"""Masked pooling / softmax primitives shared across the framework.

Static-shape, mask-based equivalents of the reference's ragged pooling
helpers (reference: .../Paired_Cross_Attention/encoders.py:39-42 _masked_mean,
mult_model.py:84-106 _masked_mean_tbd/_masked_last_tbd,
routing.py:52-59 _masked_softmax). All run in the caller's dtype; softmax is
promoted to fp32 (numerics island) and cast back.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -1e9


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = 1) -> jnp.ndarray:
    """Mean of x over `axis` counting only positions where mask==1.

    x: [..., T, ..., D]; mask broadcastable to x without the feature dim.
    With an all-zero mask the result is 0 (denominator clamped to 1).
    """
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = jnp.expand_dims(mask.astype(x.dtype), -1)
    denom = jnp.clip(jnp.sum(m, axis=axis), 1.0, None)
    return jnp.sum(x * m, axis=axis) / denom


def masked_last(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Last valid timestep of x [B,T,D] by mask [B,T]; zeros if no valid step."""
    if mask is None:
        return x[:, -1]
    m = (mask > 0.5).astype(jnp.int32)
    lengths = jnp.sum(m, axis=1)
    idx = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    return jnp.where((lengths > 0)[:, None], out, jnp.zeros_like(out))


def masked_max(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = 1) -> jnp.ndarray:
    """Max over axis with masked positions filled with -1e9."""
    if mask is None:
        return jnp.max(x, axis=axis)
    m = jnp.expand_dims(mask.astype(bool), -1)
    return jnp.max(jnp.where(m, x, jnp.full_like(x, NEG_INF)), axis=axis)


def masked_softmax(
    logits: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1
) -> jnp.ndarray:
    """Softmax over axis with masked entries forced to ~0 probability.

    fp32 island: softmax computed in float32 regardless of input dtype
    (mirrors the reference's fp32 softmax inside AMP regions,
    multihead_attention.py:136).
    """
    dtype = logits.dtype
    x = logits.astype(jnp.float32)
    if mask is not None:
        x = jnp.where(mask.astype(bool), x, NEG_INF)
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x)
    out = e / jnp.clip(jnp.sum(e, axis=axis, keepdims=True), 1e-30, None)
    return out.astype(dtype)
