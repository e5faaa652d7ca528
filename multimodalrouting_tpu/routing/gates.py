"""Gated-concat routing path (Model/ semantics).

Parity target: reference MIMIC-IV/Model/routing_and_heads.py:252-353
(RouteGateNet, FinalConcatHead, concat_routes, forward_emb_concat) and the
three gate modes of train_step3_trimodal_router.py:377-394
(uniform / learned / loss_based = softmax(-alpha * per-route BCE) + log
availability).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.models.fusions import MLPBlock
from multimodalrouting_tpu.ops.masked import masked_softmax


class RouteGateNet(nn.Module):
    """MLP([zL|zN|zI]) -> softmax over routes, renormalized by availability."""

    num_routes: int
    hidden: int = 1024
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        zl: jnp.ndarray,
        zn: jnp.ndarray,
        zi: jnp.ndarray,
        avail: Optional[jnp.ndarray] = None,  # [B,R] availability mask
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = jnp.concatenate([zl, zn, zi], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln")(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.p_drop, deterministic=deterministic)(x)
        logits = nn.Dense(
            self.num_routes, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2"
        )(x)
        w = nn.softmax(logits.astype(jnp.float32), axis=1)
        if avail is not None:
            w = w * avail.astype(w.dtype)
            w = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), 1e-6, None)
        return w.astype(self.dtype)


def uniform_gates(avail: jnp.ndarray) -> jnp.ndarray:
    """Uniform over available routes."""
    w = avail.astype(jnp.float32)
    return w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), 1e-6, None)


def loss_based_gates(
    route_losses: jnp.ndarray, avail: jnp.ndarray, alpha: float = 1.0
) -> jnp.ndarray:
    """softmax(-alpha * per-route loss + log availability).

    Reference: Model/train_step3_trimodal_router.py:377-394.
    """
    logits = -alpha * route_losses.astype(jnp.float32) + jnp.log(
        jnp.clip(avail.astype(jnp.float32), 1e-9, None)
    )
    return masked_softmax(logits, None, axis=1)


def concat_routes(
    route_embs: Dict[str, jnp.ndarray],
    gates: jnp.ndarray,
    routes: Sequence[str],
    l2norm: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gate-weight and flatten route embeddings -> ([B, R*d], [B, R, d])."""
    z = jnp.stack([route_embs[r] for r in routes], axis=1)  # [B,R,d]
    if l2norm:
        z = z / jnp.clip(jnp.linalg.norm(z, axis=2, keepdims=True), 1e-12, None)
    zw = gates.astype(z.dtype)[..., None] * z
    b, r, d = zw.shape
    return zw.reshape(b, r * d), zw


class FinalConcatHead(nn.Module):
    """Deep MLP over concatenated R*d features (reference :280-305)."""

    num_routes: int
    d: int
    n_tasks: int = 1
    hidden: Optional[Sequence[int]] = None
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_cat: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_dim = self.num_routes * self.d
        hidden = list(self.hidden) if self.hidden is not None else [4 * in_dim, 2 * in_dim]
        return MLPBlock(
            out_dim=self.n_tasks,
            hidden=hidden,
            p_drop=self.p_drop,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(x_cat, deterministic)


class RouteHead(nn.Module):
    """Per-route prediction head: LN -> Linear(2d) -> GELU -> Drop -> Linear.

    Reference: Model/routing_and_heads.py:201-218.
    """

    n_tasks: int = 1
    p_drop: float = 0.1
    width_mult: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ln")(x)
        x = nn.Dense(self.width_mult * d, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.p_drop, deterministic=deterministic)(x)
        return nn.Dense(self.n_tasks, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(x)


class StackedRouteHeads(nn.Module):
    """R parameter-independent RouteHeads as one stacked einsum program.

    Replaces the reference's per-route ModuleDict of heads with a single
    batched computation over the route axis.
    """

    num_routes: int
    n_tasks: int = 1
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """z: [B, R, d] -> logits [B, R, n_tasks]."""
        b, r, d = z.shape
        if r != self.num_routes:
            raise ValueError(f"expected {self.num_routes} routes, got {r}")

        scale = self.param("ln_scale", nn.initializers.ones, (r, d), self.param_dtype)
        bias = self.param("ln_bias", nn.initializers.zeros, (r, d), self.param_dtype)
        mean = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.var(z, axis=-1, keepdims=True)
        h = (z - mean) * jax.lax.rsqrt(var + 1e-6)
        h = h * scale.astype(z.dtype)[None] + bias.astype(z.dtype)[None]

        w1 = self.param("w1", nn.initializers.lecun_normal(), (r, d, 2 * d), self.param_dtype)
        b1 = self.param("b1", nn.initializers.zeros, (r, 2 * d), self.param_dtype)
        h = jnp.einsum("brd,rdh->brh", h, w1.astype(z.dtype)) + b1.astype(z.dtype)[None]
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(rate=self.p_drop, deterministic=deterministic)(h)
        w2 = self.param("w2", nn.initializers.lecun_normal(), (r, 2 * d, self.n_tasks), self.param_dtype)
        b2 = self.param("b2", nn.initializers.zeros, (r, self.n_tasks), self.param_dtype)
        return jnp.einsum("brh,rht->brt", h, w2.astype(z.dtype)) + b2.astype(z.dtype)[None]
