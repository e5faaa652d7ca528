"""Attention primitives: multi-head attention with an fp32 softmax island and
fairseq-style sinusoidal positions.

Behavioral parity targets:
  * MHA — reference MIMIC-IV/PhenoModel/Paired_Cross_Attention/
    multihead_attention.py:6-171 (packed QKV, q scaling by head_dim**-0.5,
    fp32 softmax, output projection).
  * Positions — reference .../position_embedding.py:12-122 (positions start at
    padding_idx+1; half sin / half cos with shared frequencies).

Design is TPU-first: batch-first [B, T, D] layouts, einsum attention that XLA
maps onto the MXU, static shapes, masks instead of ragged lengths.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodalrouting_tpu.ops.masked import NEG_INF


def _use_flash_attention() -> bool:
    """Flash attention for long self-attention, on by default on TPU
    (MMR_FLASH=0 disables)."""
    import os

    return os.environ.get("MMR_FLASH", "1") == "1"


def _use_fused_qkv() -> bool:
    """Fuse the q/k/v projections of SELF-attention into one matmul
    (MMR_FUSED_QKV=1 opts in; default OFF). Output-identical: each output
    column of a matmul is an independent dot product, so concatenating the
    three kernels along the output axis changes nothing numerically — it
    reads the [N,T,D] activation from HBM once instead of three times.
    Measured on the chunk-BERT grid (PERF.md): the per-step concat of the
    [D,3D] kernel (params are live buffers, so XLA cannot fold it) costs
    MORE than the saved activation reads — 176.6 vs 170.6 ms/fwd — so the
    unfused nn.Dense path stays the default."""
    import os

    return os.environ.get("MMR_FUSED_QKV", "0") == "1"


class _ProjParams(nn.Module):
    """Declares an nn.Dense-shaped (kernel, bias) pair WITHOUT computing the
    projection, so self-attention can run q/k/v as one fused matmul while
    keeping the exact `{q,k,v}_proj/{kernel,bias}` param tree (checkpoint- and
    HF-import-compatible with the unfused nn.Dense path)."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(), (in_features, self.features), self.param_dtype
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return kernel, bias


def sinusoidal_positions(
    seq_len: int, dim: int, padding_idx: int = 0, dtype=jnp.float32, quantized: bool = False
) -> jnp.ndarray:
    """[T, dim] fairseq-style sinusoid table for positions padding_idx+1..+T.

    quantized=True replicates a reference defect for bit-parity testing: the
    reference's SinusoidalPositionalEmbedding.forward casts its float table to
    the dtype of the integer dummy token ids (position_embedding.py:111
    ``w.to(dtype=input.dtype)`` with input torch.long), truncating every
    sin/cos value toward zero — the runnable reference's positional signal is
    integer {-1, 0, 1}. The default (False) keeps correct smooth sinusoids.
    """
    half = dim // 2
    if half <= 0:
        raise ValueError(f"dim must be >= 2, got {dim}")
    positions = np.arange(padding_idx + 1, padding_idx + 1 + seq_len, dtype=np.float32)
    if half == 1:
        freqs = np.ones((1,), dtype=np.float32)
    else:
        freqs = np.exp(np.arange(half, dtype=np.float32) * -(np.log(10000.0) / (half - 1)))
    args = positions[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((seq_len, 1), dtype=np.float32)], axis=1)
    if quantized:
        table = np.trunc(table.astype(np.float32))
    return jnp.asarray(table, dtype=dtype)


class MultiheadAttention(nn.Module):
    """Batch-first multi-head attention with fp32 softmax.

    q: [B, Tq, D], k/v: [B, Tk, D]; kv_mask: [B, Tk] (1 = keep).
    attn_bias: optional additive [Tq, Tk] bias (e.g. causal future mask).
    """

    d: int
    num_heads: int
    dropout: float = 0.0
    int8: bool = False  # int8 MXU projections (frozen/inference paths only)
    frozen_fast_path: bool = False  # caller guarantees no gradient flows
    # through this module (e.g. frozen-BERT stop_gradient) -> the packed-
    # layout flash kernel (ops/flash_packed.py, forward-only: no VJP) becomes
    # eligible, eliminating the [B,T,H*dh]->[B,H,T,dh] re-tiling copies
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        kv_mask: Optional[jnp.ndarray] = None,
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.d % self.num_heads:
            raise ValueError(f"d={self.d} not divisible by heads={self.num_heads}")
        head_dim = self.d // self.num_heads
        scaling = head_dim**-0.5

        if self.int8:
            from multimodalrouting_tpu.ops.quant import QuantDense as _Dense
        else:
            _Dense = nn.Dense
        dense = lambda name: _Dense(  # noqa: E731
            self.d,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name=name,
        )
        if q is k and k is v and not self.int8 and _use_fused_qkv():
            # Self-attention fast path: one [D, 3D] matmul over the shared
            # input instead of three [D, D] ones (HBM reads the activation
            # once). Param tree identical to the nn.Dense path (_ProjParams).
            d_in = q.shape[-1]
            qk_, qb_ = _ProjParams(self.d, self.param_dtype, name="q_proj")(d_in)
            kk_, kb_ = _ProjParams(self.d, self.param_dtype, name="k_proj")(d_in)
            vk_, vb_ = _ProjParams(self.d, self.param_dtype, name="v_proj")(d_in)
            w3 = jnp.concatenate([qk_, kk_, vk_], axis=1).astype(self.dtype)
            b3 = jnp.concatenate([qb_, kb_, vb_]).astype(self.dtype)
            qkv = q.astype(self.dtype) @ w3 + b3
            qh, kh, vh = jnp.split(qkv, 3, axis=-1)
            qh = qh * scaling
        else:
            qh = dense("q_proj")(q) * scaling
            kh = dense("k_proj")(k)
            vh = dense("v_proj")(v)

        b, tq, _ = qh.shape
        tk = kh.shape[1]
        h = self.num_heads

        # flash-attention fast path for long self-attention (chunk BERT)
        if (
            attn_bias is None
            and (deterministic or self.dropout == 0.0)
            and q.shape == k.shape
            and _use_flash_attention()
        ):
            from multimodalrouting_tpu.ops import flash

            impl = flash.attention_impl()
            if impl != "xla" and flash.flash_available():
                # packed-layout kernel: q/k/v consumed in the projections'
                # native [B,T,H*dh] layout — no head-split re-tiling copies
                # (~26% of the chunk-BERT forward, PERF.md). Default whenever
                # either no gradient flows through the body (frozen_fast_path)
                # or the packed pallas BACKWARD covers the shape
                # (flash_packed.supports_packed_bwd) — so the fine-tuned-text
                # workload (reference finetune_text,
                # Paired_Cross_Attention/main.py:2801-2807) also skips the
                # re-tiling copies in both directions. MMR_ATTN=packed forces
                # it; MMR_PACKED_BWD=xla keeps the packed fwd but routes the
                # backward through the XLA VJP.
                if impl in ("packed", "flash"):
                    from multimodalrouting_tpu.ops import flash_packed

                    take_packed = (
                        impl == "packed"
                        or self.frozen_fast_path
                        or flash_packed.supports_packed_bwd(tq, head_dim)
                    )
                    if take_packed and flash_packed.supports_packed(tq, tk, head_dim, self.d, h):
                        out = flash_packed.packed_flash_self_attention(
                            qh, kh, vh, kv_mask, h
                        )
                        return dense("out_proj")(out.astype(self.dtype))
                if impl != "packed" and flash.supports(tq, tk, head_dim):
                    q4 = qh.reshape(b, tq, h, head_dim)
                    k4 = kh.reshape(b, tk, h, head_dim)
                    v4 = vh.reshape(b, tk, h, head_dim)
                    if impl == "splash":
                        out = flash.splash_self_attention(q4, k4, v4, kv_mask)
                    else:
                        out = flash.flash_self_attention(q4, k4, v4, kv_mask)
                    out = out.astype(self.dtype).reshape(b, tq, self.d)
                    return dense("out_proj")(out)

        qh = qh.reshape(b, tq, h, head_dim)
        kh = kh.reshape(b, tk, h, head_dim)
        vh = vh.reshape(b, tk, h, head_dim)

        # [B, H, Tq, Tk] logits in fp32 (numerics island)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
        if attn_bias is not None:
            logits = logits + attn_bias.astype(jnp.float32)[None, None]
        if kv_mask is not None:
            keep = kv_mask.astype(bool)[:, None, None, :]
            logits = jnp.where(keep, logits, NEG_INF)
        weights = nn.softmax(logits, axis=-1).astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout, deterministic=False)(weights)

        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh).reshape(b, tq, self.d)
        return dense("out_proj")(out)


def future_mask(tq: int, tk: int) -> jnp.ndarray:
    """Additive causal mask [Tq, Tk] with -inf strictly above the shifted
    diagonal (reference: transformer.py:234-240 buffered_future_mask)."""
    offset = 1 + abs(tk - tq)
    i = np.arange(tq)[:, None]
    j = np.arange(tk)[None, :]
    mask = np.where(j >= i + offset, NEG_INF, 0.0).astype(np.float32)
    return jnp.asarray(mask)
