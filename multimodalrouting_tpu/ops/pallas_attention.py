"""Pallas TPU kernel: batched masked multi-head attention core.

One kernel instance computes softmax(Q K^T * scale + mask) V for one
(stream, batch, head) slice with the full Tq x Tk score tile resident in
VMEM — the fused attention core shared by all 9 directional MulT route
streams and the chunk-BERT program (BASELINE.json north star: "all 9
directional cross-attention routes batched into one fused Pallas kernel").
Streams/batch/heads are folded into the leading grid dimension, so the six
directional streams execute as one kernel launch over a [G*B*H] grid.

fp32 softmax island; bf16-in/bf16-out friendly. Backward goes through the
mathematically identical XLA einsum program via custom_vjp.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e9


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    """q [1,Tq,dh], k/v [1,Tk,dh], mask [1,1,Tk] (1=keep) -> out [1,Tq,dh]."""
    q = q_ref[0].astype(jnp.float32)  # [Tq,dh]
    k = k_ref[0].astype(jnp.float32)  # [Tk,dh]
    v = v_ref[0].astype(jnp.float32)
    mask = mask_ref[0].astype(jnp.float32)  # [1,Tk]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Tq,Tk]
    s = jnp.where(mask > 0.5, s, NEG_INF)
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.clip(jnp.sum(e, axis=1, keepdims=True), 1e-30, None)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _xla_attention(q, k, v, mask, scale):
    s = jnp.einsum("gqd,gkd->gqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    s = jnp.where(mask[:, None, :] > 0.5, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gqk,gkd->gqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _pallas_forward(q, k, v, mask, scale, interpret):
    g, tq, dh = q.shape
    tk = k.shape[1]
    mem = dict(memory_space=pltpu.VMEM) if _HAS_PLTPU and not interpret else {}
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, tq, dh), lambda i: (i, 0, 0), **mem),
            pl.BlockSpec((1, tk, dh), lambda i: (i, 0, 0), **mem),
            pl.BlockSpec((1, tk, dh), lambda i: (i, 0, 0), **mem),
            pl.BlockSpec((1, 1, tk), lambda i: (i, 0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((1, tq, dh), lambda i: (i, 0, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((g, tq, dh), q.dtype),
        interpret=interpret,
    )(q, k, v, mask.reshape(g, 1, tk))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def masked_attention_pallas(q, k, v, mask, scale: float, interpret: bool = False):
    """Batched attention core: q [G,Tq,dh], k/v [G,Tk,dh], mask [G,Tk]."""
    return _pallas_forward(q, k, v, mask, scale, interpret)


def _fwd(q, k, v, mask, scale, interpret):
    return _pallas_forward(q, k, v, mask, scale, interpret), (q, k, v, mask)


def _bwd(scale, interpret, residuals, g_out):
    q, k, v, mask = residuals
    _, vjp_fn = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, mask, scale), q, k, v)
    dq, dk, dv = vjp_fn(g_out)
    return dq, dk, dv, None


masked_attention_pallas.defvjp(_fwd, _bwd)


def multihead_attention_core(
    q: jnp.ndarray,  # [B, Tq, H, dh]
    k: jnp.ndarray,  # [B, Tk, H, dh]
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],  # [B, Tk]
    scale: float,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Fold (B,H) into the kernel grid and run the fused attention core."""
    b, tq, h, dh = q.shape
    tk = k.shape[1]
    if use_pallas is None:
        use_pallas = _on_tpu()

    qf = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, tq, dh)
    kf = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, tk, dh)
    vf = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, tk, dh)
    if kv_mask is None:
        mask = jnp.ones((b * h, tk), qf.dtype)
    else:
        mask = jnp.repeat(kv_mask.astype(qf.dtype), h, axis=0)

    if use_pallas:
        out = masked_attention_pallas(qf, kf, vf, mask, scale, not _on_tpu())
    else:
        out = _xla_attention(qf * 1.0, kf, vf, mask, scale)
    out = out.reshape(b, h, tq, dh)
    return jnp.transpose(out, (0, 2, 1, 3))
