"""Packed-layout flash self-attention: q/k/v stay [B, T, H*dh].

Why this kernel exists (PERF.md "packed attention"): the upstream pallas
flash kernel consumes [B, H, T, dh] arrays, so XLA must physically re-tile
each of q, k, v (and the output) from the projection's natural [B, T, H*dh]
layout — on the chunk-BERT grid (128x512x768, 12 heads) those "data
formatting" copies are ~0.5 ms x 4 tensors x 12 layers = ~26% of the whole
forward (measured from an xplane trace; see PERF.md). This kernel reads the
projections in their native packed layout and writes the packed layout the
out-projection wants, eliminating every copy.

Head separation without sub-128 lane slices (the Mosaic-safe trick): all
slices are 128-lane aligned. For head_dim=64 a 128-lane slice holds a PAIR
of heads; per-head logits come from zero-masking the other head's lanes
before the contraction —

    (q2 * mask_h) @ k2^T  ==  q_h @ k_h^T      (zeros kill the other head)
    p_h @ (v2 * mask_h)   ==  p_h @ v_h        (in its own 64 lanes)

and the pair's outputs just add. The MXU pads 64-dim contractions to 128
anyway, so the masked 128-wide ops cost identical silicon time to true
per-head 64-wide ones.

Scope: self-attention, Tq == Tk <= MAX_T (single kv block per grid step, so
softmax is exact — no online accumulation), no additive bias, no dropout.
Key padding is an additive -1e30 on masked keys; all-pad query rows come out
finite (uniform attention) and are masked downstream exactly like the XLA
path's garbage rows. Backward: a packed-layout pallas kernel (_bwd_kernel,
same no-retiling rationale as the forward) for shapes where
supports_packed_bwd holds (T <= MAX_T_BWD, head_dim in {64,128});
MMR_PACKED_BWD=xla is the escape hatch, and shapes outside the gate fall
back to the recompute-based VJP of the mathematically identical XLA
attention. Under the frozen-BERT default the cotangent is structurally zero
and XLA DCEs the whole backward.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MAX_T = 1024  # single-kv-block design: k/v/s tiles must fit VMEM


def supports_packed(tq: int, tk: int, head_dim: int, d: int, num_heads: int) -> bool:
    if tq != tk or tq < 256 or tq > MAX_T or tq % 128 != 0:
        return False
    if head_dim not in (64, 128) or d % 128 != 0 or num_heads * head_dim != d:
        return False
    if head_dim == 64 and num_heads % 2 != 0:
        return False
    return True


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, head_dim: int):
    t = k_ref.shape[1]
    d = q_ref.shape[2]
    # additive key mask [1, T]: 0 where valid, -1e30 where pad (finite, so
    # all-pad rows softmax to uniform instead of NaN)
    neg = (1.0 - m_ref[0].astype(jnp.float32)) * -1e30

    if head_dim == 64:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        half_masks = ((lane < 64), (lane >= 64))
    else:
        half_masks = (None,)

    def _one(q2, k2, v2, mask):
        if mask is not None:
            qm = q2 * mask.astype(q2.dtype)
            vm = v2 * mask.astype(v2.dtype)
        else:
            qm, vm = q2, v2
        s = jax.lax.dot_general(
            qm, k2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jax.nn.softmax(s + neg, axis=-1).astype(v2.dtype)
        return jax.lax.dot_general(
            p, vm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for c in range(d // 128):
        sl = slice(c * 128, (c + 1) * 128)
        q2 = q_ref[0, :, sl]
        k2 = k_ref[0, :, sl]
        v2 = v_ref[0, :, sl]
        out2 = _one(q2, k2, v2, half_masks[0])
        if head_dim == 64:
            out2 = out2 + _one(q2, k2, v2, half_masks[1])
        o_ref[0, :, sl] = out2.astype(o_ref.dtype)


def _packed_call(q, k, v, kv_mask, num_heads: int, interpret: bool):
    import os

    b, t, d = q.shape
    head_dim = d // num_heads
    # [B, 1, T] so the mask block's trailing dims equal the array dims
    # (Mosaic requires trailing block dims (8,128)-divisible OR array-equal)
    m3 = kv_mask.astype(jnp.float32).reshape(b, 1, t)

    # q=512 measured best in-graph at 12-layer scale (118.3 ms vs 122.2 at
    # 256, 125.5 at 128 — cross-layer pipelining favors fewer, larger steps)
    blk_q = min(int(os.environ.get("MMR_PACKED_BLOCK_Q", "512")), t)
    if t % blk_q != 0:
        blk_q = t
    kernel = functools.partial(_kernel, head_dim=head_dim)
    return pl.pallas_call(
        kernel,
        grid=(b, t // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v, m3)


MAX_T_BWD = 512  # bwd keeps [T,T] fp32 intermediates per head in VMEM


def supports_packed_bwd(t: int, head_dim: int) -> bool:
    # head_dim must satisfy the same pair-of-heads lane-masking contract as
    # the forward; checked here (not only in supports_packed) so loosening
    # the forward gate can never silently produce wrong gradients.
    return t <= MAX_T_BWD and head_dim in (64, 128)


def _bwd_kernel(q_ref, k_ref, v_ref, m_ref, do_ref, dq_ref, dk_ref, dv_ref, *, head_dim: int):
    """VJP of _kernel for ONE 128-lane chunk (grid = (B, d//128)).

    Exactly the standard single-block attention backward, with the same
    pair-of-heads lane masking as the forward: per-head logits come from
    zero-masking the other head's lanes, per-head gradients land in the
    head's own lanes because k/q are masked in the dq/dk contractions and do
    is masked in the dv/dp contractions. fp32 softmax recompute matches the
    forward bit-for-bit; p is cast to the compute dtype for the dv matmul
    exactly as the forward casts it for p@v."""
    neg = (1.0 - m_ref[0].astype(jnp.float32)) * -1e30

    if head_dim == 64:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        half_masks = ((lane < 64), (lane >= 64))
    else:
        half_masks = (None,)

    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    do2 = do_ref[0]

    dq = jnp.zeros(q2.shape, jnp.float32)
    dk = jnp.zeros(q2.shape, jnp.float32)
    dv = jnp.zeros(q2.shape, jnp.float32)
    for mask in half_masks:
        if mask is not None:
            qm = q2 * mask.astype(q2.dtype)
            km = k2 * mask.astype(k2.dtype)
            dom = do2 * mask.astype(do2.dtype)
        else:
            qm, km, dom = q2, k2, do2
        f32 = functools.partial(jax.lax.dot_general, preferred_element_type=jnp.float32)
        s = f32(qm, k2, dimension_numbers=(((1,), (1,)), ((), ())))
        p = jax.nn.softmax(s + neg, axis=-1)
        pb = p.astype(v2.dtype)
        # dv_h = p^T @ do_h   (contraction over the query index)
        dv = dv + f32(pb, dom, dimension_numbers=(((0,), (0,)), ((), ())))
        # dp_h = do_h @ v^T   (do masked -> other head's lanes contribute 0)
        dp = f32(dom, v2, dimension_numbers=(((1,), (1,)), ((), ())))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q2.dtype)
        # dq_h = ds @ k_h ; dk_h = ds^T @ q_h   (k/q masked -> confined lanes)
        dq = dq + f32(dsb, km, dimension_numbers=(((1,), (0,)), ((), ())))
        dk = dk + f32(dsb, qm, dimension_numbers=(((0,), (0,)), ((), ())))

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _packed_bwd_call(q, k, v, kv_mask, do, num_heads: int, interpret: bool):
    b, t, d = q.shape
    head_dim = d // num_heads
    m3 = kv_mask.astype(jnp.float32).reshape(b, 1, t)
    kernel = functools.partial(_bwd_kernel, head_dim=head_dim)
    lane_chunk = pl.BlockSpec((1, t, 128), lambda i, c: (i, 0, c))
    out_sds = jax.ShapeDtypeStruct((b, t, d), q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(b, d // 128),
        in_specs=[
            lane_chunk,  # q
            lane_chunk,  # k
            lane_chunk,  # v
            pl.BlockSpec((1, 1, t), lambda i, c: (i, 0, 0)),  # mask
            lane_chunk,  # do
        ],
        out_specs=[lane_chunk, lane_chunk, lane_chunk],
        out_shape=[out_sds, out_sds, out_sds],
        interpret=interpret,
    )(q, k, v, m3, do)


def _xla_attention(q, k, v, kv_mask, num_heads: int):
    """The mathematically identical XLA program (used for the backward)."""
    b, t, d = q.shape
    h = num_heads
    dh = d // h
    q4 = q.reshape(b, t, h, dh)
    k4 = k.reshape(b, t, h, dh)
    v4 = v.reshape(b, t, h, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q4, k4).astype(jnp.float32)
    logits = logits + ((1.0 - kv_mask.astype(jnp.float32)) * -1e30)[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v4)
    return out.reshape(b, t, d).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _packed_diff(q, k, v, kv_mask, num_heads: int, interpret: bool):
    return _packed_call(q, k, v, kv_mask, num_heads, interpret)


def _packed_fwd(q, k, v, kv_mask, num_heads, interpret):
    return _packed_call(q, k, v, kv_mask, num_heads, interpret), (q, k, v, kv_mask)


def _packed_bwd(num_heads, interpret, res, ct):
    # Backward: a packed-layout pallas kernel (same no-retiling rationale as
    # the forward — the fine-tuned BERT body otherwise pays 6 re-tiling
    # copies per layer in the backward). Falls back to the VJP of the
    # mathematically identical XLA attention for shapes the kernel doesn't
    # cover, or under MMR_PACKED_BWD=xla. Under the frozen-BERT default the
    # cotangent is a structural zero and XLA DCEs all of this.
    import os

    q, k, v, kv_mask = res
    t = q.shape[1]
    head_dim = q.shape[2] // num_heads
    use_kernel = (
        supports_packed_bwd(t, head_dim)
        and os.environ.get("MMR_PACKED_BWD", "pallas") != "xla"
    )
    if use_kernel:
        dq, dk, dv = _packed_bwd_call(q, k, v, kv_mask, ct, num_heads, interpret)
    else:
        _, vjp = jax.vjp(
            lambda a, b_, c: _xla_attention(a, b_, c, kv_mask, num_heads), q, k, v
        )
        dq, dk, dv = vjp(ct)
    return dq, dk, dv, jnp.zeros_like(kv_mask)


_packed_diff.defvjp(_packed_fwd, _packed_bwd)


def packed_flash_self_attention(
    q: jnp.ndarray,  # [B, T, H*dh] (query already scaled by caller)
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],  # [B, T] 1 = valid
    num_heads: int,
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Returns [B, T, H*dh] in the packed layout."""
    import os

    if interpret is None:
        interpret = os.environ.get("MMR_PACKED_INTERPRET", "0") == "1"
    b, t, d = q.shape
    head_dim = d // num_heads
    if not supports_packed(t, k.shape[1], head_dim, d, num_heads):
        raise ValueError(
            f"packed flash unsupported for T={t}, d={d}, heads={num_heads}"
        )
    if kv_mask is None:
        kv_mask = jnp.ones((b, t), jnp.float32)
    return _packed_diff(q, k, v, kv_mask.astype(jnp.float32), num_heads, bool(interpret))
