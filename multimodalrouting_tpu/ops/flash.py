"""Flash-attention fast path for long-sequence self-attention (chunk BERT).

Wraps jax.experimental.pallas.ops.tpu.flash_attention with tuned BlockSizes
for the [B*S, 512]-token chunk grids this framework runs (measured ~13%
faster than the fused-XLA attention at B*S=128, H=12, T=512 on v5e — see
PERF.md). Key-padding is expressed as segment ids (valid tokens = segment 1,
pad = segment 0), so valid queries never attend pad keys; pad-query rows are
garbage by construction and are masked downstream exactly as in the XLA path.

Applies only on TPU for self-attention with Tq == Tk >= 256 and no additive
bias; everything else falls back to the XLA einsum path in
models/attention.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def flash_available() -> bool:
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401
    except Exception:  # pragma: no cover
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def attention_impl() -> str:
    """Self-attention kernel selector: MMR_ATTN = flash (default) | packed |
    splash | xla. MMR_FLASH=0 remains the back-compat kill switch for the XLA
    path. Under the default "flash", frozen-body self-attention (chunk BERT
    with finetune_text=False) auto-upgrades to the packed-layout kernel
    (ops/flash_packed.py) which skips the [B,T,H*dh]->[B,H,T,dh] re-tiling
    copies; "packed" forces it everywhere it is supported, "flash" semantics
    otherwise keep the upstream pallas kernel."""
    import os

    if os.environ.get("MMR_FLASH", "1") == "0":
        return "xla"
    return os.environ.get("MMR_ATTN", "flash")


def splash_self_attention(
    q: jnp.ndarray,  # [B, T, H, dh] (query already scaled by caller)
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],  # [B, T] 1 = valid
) -> jnp.ndarray:
    """Splash-attention variant of flash_self_attention (same contract:
    returns [B, T, H, dh], pad-query rows garbage, pad keys never attended)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak,
        splash_attention_mask as sam,
    )

    b, t, h, dh = q.shape
    qh = jnp.transpose(q, (0, 2, 1, 3))  # [B,H,T,dh]
    kh = jnp.transpose(k, (0, 2, 1, 3))
    vh = jnp.transpose(v, (0, 2, 1, 3))

    import os

    blk = min(512, t)
    blk_q = int(os.environ.get("MMR_SPLASH_BLOCK_Q", blk))
    blk_kv = int(os.environ.get("MMR_SPLASH_BLOCK_KV", blk))
    bs = sak.BlockSizes(
        block_q=min(blk_q, t), block_kv=min(blk_kv, t),
        block_kv_compute=min(blk_kv, t),
        block_q_dkv=min(blk_q, t), block_kv_dkv=min(blk_kv, t),
        block_kv_dkv_compute=min(blk_kv, t),
        block_q_dq=min(blk_q, t), block_kv_dq=min(blk_kv, t),
    )
    mask = sam.MultiHeadMask([sam.FullMask((t, t)) for _ in range(h)])
    kernel = sak.make_splash_mha(
        mask, block_sizes=bs, head_shards=1, q_seq_shards=1,
        interpret=os.environ.get("MMR_SPLASH_INTERPRET", "0") == "1",
    )

    if kv_mask is not None:
        ids = kv_mask.astype(jnp.int32)  # pad -> segment 0, valid -> 1

        def one(qq, kk, vv, ii):
            return kernel(qq, kk, vv, segment_ids=sak.SegmentIds(q=ii, kv=ii))

        out = jax.vmap(one)(qh, kh, vh, ids)
    else:
        out = jax.vmap(kernel)(qh, kh, vh)
    return jnp.transpose(out, (0, 2, 1, 3))


def supports(tq: int, tk: int, head_dim: int) -> bool:
    return tq == tk and tq >= 256 and tq % 128 == 0 and head_dim in (64, 128)


def flash_self_attention(
    q: jnp.ndarray,  # [B, T, H, dh] (query already scaled by caller)
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],  # [B, T] 1 = valid
) -> jnp.ndarray:
    """Returns [B, T, H, dh]; caller applied the 1/sqrt(dh) scaling to q."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, t, h, dh = q.shape
    qh = jnp.transpose(q, (0, 2, 1, 3))  # [B,H,T,dh]
    kh = jnp.transpose(k, (0, 2, 1, 3))
    vh = jnp.transpose(v, (0, 2, 1, 3))

    seg = None
    if kv_mask is not None:
        ids = kv_mask.astype(jnp.int32)  # pad -> segment 0, valid -> 1
        seg = SegmentIds(q=ids, kv=ids)

    import os

    # defaults from the round-2 block sweep on v5e (PERF.md): q512/k512/b4
    # gave 171.6 ms vs 196.8 ms fused-XLA on the 128x12x512x64 chunk grid;
    # k256/q256 lose, b16 exceeds scoped VMEM
    blk = min(512, t)

    # env overrides are validated up front — bad blocks otherwise fail deep
    # inside the pallas kernel with an opaque grid error (ADVICE r2)
    def _env_block(name: str, default: int, total: int) -> int:
        raw = os.environ.get(name)
        if raw is None:
            return default
        try:
            val = int(raw)
        except ValueError:
            val = -1
        if val <= 0 or total % min(val, total) != 0:
            import warnings

            warnings.warn(
                f"{name}={raw!r} must be a positive divisor of {total}; "
                f"falling back to {default}"
            )
            return default
        return min(val, total)

    blk_q = _env_block("MMR_FLASH_BLOCK_Q", blk, t)
    blk_k = _env_block("MMR_FLASH_BLOCK_K", blk, t)
    default_b = next((c for c in (4, 2, 1) if b % c == 0), 1)
    blk_b = _env_block("MMR_FLASH_BLOCK_B", default_b, b)
    bs = BlockSizes(
        block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=blk_b,
        block_q_major_dkv=blk_q, block_k_major_dkv=blk_k, block_k_dkv=blk_k, block_q_dkv=blk_q,
        block_k_major_dq=blk_k, block_k_dq=blk_k, block_q_dq=blk_q,
    )
    out = flash_attention(qh, kh, vh, segment_ids=seg, causal=False, sm_scale=1.0, block_sizes=bs)
    return jnp.transpose(out, (0, 2, 1, 3))
