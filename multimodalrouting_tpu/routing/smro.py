"""sMRO-style block-staged routing gate (MMRouting).

Parity target: reference routing.py:21-176 — trainable per-instance route and
block gates over the shared context [zL|zN|zI], stage masks for the
uni -> bi -> tri curriculum, and stop-gradients on lower blocks during staged
training. A deterministic loss-based variant mirrors INSPECT/routing.py:10-98
(softmax(-alpha * EMA route losses)).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.ops.masked import masked_softmax
from multimodalrouting_tpu.routes import block_mask_for_stage, get_blocks


class MMRoutingOut(NamedTuple):
    fused: jnp.ndarray  # [B, C] fused logits
    route_w: jnp.ndarray  # [B, R]
    block_w: jnp.ndarray  # [B, 3]
    block_logits: jnp.ndarray  # [B, 3, C] per-block contributions (uni/bi/tri)


class MMRouting(nn.Module):
    """Trainable per-instance gating with sMRO block-staged fusion."""

    routes: Tuple[str, ...]
    gate_hidden: int = 256
    p_drop: float = 0.10
    strict_freeze_gate: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        route_logits: jnp.ndarray,  # [B, R, C]
        zl: jnp.ndarray,
        zn: jnp.ndarray,
        zi: jnp.ndarray,
        stage: Optional[str] = None,  # None/"eval" | uni | bi | tri
        deterministic: bool = True,
    ) -> MMRoutingOut:
        b, r, c = route_logits.shape
        if r != len(self.routes):
            raise ValueError(f"route_logits has {r} routes, expected {len(self.routes)}")
        x = jnp.concatenate([zl, zn, zi], axis=-1)

        def gate(out_dim, name):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=f"{name}_ln")(x)
            h = nn.Dense(self.gate_hidden, dtype=self.dtype, param_dtype=self.param_dtype, name=f"{name}_fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=self.p_drop, deterministic=deterministic)(h)
            return nn.Dense(out_dim, dtype=self.dtype, param_dtype=self.param_dtype, name=f"{name}_fc2")(h)

        rmask = bmask = None
        if stage not in (None, "eval", ""):
            rmask, bmask = block_mask_for_stage(stage, self.routes)
            rmask = jnp.broadcast_to(rmask[None], (b, r))
            bmask = jnp.broadcast_to(bmask[None], (b, 3))

        route_w = masked_softmax(gate(r, "route_gate"), rmask, axis=-1)
        block_w = masked_softmax(gate(3, "block_gate"), bmask, axis=-1)

        blocks = get_blocks(self.routes)
        weighted = route_logits * route_w[..., None].astype(route_logits.dtype)
        uni = jnp.sum(weighted[:, jnp.array(blocks["uni"])], axis=1)
        bi = jnp.sum(weighted[:, jnp.array(blocks["bi"])], axis=1)
        tri = jnp.sum(weighted[:, jnp.array(blocks["tri"])], axis=1)
        block_logits = jnp.stack([uni, bi, tri], axis=1)

        w_uni, w_bi, w_tri = (block_w[:, i : i + 1] for i in range(3))
        sg = jax.lax.stop_gradient
        if stage in (None, "eval", ""):
            fused = w_uni * uni + w_bi * bi + w_tri * tri
        elif stage == "uni":
            fused = w_uni * uni
        elif stage == "bi":
            if self.strict_freeze_gate:
                fused = sg(w_uni) * sg(uni) + w_bi * bi
            else:
                fused = w_uni * sg(uni) + w_bi * bi
        elif stage == "tri":
            if self.strict_freeze_gate:
                fused = sg(w_uni) * sg(uni) + sg(w_bi) * sg(bi) + w_tri * tri
            else:
                fused = w_uni * sg(uni) + w_bi * sg(bi) + w_tri * tri
        else:
            raise ValueError(f"Invalid stage {stage!r}")

        return MMRoutingOut(fused=fused, route_w=route_w, block_w=block_w, block_logits=block_logits)


def loss_based_route_weights(
    route_losses_ema: jnp.ndarray, alpha: float, routes: Tuple[str, ...]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic loss-based gate (INSPECT/routing.py:10-98).

    route_losses_ema: [R] EMA of per-route losses -> (route_w [R], block_w [3]).
    Route weights are softmax(-alpha * losses) (`_compute_route_weights`,
    INSPECT/routing.py:44-46); block weights are softmax(-alpha * block-mean
    LOSSES) (`_compute_block_weights`, :48-57) — the mean is over losses, not
    over the already-softmaxed route weights.
    """
    losses = route_losses_ema.astype(jnp.float32)
    rw = jax.nn.softmax(-alpha * losses)
    blocks = get_blocks(routes)
    block_losses = jnp.stack(
        [jnp.mean(losses[jnp.array(blocks[k])]) for k in ("uni", "bi", "tri")]
    )
    bw = jax.nn.softmax(-alpha * block_losses)
    return rw, bw


def loss_based_fuse(
    route_logits: jnp.ndarray,  # [B, R, C]
    route_losses_ema: jnp.ndarray,  # [R]
    alpha: float,
    routes: Tuple[str, ...],
) -> MMRoutingOut:
    """Deterministic loss-based sMRO fusion (INSPECT/routing.py:59-90).

    weighted = logits * route_w; block sums over uni/bi/tri; fused =
    sum(block_w * block_sums). No stage masks or stop-gradients — the INSPECT
    curriculum freezes route heads instead (train_fame.py:122-126).
    """
    b = route_logits.shape[0]
    rw, bw = loss_based_route_weights(route_losses_ema, alpha, routes)
    weighted = route_logits * rw[None, :, None].astype(route_logits.dtype)
    blocks = get_blocks(routes)
    uni = jnp.sum(weighted[:, jnp.array(blocks["uni"])], axis=1)
    bi = jnp.sum(weighted[:, jnp.array(blocks["bi"])], axis=1)
    tri = jnp.sum(weighted[:, jnp.array(blocks["tri"])], axis=1)
    block_logits = jnp.stack([uni, bi, tri], axis=1)
    fused = jnp.sum(block_logits * bw[None, :, None].astype(block_logits.dtype), axis=1)
    return MMRoutingOut(
        fused=fused,
        route_w=jnp.broadcast_to(rw[None], (b, len(routes))),
        block_w=jnp.broadcast_to(bw[None], (b, 3)),
        block_logits=block_logits,
    )
