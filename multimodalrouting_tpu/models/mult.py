"""MULTRouter — the 10-route directional cross-attention builder.

Behavioral parity target: reference MIMIC-IV/MortModel/Paired_Cross_Attention/
mult_model.py:7-193 (MULTModel): per-modality 1x1-conv input projections,
3 self streams, 6 directional cross streams (L<-N, L<-I, N<-L, N<-I, I<-L,
I<-N), masked-mean pooling over query positions, pair projections merging the
two directions of each pair into eLN/eLI/eNI, and a trimodal projection
final_lni. Returns the 10-route embedding dict
{"L","N","I","LN","NL","LI","IL","NI","IN","LNI"}.

TPU-first redesign: the three modality sequences are padded to one static
T_max, so ALL self streams run as one vmapped stacked-parameter program and
ALL six directional cross streams run as another (see
models/transformer.py:make_stacked_mult) — two fused XLA computations instead
of nine sequential transformer modules.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.models.transformer import StackedCrossMulT, StackedSelfMulT
from multimodalrouting_tpu.ops.masked import masked_last, masked_mean

#: (query modality index, kv modality index) for the six directional streams,
#: in route order LN, LI, NL, NI, IL, IN (L=0, N=1, I=2)
CROSS_STREAMS: Tuple[Tuple[int, int], ...] = (
    (0, 1),  # LN : L queries attend over N
    (0, 2),  # LI
    (1, 0),  # NL
    (1, 2),  # NI
    (2, 0),  # IL
    (2, 1),  # IN
)
CROSS_NAMES = ("LN", "LI", "NL", "NI", "IL", "IN")


def _pad_time(seq: jnp.ndarray, mask: jnp.ndarray, t_max: int):
    t = seq.shape[1]
    if t == t_max:
        return seq, mask
    pad = t_max - t
    seq = jnp.pad(seq, ((0, 0), (0, pad), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return seq, mask


class MULTRouter(nn.Module):
    d: int = 256
    num_heads: int = 8
    layers: int = 4
    self_layers: int = 2
    attn_dropout: float = 0.1
    attn_dropout_n: float = 0.0
    attn_dropout_i: float = 0.0
    relu_dropout: float = 0.1
    res_dropout: float = 0.1
    embed_dropout: float = 0.1
    attn_mask: bool = False
    pool: str = "mean"  # mean | last (masked; reference _masked_mean_tbd /
    # _masked_last_tbd, mult_model.py:84-106)
    positions: str = "sinusoidal"  # sinusoidal | ref_quantized
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_l: jnp.ndarray,
        x_n: jnp.ndarray,
        x_i: jnp.ndarray,
        m_l: Optional[jnp.ndarray] = None,
        m_n: Optional[jnp.ndarray] = None,
        m_i: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        b = x_l.shape[0]
        masks = []
        for x, m in ((x_l, m_l), (x_n, m_n), (x_i, m_i)):
            masks.append(
                jnp.ones((b, x.shape[1]), jnp.float32) if m is None else m.astype(jnp.float32)
            )
        m_l, m_n, m_i = masks

        drop = nn.Dropout(rate=self.embed_dropout, deterministic=deterministic)
        proj = lambda name: nn.Dense(  # noqa: E731  (1x1 conv == Dense)
            self.d, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        p_l = proj("proj_l")(drop(x_l.astype(self.dtype)))
        p_n = proj("proj_n")(drop(x_n.astype(self.dtype)))
        p_i = proj("proj_i")(drop(x_i.astype(self.dtype)))

        t_max = max(p_l.shape[1], p_n.shape[1], p_i.shape[1])
        (p_l, m_l), (p_n, m_n), (p_i, m_i) = (
            _pad_time(p_l, m_l, t_max),
            _pad_time(p_n, m_n, t_max),
            _pad_time(p_i, m_i, t_max),
        )
        seqs = jnp.stack([p_l, p_n, p_i], axis=0)  # [3,B,T,d]
        mods = jnp.stack([m_l, m_n, m_i], axis=0)  # [3,B,T]

        common = dict(
            d=self.d,
            num_heads=self.num_heads,
            relu_dropout=self.relu_dropout,
            res_dropout=self.res_dropout,
            embed_dropout=self.embed_dropout,
            causal=self.attn_mask,
            positions=self.positions,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

        pool_fn = masked_last if self.pool == "last" else masked_mean

        # --- 3 self streams as one vmapped program ---
        h_self = StackedSelfMulT(
            layers=self.self_layers, attn_dropout=self.attn_dropout, name="self_streams", **common
        )(seqs, None, None, mods, None, deterministic)
        z_l, z_n, z_i = (pool_fn(h_self[i], mods[i]) for i in range(3))

        # --- 6 directional cross streams as one vmapped program ---
        q_idx = jnp.array([q for q, _ in CROSS_STREAMS])
        kv_idx = jnp.array([kv for _, kv in CROSS_STREAMS])
        q_seqs = seqs[q_idx]  # [6,B,T,d]
        kv_seqs = seqs[kv_idx]
        q_masks = mods[q_idx]
        kv_masks = mods[kv_idx]
        from multimodalrouting_tpu.parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            constrain,
            ep_enabled,
        )

        if ep_enabled():
            # route-parallel (parallel/ep.py): the leading stream axis lives
            # on 'model' — each shard computes its 6/n streams independently
            q_seqs = constrain(q_seqs, MODEL_AXIS, DATA_AXIS)
            kv_seqs = constrain(kv_seqs, MODEL_AXIS, DATA_AXIS)
            q_masks = constrain(q_masks, MODEL_AXIS, DATA_AXIS)
            kv_masks = constrain(kv_masks, MODEL_AXIS, DATA_AXIS)
        h_cross = StackedCrossMulT(
            layers=self.layers, attn_dropout=self.attn_dropout, name="cross_streams", **common
        )(q_seqs, kv_seqs, kv_seqs, q_masks, kv_masks, deterministic)
        if ep_enabled():
            h_cross = constrain(h_cross, MODEL_AXIS, DATA_AXIS)

        pooled = {
            name: pool_fn(h_cross[g], q_masks[g]) for g, name in enumerate(CROSS_NAMES)
        }

        # --- pair merges + trimodal (reference mult_model.py:169-178) ---
        pair = lambda name: nn.Dense(  # noqa: E731
            self.d, use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        e_ln = pair("proj_pair_ln")(jnp.concatenate([pooled["LN"], pooled["NL"]], axis=-1))
        e_li = pair("proj_pair_li")(jnp.concatenate([pooled["LI"], pooled["IL"]], axis=-1))
        e_ni = pair("proj_pair_ni")(jnp.concatenate([pooled["NI"], pooled["IN"]], axis=-1))
        z_lni = pair("final_lni")(jnp.concatenate([e_ln, e_li, e_ni], axis=-1))

        return {
            "L": z_l,
            "N": z_n,
            "I": z_i,
            "LN": pooled["LN"],
            "LI": pooled["LI"],
            "NL": pooled["NL"],
            "NI": pooled["NI"],
            "IL": pooled["IL"],
            "IN": pooled["IN"],
            "LNI": z_lni,
        }
