"""Per-route MulT fusion family — one full MulT stack per directional route.

Behavioral parity target: reference MIMIC-IV/PhenoModel/
routing_and_heads_atten.py:81-240 —
  * MulTCrossAttentionFusion: A attends over B through a TransformerEncoder
    (embed scale + fairseq sinusoids, pre-LN, optional causal mask), then the
    LAST timestep of the A-aligned output is taken — last VALID timestep when
    a query mask is given (:119-130), with empty masks clamped to index 0.
  * MulTTriFusion: three directional streams L<-N, L<-I, I<-N, literal last
    timestep of each (:188-193), concat in [LN, IN, LI] order, final
    Linear(3d -> d) (:195-196).
  * make_route_inputs (:245+): unimodal routes are the pooled embeddings,
    the 6 directional routes get their OWN fusion module each, plus LNI.
    The B-side mask is accepted but UNUSED — attention attends over padded
    B positions, exactly as the reference.

TPU-first redesign: the six directional stacks run as ONE vmapped
stacked-parameter program (models/transformer.py:make_stacked_mult) and the
tri fusion's three stacks as another — two fused XLA computations instead of
nine sequential transformer modules. Sequences of unequal length are padded
to a common static T with the *extension* masked out of attention keys, which
is numerically identical to the reference running each stack at its native
length (masking a key == not having it).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

import numpy as np

from multimodalrouting_tpu.models.mult import _pad_time
from multimodalrouting_tpu.models.transformer import MulTEncoder, StackedCrossMulTBias
from multimodalrouting_tpu.ops.masked import NEG_INF

#: (query, kv) modality index per directional route, reference build order
#: (routing_and_heads_atten.py:209-238): LN, NL, LI, IL, NI, IN (L=0,N=1,I=2)
DIRECTIONAL_STREAMS: Tuple[Tuple[int, int], ...] = (
    (0, 1),  # LN : L queries attend over N
    (1, 0),  # NL
    (0, 2),  # LI
    (2, 0),  # IL
    (1, 2),  # NI
    (2, 1),  # IN
)
DIRECTIONAL_NAMES = ("LN", "NL", "LI", "IL", "NI", "IN")

#: tri streams (routing_and_heads_atten.py:156-176): L<-N, L<-I, I<-N
TRI_STREAMS: Tuple[Tuple[int, int], ...] = ((0, 1), (0, 2), (2, 1))


def _native_causal_bias(
    streams: Tuple[Tuple[int, int], ...], t_nat, t_max: int, causal: bool
) -> jnp.ndarray:
    """Per-stream additive attention bias [G, T_max, T_max] reproducing each
    stream's NATIVE-length causal offset 1 + |Tk - Tq| (reference
    transformer.py:204-210 buffered_future_mask) on the padded grid; zeros
    when the family runs without the causal mask."""
    g = len(streams)
    if not causal:
        return jnp.zeros((g, t_max, t_max), jnp.float32)
    i = np.arange(t_max)[:, None]
    j = np.arange(t_max)[None, :]
    biases = []
    for q, kv in streams:
        offset = 1 + abs(t_nat[kv] - t_nat[q])
        biases.append(np.where(j >= i + offset, NEG_INF, 0.0).astype(np.float32))
    return jnp.asarray(np.stack(biases, 0))


def _last_valid(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Reference last-timestep pooling (routing_and_heads_atten.py:119-130):
    last VALID step per the mask, clamped to index 0 when the mask is empty
    (NOT zeroed — the reference returns row 0)."""
    if mask is None:
        return x[:, -1]
    lengths = jnp.sum((mask > 0.5).astype(jnp.int32), axis=1)
    idx = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
    return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]


class MulTCrossAttentionFusion(nn.Module):
    """One directional route: a full MulT stack where A attends over B, pooled
    at the last (valid) A timestep.

    Reference: routing_and_heads_atten.py:81-130. The B mask is accepted for
    signature parity but unused — the reference attends over padded B.
    """

    d: int
    n_heads: int = 8
    layers: int = 1
    attn_dropout: float = 0.0
    relu_dropout: float = 0.0
    res_dropout: float = 0.0
    embed_dropout: float = 0.0
    attn_mask: bool = True  # causal, reference default (:98)
    use_positional: bool = True
    positions: str = "sinusoidal"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a_seq, a_mask, b_seq, b_mask=None, deterministic=True):
        h = MulTEncoder(
            d=self.d,
            num_heads=self.n_heads,
            layers=self.layers,
            attn_dropout=self.attn_dropout,
            relu_dropout=self.relu_dropout,
            res_dropout=self.res_dropout,
            embed_dropout=self.embed_dropout,
            causal=self.attn_mask,
            use_positional=self.use_positional,
            positions=self.positions,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="trans",
        )(a_seq, b_seq, b_seq, q_mask=None, kv_mask=None, deterministic=deterministic)
        return _last_valid(h, a_mask)


class MulTTriFusion(nn.Module):
    """Trimodal route: L<-N, L<-I, I<-N directional streams, literal last
    timestep each, concat [LN, IN, LI] -> Linear(3d, d).

    Reference: routing_and_heads_atten.py:133-196 (note the concat order
    swaps IN before LI, :194). The three stacks run as one vmapped program;
    unequal sequence lengths are padded to a common T with the extension
    masked out of the attention keys.
    """

    d: int
    n_heads: int = 8
    layers: int = 1
    attn_dropout: float = 0.0
    relu_dropout: float = 0.0
    res_dropout: float = 0.0
    embed_dropout: float = 0.0
    attn_mask: bool = False  # reference signature default (:150)
    use_positional: bool = True
    positions: str = "sinusoidal"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, l_seq, l_mask, n_seq, n_mask, i_seq, i_mask, deterministic=True):
        del l_mask, n_mask, i_mask  # reference pools h[-1] regardless of mask
        seqs = (l_seq, n_seq, i_seq)
        t_nat = [s.shape[1] for s in seqs]
        t_max = max(t_nat)
        b = l_seq.shape[0]
        padded, ext = [], []
        for s in seqs:
            ones = jnp.ones((b, s.shape[1]), jnp.float32)
            ps, pm = _pad_time(s, ones, t_max)
            padded.append(ps)
            ext.append(pm)

        q_idx = [q for q, _ in TRI_STREAMS]
        kv_idx = [kv for _, kv in TRI_STREAMS]
        q_seqs = jnp.stack([padded[i] for i in q_idx], 0)      # [3,B,T,d]
        kv_seqs = jnp.stack([padded[i] for i in kv_idx], 0)
        q_ext = jnp.stack([ext[i] for i in q_idx], 0)          # [3,B,T]
        kv_ext = jnp.stack([ext[i] for i in kv_idx], 0)

        bias = _native_causal_bias(TRI_STREAMS, t_nat, t_max, self.attn_mask)
        h = StackedCrossMulTBias(
            d=self.d,
            num_heads=self.n_heads,
            layers=self.layers,
            attn_dropout=self.attn_dropout,
            relu_dropout=self.relu_dropout,
            res_dropout=self.res_dropout,
            embed_dropout=self.embed_dropout,
            causal=False,  # causality carried by the per-stream bias
            use_positional=self.use_positional,
            positions=self.positions,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="streams",
        )(q_seqs, kv_seqs, kv_seqs, q_ext, kv_ext, deterministic, bias)

        # literal last NATIVE timestep per stream (reference h_xy[-1], :188-193)
        ln_last = h[0][:, t_nat[q_idx[0]] - 1]
        li_last = h[1][:, t_nat[q_idx[1]] - 1]
        in_last = h[2][:, t_nat[q_idx[2]] - 1]
        z = jnp.concatenate([ln_last, in_last, li_last], axis=-1)  # ref order :194
        return nn.Dense(
            self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="final"
        )(z)


class PerRouteMulTFusion(nn.Module):
    """The full 10-route builder of the atten family: unimodal pools pass
    through, each directional route gets its own MulT stack (all six fused
    into one vmapped program), plus the MulTTriFusion LNI route.

    Reference: routing_and_heads_atten.py:199-262 (build_fusions +
    make_route_inputs). Selected via model.bi_fusion_mode="mult" with
    routes="10" (models/full.py).
    """

    d: int
    n_heads: int = 8
    layers: int = 1
    attn_dropout: float = 0.0
    relu_dropout: float = 0.0
    res_dropout: float = 0.0
    embed_dropout: float = 0.0
    attn_mask: bool = True  # CFG.cross_attn_mask default (:205)
    use_positional: bool = True
    positions: str = "sinusoidal"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        l_seq, l_mask, l_pool,
        n_seq, n_mask, n_pool,
        i_seq, i_mask, i_pool,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        seqs = (l_seq, n_seq, i_seq)
        masks = (l_mask, n_mask, i_mask)
        t_max = max(s.shape[1] for s in seqs)
        b = l_seq.shape[0]
        padded, pmask, ext = [], [], []
        for s, m in zip(seqs, masks):
            ones = jnp.ones((b, s.shape[1]), jnp.float32)
            ps, pe = _pad_time(s, ones, t_max)
            _, pm = _pad_time(s, m.astype(jnp.float32), t_max)
            padded.append(ps)
            ext.append(pe)   # 1 on native positions (incl. data pads), 0 on extension
            pmask.append(pm)  # real data mask, for last-valid pooling only

        q_idx = [q for q, _ in DIRECTIONAL_STREAMS]
        kv_idx = [kv for _, kv in DIRECTIONAL_STREAMS]
        q_seqs = jnp.stack([padded[i] for i in q_idx], 0)   # [6,B,T,d]
        kv_seqs = jnp.stack([padded[i] for i in kv_idx], 0)
        q_ext = jnp.stack([ext[i] for i in q_idx], 0)
        kv_ext = jnp.stack([ext[i] for i in kv_idx], 0)

        t_nat = [s.shape[1] for s in seqs]
        bias = _native_causal_bias(DIRECTIONAL_STREAMS, t_nat, t_max, self.attn_mask)
        from multimodalrouting_tpu.parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            constrain,
            ep_enabled,
        )

        if ep_enabled():
            # route-parallel (parallel/ep.py): the leading stream axis lives
            # on 'model' — each shard computes its 6/n directional stacks
            q_seqs = constrain(q_seqs, MODEL_AXIS, DATA_AXIS)
            kv_seqs = constrain(kv_seqs, MODEL_AXIS, DATA_AXIS)
            q_ext = constrain(q_ext, MODEL_AXIS, DATA_AXIS)
            kv_ext = constrain(kv_ext, MODEL_AXIS, DATA_AXIS)
            bias = constrain(bias, MODEL_AXIS)
        h = StackedCrossMulTBias(
            d=self.d,
            num_heads=self.n_heads,
            layers=self.layers,
            attn_dropout=self.attn_dropout,
            relu_dropout=self.relu_dropout,
            res_dropout=self.res_dropout,
            embed_dropout=self.embed_dropout,
            causal=False,  # causality carried by the per-stream bias
            use_positional=self.use_positional,
            positions=self.positions,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="directional",
        )(q_seqs, kv_seqs, kv_seqs, q_ext, kv_ext, deterministic, bias)
        if ep_enabled():
            h = constrain(h, MODEL_AXIS, DATA_AXIS)

        routes = {"L": l_pool, "N": n_pool, "I": i_pool}
        for g, name in enumerate(DIRECTIONAL_NAMES):
            routes[name] = _last_valid(h[g], pmask[q_idx[g]])

        routes["LNI"] = MulTTriFusion(
            d=self.d,
            n_heads=self.n_heads,
            layers=self.layers,
            attn_dropout=self.attn_dropout,
            relu_dropout=self.relu_dropout,
            res_dropout=self.res_dropout,
            embed_dropout=self.embed_dropout,
            attn_mask=self.attn_mask,
            use_positional=self.use_positional,
            positions=self.positions,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="LNI",
        )(l_seq, l_mask, n_seq, n_mask, i_seq, i_mask, deterministic)
        return routes
