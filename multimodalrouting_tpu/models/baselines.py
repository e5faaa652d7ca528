"""Baseline model families: LateFusion and TriMF.

Parity targets:
  * LateFusion — reference MIMIC-IV/PhenoModel/Baseline/LateFusion.py:54-165:
    concat pooled zL, zN, zI -> MLP head (the reference lazily infers the
    input dim from the first batch; here dims are static).
  * TriMF — reference MIMIC-IV/PhenoModel/Baseline/TriMF.py:1255-1494:
    three rich-feature PairFusion streams (LN, LI, NI) + a gated TriFusion
    (softmax gate over the three pair streams) -> Linear head.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.configs import Config
from multimodalrouting_tpu.data.batches import Batch
from multimodalrouting_tpu.models.full import ModelOutput, TriEncoder
from multimodalrouting_tpu.models.fusions import MLPBlock, PairwiseFusion


class LateFusion(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        m = self.cfg.model
        dtype = jnp.dtype(m.dtype)
        det = not train
        enc = TriEncoder(cfg=self.cfg, dtype=dtype, name="encoders")(batch, train=train)
        x = jnp.concatenate([enc.l_pool, enc.n_pool, enc.i_pool], axis=-1)
        logits = MLPBlock(
            out_dim=m.num_classes,
            hidden=[2 * m.d],
            p_drop=m.fusion_dropout,
            dtype=dtype,
            name="head",
        )(x, det)
        return ModelOutput(
            logits=logits.astype(jnp.float32),
            pooled={"L": enc.l_pool, "N": enc.n_pool, "I": enc.i_pool},
            chexpert_logits=enc.chexpert_logits.astype(jnp.float32),
        )


class TriMF(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        m = self.cfg.model
        dtype = jnp.dtype(m.dtype)
        det = not train
        enc = TriEncoder(cfg=self.cfg, dtype=dtype, name="encoders")(batch, train=train)
        zl, zn, zi = enc.l_pool, enc.n_pool, enc.i_pool

        pair = lambda name: PairwiseFusion(  # noqa: E731
            d=m.d, feature_mode="rich", p_drop=m.fusion_dropout, dtype=dtype, name=name
        )
        h_ln = pair("pair_ln")(zl, zn, det)
        h_li = pair("pair_li")(zl, zi, det)
        h_ni = pair("pair_ni")(zn, zi, det)

        # gated TriFusion: softmax gate over the three pair streams
        ctx = jnp.concatenate([zl, zn, zi], axis=-1)
        gate_logits = nn.Dense(3, dtype=dtype, name="gate")(ctx)
        gates = nn.softmax(gate_logits.astype(jnp.float32), axis=-1).astype(dtype)
        fused = (
            gates[:, 0:1] * h_ln + gates[:, 1:2] * h_li + gates[:, 2:3] * h_ni
        )
        logits = nn.Dense(m.num_classes, dtype=dtype, name="head")(fused)
        return ModelOutput(
            logits=logits.astype(jnp.float32),
            gates=gates.astype(jnp.float32),
            pooled={"L": zl, "N": zn, "I": zi},
            chexpert_logits=enc.chexpert_logits.astype(jnp.float32),
        )


def build_baseline(cfg: Config, name: str) -> nn.Module:
    if name == "late_fusion":
        return LateFusion(cfg=cfg)
    if name == "trimf":
        return TriMF(cfg=cfg)
    raise ValueError(f"Unknown baseline {name!r}")
