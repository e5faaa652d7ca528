"""INSPECT cohort model family (PE/PH from CT + EHR + impressions).

Parity targets (reference INSPECT/):
  * Single-feature BEHRT lab encoder (models/encoders.py:28-79: scalar lab
    sequence, learnable positions, mean pooling, GELU projection) — covered by
    models/behrt.py with n_feats=1, pool="mean".
  * CT volume encoder (models/encoders.py:119-207): per-slice 2D backbone
    over [B,S,H,W,C] stacks, slice-mean pooling, projection. TPU-first: the
    slice axis folds into the batch for one fused conv program.
  * OMOP concept-embedding multitask model (BEHRT.py:62-90 CombinedModel):
    procedure/measurement/drug concept embeddings -> fuse -> four task heads
    pe / mort1m / read1m / ph12m.
  * FAME INSPECT driver (INSPECT/train_fame.py): loss-based MMRouting over
    EMA route losses — covered by routing/smro.py loss_based_route_weights.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.models.cxr import ResNet, BACKBONES

INSPECT_TASKS = ("pe", "mort1m", "read1m", "ph12m")


class CTVolumeEncoder(nn.Module):
    """CT volume encoder: slice-folded 2D CNN + slice-mean pooling.

    x: [B, S, H, W, C] -> (pooled [B, d]); slice axis folds into batch so
    the whole volume runs as one convolution program on the MXU.
    """

    d: int = 256
    backbone: str = "resnet18"
    norm_kind: str = "group"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, slice_mask: Optional[jnp.ndarray] = None, train: bool = False):
        b, s, h, w, c = x.shape
        flat = x.reshape(b * s, h, w, c)
        pooled, _ = ResNet(
            stage_sizes=BACKBONES[self.backbone],
            norm_kind=self.norm_kind,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="backbone",
        )(flat, train=train)
        feats = pooled.reshape(b, s, -1)
        if slice_mask is not None:
            m = slice_mask.astype(feats.dtype)[..., None]
            feats = jnp.sum(feats * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), 1.0, None)
        else:
            feats = jnp.mean(feats, axis=1)
        return nn.Dense(self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="proj")(feats)


class OMOPConceptModel(nn.Module):
    """Concept-embedding multitask model (INSPECT BEHRT.py CombinedModel)."""

    num_proc_codes: int
    num_meas_codes: int
    num_drug_codes: int
    hidden: int = 128
    dropout: float = 0.1
    tasks: Tuple[str, ...] = INSPECT_TASKS
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        proc: jnp.ndarray,  # [B] or [B,T] concept ids
        meas: jnp.ndarray,
        drug: jnp.ndarray,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        def emb(ids, vocab, name):
            e = nn.Embed(vocab, self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name=name)(ids)
            if e.ndim == 3:  # sequence of codes -> mean pool
                e = jnp.mean(e, axis=1)
            return e

        h = jnp.concatenate(
            [
                emb(proc, self.num_proc_codes, "proc_emb"),
                emb(meas, self.num_meas_codes, "meas_emb"),
                emb(drug, self.num_drug_codes, "drug_emb"),
            ],
            axis=-1,
        )
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="fuse")(h))
        h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        return {
            t: nn.Dense(1, dtype=self.dtype, param_dtype=self.param_dtype, name=f"head_{t}")(h)[:, 0]
            for t in self.tasks
        }
