"""Standalone unimodal drivers' model surface.

Parity targets (reference Unimodal/ + top-level scripts):
  * 01_BEHRT.py / Unimodal/MIMIC/BEHRT.py: 3-task BEHRT over wide lab
    columns (mortality + PE + PH) with a fairness evaluation suite —
    `WideBEHRTClassifier` over [B, n_cols] wide features reshaped to a
    sequence; the fairness metrics live in metrics/fairness.py.
  * 02_BEHRT.py: 30-day readmission variant — same model, task="readmit".
  * 01_BioClinicalBert.py: aggregated note embeddings -> MLP classifier with
    FocalLoss — `NoteEmbeddingClassifier` (embeddings precomputed at ETL);
    the focal loss lives in train/losses.py.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalrouting_tpu.models.behrt import BEHRTLabEncoder


class WideBEHRTClassifier(nn.Module):
    """Wide lab columns -> per-bin sequence -> BEHRT -> multi-task heads.

    Wide layout: columns lab_{itemid}_b{bin} (reference Data/
    icustay_dataset.py export); reshaped to [B, n_bins, n_labs].
    """

    n_bins: int
    n_labs: int
    d: int = 128
    n_layers: int = 2
    n_heads: int = 8
    tasks: Tuple[str, ...] = ("mortality", "pe", "ph")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_wide: jnp.ndarray, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        b = x_wide.shape[0]
        x = x_wide.reshape(b, self.n_bins, self.n_labs)
        _, _, pooled = BEHRTLabEncoder(
            n_feats=self.n_labs,
            d=self.d,
            seq_len=self.n_bins,
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            pool="mean",
            dtype=self.dtype,
            name="behrt",
        )(x, deterministic=deterministic)
        return {
            t: nn.Dense(1, dtype=self.dtype, name=f"head_{t}")(pooled)[:, 0] for t in self.tasks
        }


class NoteEmbeddingClassifier(nn.Module):
    """Aggregated note embedding [B, hidden] -> MLP -> task logits."""

    hidden: int = 256
    num_classes: int = 1
    p_drop: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(emb.astype(self.dtype))
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(rate=self.p_drop, deterministic=deterministic)(h)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(h)
        return logits[:, 0] if self.num_classes == 1 else logits
