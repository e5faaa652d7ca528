"""Static-shape batch contract.

Every model/train entry point consumes this one structure (SURVEY.md §7.1):
ragged per-stay inputs are padded to static shapes at the data layer, with
masks carrying validity — the TPU replacement for the reference's
collate-time ragged lists (reference: MIMIC-IV/MortModel/Paired_Cross_Attention/
main.py:1523-1600).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp


class Batch(NamedTuple):
    x_struct: jnp.ndarray  # [B, T, F] binned lab time series
    m_struct: jnp.ndarray  # [B, T] 1 = valid bin
    note_ids: jnp.ndarray  # [B, S, L] pretokenized chunk token ids (int32)
    note_attn: jnp.ndarray  # [B, S, L] token attention mask
    chunk_mask: jnp.ndarray  # [B, S] 1 = real chunk
    image: jnp.ndarray  # [B, H, W, 3]
    has_l: jnp.ndarray  # [B] modality presence flags
    has_n: jnp.ndarray  # [B]
    has_i: jnp.ndarray  # [B]
    y: jnp.ndarray  # [B] (mort) or [B, K] (pheno multi-label)
    sens: Optional[jnp.ndarray] = None  # [B] sensitive group id (fairness)
    chexpert: Optional[jnp.ndarray] = None  # [B, 14] CheXpert aux labels
    note_chunk_embs: Optional[jnp.ndarray] = None  # [B, S, bert_hidden]
    # precomputed frozen-BERT per-chunk embeddings (encoder.text_embedding_cache;
    # the TPU analogue of the reference's precomputed-embedding CSVs,
    # 01_BioClinicalBert.py) — when set, the note encoder skips the BERT body

    @property
    def batch_size(self) -> int:
        return self.x_struct.shape[0]

    def notes_dict(self) -> Dict[str, jnp.ndarray]:
        d = {
            "input_ids": self.note_ids,
            "attention_mask": self.note_attn,
            "chunk_mask": self.chunk_mask,
        }
        if self.note_chunk_embs is not None:
            d["chunk_embs"] = self.note_chunk_embs
        return d


def slice_batch(batch: Batch, start: int, size: int) -> Batch:
    return Batch(*(None if v is None else v[start : start + size] for v in batch))


def take_batch(batch: Batch, idx) -> Batch:
    """Row-gather every present field."""
    return Batch(*(None if v is None else v[idx] for v in batch))


def concat_batches(batches) -> Batch:
    """Concatenate along the batch axis; optional fields must be uniformly
    present or uniformly None across the inputs."""
    import numpy as np

    fields = []
    for vals in zip(*batches):
        present = [v is not None for v in vals]
        if not any(present):
            fields.append(None)
        elif all(present):
            fields.append(np.concatenate([np.asarray(v) for v in vals], axis=0))
        else:
            raise ValueError("cannot concat batches with mixed None/array fields")
    return Batch(*fields)
