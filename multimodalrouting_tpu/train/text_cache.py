"""Frozen-BERT note-embedding cache (encoder.text_embedding_cache).

The whole-step phase table (PERF.md) shows the frozen chunk-BERT forward is
~85% of every training step — yet with finetune_text=False its inputs
(pretokenized chunks) and weights never change, so every epoch recomputes
the exact same embeddings. The reference sidesteps this for its unimodal
note model by precomputing embeddings to CSV (01_BioClinicalBert.py); this
module is the framework-wide analogue: after state init, run the BERT body
ONCE over each cohort split and attach the per-chunk embeddings to the
Batch (`note_chunk_embs`). The note encoder then skips the BERT body
(models/clinbert.py chunk_embs path) — output-identical, and XLA never even
compiles the BERT program into the train step.

Cache contents are the token-aggregated per-chunk embeddings BEFORE the
trainable LayerNorm+Linear projection, so the projection (and everything
downstream) still trains normally.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalrouting_tpu.configs import Config
from multimodalrouting_tpu.data.batches import Batch


def find_bbert_params(params: Any) -> Optional[Dict]:
    """Locate the note encoder's param subtree (module name 'bbert') anywhere
    in a model param pytree."""
    if not isinstance(params, dict):
        return None
    if "bbert" in params and isinstance(params["bbert"], dict):
        return params["bbert"]
    for v in params.values():
        found = find_bbert_params(v)
        if found is not None:
            return found
    return None


def _encoder_from_cfg(cfg: Config):
    from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder

    e = cfg.encoder
    return BioClinBERTEncoder(
        d=e.d,
        note_agg=e.note_agg,
        chunk_agg=e.note_chunk_agg,
        finetune_text=False,
        int8=e.int8_text,
        remat=cfg.model.remat,
        vocab_size=e.bert_vocab_size,
        hidden=e.bert_hidden,
        layers=e.bert_layers,
        heads=e.bert_heads,
        intermediate=e.bert_intermediate,
        max_position=e.bert_max_position,
        type_vocab=e.bert_type_vocab,
        dropout=e.dropout,
        gelu=e.bert_gelu,
        dtype=jnp.dtype(cfg.model.dtype),
    )


def compute_note_chunk_embs(
    cfg: Config,
    model_params: Any,
    cohort: Batch,
    *,
    batch_size: int = 0,
) -> np.ndarray:
    """Run the frozen BERT body once over a cohort -> [N, S, hidden] cache.

    `model_params` is the FULL model param pytree (the 'bbert' subtree is
    located inside it), so the cache is computed with exactly the weights —
    and exactly the at-rest dtype (encoder.frozen_text_bf16) — the train
    step would use.
    """
    bbert = find_bbert_params(jax.device_get(model_params))
    if bbert is None:
        raise ValueError("no 'bbert' subtree in model params — the model has "
                         "no note encoder to cache")
    enc = _encoder_from_cfg(cfg)

    @jax.jit
    def run(notes):
        # the sow tap in BioClinBERTEncoder.__call__ captures the pre-proj
        # per-chunk embedding; dropout=deterministic + frozen body make it
        # exactly the value the train step would compute
        _, inter = enc.apply(
            {"params": bbert}, notes, deterministic=True,
            mutable=["intermediates"],
        )
        return inter["intermediates"]["chunk_embs"][0]

    n = cohort.batch_size
    bs = batch_size if batch_size > 0 else min(n, max(cfg.train.batch_size, 1))
    out = []
    for start in range(0, n, bs):
        stop = min(start + bs, n)
        notes = {
            "input_ids": jnp.asarray(np.asarray(cohort.note_ids[start:stop])),
            "attention_mask": jnp.asarray(np.asarray(cohort.note_attn[start:stop])),
            "chunk_mask": jnp.asarray(np.asarray(cohort.chunk_mask[start:stop])),
        }
        out.append(np.asarray(run(notes)))
    return np.concatenate(out, axis=0)


def attach_note_cache(
    cfg: Config,
    model_params: Any,
    cohort: Batch,
    *,
    batch_size: int = 0,
) -> Batch:
    """Return the cohort Batch with `note_chunk_embs` attached."""
    if cfg.encoder.finetune_text:
        raise ValueError(
            "encoder.text_embedding_cache requires finetune_text=False — "
            "a fine-tuned BERT body invalidates the cache every step"
        )
    embs = compute_note_chunk_embs(cfg, model_params, cohort, batch_size=batch_size)
    return cohort._replace(note_chunk_embs=embs)
