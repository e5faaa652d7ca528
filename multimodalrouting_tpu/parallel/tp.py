"""Megatron-style tensor parallelism over the 'model' mesh axis.

The default multi-chip layout (parallel/mesh.py) replicates parameters and
shards the flattened note-chunk axis over 'model' — the right call for
BERT-base-sized encoders, where the B*S independent 512-token chunks are the
natural unit of parallelism and weight replication costs ~0.2 GB/chip.
This module supplies the alternative for encoders too big to replicate:
`train.tensor_parallel=true` shards the text-encoder transformer weights
over 'model' instead (GSPMD inserts the per-layer collectives):

- **column-parallel** (output dim sharded, bias sharded): q/k/v projections
  and the FFN `intermediate` matmul — each shard computes its own slice of
  heads / FFN features, no communication;
- **row-parallel** (input dim sharded, bias replicated): the attention
  `out_proj` and FFN `output` matmuls — each shard holds partial sums that
  XLA reduces with one all-reduce per pair, the classic Megatron pattern.

Everything outside the text encoder's transformer layers (embeddings,
LayerNorms, the other modality encoders, fusion/routing/heads) stays
replicated: at reference scale they are a few MB, and the BERT body is
>90% of parameter bytes.

Chunk (sequence) sharding and weight sharding consume the same mesh axis,
so they are mutually exclusive; `set_tp_mode(True)` switches the clinbert
activation constraint to 'data'-only (models/clinbert.py).
"""
from __future__ import annotations

from typing import Any

from jax.sharding import PartitionSpec as P

from multimodalrouting_tpu.parallel.mesh import MODEL_AXIS

# param owners inside a BERT layer, by sharding role (see module docstring)
_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "intermediate")
_ROW_PARALLEL = ("out_proj", "output")


def _is_bert_layer_path(names) -> bool:
    return "bert" in names and any(str(n).startswith("layer_") for n in names)


def tp_spec_for_path(path) -> P:
    """PartitionSpec for one param leaf, from its pytree path."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if not _is_bert_layer_path(names):
        return P()
    leaf = names[-1]
    owner = names[-2] if len(names) >= 2 else ""
    if owner in _COL_PARALLEL:
        return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
    if owner in _ROW_PARALLEL:
        return P(MODEL_AXIS, None) if leaf == "kernel" else P()
    return P()  # LayerNorms etc. inside the layer stay replicated


def validate_tp_divisibility(cfg, n_model: int) -> None:
    """Shard-count divisibility: heads and FFN width must split evenly."""
    e = cfg.encoder
    bad = []
    if e.bert_heads % n_model:
        bad.append(f"encoder.bert_heads={e.bert_heads}")
    if e.bert_hidden % n_model:
        bad.append(f"encoder.bert_hidden={e.bert_hidden}")
    if e.bert_intermediate % n_model:
        bad.append(f"encoder.bert_intermediate={e.bert_intermediate}")
    if bad:
        raise ValueError(
            f"train.tensor_parallel needs {', '.join(bad)} divisible by "
            f"model shards ({n_model})"
        )


def tp_state_shardings(state: Any, mesh) -> Any:
    """NamedSharding tree for a TrainState: TP specs on params/ema_params,
    everything else replicated (see mesh.py:param_state_shardings)."""
    from multimodalrouting_tpu.parallel.mesh import param_state_shardings

    return param_state_shardings(state, mesh, tp_spec_for_path)
