"""ZeRO-1-style optimizer-state sharding over the 'data' mesh axis.

Data-parallel replicas all hold identical Adam moments — redundant by
construction. `train.zero_sharded_opt=true` shards every moment tensor's
leading dimension over 'data' (GSPMD inserts the gathers the elementwise
update needs), cutting per-chip optimizer HBM by ~Nx. With the default
frozen text encoder the moments are small (frozen leaves allocate no Adam
state — `train/state.py:make_optimizer` routes them to `set_to_zero`), but
with `encoder.finetune_text=true` the BERT body's fp32 mu+nu are ~0.9 GB,
which this spreads across the data shards.

Value-preserving: the update math is unchanged, only the moments' placement;
`tests/test_zero.py` pins trajectory equality vs the replicated layout.

Composes with tensor parallelism (parallel/tp.py): TP shards *weights* over
'model', this shards *moments* over 'data' — disjoint axes.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodalrouting_tpu.parallel.mesh import DATA_AXIS

# Don't split tiny tensors (biases, LayerNorm scales): the collective + layout
# overhead exceeds the few KB saved. Threshold in elements.
MIN_SHARD_SIZE = 2048


def zero_opt_shardings(opt_state: Any, mesh, *, min_size: int = MIN_SHARD_SIZE) -> Any:
    """Sharding tree for an optax state: moment tensors with a leading dim
    divisible by the data-shard count get P('data'), everything else
    (step counts, small leaves, indivisible shapes) stays replicated."""
    n = mesh.shape[DATA_AXIS]
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(DATA_AXIS))

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        size = getattr(leaf, "size", 0)
        if len(shape) >= 1 and shape[0] > 0 and shape[0] % n == 0 and size >= min_size:
            return sharded
        return replicated

    return jax.tree_util.tree_map(spec, opt_state)
