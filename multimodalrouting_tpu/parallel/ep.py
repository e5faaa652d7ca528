"""Route-level expert parallelism over the 'model' mesh axis.

The flagship MULT builder runs all six directional cross-attention streams
(L<-N, L<-I, N<-L, N<-I, I<-L, I<-N — reference MIMIC-IV/MortModel/
Paired_Cross_Attention/mult_model.py:116-193 builds them as six sequential
torch modules) as ONE stacked-parameter program with a leading stream axis
(models/mult.py). That axis is the natural *expert* unit: each stream is an
independent transformer stack applied to its own (query, kv) modality pair,
and streams never interact until the pooled pair merges. `train.route_parallel
=true` shards the leading stream axis over 'model': each shard holds and
computes 6/n streams with NO collective anywhere inside the stacks — GSPMD
inserts a single gather where the pooled outputs meet the pair projections.

This is the fourth role of the 'model' axis (after note-chunk sequence
sharding, Megatron tensor parallelism, and GPipe pipeline parallelism) and is
mutually exclusive with the other weight-sharding roles. The self-stream
stack (3 streams) and everything else stay replicated / data-sharded: 3 is
not generally divisible by the shard count and the self streams are a small
fraction of MULT compute (2 layers vs 4, one stream per modality).
"""
from __future__ import annotations

from typing import Any

from jax.sharding import PartitionSpec as P

from multimodalrouting_tpu.models.mult import CROSS_STREAMS
from multimodalrouting_tpu.parallel.mesh import MODEL_AXIS

#: flax scopes of the stacked 6-stream programs — must match the
#: `name="cross_streams"` scope in models/mult.py:MULTRouter and the
#: `name="directional"` scope under models/route_mult.py:PerRouteMulTFusion
#: (`name="route_mult"` in models/full.py); the spec tests in tests/test_ep.py
#: assert both scopes resolve against real param trees. The per-route
#: family's tri program (`route_mult/LNI/streams`, 3 streams) stays
#: replicated — 3 is not generally divisible by the shard count.
_CROSS_SCOPE = "cross_streams"
_ROUTE_MULT_SCOPE = ("route_mult", "directional")

#: number of directional cross streams, derived from the taxonomy itself
N_CROSS_STREAMS = len(CROSS_STREAMS)


def ep_spec_for_path(path) -> P:
    """PartitionSpec for one param leaf: every leaf under a stacked
    6-stream program is sharded on its leading (stream) axis."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if _CROSS_SCOPE in names:
        return P(MODEL_AXIS)
    if all(s in names for s in _ROUTE_MULT_SCOPE):
        return P(MODEL_AXIS)
    return P()


def validate_ep(cfg, n_model: int) -> None:
    """Reject configs where route parallelism cannot apply or divide."""
    t, m = cfg.train, cfg.model
    if t.tensor_parallel or t.pipeline_parallel:
        raise ValueError(
            "train.route_parallel is mutually exclusive with "
            "train.tensor_parallel / train.pipeline_parallel — all three are "
            "roles of the 'model' mesh axis"
        )
    if m.routes != "10":
        raise ValueError(
            "train.route_parallel shards the stacked 6-stream cross program "
            "(MULTRouter or the per-route MulT family); it needs "
            "model.routes=10"
        )
    if n_model < 2 or N_CROSS_STREAMS % n_model:
        raise ValueError(
            f"train.route_parallel needs the {N_CROSS_STREAMS} cross streams "
            f"divisible by the model shards ({n_model}); use 2, 3 or 6"
        )


def ep_state_shardings(state: Any, mesh) -> Any:
    """NamedSharding tree for a TrainState: stream-axis specs on params /
    ema_params, everything else replicated (see param_state_shardings)."""
    from multimodalrouting_tpu.parallel.mesh import param_state_shardings

    return param_state_shardings(state, mesh, ep_spec_for_path)
