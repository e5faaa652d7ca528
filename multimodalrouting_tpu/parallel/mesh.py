"""Device mesh construction and sharding helpers.

The reference is single-device (SURVEY.md §2.4); this module supplies the
TPU-native scale-out plan: a ('data','model') mesh over ICI, batch sharded
over 'data', the flattened note-chunk axis additionally sharded over 'model'
(sequence parallelism for the dominant chunk-BERT program), parameters
replicated, gradient reduction inserted by XLA/GSPMD under jit.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from multimodalrouting_tpu.data.batches import Batch

DATA_AXIS = "data"
MODEL_AXIS = "model"

_ACTIVE_MESH: Optional[Mesh] = None
_TP_MODE: bool = False
_PP_MODE: bool = False
_EP_MODE: bool = False


def set_tp_mode(on: bool) -> None:
    """Tensor-parallel mode (parallel/tp.py): the 'model' axis shards the
    text-encoder weights instead of the note-chunk axis — the two uses of
    the axis are mutually exclusive, so activation constraints consult this."""
    global _TP_MODE
    _TP_MODE = bool(on)


def tp_enabled() -> bool:
    return _TP_MODE


def set_pp_mode(on: bool) -> None:
    """Pipeline-parallel mode (parallel/pp.py): the 'model' axis holds BERT
    layer *stages* (GPipe schedule) instead of the note-chunk axis — a third
    mutually-exclusive use of the axis alongside chunk sharding and TP."""
    global _PP_MODE
    _PP_MODE = bool(on)


def pp_enabled() -> bool:
    return _PP_MODE


def set_ep_mode(on: bool) -> None:
    """Route-parallel (expert) mode (parallel/ep.py): the 'model' axis shards
    the stacked 6-stream MULT cross program on its leading stream axis — a
    fourth mutually-exclusive role alongside chunk sharding, TP and PP."""
    global _EP_MODE
    _EP_MODE = bool(on)


def ep_enabled() -> bool:
    return _EP_MODE


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} exceeds {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def warmup_collectives(mesh: Mesh) -> None:
    """Establish cross-process communicator cliques before the big compile.

    Gloo (the CPU backend's collectives) creates a communicator per device
    clique at the FIRST collective execution that uses it, exchanging peer
    addresses through the coordination KV store with a short (~30 s) hard
    timeout. In a training run that first use happens only after every
    process finishes compiling the full train step, and compile skew on an
    oversubscribed host easily exceeds the timeout — the job aborts with
    "Gloo context initialization failed: GetKeyValue() timed out". This
    runs a trivial psum over each mesh axis (and both) right after mesh
    construction: the leading sync_global_devices barrier realigns
    processes over the world clique (created at init_multihost time, when
    skew is microseconds), then the tiny program mints the data/model/world
    cliques while skew is milliseconds. No-op single-process; on real TPU
    the barrier is harmless and the psums compile in well under a second.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mmr:mesh_warmup")

    def _touch(v):
        a = jax.lax.psum(v, DATA_AXIS)
        b = jax.lax.psum(v, MODEL_AXIS)
        return jax.lax.psum(a + b, (DATA_AXIS, MODEL_AXIS))

    n = mesh.devices.size
    spec = PartitionSpec((DATA_AXIS, MODEL_AXIS))
    x = global_device_put(np.zeros((n,), np.float32), NamedSharding(mesh, spec))
    f = jax.jit(jax.shard_map(_touch, mesh=mesh, in_specs=spec, out_specs=spec))
    jax.block_until_ready(f(x))


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def constrain(x, *spec_axes):
    """Sharding constraint; no-op when no mesh is active.

    Axis names are validated against the active mesh so a typo raises instead
    of silently degrading to replicated; real constraint errors propagate.
    """
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    for ax in spec_axes:
        for name in (ax if isinstance(ax, tuple) else (ax,)):
            if name is not None and name not in mesh.axis_names:
                raise ValueError(
                    f"unknown mesh axis {name!r}; active mesh has {mesh.axis_names}"
                )
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, PartitionSpec(*spec_axes))
    )


def batch_sharding(mesh: Mesh) -> Batch:
    """Per-field NamedShardings for a Batch: leading batch axis over 'data'."""

    def s(*axes):
        return NamedSharding(mesh, PartitionSpec(*axes))

    return Batch(
        x_struct=s(DATA_AXIS),
        m_struct=s(DATA_AXIS),
        note_ids=s(DATA_AXIS),
        note_attn=s(DATA_AXIS),
        chunk_mask=s(DATA_AXIS),
        image=s(DATA_AXIS),
        has_l=s(DATA_AXIS),
        has_n=s(DATA_AXIS),
        has_i=s(DATA_AXIS),
        y=s(DATA_AXIS),
        sens=s(DATA_AXIS),
        chexpert=s(DATA_AXIS),
        note_chunk_embs=s(DATA_AXIS),
    )


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def param_state_shardings(state, mesh: Mesh, spec_for_path) -> object:
    """NamedSharding tree for a TrainState: `spec_for_path(path)` on params /
    ema_params (same treedef), everything else replicated.

    Shared by the three weight-sharding roles of the 'model' axis
    (parallel/tp.py, parallel/pp.py, parallel/ep.py) so TrainState shape
    changes are handled in exactly one place. Optimizer state stays
    replicated in all three: with the default frozen text encoder the
    sharded leaves carry no Adam moments, and when they do, replicated
    moments are correct (GSPMD gathers as needed) at some memory cost —
    compose with train.zero_sharded_opt when that cost matters.
    """
    replicated = NamedSharding(mesh, PartitionSpec())

    def param_sharding(path, leaf):
        return NamedSharding(mesh, spec_for_path(path))

    params_sh = jax.tree_util.tree_map_with_path(param_sharding, state.params)
    ema_sh = (
        jax.tree_util.tree_map_with_path(param_sharding, state.ema_params)
        if state.ema_params is not None
        else None
    )
    rest = jax.tree_util.tree_map(lambda _: replicated, state)
    return rest.replace(params=params_sh, ema_params=ema_sh)


def global_device_put(value, sharding: NamedSharding):
    """device_put that also works across processes (multi-host).

    Single-process: plain jax.device_put. Multi-process: every process holds
    the same GLOBAL host value (the loaders are deterministic, so each host
    materializes identical batches/state); each process uploads only the
    shards its addressable devices own and the pieces assemble into one
    global jax.Array — the standard multihost feeding pattern
    (jax.make_array_from_single_device_arrays)."""
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    import numpy as np_

    value = np_.asarray(value)
    me = jax.process_index()
    arrs = [
        jax.device_put(value[idx], d)
        for d, idx in sharding.devices_indices_map(value.shape).items()
        if d.process_index == me
    ]
    return jax.make_array_from_single_device_arrays(value.shape, sharding, arrs)


def global_device_put_tree(tree, shardings):
    """Tree version of global_device_put (state placement in train/loop.py)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    return jax.tree_util.tree_map(global_device_put, tree, shardings)


def host_gather(x):
    """Materialize a (possibly cross-process-sharded) jax.Array on this host.

    Fully-addressable or fully-replicated arrays convert directly; otherwise
    all-gather across processes first (multihost_utils.process_allgather) so
    eval/audit paths see the full global tensor on every host."""
    import numpy as np_

    if x is None:
        return None
    if not hasattr(x, "sharding") or x.is_fully_addressable or x.is_fully_replicated:
        return np_.asarray(x)
    from jax.experimental import multihost_utils

    return np_.asarray(multihost_utils.process_allgather(x, tiled=True))


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    """device_put a host Batch with batch-axis sharding over 'data'."""
    shardings = batch_sharding(mesh)
    out = []
    for value, sh in zip(batch, shardings):
        out.append(None if value is None else global_device_put(value, sh))
    return Batch(*out)
