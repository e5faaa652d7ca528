"""Multi-host initialization over DCN (SURVEY.md §5.8 plan).

The reference has no distributed backend; this is the TPU-native scale-out
shim: `init_multihost()` wires jax.distributed from standard cluster env vars
(or explicit args), after which `parallel.mesh.make_mesh` sees all global
devices and the same jit/GSPMD train step spans hosts — collectives ride ICI
within a slice and DCN across slices, inserted by the compiler.
"""
from __future__ import annotations

import os
from typing import Optional


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; no-op otherwise.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env > TPU pod auto-detect
    (jax.distributed.initialize() with no args). Returns True if distributed
    mode was initialized.
    """
    import jax

    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coord and nproc and pid is not None:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
        _warmup_world()
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES") and _int_env("TPU_WORKER_ID") is not None:
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        _warmup_world()
        return True
    return False


def _warmup_world() -> None:
    """Create the all-device communicator clique while processes are still in
    lockstep from jax.distributed.initialize (its coordinator connect is a
    barrier). Gloo cliques are minted at first collective use with a ~30 s
    peer-address KV timeout, so the first clique must not wait for each
    process's multi-minute train-step compile — see
    parallel/mesh.py:warmup_collectives for the per-mesh-axis counterpart."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mmr:init_multihost")


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def process_local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-sharded batch (host data loading)."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
