"""True multi-process (multi-host) training over jax.distributed.

The single-process multichip tests (tests/test_multichip_product.py) validate
GSPMD sharding; this one validates the cross-PROCESS seams the pod path adds:
`global_device_put` batch/state feeding (each process uploads only the shards
its devices own — jax.make_array_from_single_device_arrays), `host_gather`
eval materialization, and rank-0 msgpack checkpointing with the save barrier.

Two subprocesses × 2 virtual CPU devices each form one 4-device cluster
(gloo collectives); the parent then runs the SAME 4-shard config in one
process and asserts the loss trajectories match — the multi-process run must
be value-identical, not merely alive.
"""
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.dist  # multi-device/multi-process tier (see pytest.ini)

def _free_port() -> int:
    """A port other concurrent suites are unlikely to pick. The candidate
    derives from this process's PID (distinct per pytest invocation on one
    host), in [20000, 28050) — below Linux's default ephemeral range
    (32768+), so transient client sockets can't land on it. The probe still
    binds-and-closes before the coordinator binds, so a narrow close→use
    race remains in principle (unavoidable without passing a live socket
    to the worker); the PID spread removes the realistic collision source,
    two suites starting together off the same ephemeral-bind answer."""
    import socket

    port = 20000 + os.getpid() % 8000
    for candidate in range(port, port + 50):
        with socket.socket() as s:
            try:
                s.bind(("127.0.0.1", candidate))
            except OSError:
                continue
            return candidate
    raise RuntimeError(f"no bindable port in [{port}, {port + 50})")


_WORKER = textwrap.dedent(
    """
    import json, os, sys
    pid = int(sys.argv[1]); out_dir = sys.argv[2]; port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    from multimodalrouting_tpu.parallel.distributed import init_multihost
    # product shim: initializes jax.distributed AND pre-mints the world
    # gloo clique while the processes are still in lockstep (the later
    # per-mesh warmup_collectives realigns before minting axis cliques)
    assert init_multihost(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import train_model
    from tests.helpers import tiny_batch, tiny_config

    cfg = tiny_config(**{
        "model.routes": "10", "model.num_classes": 2,
        "train.num_data_shards": 4, "train.batch_size": 8,
        "train.epochs": 2, "train.use_ema": False,
        "train.sampler_mode": "none", "train.route_dropout_p": 0.0,
    })
    res = train_model(
        cfg, CapsuleRoutingModel(cfg=cfg),
        tiny_batch(n=16, seed=0), tiny_batch(n=8, seed=1),
        family="capsule", log_fn=lambda s: None, ckpt_dir=out_dir,
    )
    if jax.process_index() == 0:
        with open(os.path.join(out_dir, "history.json"), "w") as f:
            json.dump(res.history, f)
    print(f"[worker {pid}] done", flush=True)
    """
)


_ORBAX_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); out_dir = sys.argv[2]; port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    from multimodalrouting_tpu.parallel.distributed import init_multihost
    assert init_multihost(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )

    import numpy as np
    from multimodalrouting_tpu.ckpt import restore_checkpoint, save_checkpoint
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.parallel.mesh import (
        global_device_put_tree, host_gather, make_mesh, replicate_sharding,
        warmup_collectives,
    )
    from multimodalrouting_tpu.train.state import create_train_state
    from tests.helpers import tiny_batch, tiny_config

    cfg = tiny_config(**{"model.routes": "10", "model.num_classes": 2})
    model = CapsuleRoutingModel(cfg=cfg)
    batch = tiny_batch(n=4, seed=0)
    state = create_train_state(
        cfg, model, model.init(jax.random.PRNGKey(0), batch, train=False)
    )
    mesh = make_mesh(n_data=4, n_model=1)
    warmup_collectives(mesh)
    repl = replicate_sharding(mesh)
    state = global_device_put_tree(
        state, jax.tree_util.tree_map(lambda _: repl, state)
    )

    # save TWICE: the second save replaces a finalized orbax dir, which in
    # multi-process mode is rank-0's rmtree inside the two-sided
    # sync_global_devices fence (ckpt.py:save_checkpoint)
    save_checkpoint(out_dir, state, cfg, name="mh", backend="orbax")
    save_checkpoint(out_dir, state, cfg, name="mh", backend="orbax")

    restored = restore_checkpoint(out_dir, state, name="mh")
    live = [np.asarray(host_gather(x)) for x in jax.tree_util.tree_leaves(state.params)]
    back = [np.asarray(x) for x in jax.tree_util.tree_leaves(restored.params)]
    assert len(live) == len(back)
    for a, b in zip(live, back):
        np.testing.assert_array_equal(a, b)
    print(f"[worker {pid}] done", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_orbax_checkpoint_roundtrip(tmp_path):
    """Multi-process orbax saves: the fenced rank-0 replace of a finalized
    checkpoint dir must not deadlock or corrupt, and the restore must be
    value-identical on every process."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    script = tmp_path / "worker_orbax.py"
    script.write_text(_ORBAX_WORKER)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(tmp_path), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    assert (tmp_path / "mh.orbax").is_dir(), "orbax checkpoint dir missing"


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()  # fresh per run: parallel suites must not collide
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(tmp_path), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:  # a timed-out peer must not linger and hold the port
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    with open(tmp_path / "history.json") as f:
        history_mp = json.load(f)
    assert (tmp_path / "final.msgpack").exists(), "rank-0 checkpoint missing"

    # same 4-shard config in THIS (single) process on the conftest's 8
    # virtual devices — trajectories must agree (value-preserving feeding)
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import train_model
    from tests.helpers import tiny_batch, tiny_config

    cfg = tiny_config(**{
        "model.routes": "10", "model.num_classes": 2,
        "train.num_data_shards": 4, "train.batch_size": 8,
        "train.epochs": 2, "train.use_ema": False,
        "train.sampler_mode": "none", "train.route_dropout_p": 0.0,
    })
    res = train_model(
        cfg, CapsuleRoutingModel(cfg=cfg),
        tiny_batch(n=16, seed=0), tiny_batch(n=8, seed=1),
        family="capsule", log_fn=lambda s: None,
    )
    assert len(history_mp) == len(res.history)
    for row_mp, row_sp in zip(history_mp, res.history):
        assert row_mp["train_loss"] == pytest.approx(row_sp["train_loss"], abs=2e-4)
        assert row_mp["val_auroc"] == pytest.approx(row_sp["val_auroc"], abs=2e-2)


def test_global_device_put_and_host_gather_single_process():
    """Single-process fast paths are plain device_put / np.asarray."""
    import jax
    from jax.sharding import PartitionSpec as P, NamedSharding

    from multimodalrouting_tpu.parallel.mesh import (
        global_device_put, host_gather, make_mesh,
    )

    mesh = make_mesh(n_data=4, n_model=2)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    arr = global_device_put(x, NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(host_gather(arr), x)
    assert host_gather(None) is None
    # plain numpy passes through
    np.testing.assert_array_equal(host_gather(x), x)
