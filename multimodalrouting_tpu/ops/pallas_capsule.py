"""Fused Pallas TPU kernel for capsule routing-by-agreement.

All `num_iters` routing iterations (agreement -> fp32 softmax -> act
weighting -> renorm -> vote aggregation) run inside ONE kernel with votes,
coefficients and decision poses resident in VMEM — zero HBM round-trips
between iterations, versus one XLA dispatch chain per iteration in the naive
path (BASELINE.json north star: capsule routing as on-device einsum/softmax
kernels).

Forward runs the kernel; backward re-derives gradients through the
mathematically identical XLA implementation via jax.custom_vjp (the op is
closed-form differentiable; the kernel and the XLA path agree to fp32
tolerance, enforced by tests/test_pallas.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (kernels then run with interpret=True)
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _capsule_kernel(pose_ref, act_ref, w_ref, pose_out_ref, act_out_ref, coef_ref,
                    *, num_iters: int, scale: float):
    """One batch-tile of fused routing. Shapes in VMEM:
    pose [TB,N,A], act [TB,N], w [N,A,M,D] -> pose_out [TB,M,D],
    act_out [TB,M], coef [TB,N,M]."""
    pose = pose_ref[:].astype(jnp.float32)  # [TB,N,A]
    act = act_ref[:].astype(jnp.float32)  # [TB,N]
    w = w_ref[:].astype(jnp.float32)  # [N,A,M,D]

    tb, n, a = pose.shape
    _, _, m, d = w.shape

    # votes[b,n,m,d] = sum_a pose[b,n,a] * w[n,a,m,d]
    # Mosaic-friendly: N is static and small, so unroll into N plain 2D
    # matmuls [TB,A] @ [A, M*D] (no batched dot_general inside the kernel)
    votes_list = [
        jnp.dot(pose[:, i, :], w[i].reshape(a, m * d), preferred_element_type=jnp.float32)
        for i in range(n)
    ]
    votes = jnp.stack(votes_list, axis=1).reshape(tb, n, m, d)  # [TB,N,M,D]

    # iteration-0 seed: uniform 1/M coefficients
    next_pose = jnp.sum(votes, axis=1) / m  # [TB,M,D]
    next_act = jnp.broadcast_to(jnp.mean(act, axis=1, keepdims=True), (tb, m))

    votes_act = votes * act[:, :, None, None]
    coef = jnp.zeros((tb, n, m), jnp.float32)

    for _ in range(num_iters):
        # agreement via broadcast-multiply + reduce (VPU-friendly)
        agree = jnp.sum(votes * next_pose[:, None, :, :], axis=3) * scale  # [TB,N,M]
        qk = jax.nn.softmax(agree, axis=2)
        qk = qk * next_act[:, None, :]
        coef = qk / (jnp.sum(qk, axis=2, keepdims=True) + 1e-10)
        next_pose = jnp.sum(coef[..., None] * votes_act, axis=1)  # [TB,M,D]
        next_act = jnp.ones((tb, m), jnp.float32)

    pose_out_ref[:] = next_pose
    act_out_ref[:] = next_act
    coef_ref[:] = coef


def _pallas_forward(pose, act, w, num_iters: int, interpret: bool):
    b, n, a = pose.shape
    _, _, m, d = w.shape
    scale = float(1.0 / np.sqrt(d))

    tb = b
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if b % cand == 0:
            tb = cand
            break
    grid = (b // tb,)

    kernel = functools.partial(_capsule_kernel, num_iters=num_iters, scale=scale)
    mem = dict(memory_space=pltpu.VMEM) if _HAS_PLTPU and not interpret else {}
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n, a), lambda i: (i, 0, 0), **mem),
            pl.BlockSpec((tb, n), lambda i: (i, 0), **mem),
            pl.BlockSpec((n, a, m, d), lambda i: (0, 0, 0, 0), **mem),
        ],
        out_specs=[
            pl.BlockSpec((tb, m, d), lambda i: (i, 0, 0), **mem),
            pl.BlockSpec((tb, m), lambda i: (i, 0), **mem),
            pl.BlockSpec((tb, n, m), lambda i: (i, 0, 0), **mem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m), jnp.float32),
            jax.ShapeDtypeStruct((b, n, m), jnp.float32),
        ],
        interpret=interpret,
    )(pose.astype(jnp.float32), act.astype(jnp.float32), w.astype(jnp.float32))
    return tuple(out)


def _xla_reference(pose, act, w, num_iters: int):
    """The mathematically identical XLA program (used for backward)."""
    from multimodalrouting_tpu.ops.capsule import capsule_routing

    out = capsule_routing(
        pose.astype(jnp.float32), act.astype(jnp.float32), w.astype(jnp.float32),
        num_iters, mode="softmax_out", act_type="ONES",
    )
    return (out.pose, out.act, out.coef)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def capsule_routing_pallas(
    pose: jnp.ndarray,
    act: jnp.ndarray,
    w: jnp.ndarray,
    num_iters: int = 3,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused capsule routing (softmax_out / ONES semantics).

    Returns (decision_pose [B,M,D], decision_act [B,M], coef [B,N,M]) in fp32.
    """
    return _pallas_forward(pose, act, w, num_iters, interpret)


def _fwd(pose, act, w, num_iters, interpret):
    out = _pallas_forward(pose, act, w, num_iters, interpret)
    return out, (pose, act, w)


def _bwd(num_iters, interpret, residuals, cotangents):
    pose, act, w = residuals
    _, vjp_fn = jax.vjp(lambda p, a, ww: _xla_reference(p, a, ww, num_iters), pose, act, w)
    return vjp_fn(cotangents)


capsule_routing_pallas.defvjp(_fwd, _bwd)


def capsule_routing_fused(pose, act, w, num_iters: int = 3):
    """Dispatch for the fused capsule routing.

    The current TPU Mosaic toolchain in this image crashes on the >2D
    in-kernel layouts this op needs (batched votes tensor), so on TPU we run
    the votes-hoisted XLA program (ops/capsule.py) — XLA fuses the whole
    iteration chain on-device, which is the north-star behavior; the Pallas
    kernel remains interpret-mode-verified for when the toolchain catches up.
    """
    if _on_tpu():
        return _xla_reference(pose, act, w, num_iters)
    return capsule_routing_pallas(pose, act, w, num_iters, True)
