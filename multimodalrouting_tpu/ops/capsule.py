"""Capsule routing-by-agreement as functional JAX einsum programs.

TPU-native re-design of the reference's CapsuleFC
(reference: MIMIC-IV/MortModel/capsule_layers.py:7-124 canonical softmax
variant; MIMIC-IV/PhenoModel/capsule_atten.py:7-257 sigmoid-gate
anti-collapse variant). The iterative routing loop is unrolled statically
(num_iters is small and fixed), every iteration is two einsums + a masked
softmax/sigmoid, and all routing math runs in a float32 numerics island
regardless of the compute dtype (the reference keeps fp32 softmax islands
inside AMP regions).

Shapes (names follow the reference):
    pose        [B, N, A]    primary capsule poses (N = #routes, A = pc_dim)
    act         [B, N]       primary capsule activations
    w           [N, A, M, D] routing weights (M = #decision caps, D = mc dim)
    -> decision pose [B, M, D], decision act [B, M], coef [B, N, M]
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class CapsuleOut(NamedTuple):
    pose: jnp.ndarray  # [B, M, D]
    act: jnp.ndarray  # [B, M]
    coef: jnp.ndarray  # [B, N, M] routing coefficients (query_key)


def capsule_weight_init(key, n_in: int, a: int, m: int, d: int, dtype=jnp.float32):
    """sqrt(M / (A * N)) * randn — reference: capsule_layers.py:19-23."""
    const = np.sqrt(m / (a * n_in))
    return const * jax.random.normal(key, (n_in, a, m, d), dtype=dtype)


def _gate_temp_and_clamp(
    act: jnp.ndarray, temp: float, gmin: float, gmax: float, eps: float = 1e-6
) -> jnp.ndarray:
    """Logit-space temperature + clamp on activations.

    Reference: capsule_atten.py:107-124 (_apply_gate_temp_and_clamp).
    """
    a = jnp.clip(act, eps, 1.0 - eps)
    if temp and temp != 1.0:
        logits = jnp.log(a) - jnp.log1p(-a)
        a = jax.nn.sigmoid(logits / temp)
    if gmin > 0.0 or gmax < 1.0:
        a = jnp.clip(a, gmin, gmax)
    return a


def capsule_routing(
    pose: jnp.ndarray,
    act: jnp.ndarray,
    w: jnp.ndarray,
    num_iters: int,
    *,
    mode: str = "softmax_out",
    act_type: str = "ONES",
    uniform_routing: bool = False,
    gate_temp: float = 1.0,
    gate_min: float = 0.0,
    gate_max: float = 1.0,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> CapsuleOut:
    """Run `num_iters` routing iterations and return the final state.

    mode:
      * "softmax_out" — canonical: agreement softmax over decision capsules M,
        weighted by previous decision act, renormalized over M
        (reference: capsule_layers.py:93-113). Iteration-0 decision pose is
        seeded from a uniform 1/M coefficient.
      * "sigmoid_routes" — anti-collapse: independent per-(route,label)
        sigmoid gates, scale-normalized over routes N
        (reference: capsule_atten.py:196-229). Iteration-0 seed is uniform
        1/N over routes; primary acts get logit-temperature + clamp.
      * "uniform" / uniform_routing=True — fixed uniform coefficients.

    dropout_rate / dropout_rng: train-time decision-pose dropout — inverted
    dropout applied to next_pose at the END of every routing iteration, so the
    dropped poses feed the next iteration's agreement einsum AND the final
    decision pose is a dropped sample (reference: capsule_layers.py:31-32,118
    ``self.drop = nn.Dropout(dp)`` on ``next_capsule_value``). No-op when
    dropout_rng is None (eval) or dropout_rate == 0.
    """
    if pose.ndim != 3:
        raise ValueError(f"pose must be [B,N,A], got {pose.shape}")
    if act.ndim == 3 and act.shape[-1] == 1:
        act = act[..., 0]
    if act.ndim != 2:
        raise ValueError(f"act must be [B,N] or [B,N,1], got {act.shape}")

    n_in, a_dim, m_out, d_out = w.shape
    b = pose.shape[0]
    out_dtype = pose.dtype

    # float32 numerics island
    pose32 = pose.astype(jnp.float32)
    act32 = act.astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    scale = 1.0 / np.sqrt(d_out)

    if mode == "sigmoid_routes":
        act32 = _gate_temp_and_clamp(act32, gate_temp, gate_min, gate_max)
        seed_coef = jnp.full((n_in, m_out), 1.0 / n_in, dtype=jnp.float32)
    elif mode in ("softmax_out", "uniform"):
        seed_coef = jnp.full((n_in, m_out), 1.0 / m_out, dtype=jnp.float32)
    else:
        raise ValueError(f"Unknown capsule routing mode {mode!r}")

    # Precompute votes ONCE: every iteration's agreement and aggregation
    # einsums factor through votes[b,n,m,d] = sum_a pose[b,n,a] * w[n,a,m,d],
    # so the expensive contraction is hoisted out of the routing loop
    # (algebraically identical to the reference's per-iteration einsums).
    votes = jnp.einsum("bna,namd->bnmd", pose32, w32)  # [B,N,M,D]

    # iteration-0 seed poses: uniform-coefficient vote aggregate [B,M,D]
    next_pose = jnp.einsum("nm,bnmd->bmd", seed_coef, votes)
    # decision act seed: mean primary act, broadcast over M
    next_act = jnp.broadcast_to(jnp.mean(act32, axis=1, keepdims=True), (b, m_out))

    uniform = uniform_routing or mode == "uniform"
    coef = jnp.broadcast_to(seed_coef[None], (b, n_in, m_out))
    votes_act = votes * act32[:, :, None, None]  # fold current_act into votes

    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    keep_p = 1.0 - float(dropout_rate)

    for it in range(int(num_iters)):
        if uniform:
            coef = jnp.full((b, n_in, m_out), 1.0 / m_out, dtype=jnp.float32)
            if mode == "sigmoid_routes":
                coef = jnp.full((b, n_in, m_out), 1.0 / n_in, dtype=jnp.float32)
        else:
            # agreement [B,N,M] = sum_d votes * next_pose
            agree = jnp.einsum("bnmd,bmd->bnm", votes, next_pose) * scale
            if mode == "sigmoid_routes":
                qk = jnp.clip(jax.nn.sigmoid(agree), 1e-6, 1.0 - 1e-6)
                denom = jnp.clip(jnp.sum(qk, axis=1, keepdims=True), 1e-6, None)
                coef = qk / denom  # scale-norm over routes
            else:
                qk = jax.nn.softmax(agree, axis=2)
                qk = qk * next_act[:, None, :]
                coef = qk / (jnp.sum(qk, axis=2, keepdims=True) + 1e-10)

        next_pose = jnp.einsum("bnm,bnmd->bmd", coef, votes_act)
        if use_dropout:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, it), keep_p, next_pose.shape
            )
            next_pose = jnp.where(keep, next_pose / keep_p, 0.0)
        if act_type == "ONES":
            next_act = jnp.ones((b, m_out), dtype=jnp.float32)
        # EM / other act types keep the threaded next_act (matches the
        # reference's simplified CapsuleFC which only recomputes for ONES)

    return CapsuleOut(
        pose=next_pose.astype(out_dtype),
        act=next_act.astype(out_dtype),
        coef=coef.astype(out_dtype),
    )


def assert_routing_over_routes(r_matrix: jnp.ndarray, atol: float = 1e-3) -> None:
    """Checked invariant: R[b,:,k] sums to 1 over routes for every label.

    Host-side assertion (call on fetched arrays). Reference:
    MortModel/Paired_Cross_Attention/main.py:319-338.
    """
    import numpy as np

    sums = np.asarray(jnp.sum(r_matrix, axis=1))
    if not np.allclose(sums, 1.0, atol=atol):
        bad = float(np.abs(sums - 1.0).max())
        raise AssertionError(f"R not normalized over routes: max |sum-1| = {bad:.2e}")


def coerce_rc_semantics(
    rc: jnp.ndarray, num_routes: int, atol: float = 1e-2
) -> jnp.ndarray:
    """Detect and fix routing-coefficient orientation.

    The audit contract is R[b, route, label] with sum over routes == 1
    (p(route|label)). If rc arrives as [B, label, route] (sum over its last
    axis == 1 and that axis is the route axis), transpose. Reference:
    main.py:1043-1079 (coerce_rc_semantics).
    """
    import numpy as np

    if rc.ndim != 3:
        raise ValueError(f"rc must be 3D, got {rc.shape}")
    b, d1, d2 = rc.shape
    if d1 == num_routes and d2 != num_routes:
        return rc
    if d2 == num_routes and d1 != num_routes:
        return jnp.swapaxes(rc, 1, 2)
    # ambiguous square case: decide by which axis is normalized
    sums_routes = np.asarray(jnp.sum(rc, axis=1))
    sums_labels = np.asarray(jnp.sum(rc, axis=2))
    if np.allclose(sums_routes, 1.0, atol=atol):
        return rc
    if np.allclose(sums_labels, 1.0, atol=atol):
        return jnp.swapaxes(rc, 1, 2)
    return rc


def route_given_label(
    coef: jnp.ndarray, route_mask: Optional[jnp.ndarray] = None, eps: float = 1e-10
) -> jnp.ndarray:
    """Normalize routing coefficients over routes per label: R[b,:,k] sums to 1.

    This is the route-audit output p(route | label). Reference:
    MIMIC-IV/MortModel/Paired_Cross_Attention/routing_and_heads.py:39-48
    (route_given_pheno).
    """
    resp = coef.astype(jnp.float32)
    if route_mask is not None:
        m = route_mask
        if m.ndim == 1:
            m = m[None, :, None]
        elif m.ndim == 2:
            m = m[:, :, None]
        resp = resp * m.astype(resp.dtype)
    denom = jnp.clip(jnp.sum(resp, axis=1, keepdims=True), eps, None)
    return (resp / denom).astype(coef.dtype)
