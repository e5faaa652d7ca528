"""Interpretability: occlusion route contributions and UC/BI/TI decomposition.

Parity targets:
  * route_contributions_occlusion — reference MIMIC-IV/Model/
    interpretability.py:212-239: zero one route's gate, re-run the head,
    record the logit delta. Here all R occlusions run as ONE vmapped program
    over the route axis instead of a Python loop of head re-runs.
  * compute_uc_bi_ti — reference routing.py:180-277 (InteractionAttributor):
    Monte-Carlo permutation estimates of unique (UC), pairwise (BI) and
    trimodal (TI) contributions. The 7-expectation battery is one
    lax.scan over n_mc permutation draws.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def route_contributions_occlusion(
    head_fn: Callable[[jnp.ndarray], jnp.ndarray],
    route_embs_stack: jnp.ndarray,  # [B, R, d]
    gates: jnp.ndarray,  # [B, R]
) -> jnp.ndarray:
    """Per-route logit deltas from zeroing each route's gate.

    head_fn maps the gated flat concat [B, R*d] -> logits [B] (or [B,K]).
    Returns [B, R] (or [B, R, K]) contribution = full_logit - occluded_logit.
    """
    b, r, d = route_embs_stack.shape

    def logits_for(g):
        x = (g[..., None] * route_embs_stack).reshape(b, r * d)
        return head_fn(x)

    full = logits_for(gates)

    def occlude(i):
        g = gates * (1.0 - jax.nn.one_hot(i, r, dtype=gates.dtype))[None, :]
        return full - logits_for(g)

    deltas = jax.vmap(occlude)(jnp.arange(r))  # [R, B] or [R, B, K]
    return jnp.moveaxis(deltas, 0, 1)


def compute_uc_bi_ti(
    f: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    l: jnp.ndarray,
    n: jnp.ndarray,
    i: jnp.ndarray,
    *,
    rng: jax.Array,
    n_mc: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Monte-Carlo UC/BI/TI decomposition of f(L, N, I) -> [B] (or [B,K]).

    UC = sum of unique main effects, BI = sum of pairwise interactions,
    TI = trimodal residual; f(obs) = G + UC + BI + TI by construction.
    """
    b = l.shape[0]

    def one_draw(carry, key):
        k1, k2, k3 = jax.random.split(key, 3)
        pl = l[jax.random.permutation(k1, b)]
        pn = n[jax.random.permutation(k2, b)]
        pi = i[jax.random.permutation(k3, b)]
        vals = (
            f(pl, pn, pi),  # E_all
            f(l, pn, pi),  # hold L
            f(pl, n, pi),  # hold N
            f(pl, pn, i),  # hold I
            f(l, n, pi),  # keep LN
            f(l, pn, i),  # keep LI
            f(pl, n, i),  # keep NI
        )
        acc = tuple(c + v for c, v in zip(carry, vals))
        return acc, None

    zero = f(l, n, i) * 0.0
    init = tuple(zero for _ in range(7))
    keys = jax.random.split(rng, n_mc)
    sums, _ = jax.lax.scan(one_draw, init, keys)
    g, e_l, e_n, e_i, e_ln, e_li, e_ni = (s / n_mc for s in sums)

    u_l, u_n, u_i = e_l - g, e_n - g, e_i - g
    uc = u_l + u_n + u_i
    p_ln = e_ln - g - u_l - u_n
    p_li = e_li - g - u_l - u_i
    p_ni = e_ni - g - u_n - u_i
    bi = p_ln + p_li + p_ni
    ti = f(l, n, i) - (g + uc + bi)
    return uc, bi, ti


def block_weights_from_gates(gates: jnp.ndarray, routes) -> Dict[str, jnp.ndarray]:
    """Mean uni/bi/tri block gate mass (interpretability.py:240)."""
    from multimodalrouting_tpu.routes import get_blocks

    blocks = get_blocks(routes)
    return {
        name: jnp.sum(gates[:, jnp.asarray(idx)], axis=1)
        for name, idx in blocks.items()
    }
