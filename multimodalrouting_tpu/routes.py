"""Route taxonomy registry and route-mask algebra.

The reference keeps two taxonomies (see SURVEY.md §0):
  * 7 routes  ["L","N","I","LN","LI","NI","LNI"]
    (reference: MIMIC-IV/Model/env_config.py:26, routing.py:23)
  * 10 routes ["L","N","I","LN","NL","LI","IL","NI","IN","LNI"]
    (reference: MIMIC-IV/MortModel/Paired_Cross_Attention/env_config.py:53)

Route names are ordered tuples; all tensors indexed by route use this order.
Availability masks are derived from per-sample modality presence flags
(reference: MIMIC-IV/Model/routing_and_heads.py:231-249 for 7 routes;
MIMIC-IV/PhenoModel/Partial/Cross_Attention/routing_and_heads.py:10-64 for 10).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

ROUTES_7: Tuple[str, ...] = ("L", "N", "I", "LN", "LI", "NI", "LNI")
ROUTES_10: Tuple[str, ...] = ("L", "N", "I", "LN", "NL", "LI", "IL", "NI", "IN", "LNI")

#: block structure used by sMRO staged gating (reference: routing.py:24)
BLOCKS_7: Dict[str, Tuple[int, ...]] = {"uni": (0, 1, 2), "bi": (3, 4, 5), "tri": (6,)}
BLOCKS_10: Dict[str, Tuple[int, ...]] = {
    "uni": (0, 1, 2),
    "bi": (3, 4, 5, 6, 7, 8),
    "tri": (9,),
}

#: modalities required by each route (directional routes need both endpoints)
ROUTE_REQUIRES: Dict[str, Tuple[str, ...]] = {
    "L": ("L",),
    "N": ("N",),
    "I": ("I",),
    "LN": ("L", "N"),
    "NL": ("L", "N"),
    "LI": ("L", "I"),
    "IL": ("L", "I"),
    "NI": ("N", "I"),
    "IN": ("N", "I"),
    "LNI": ("L", "N", "I"),
}

#: which modality provides the *query* stream for each directional route
#: (route "LN" = L queries attending over N keys/values -> query modality L)
ROUTE_QUERY_MODALITY: Dict[str, str] = {
    "L": "L", "N": "N", "I": "I",
    "LN": "L", "LI": "L",
    "NL": "N", "NI": "N",
    "IL": "I", "IN": "I",
    "LNI": "L",
}


def get_routes(taxonomy: str | int) -> Tuple[str, ...]:
    """Return the route tuple for a taxonomy given as "7"/"10" or 7/10."""
    t = str(taxonomy)
    if t == "7":
        return ROUTES_7
    if t == "10":
        return ROUTES_10
    raise ValueError(f"Unknown route taxonomy {taxonomy!r}; expected 7 or 10")


def get_blocks(routes: Sequence[str]) -> Dict[str, Tuple[int, ...]]:
    n = len(routes)
    if n == 7:
        return BLOCKS_7
    if n == 10:
        return BLOCKS_10
    # generic: group by arity
    uni = tuple(i for i, r in enumerate(routes) if len(ROUTE_REQUIRES[r]) == 1)
    bi = tuple(i for i, r in enumerate(routes) if len(ROUTE_REQUIRES[r]) == 2)
    tri = tuple(i for i, r in enumerate(routes) if len(ROUTE_REQUIRES[r]) == 3)
    return {"uni": uni, "bi": bi, "tri": tri}


def route_mask_from_presence(
    has_l: jnp.ndarray,
    has_n: jnp.ndarray,
    has_i: jnp.ndarray,
    routes: Sequence[str],
) -> jnp.ndarray:
    """Per-sample route availability mask [B, R] from modality presence [B].

    A route is available iff every modality it requires is present.
    Reference semantics: MIMIC-IV/Model/routing_and_heads.py:231-249 and
    MIMIC-IV/PhenoModel/Partial/Cross_Attention/routing_and_heads.py:10-64.
    """
    has = {
        "L": has_l.astype(jnp.float32),
        "N": has_n.astype(jnp.float32),
        "I": has_i.astype(jnp.float32),
    }
    cols = []
    for r in routes:
        m = jnp.ones_like(has["L"])
        for mod in ROUTE_REQUIRES[r]:
            m = m * has[mod]
        cols.append(m)
    return jnp.clip(jnp.stack(cols, axis=-1), 0.0, 1.0)


def block_mask_for_stage(stage: str, routes: Sequence[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(route_mask[R], block_mask[3]) for a curriculum stage uni/bi/tri.

    Reference semantics: routing.py:62-77 (_stage_masks).
    """
    blocks = get_blocks(routes)
    r = len(routes)
    rm = jnp.zeros((r,), dtype=jnp.float32)
    if stage == "uni":
        idx, bm = blocks["uni"], jnp.array([1.0, 0.0, 0.0])
    elif stage == "bi":
        idx, bm = blocks["uni"] + blocks["bi"], jnp.array([1.0, 1.0, 0.0])
    elif stage == "tri":
        idx = blocks["uni"] + blocks["bi"] + blocks["tri"]
        bm = jnp.array([1.0, 1.0, 1.0])
    else:
        raise ValueError(f"Invalid stage {stage!r}; expected uni/bi/tri")
    rm = rm.at[jnp.array(idx)].set(1.0)
    return rm, bm
