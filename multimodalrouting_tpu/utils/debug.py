"""Numerics debug checks behind a flag (SURVEY.md §5.2).

The reference's pervasive NaN/Inf guards (its _nan_guard, _has_nonfinite
batch skips) become jax.debug checks gated on MMR_DEBUG_CHECKS=1 — free when
off (no trace-time cost), loud when on.
"""
from __future__ import annotations

import os


def debug_checks_enabled() -> bool:
    return os.environ.get("MMR_DEBUG_CHECKS", "0") == "1"


def checked_finite(x, name: str):
    """Assert all-finite inside jit when debug checks are on; identity
    otherwise."""
    if not debug_checks_enabled():
        return x
    import jax
    import jax.numpy as jnp

    ok = jnp.all(jnp.isfinite(x))
    jax.debug.callback(
        lambda ok_, name_=name: None
        if ok_
        else print(f"[MMR_DEBUG] non-finite values in {name_}"),
        ok,
    )
    return x
