"""multimodalrouting_tpu — TPU-native multimodal routing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AI-for-Health-Data/MultimodalRouting (PyTorch reference): ICU outcome
prediction from three modalities (structured EHR time series L, clinical
notes N, chest X-rays I), decomposed into explicit routes (unimodal,
directional bimodal, trimodal) with per-patient / per-label routing via

  1. capsule routing-by-agreement (alpha activations + R coefficients),
  2. gated concatenation (uniform / learned / loss-based gates),
  3. sMRO-style block-staged gating (uni -> bi -> tri curriculum).

Everything is built TPU-first: static shapes, batched/vmapped multi-stream
cross-attention instead of sequential per-route modules, fp32 numerics
islands inside bf16 compute, shard_map/pjit data parallelism over an ICI
mesh, and Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache, shared across processes.

    On the remote-AOT (axon) TPU backend a flagship-scale compile can take
    10+ minutes through the tunnel; the persistent cache turns every repeat
    compile (bench, CLI runs, demos, the driver's checks) into a disk hit
    (~7x faster measured even with backend init included). Opt out / point
    elsewhere with MMR_JAX_CACHE_DIR=0 / =<dir>.
    """
    where = _os.environ.get(
        "MMR_JAX_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
    )
    if not where or where == "0":
        return
    try:
        import jax

        _os.makedirs(where, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", where)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (ImportError, AttributeError, OSError):  # old jax / read-only fs
        return


_enable_compilation_cache()

from multimodalrouting_tpu import routes  # noqa: F401
from multimodalrouting_tpu.configs import (  # noqa: F401
    Config,
    EncoderConfig,
    ModelConfig,
    TrainConfig,
    load_cfg,
)
