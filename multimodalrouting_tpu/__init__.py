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

from multimodalrouting_tpu import routes  # noqa: F401
from multimodalrouting_tpu.configs import (  # noqa: F401
    Config,
    EncoderConfig,
    ModelConfig,
    TrainConfig,
    load_cfg,
)
