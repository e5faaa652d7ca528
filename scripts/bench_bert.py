"""Isolate the chunk-BERT forward: time BERT-base at [N,512] on the real chip.

Prints ms/fwd and achieved TFLOP/s + MFU vs the v5e bf16 peak (197 TFLOP/s)
for each variant. Variants are selected with env vars:
  BENCH_BERT_N        chunk count (default 128)
  BENCH_BERT_INT8     1 — run the frozen-BERT int8 MXU path (default 0)
  MMR_FLASH           1 (default) | 0  — flash-attention fast path
  MMR_FLASH_BLOCK_Q / MMR_FLASH_BLOCK_K / MMR_FLASH_BLOCK_B — block overrides
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def bert_fwd_flops(n_chunks: int, t: int = 512, d: int = 768, ff: int = 3072, layers: int = 12) -> float:
    per_layer = 4 * t * d * d * 2 + 2 * t * d * ff * 2 + 2 * t * t * d * 2
    return n_chunks * layers * per_layer


def main():
    from multimodalrouting_tpu.models.clinbert import BertEncoder

    n = int(os.environ.get("BENCH_BERT_N", "128"))
    steps = int(os.environ.get("BENCH_BERT_STEPS", "10"))
    int8 = os.environ.get("BENCH_BERT_INT8", "0") == "1"
    dtype = jnp.bfloat16

    enc = BertEncoder(
        dtype=dtype, int8=int8, gelu=os.environ.get("BENCH_GELU", "poly")
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 28996, size=(n, 512)), jnp.int32)
    attn = jnp.ones((n, 512), jnp.float32)

    variables = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), ids, attn))()

    @jax.jit
    def fwd(v, ids, attn, salt):
        # salt the ids so chained calls can't be CSE'd into one
        out = enc.apply(v, jnp.where(salt > 0, ids, ids), attn)
        return out[:, 0].astype(jnp.float32)

    # warmup
    out = fwd(variables, ids, attn, jnp.asarray(1))
    float(out[0, 0])

    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(steps):
        out = fwd(variables, ids, attn, jnp.asarray(i + 1))
        acc = acc + out[0, 0]
    _ = float(acc)
    dt = (time.perf_counter() - t0) / steps

    fl = bert_fwd_flops(n)
    tflops = fl / dt / 1e12
    print(
        f"[bench_bert] n={n} int8={int(int8)} flash={os.environ.get('MMR_FLASH', '1')} "
        f"blocks=q{os.environ.get('MMR_FLASH_BLOCK_Q', '-')}/"
        f"k{os.environ.get('MMR_FLASH_BLOCK_K', '-')}/"
        f"b{os.environ.get('MMR_FLASH_BLOCK_B', '-')}: "
        f"{dt * 1e3:.1f} ms/fwd  {tflops:.1f} TFLOP/s  "
        f"MFU={100 * tflops / V5E_BF16_PEAK_TFLOPS:.1f}% (v5e bf16 peak)"
    )


if __name__ == "__main__":
    main()
