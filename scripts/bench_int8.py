"""Microbenchmark: bf16 vs int8 matmul throughput on the chip + a prototype
dynamically-quantized Dense (per-token activation scales x per-channel weight
scales -> int8 MXU -> fp32 dequant), to size the frozen-BERT int8 win."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, steps=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[..., :1, :1]), out)
    t0 = time.perf_counter()
    acc = None
    for _ in range(steps):
        out = fn(*args)
    _ = np.asarray(out)[..., :1, :1] if hasattr(out, "shape") else out
    return (time.perf_counter() - t0) / steps


def main():
    rng = np.random.default_rng(0)
    m, k, n = 65536, 768, 768  # one BERT qkv-like matmul over 128x512 tokens

    x32 = rng.standard_normal((m, k)).astype(np.float32)
    w32 = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    x_bf = jnp.asarray(x32, jnp.bfloat16)
    w_bf = jnp.asarray(w32, jnp.bfloat16)

    @jax.jit
    def mm_bf16(x, w):
        return jnp.dot(x, w)

    @jax.jit
    def mm_int8(xq, wq):
        return jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    xq = jnp.asarray(np.clip(np.round(x32 / np.abs(x32).max() * 127), -127, 127), jnp.int8)
    wq = jnp.asarray(np.clip(np.round(w32 / np.abs(w32).max() * 127), -127, 127), jnp.int8)

    @jax.jit
    def quant_dense(x, w):
        # dynamic per-token activation quant + per-channel weight quant
        s_x = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
        s_w = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
        xq = jnp.round(x / s_x).astype(jnp.int8)
        wq = jnp.round(w / s_w).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * s_x * s_w).astype(jnp.bfloat16)

    fl = 2 * m * k * n
    for name, fn, args in (
        ("bf16", mm_bf16, (x_bf, w_bf)),
        ("int8-pre", mm_int8, (xq, wq)),
        ("int8-dynamic-dense", quant_dense, (jnp.asarray(x32, jnp.float32), jnp.asarray(w32, jnp.float32))),
    ):
        dt = timeit(fn, *args)
        print(f"[bench_int8] {name}: {dt * 1e3:.2f} ms  {fl / dt / 1e12:.1f} T(FL)OP/s")

    # accuracy of the dynamic quant dense vs fp32
    ref = x32 @ w32
    got = np.asarray(quant_dense(jnp.asarray(x32), jnp.asarray(w32))).astype(np.float32)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-6)
    print(f"[bench_int8] dynamic dense rel err: mean={rel.mean():.4f} p99={np.quantile(rel, 0.99):.4f}")


if __name__ == "__main__":
    main()
