"""Benchmark: ICU stays/sec/chip, full trimodal 10-route fwd+bwd train step.

Runs the flagship capsule-routing training step (BASELINE.json metric) on the
available accelerator and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "stays/sec/chip", "vs_baseline": N}

vs_baseline compares against the PyTorch-CPU reference-equivalent workload
measured by scripts/torch_cpu_baseline.py (stored in bench_baseline.json;
re-measure with that script — the reference repo publishes no numbers,
SURVEY.md §6).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from multimodalrouting_tpu.configs import Config, apply_overrides
    from multimodalrouting_tpu.data.synthetic import make_synthetic_cohort
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.state import create_train_state
    from multimodalrouting_tpu.train.steps import make_train_step

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    chunks = int(os.environ.get("BENCH_CHUNKS", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    # BENCH_FINETUNE=1 measures the fine-tuned-text workload (reference knob
    # finetune_text, MortModel/Paired_Cross_Attention/main.py:2801-2807): the
    # BERT body trains, so its backward runs in the step. The headline stays
    # the frozen default; this leg exists so the fine-tuned step has a
    # like-for-like measured number (PERF.md "fine-tuned text").
    finetune = os.environ.get("BENCH_FINETUNE", "0") == "1"

    cfg = apply_overrides(
        Config(),
        {
            "model.num_classes": 2,
            "model.routes": "10",
            "train.batch_size": batch_size,
            # dropout off for a deterministic, fusion-friendly hot path
            "model.attn_dropout": 0.0,
            "model.relu_dropout": 0.0,
            "model.res_dropout": 0.0,
            "model.embed_dropout": 0.0,
            # headline default "poly" = exact GELU via polynomial erf — at
            # bf16 it is closer to float64-exact GELU than XLA's erf
            # lowering while ~16% faster whole-step (PERF.md "GELU
            # lowering"); BENCH_GELU=erf|tanh probes the alternatives
            "encoder.bert_gelu": os.environ.get("BENCH_GELU", "poly"),
            # BENCH_LN=bf16 probes the compute-dtype LN epilogue
            # (ops/layernorm.py; PERF.md "LN epilogue precision")
            "encoder.bert_ln": os.environ.get("BENCH_LN", "fp32"),
            "encoder.finetune_text": finetune,
        },
    )

    batch = make_synthetic_cohort(
        batch_size,
        t=cfg.encoder.structured_seq_len,
        f=cfg.encoder.structured_n_feats,
        s=chunks,
        l=cfg.encoder.text_max_len,
        image_size=cfg.encoder.image_size,
        vocab_size=cfg.encoder.bert_vocab_size,
        seed=0,
        task="mort",
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    model = CapsuleRoutingModel(cfg=cfg)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()
    state = create_train_state(cfg, model, variables)
    step_fn = make_train_step(cfg, model, "capsule")

    rng = jax.random.PRNGKey(1)
    lr = jnp.asarray(cfg.train.lr)

    # chunk packing: BERT runs only over the batch's valid note chunks
    # (bucketed static capacity; identical outputs — tests/test_note_pack.py)
    from multimodalrouting_tpu.train.loop import note_pack_bucket

    cap = note_pack_bucket(cfg, batch)

    def run_one(state, i):
        sub = jax.random.fold_in(rng, i)
        state, metrics = step_fn(state, batch, sub, lr, lr, note_pack=cap)
        return state, metrics

    def force(state, metrics):
        # Host readback: on the axon remote backend block_until_ready does
        # not force execution, so fetch scalars (loss + a param element) to
        # guarantee the whole chained computation actually ran.
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(metrics.loss) + float(jnp.ravel(leaf)[0])

    for i in range(warmup):
        state, metrics = run_one(state, i)
    force(state, metrics)

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = run_one(state, warmup + i)
    force(state, metrics)
    dt = time.perf_counter() - t0

    stays_per_sec = batch_size * steps / dt

    baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        # the fine-tuned leg is a different workload (BERT backward runs) —
        # only compare against a baseline measured the same way, never
        # against the frozen-workload number
        key = "torch_cpu_finetune_stays_per_sec" if finetune else "torch_cpu_stays_per_sec"
        baseline = base.get(key)

    name = "ICU stays/sec/chip fwd+bwd (10-route trimodal)"
    if finetune:
        name += " [fine-tuned text]"
    result = {
        "metric": name,
        "value": round(stays_per_sec, 3),
        "unit": "stays/sec/chip",
        "vs_baseline": round(stays_per_sec / baseline, 3) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
