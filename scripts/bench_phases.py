"""Whole-step phase breakdown for the flagship bench workload (PERF.md).

Times separately-jitted programs on the real chip with forced host readback
(same honesty rules as bench.py) and derives a phase table:

  bert_fwd     frozen chunked BioClinicalBERT forward (packed capacity)
  behrt_fwd    structured lab encoder forward
  cxr_fwd      ResNet image encoder forward
  model_fwd    full trimodal forward (encoders + MULT + fusion + capsule)
  fusion_fwd*  model_fwd - (bert + behrt + cxr)   [derived]
  train_step   full fwd+bwd+AdamW+EMA step
  bwd_opt*     train_step - model_fwd             [derived]

Usage: python scripts/bench_phases.py  (env BENCH_BATCH/BENCH_CHUNKS/BENCH_STEPS)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _timed(fn, steps, warmup, force):
    for _ in range(warmup):
        out = fn()
    force(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    force(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    from multimodalrouting_tpu.configs import Config, apply_overrides
    from multimodalrouting_tpu.data.synthetic import make_synthetic_cohort
    from multimodalrouting_tpu.models.behrt import BEHRTLabEncoder
    from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder, note_pack_capacity
    from multimodalrouting_tpu.models.cxr import ImageEncoder
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import note_pack_bucket
    from multimodalrouting_tpu.train.state import create_train_state
    from multimodalrouting_tpu.train.steps import make_train_step

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    chunks = int(os.environ.get("BENCH_CHUNKS", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    warmup = int(os.environ.get("BENCH_WARMUP", "2"))

    cfg = apply_overrides(
        Config(),
        {
            "model.num_classes": 2,
            "model.routes": "10",
            "train.batch_size": batch_size,
            "model.attn_dropout": 0.0,
            "model.relu_dropout": 0.0,
            "model.res_dropout": 0.0,
            "model.embed_dropout": 0.0,
            # BENCH_FINETUNE=1: phase table for the fine-tuned-text workload
            # (BERT body trains; reference finetune_text knob)
            "encoder.finetune_text": os.environ.get("BENCH_FINETUNE", "0") == "1",
        },
    )
    e, m = cfg.encoder, cfg.model
    dtype = jnp.dtype(m.dtype)

    batch = make_synthetic_cohort(
        batch_size, t=e.structured_seq_len, f=e.structured_n_feats, s=chunks,
        l=e.text_max_len, image_size=e.image_size, vocab_size=e.bert_vocab_size,
        seed=0, task="mort",
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    cap = note_pack_bucket(cfg, batch)

    def scalar_force(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.ravel(leaf)[0].astype(jnp.float32))

    results = {}

    # --- BERT (packed, like the train step) ---
    bert = BioClinBERTEncoder(
        d=e.d, vocab_size=e.bert_vocab_size, hidden=e.bert_hidden,
        layers=e.bert_layers, heads=e.bert_heads, intermediate=e.bert_intermediate,
        max_position=e.bert_max_position, note_agg=e.note_agg,
        chunk_agg=e.note_chunk_agg, dtype=dtype,
        finetune_text=e.finetune_text,  # frozen_fast_path is derived inside
    )
    with note_pack_capacity(cap):
        bvars = jax.jit(lambda: bert.init(jax.random.PRNGKey(0), batch.notes_dict()))()
        bert_fwd = jax.jit(lambda v, nd: bert.apply(v, nd))
        results["bert_fwd_ms"] = _timed(
            lambda: bert_fwd(bvars, batch.notes_dict()), steps, warmup, scalar_force
        )

    # --- BEHRT labs ---
    behrt = BEHRTLabEncoder(
        n_feats=e.structured_n_feats, d=e.d, seq_len=e.structured_seq_len,
        n_layers=e.structured_layers, n_heads=e.structured_heads,
        pool=e.structured_pool, dtype=dtype,
    )
    lvars = jax.jit(lambda: behrt.init(jax.random.PRNGKey(0), batch.x_struct, batch.m_struct))()
    behrt_fwd = jax.jit(lambda v: behrt.apply(v, batch.x_struct, batch.m_struct))
    results["behrt_fwd_ms"] = _timed(lambda: behrt_fwd(lvars), steps, warmup, scalar_force)

    # --- CXR ---
    cxr = ImageEncoder(
        d=m.d, vision_backbone=e.vision_backbone,
        vision_num_classes=e.vision_num_classes, norm_kind=e.vision_norm, dtype=dtype,
    )
    cvars = jax.jit(lambda: cxr.init(jax.random.PRNGKey(0), batch.image))()
    cxr_fwd = jax.jit(lambda v: cxr.apply(v, batch.image, train=False))
    results["cxr_fwd_ms"] = _timed(lambda: cxr_fwd(cvars), steps, warmup, scalar_force)

    # --- full model fwd + full train step ---
    model = CapsuleRoutingModel(cfg=cfg)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()
    state = create_train_state(cfg, model, variables)
    with note_pack_capacity(cap):
        model_fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
        results["model_fwd_ms"] = _timed(
            lambda: model_fwd({"params": state.params, **(
                {"batch_stats": state.batch_stats} if state.batch_stats else {})}, batch),
            steps, warmup, lambda out: float(jnp.ravel(out.logits)[0]),
        )
    step_fn = make_train_step(cfg, model, "capsule")
    lr = jnp.asarray(cfg.train.lr)
    rng = jax.random.PRNGKey(1)

    class Box:
        pass

    box = Box()
    box.state = state

    def one_step():
        box.state, metrics = step_fn(box.state, batch, rng, lr, lr, note_pack=cap)
        return metrics

    results["train_step_ms"] = _timed(
        one_step, steps, warmup,
        lambda mtr: float(mtr.loss) + scalar_force(box.state.params),
    )

    results["fusion_routing_fwd_ms_derived"] = round(
        results["model_fwd_ms"]
        - results["bert_fwd_ms"] - results["behrt_fwd_ms"] - results["cxr_fwd_ms"], 2
    )
    results["bwd_optimizer_ms_derived"] = round(
        results["train_step_ms"] - results["model_fwd_ms"], 2
    )
    results = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in results.items()}
    results["config"] = {"batch": batch_size, "chunks": chunks, "pack_capacity": cap,
                         "device": str(jax.devices()[0].platform)}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
