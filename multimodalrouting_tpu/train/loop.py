"""Epoch-level training driver.

Covers the reference flagship loop's operational features (reference:
MIMIC-IV/MortModel/Paired_Cross_Attention/main.py:2949-3360): weighted
positive sampling (sqrt-clipped), encoder LR warmup, detach-priors warmup,
ReduceLROnPlateau on val AUROC, early stopping with min_epochs, EMA eval,
best/last checkpointing, post-training temperature calibration + threshold
search, and route-audit export.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from collections import deque
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalrouting_tpu.ckpt import save_checkpoint, wait_for_saves
from multimodalrouting_tpu.configs import Config
from multimodalrouting_tpu.data.batches import Batch
from multimodalrouting_tpu.metrics.calibration import find_best_thresholds, fit_temperature
from multimodalrouting_tpu.metrics.classification import epoch_metrics
from multimodalrouting_tpu.train.state import create_train_state, n_route_loss_ema_for
from multimodalrouting_tpu.train.steps import make_eval_step, make_train_step


def weighted_sample_order(
    y: np.ndarray, rng: np.random.Generator, mode: str = "sqrt"
) -> np.ndarray:
    """WeightedRandomSampler equivalent: sqrt-clipped positive upweighting
    (reference main.py:2695-2715 w_pos = clip(sqrt(neg/pos), 1, 5))."""
    n = len(y)
    y_bin = np.asarray(y).reshape(n, -1)[:, 0] > 0.5
    if mode in ("none", "", "pos_weight"):
        # pos_weight mode handles imbalance in the loss, not the sampler
        return rng.permutation(n)
    pos = max(int(y_bin.sum()), 1)
    neg = max(n - pos, 1)
    w_pos = float(np.clip(np.sqrt(neg / pos), 1.0, 5.0))
    weights = np.where(y_bin, w_pos, 1.0)
    weights = weights / weights.sum()
    return rng.choice(n, size=n, replace=True, p=weights)


def chunk_bucketed_order(
    order: np.ndarray, chunk_mask: np.ndarray, batch_size: int, rng: np.random.Generator
) -> np.ndarray:
    """Regroup a sampled epoch order so each batch has homogeneous note-chunk
    counts, then shuffle the batch order.

    The sampled multiset (and therefore the sampling distribution) is
    unchanged — only batch composition is, which tightens each batch's
    chunk-pack capacity (note_pack_bucket) on real ragged data. Off by
    default (train.chunk_bucketing) to keep the reference's pure-random
    batches.
    """
    counts = np.asarray(chunk_mask).sum(axis=1)[order]
    # stable sort by chunk count with the sampled order as tiebreak
    regrouped = order[np.argsort(counts, kind="stable")]
    n_full = (len(order) // batch_size) * batch_size
    batches = regrouped[:n_full].reshape(-1, batch_size)
    perm = rng.permutation(len(batches))
    return np.concatenate([batches[perm].reshape(-1), regrouped[n_full:]])


def note_pack_bucket(cfg: Config, batch: Batch) -> int:
    """Bucketed chunk-pack capacity for this batch (0 = packing off).

    The capacity covers every valid chunk exactly (so packing never drops a
    real chunk) and is rounded up to a bucket grid so only a handful of
    program shapes ever compile (~total/16 buckets worst case).
    """
    if batch.note_chunk_embs is not None:
        return 0  # cached embeddings skip the BERT body — nothing to pack
    if not cfg.encoder.note_pack or batch.chunk_mask is None:
        return 0
    cm = np.asarray(batch.chunk_mask)
    total = int(cm.size)
    n_valid = int(cm.sum())
    g = max(16, total // 8)
    cap = int(np.ceil(max(n_valid, 1) / g) * g)
    return 0 if cap >= total else cap


@dataclasses.dataclass
class TrainResult:
    state: object
    history: List[Dict[str, float]]
    best_metric: float
    thresholds: Optional[np.ndarray]
    temperature: float


def _predict_probs(eval_step, state, cohort: Batch, batch_size: int, task: str, cfg=None, mesh=None):
    """Full-split inference -> (probs, alpha, r_matrix) stacked on host.

    Route-audit tensors (alpha [B,R], R [B,R,K]) and logits are streamed with
    async device-to-host copies so transfers overlap the next batch's compute
    (BASELINE.json north star: route-audit path streams from device without
    host sync); everything materializes once after the loop.
    """
    n = cohort.batch_size
    dev_logits, dev_alphas, dev_rms, valid = [], [], [], []

    def start_async(x):
        if x is not None:
            try:
                x.copy_to_host_async()
            except AttributeError:
                pass  # plain numpy input (CPU tests) has no async copy
        return x

    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        # pad the tail batch to a full batch by repeating the last row
        # (clipped gather keeps shapes static -> no recompile), trim on host;
        # every sample contributes to metrics exactly once
        idx = np.minimum(np.arange(start, start + batch_size), n - 1)
        sub = Batch(*(None if v is None else v[idx] for v in cohort))
        cap = note_pack_bucket(cfg, sub) if cfg is not None else 0
        if mesh is not None:
            from multimodalrouting_tpu.parallel.mesh import shard_batch

            sub = shard_batch(sub, mesh)
        out = eval_step(state, sub, note_pack=cap)
        dev_logits.append(start_async(out.logits))
        dev_alphas.append(start_async(out.alpha))
        dev_rms.append(start_async(out.r_matrix))
        valid.append(stop - start)

    from multimodalrouting_tpu.parallel.mesh import host_gather

    probs = []
    for logits_dev, k in zip(dev_logits, valid):
        logits = host_gather(logits_dev)[:k]
        if task == "mort" and logits.shape[-1] == 2:
            p = 1.0 / (1.0 + np.exp(-(logits[:, 1] - logits[:, 0])))
        else:
            p = 1.0 / (1.0 + np.exp(-logits))
        probs.append(p)
    alphas = [host_gather(a)[:k] for a, k in zip(dev_alphas, valid) if a is not None]
    rms = [host_gather(r)[:k] for r, k in zip(dev_rms, valid) if r is not None]
    cat = lambda xs: np.concatenate(xs, 0) if xs else None  # noqa: E731
    return cat(probs), cat(alphas), cat(rms)


def train_model(
    cfg: Config,
    model,
    train_cohort: Batch,
    val_cohort: Batch,
    *,
    family: str = "capsule",
    stage: str = "",
    init_state=None,
    log_fn: Callable[[str], None] = print,
    ckpt_dir: Optional[str] = None,
    **apply_kwargs,
) -> TrainResult:
    t = cfg.train
    rng = np.random.default_rng(t.seed)
    jrng = jax.random.PRNGKey(t.seed)

    # Multi-chip product path (SURVEY.md §2.4/§5.8): a ('data','model') mesh
    # over ICI; params/opt-state replicated, batches sharded over 'data', the
    # flattened note-chunk program additionally sharded over 'model'. GSPMD
    # inserts the gradient psum — the train step itself is unchanged.
    mesh = None
    try:
        if t.num_data_shards * t.num_model_shards > 1:
            from multimodalrouting_tpu.parallel.mesh import make_mesh, set_active_mesh

            if t.batch_size % t.num_data_shards != 0:
                raise ValueError(
                    f"train.batch_size={t.batch_size} must be divisible by "
                    f"train.num_data_shards={t.num_data_shards}"
                )
            if t.tensor_parallel:
                from multimodalrouting_tpu.parallel.mesh import set_tp_mode
                from multimodalrouting_tpu.parallel.tp import validate_tp_divisibility

                # validate BEFORE publishing any global mesh/tp state: a
                # raise here must not leak a stale mesh into later runs
                validate_tp_divisibility(cfg, t.num_model_shards)
            if t.pipeline_parallel:
                from multimodalrouting_tpu.parallel.mesh import set_pp_mode
                from multimodalrouting_tpu.parallel.pp import validate_pp

                validate_pp(cfg, t.num_model_shards)
            if t.route_parallel:
                from multimodalrouting_tpu.parallel.ep import validate_ep
                from multimodalrouting_tpu.parallel.mesh import set_ep_mode

                validate_ep(cfg, t.num_model_shards)
            mesh = make_mesh(n_data=t.num_data_shards, n_model=t.num_model_shards)
            from multimodalrouting_tpu.parallel.mesh import warmup_collectives

            warmup_collectives(mesh)  # pre-mint cross-process gloo cliques
            set_active_mesh(mesh)
            if t.tensor_parallel:
                set_tp_mode(True)
            if t.pipeline_parallel:
                set_pp_mode(True)
            if t.route_parallel:
                set_ep_mode(True)
        return _train_model_on_mesh(
            cfg, model, train_cohort, val_cohort, mesh=mesh, family=family,
            stage=stage, init_state=init_state, log_fn=log_fn,
            ckpt_dir=ckpt_dir, rng=rng, jrng=jrng, **apply_kwargs,
        )
    finally:
        if mesh is not None:
            from multimodalrouting_tpu.parallel.mesh import (
                set_active_mesh,
                set_ep_mode,
                set_pp_mode,
                set_tp_mode,
            )

            set_active_mesh(None)
            set_tp_mode(False)
            set_pp_mode(False)
            set_ep_mode(False)


def _train_model_on_mesh(
    cfg: Config,
    model,
    train_cohort: Batch,
    val_cohort: Batch,
    *,
    mesh,
    family: str,
    stage: str,
    init_state,
    log_fn,
    ckpt_dir,
    rng,
    jrng,
    **apply_kwargs,
) -> TrainResult:
    t = cfg.train

    # Streaming split (data/streaming.py:StreamingSplit): sequential batch
    # pulls instead of random-access slicing. Samplers/bucketing need random
    # access — reject loudly rather than silently changing semantics.
    streaming = hasattr(train_cohort, "epoch_iter")
    if streaming:
        if t.sampler_mode not in ("", "none", "pos_weight"):
            # pos_weight reweights the loss, not the sample order, so it
            # composes trivially; sqrt/hybrid use the split's streaming
            # resampler (expected-count-equivalent to the reference's
            # WeightedRandomSampler — data/streaming.py:enable_sampler)
            if hasattr(train_cohort, "enable_sampler"):
                train_cohort.enable_sampler(t.sampler_mode)
            else:
                raise ValueError(
                    f"train.sampler_mode={t.sampler_mode!r} needs random access; "
                    "this streaming split supports 'none' or 'pos_weight' "
                    "(use data.stream_shuffle_buffer for shuffling)"
                )
        if t.chunk_bucketing:
            raise ValueError("train.chunk_bucketing needs random access; "
                             "disable it for streaming splits")

    if init_state is None:
        example = (
            train_cohort.example_batch(t.batch_size)
            if streaming
            else Batch(
                *(None if v is None else v[: t.batch_size] for v in train_cohort)
            )
        )
        example = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x), example
        )
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(t.seed), example, train=False))()
        if cfg.encoder.bert_weights or cfg.encoder.vision_weights:
            from multimodalrouting_tpu.pretrained import apply_pretrained

            variables = apply_pretrained(cfg, variables, log_fn=log_fn)
        state = create_train_state(
            cfg, model, variables, stage=stage,
            n_route_loss_ema=n_route_loss_ema_for(cfg, family),
        )
    else:
        state = init_state
    if mesh is not None:
        # one merged sharding tree, one device_put: placing replicated first
        # and re-sharding after would materialize the full Adam moments on
        # every chip — the exact peak ZeRO-1 exists to avoid
        from multimodalrouting_tpu.parallel.mesh import replicate_sharding

        if t.tensor_parallel:
            from multimodalrouting_tpu.parallel.tp import tp_state_shardings

            shardings = tp_state_shardings(state, mesh)
        elif t.pipeline_parallel:
            from multimodalrouting_tpu.parallel.pp import pp_state_shardings

            shardings = pp_state_shardings(state, mesh)
        elif t.route_parallel:
            from multimodalrouting_tpu.parallel.ep import ep_state_shardings

            shardings = ep_state_shardings(state, mesh)
        else:
            repl = replicate_sharding(mesh)
            shardings = jax.tree_util.tree_map(lambda _: repl, state)
        if t.zero_sharded_opt:
            from multimodalrouting_tpu.parallel.zero import zero_opt_shardings

            shardings = shardings.replace(
                opt_state=zero_opt_shardings(state.opt_state, mesh)
            )
        from multimodalrouting_tpu.parallel.mesh import global_device_put_tree

        state = global_device_put_tree(state, shardings)

    # Frozen-BERT note-embedding cache (train/text_cache.py): compute the
    # per-chunk BERT embeddings ONCE, train every epoch from the cache.
    # Needs random access to the whole split, so dense cohorts only.
    if cfg.encoder.text_embedding_cache:
        if streaming:
            raise ValueError(
                "encoder.text_embedding_cache needs a dense split; "
                "unset data.stream (streaming re-draws batches every epoch)"
            )
        from multimodalrouting_tpu.train.text_cache import attach_note_cache

        t0 = time.perf_counter()
        train_cohort = attach_note_cache(cfg, state.params, train_cohort)
        val_cohort = attach_note_cache(cfg, state.params, val_cohort)
        log_fn(
            f"[text-cache] frozen-BERT chunk embeddings precomputed for "
            f"{train_cohort.batch_size}+{val_cohort.batch_size} stays in "
            f"{time.perf_counter() - t0:.1f}s"
        )
    # On a virtual CPU mesh the devices time-share the host cores, so a step
    # dispatched before the previous one drains can leave some "devices" a
    # whole step behind — their rendezvous with the devices already inside
    # step N+1's first collective then times out and XLA:CPU aborts the
    # process. Fully drain each step before dispatching the next. Real TPU
    # meshes keep the async dispatch, with metrics read back lag-K (below) so
    # the host never blocks on the step it just launched.
    hard_sync = mesh is not None and jax.devices()[0].platform == "cpu"

    if family == "fame" and stage in ("uni", "bi", "tri"):
        apply_kwargs = {**apply_kwargs, "stage": stage}
    if family == "gated_concat" and stage in ("step1", "step2", "step3"):
        # staged gated semantics (reference train_step1/2): loss + monitor
        # come from the stage's route heads, not the (frozen) final head
        apply_kwargs = {**apply_kwargs, "stage": stage}
    train_step = make_train_step(cfg, model, family, **apply_kwargs)
    eval_kwargs = {}
    if family == "gated_concat" and stage in ("step1", "step2"):
        eval_kwargs = {"stage": stage}
    elif family == "fame" and stage in ("uni", "bi"):
        # mid-curriculum monitoring must fuse only the trained blocks: the
        # block gate's logits for stage-masked blocks are untrained, so the
        # reference's stage="eval" full fusion (train_fame.py:267) is only
        # meaningful AFTER the tri stage — evaluating uni/bi checkpoints
        # unmasked mixes garbage blocks into the monitor, early stopping,
        # and best-checkpoint selection
        eval_kwargs = {"stage": stage}
    eval_step = make_eval_step(cfg, model, family, use_ema=t.use_ema, **eval_kwargs)

    n_train = train_cohort.batch_size
    if t.max_train_patients > 0:
        n_train = min(n_train, t.max_train_patients)
    steps_per_epoch = max(n_train // t.batch_size, 1)

    if cfg.verbose:
        from multimodalrouting_tpu.configs import to_dict

        log_fn(f"[config] {json.dumps(to_dict(cfg), sort_keys=True)}")
        log_fn(
            f"[train] family={family} stage={stage or '-'} n_train={n_train} "
            f"steps/epoch={steps_per_epoch} mesh={'none' if mesh is None else mesh.shape}"
        )

    lr_head = t.lr
    lr_scale = 1.0
    best_metric, best_epoch = -np.inf, -1
    best_f1 = -np.inf
    plateau_count = 0
    history: List[Dict[str, float]] = []

    # step-granular resume: continue from the epoch implied by the restored
    # optimizer step (reference load_checkpoint:2024-2037)
    start_epoch = int(jax.device_get(state.step)) // steps_per_epoch if init_state is not None else 0

    for epoch in range(start_epoch, t.epochs):
        if streaming:
            order = None
            batch_iter = train_cohort.epoch_iter(epoch, t.batch_size)
        else:
            order = weighted_sample_order(
                np.asarray(train_cohort.y)[:n_train], rng, mode=t.sampler_mode
            )
            if t.chunk_bucketing and train_cohort.chunk_mask is not None:
                order = chunk_bucketed_order(
                    order, np.asarray(train_cohort.chunk_mask), t.batch_size, rng
                )
        lr_enc = 0.0 if epoch < t.encoder_warmup_epochs else t.encoder_lr * lr_scale
        detach = epoch < t.detach_priors_epochs
        # act-temperature anneal start -> act_temperature over N epochs
        m = cfg.model
        act_temp = None
        if family == "capsule" and m.act_temperature_start > 0 and m.act_temperature_epochs > 0:
            frac = min(epoch / max(m.act_temperature_epochs, 1), 1.0)
            act_temp = jnp.asarray(
                m.act_temperature_start + frac * (m.act_temperature - m.act_temperature_start),
                jnp.float32,
            )
        t0 = time.perf_counter()
        losses, skipped = [], 0
        alpha_dev = None
        # Lag-K metrics readback: float(loss) blocks the host on the step's
        # completion, which on a remote-device backend (axon tunnel) serializes
        # host batch prep against device compute. Holding K steps of device
        # scalars before materializing lets dispatch run ahead (overlapping
        # H2D transfer + compute) while bounding buffer run-ahead to K batches.
        # hard_sync (CPU virtual meshes) drains every step instead — see above.
        pending: deque = deque()
        readback_lag = 0 if hard_sync else 8

        # step-cadence running-loss log (reference log_every /
        # routing_print_every, main.py:3174-3194); reads the lag-K
        # materialized metric so it never blocks dispatch
        def _drain_one(pending, losses, epoch):
            nonlocal skipped
            m = pending.popleft()
            losses.append(float(m.loss))
            skipped += int(not bool(m.grad_finite))
            if t.log_every > 0 and len(losses) % t.log_every == 0:
                log_fn(
                    f"[epoch {epoch:03d} step {len(losses)}/{steps_per_epoch}] "
                    f"loss={np.mean(losses[-t.log_every:]):.4f}"
                )
        for s in range(steps_per_epoch):
            if streaming:
                sub = next(batch_iter, None)
                if sub is None:
                    break  # split shrank between epochs (drop_remainder)
            else:
                sel = order[s * t.batch_size : (s + 1) * t.batch_size]
                sub = Batch(*(None if v is None else v[sel] for v in train_cohort))
            pack_cap = note_pack_bucket(cfg, sub)
            if mesh is not None:
                from multimodalrouting_tpu.parallel.mesh import shard_batch

                sub = shard_batch(sub, mesh)
            jrng, sub_rng = jax.random.split(jrng)
            state, metrics = train_step(
                state,
                sub,
                sub_rng,
                jnp.asarray(lr_head * lr_scale),
                jnp.asarray(lr_enc),
                detach_priors=detach,
                act_temperature=act_temp,
                note_pack=pack_cap,
            )
            if hard_sync:
                jax.block_until_ready(state)
            pending.append(metrics)
            if metrics.alpha_mean is not None:
                alpha_dev = metrics.alpha_mean  # device ref; materialized below
            while len(pending) > readback_lag:
                _drain_one(pending, losses, epoch)
        while pending:
            _drain_one(pending, losses, epoch)
        alpha_mean = None if alpha_dev is None else np.asarray(jax.device_get(alpha_dev))
        dt = time.perf_counter() - t0

        # ROUTE HEALTH CHECK / collapse alarm (reference main.py:3195-3200)
        if alpha_mean is not None and float(alpha_mean.max()) > 0.95:
            log_fn(
                f"[ROUTE HEALTH] collapse alarm: max mean route activation "
                f"{alpha_mean.max():.3f} (alpha={np.round(alpha_mean, 3).tolist()})"
            )

        probs, _, _ = _predict_probs(
            eval_step, state, val_cohort, t.batch_size, cfg.model.task, mesh=mesh
        )
        val_m = epoch_metrics(np.asarray(val_cohort.y)[: len(probs)], probs)
        monitor = val_m.get("auroc", val_m.get("auroc_macro", 0.0))
        if np.isnan(monitor):
            monitor = 0.0
        row = {
            "epoch": epoch,
            "train_loss": float(np.mean(losses)),
            "val_auroc": float(monitor),
            "lr_scale": lr_scale,
            "skipped_steps": skipped,
            "sec": dt,
        }
        history.append(row)
        log_fn(
            f"[epoch {epoch:03d}] loss={row['train_loss']:.4f} "
            f"val_auroc={monitor:.4f} lr_scale={lr_scale:.3f} "
            f"({dt:.1f}s, {skipped} skipped)"
        )

        if monitor > best_metric + 1e-6:
            best_metric, best_epoch = monitor, epoch
            plateau_count = 0
            if ckpt_dir and t.ckpt_every > 0:
                save_checkpoint(ckpt_dir, state, cfg, name="best", backend=t.ckpt_backend)
        else:
            plateau_count += 1
            if plateau_count >= t.plateau_patience:
                lr_scale *= t.plateau_factor
                plateau_count = 0
                log_fn(f"[plateau] lr_scale -> {lr_scale:.4f}")
        # best_f1 dual checkpoint (reference main.py:3351-3355: best.pt tracks
        # VAL AUROC, best_f1.pt tracks VAL F1 — macro F1 for multilabel)
        val_f1 = float(val_m.get("f1", val_m.get("f1_macro", 0.0)))
        if np.isfinite(val_f1) and val_f1 > best_f1 + 1e-6:
            best_f1 = val_f1
            if ckpt_dir and t.ckpt_every > 0:
                save_checkpoint(ckpt_dir, state, cfg, name="best_f1", backend=t.ckpt_backend)
                log_fn(f"[epoch {epoch:03d}] saved best_f1 (val F1={val_f1:.4f})")
        if ckpt_dir and t.ckpt_every > 0 and (epoch + 1) % t.ckpt_every == 0:
            save_checkpoint(ckpt_dir, state, cfg, name="last", backend=t.ckpt_backend)
        if epoch >= t.min_epochs and epoch - best_epoch >= t.early_stop_patience:
            log_fn(f"[early stop] epoch {epoch}, best {best_metric:.4f} @ {best_epoch}")
            break

    # post-training calibration on VAL (reference main.py:3428-3471)
    probs, _, _ = _predict_probs(
        eval_step, state, val_cohort, t.batch_size, cfg.model.task, mesh=mesh
    )
    y_val = np.asarray(val_cohort.y)[: len(probs)]
    eps = 1e-7
    logits_val = np.log(np.clip(probs, eps, 1 - eps)) - np.log1p(-np.clip(probs, eps, 1 - eps))
    if y_val.ndim == 1:
        temperature = fit_temperature(logits_val, y_val)
        ths, _ = find_best_thresholds(y_val, 1 / (1 + np.exp(-logits_val / temperature)))
        if ckpt_dir and jax.process_index() == 0:  # one artifact writer per fs
            # reliability diagram of the calibrated VAL probs
            # (reference main.py:2366 plot_reliability)
            from multimodalrouting_tpu.audit.exports import save_reliability_diagram

            save_reliability_diagram(
                y_val, 1 / (1 + np.exp(-logits_val / temperature)), ckpt_dir, split="val"
            )
    else:
        temperature = 1.0
        # phenotype flavor searches F-beta=2 thresholds (PhenoModel PCA :2173)
        beta = 2.0 if cfg.model.task == "pheno" else 1.0
        ths, _ = find_best_thresholds(y_val, probs, beta=beta)

    if ckpt_dir:
        save_checkpoint(
            ckpt_dir, state, cfg, name="final", thresholds=ths.ravel(),
            extra={"temperature": float(temperature)}, backend=t.ckpt_backend,
        )
    wait_for_saves()  # orbax_async: background writes must land before return

    return TrainResult(
        state=state,
        history=history,
        best_metric=float(best_metric),
        thresholds=ths,
        temperature=float(temperature),
    )
