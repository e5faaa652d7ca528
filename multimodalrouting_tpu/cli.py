"""Command-line driver: train / evaluate / audit any model family.

Replaces the reference's 16 per-variant training mains (SURVEY.md §2.2) with
one entry point:

  python -m multimodalrouting_tpu.cli train --family capsule --task mort \
      --routes 10                       # MortModel/Paired_Cross_Attention
  python -m multimodalrouting_tpu.cli train --family capsule --task pheno \
      --routes 7 --set model.bi_fusion_mode=linear   # PhenoModel/main.py
  python -m multimodalrouting_tpu.cli train --family gated_concat \
      --stage step1|step2|step3         # Model/train_step{1,2,3}
  python -m multimodalrouting_tpu.cli train --family fame \
      --stage uni|bi|tri                # train_fame.py curriculum
  python -m multimodalrouting_tpu.cli train --family late_fusion|trimf
  python -m multimodalrouting_tpu.cli eval --ckpt runs/... --drop-table

Config resolution mirrors the reference (env_config.py): defaults <- --config
file <- MIMICIV_* env vars <- --set key=value overrides.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Optional

import numpy as np


def _parse_sets(pairs: List[str]) -> Dict[str, str]:
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def _load_data(cfg, task: str):
    from multimodalrouting_tpu.data.batches import Batch
    from multimodalrouting_tpu.data.synthetic import make_synthetic_cohort

    if cfg.data.synthetic or not cfg.data.data_root:
        n = cfg.data.synthetic_n

        def mk(seed):
            return make_synthetic_cohort(
                n,
                t=cfg.encoder.structured_seq_len,
                f=cfg.encoder.structured_n_feats,
                s=cfg.encoder.notes_max_chunks,
                l=min(cfg.encoder.text_max_len, 128),
                image_size=min(cfg.encoder.image_size, 96),
                vocab_size=cfg.encoder.bert_vocab_size,
                pos_rate=cfg.data.synthetic_pos_rate,
                missing_rate=cfg.data.synthetic_missing_rate,
                seed=seed,
                task=task,
            )

        return mk(0), mk(1), mk(2)

    from multimodalrouting_tpu.data.images import make_image_loader
    from multimodalrouting_tpu.data.loader import load_split

    pixels = "uint8" if cfg.encoder.image_uint8_transfer else "normalized"
    image_dtype = np.uint8 if cfg.encoder.image_uint8_transfer else np.float32

    def split_loader(split):
        # train gets the augmenting stack, val/test the deterministic one
        # (reference build_image_transform(split), main.py:907-925)
        return make_image_loader(
            split,
            spec=cfg.encoder.image_transform,
            resize=cfg.encoder.image_resize,
            crop=cfg.encoder.image_size,
            seed=cfg.train.seed,
            root=cfg.data.image_root,
            pixels=pixels,
        )

    if cfg.data.stream:
        # memory-bounded train split; val/test are small enough to stay dense
        from multimodalrouting_tpu.data.streaming import StreamingSplit

        tr_stream = StreamingSplit(
            cfg.data.data_root, "train", task=task,
            image_size=cfg.encoder.image_size, image_loader=split_loader("train"),
            image_dtype=image_dtype,
            rows_per_read=cfg.data.stream_rows_per_read,
            shuffle_buffer=cfg.data.stream_shuffle_buffer,
            seed=cfg.train.seed,
        )
        va = load_split(cfg.data.data_root, "val", task=task,
                        image_size=cfg.encoder.image_size, image_loader=split_loader("val"),
                        image_dtype=image_dtype)
        te = load_split(cfg.data.data_root, "test", task=task,
                        image_size=cfg.encoder.image_size, image_loader=split_loader("test"),
                        image_dtype=image_dtype)
        return tr_stream, va.batch, te.batch

    tr = load_split(cfg.data.data_root, "train", task=task,
                    image_size=cfg.encoder.image_size, image_loader=split_loader("train"),
                    image_dtype=image_dtype)
    va = load_split(cfg.data.data_root, "val", task=task,
                    image_size=cfg.encoder.image_size, image_loader=split_loader("val"),
                    image_dtype=image_dtype)
    te = load_split(cfg.data.data_root, "test", task=task,
                    image_size=cfg.encoder.image_size, image_loader=split_loader("test"),
                    image_dtype=image_dtype)
    return tr.batch, va.batch, te.batch


def _build(cfg, family: str):
    if family in ("late_fusion", "trimf"):
        from multimodalrouting_tpu.models.baselines import build_baseline

        return build_baseline(cfg, family)
    from multimodalrouting_tpu.models.full import build_model

    return build_model(cfg, family)


def cmd_train(args) -> int:
    from multimodalrouting_tpu.configs import load_cfg
    from multimodalrouting_tpu.parallel.distributed import init_multihost
    from multimodalrouting_tpu.train.loop import train_model

    # multi-host first, before anything touches jax.devices(): wires
    # jax.distributed from cluster env vars (JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID or TPU pod metadata); no-op on a
    # single host, after which --mesh axes span all global devices
    if init_multihost():
        import jax

        print(f"[distributed] process {jax.process_index()}/{jax.process_count()}: "
              f"{jax.local_device_count()} local / {jax.device_count()} global devices")

    overrides = _parse_sets(args.set or [])
    if args.task:
        overrides.setdefault("model.task", args.task)
        if args.task == "pheno":
            overrides.setdefault("model.num_classes", "25")
        elif args.task == "mort":
            overrides.setdefault("model.num_classes", "2")
        elif args.task == "multitask":
            overrides.setdefault("model.num_classes", "3")
    if args.routes:
        overrides.setdefault("model.routes", args.routes)
    if args.epochs is not None:
        overrides["train.epochs"] = str(args.epochs)
    if getattr(args, "mesh", None):
        # --mesh data=4,model=2 -> ('data','model') device mesh (SURVEY §2.4)
        for part in args.mesh.split(","):
            axis, _, n = part.partition("=")
            axis = axis.strip()
            if axis not in ("data", "model") or not n.strip().isdigit():
                raise SystemExit(
                    f"--mesh: bad spec {part!r} (want data=N[,model=M])"
                )
            key = "num_data_shards" if axis == "data" else "num_model_shards"
            overrides[f"train.{key}"] = n.strip()
    cfg = load_cfg(args.config, overrides)

    train_b, val_b, test_b = _load_data(cfg, cfg.model.task)
    loss_family = args.family if args.family in ("capsule", "gated_concat", "fame") else "fame"
    model = _build(cfg, args.family)

    out_dir = args.out or os.path.join(cfg.out_dir, args.family)
    os.makedirs(out_dir, exist_ok=True)

    init_state = None
    if args.init_from or args.resume:
        # --init-from: stage chaining (params only, fresh optimizer);
        # --resume: full restore incl. optimizer state + step counter
        # (reference: train_step2/3 warm starts; load_checkpoint:2024-2037)
        import jax

        from multimodalrouting_tpu.ckpt import restore_checkpoint
        from multimodalrouting_tpu.data.batches import Batch
        from multimodalrouting_tpu.train.state import create_train_state, n_route_loss_ema_for

        example = (
            train_b.example_batch(cfg.train.batch_size)
            if hasattr(train_b, "epoch_iter")
            else Batch(
                *(None if v is None else v[: cfg.train.batch_size] for v in train_b)
            )
        )
        variables = model.init(jax.random.PRNGKey(cfg.train.seed), example, train=False)
        init_state = create_train_state(
            cfg, model, variables, stage=args.stage or "",
            n_route_loss_ema=n_route_loss_ema_for(cfg, loss_family),
        )
        if args.resume:
            init_state = restore_checkpoint(args.resume, init_state, name="last")
        else:
            init_state = restore_checkpoint(
                args.init_from, init_state, name=args.init_name, params_only=True
            )

    from multimodalrouting_tpu.utils.profiling import trace_context

    with trace_context(args.profile_dir):
        result = train_model(
            cfg,
            model,
            train_b,
            val_b,
            family=loss_family,
            stage=args.stage or "",
            init_state=init_state,
            ckpt_dir=out_dir,
        )
    with open(os.path.join(out_dir, "history.json"), "w") as f:
        json.dump(result.history, f, indent=2)
    print(
        json.dumps(
            {
                "family": args.family,
                "stage": args.stage or "",
                "best_val_auroc": result.best_metric,
                "temperature": result.temperature,
                "epochs_ran": len(result.history),
                "ckpt_dir": out_dir,
            }
        )
    )
    return 0


def cmd_eval(args) -> int:
    import jax

    from multimodalrouting_tpu.audit.droptable import drop_table_eval, format_drop_table
    from multimodalrouting_tpu.audit.exports import routing_heatmap_tables
    from multimodalrouting_tpu.ckpt import load_config, restore_checkpoint
    from multimodalrouting_tpu.data.batches import Batch
    from multimodalrouting_tpu.metrics.classification import epoch_metrics
    from multimodalrouting_tpu.routes import get_routes
    from multimodalrouting_tpu.train.loop import _predict_probs
    from multimodalrouting_tpu.train.state import create_train_state, n_route_loss_ema_for
    from multimodalrouting_tpu.train.steps import make_eval_step

    cfg = load_config(args.ckpt, args.name)
    family = args.family
    model = _build(cfg, family)
    _, _, test_b = _load_data(cfg, cfg.model.task)
    example = Batch(*(None if v is None else v[: cfg.train.batch_size] for v in test_b))
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    state = create_train_state(
        cfg, model, variables,
        n_route_loss_ema=n_route_loss_ema_for(
            cfg, family if family in ("capsule", "gated_concat", "fame") else "fame"
        ),
    )
    state = restore_checkpoint(args.ckpt, state, name=args.name)
    # restored leaves are host numpy; put them on device ONCE — otherwise
    # every jitted eval call re-uploads the full ~1GB param tree through the
    # (remote) device transport, ~17s per batch on the axon tunnel
    state = jax.device_put(state)

    if cfg.encoder.text_embedding_cache and not cfg.encoder.finetune_text:
        # frozen-BERT embedding cache (train/text_cache.py): one BERT pass
        # over the split, then every eval batch — including all drop-table
        # conditions, which act on has_* flags only — skips the BERT body
        from multimodalrouting_tpu.train.text_cache import attach_note_cache

        test_b = attach_note_cache(cfg, state.params, test_b)

    loss_family = family if family in ("capsule", "gated_concat", "fame") else "fame"
    eval_step = make_eval_step(cfg, model, loss_family)
    probs, alpha, r_matrix = _predict_probs(
        eval_step, state, test_b, cfg.train.batch_size, cfg.model.task
    )
    y = np.asarray(test_b.y)[: len(probs)]

    # apply the VAL-fitted temperature + thresholds saved with the checkpoint
    from multimodalrouting_tpu.ckpt import load_meta
    from multimodalrouting_tpu.metrics.calibration import expected_calibration_error

    meta = load_meta(args.ckpt, args.name)
    eps = 1e-7
    logits_np = np.log(np.clip(probs, eps, 1 - eps)) - np.log1p(-np.clip(probs, eps, 1 - eps))
    temperature = float(meta.get("temperature", 1.0) or 1.0)
    probs = 1.0 / (1.0 + np.exp(-logits_np / temperature))
    thresholds = meta.get("thresholds")
    th_arr = np.asarray(thresholds, np.float64) if thresholds else None

    metrics = epoch_metrics(y, probs, thresholds=th_arr if y.ndim == 2 else None,
                            threshold=float(th_arr[0]) if (th_arr is not None and y.ndim == 1) else 0.5)
    metrics["temperature"] = temperature
    if y.ndim == 1:
        metrics["ece"] = expected_calibration_error(y, probs)
    sens = test_b.sens
    if sens is not None and y.ndim == 1:
        from multimodalrouting_tpu.metrics.fairness import (
            eddi,
            equalized_odds_gap,
            predictive_parity_gap,
        )

        s = np.asarray(sens)[: len(probs)]
        th = float(th_arr[0]) if th_arr is not None else 0.5
        metrics["eddi"] = eddi(y, probs, s)
        metrics.update(equalized_odds_gap(y, probs >= th, s))
        metrics["ppv_gap"] = predictive_parity_gap(y, probs >= th, s)
    print(json.dumps({k: v for k, v in metrics.items() if not isinstance(v, list)}, indent=2))

    out_dir = args.out or args.ckpt
    if y.ndim == 1:
        from multimodalrouting_tpu.audit.exports import save_reliability_diagram

        save_reliability_diagram(y, probs, out_dir, split="test")
    if alpha is not None and r_matrix is not None:
        routes = get_routes(cfg.model.routes)
        routing_heatmap_tables(alpha, r_matrix, routes, out_dir, split="test")
        print(f"[audit] route heatmaps/tables -> {out_dir}")

    if args.drop_table:
        def predict(b: Batch):
            p, _, _ = _predict_probs(eval_step, state, b, cfg.train.batch_size, cfg.model.task)
            if temperature != 1.0:
                lg = np.log(np.clip(p, eps, 1 - eps)) - np.log1p(-np.clip(p, eps, 1 - eps))
                p = 1.0 / (1.0 + np.exp(-lg / temperature))
            return p

        n_full = (test_b.batch_size // cfg.train.batch_size) * cfg.train.batch_size
        # splits smaller than one batch keep the padded-tail path
        # (_predict_probs pads short batches; trimming to 0 rows would
        # hand drop_table_eval an empty cohort)
        n_full = n_full or test_b.batch_size
        trimmed = Batch(*(None if v is None else v[:n_full] for v in test_b))
        table = drop_table_eval(predict, trimmed, thresholds=th_arr)
        print(format_drop_table(table))
    return 0


def cmd_predict(args) -> int:
    """Serving path: checkpoint -> calibrated predictions (JSONL or HTTP).

    The reference's inference surface is demo prints inside the training
    scripts (`Model/inference_demo.py`); this is the productionized
    equivalent — one static-shape compiled program, VAL-fitted temperature +
    thresholds applied, route audit per prediction (see `serve.py`).
    """
    from multimodalrouting_tpu.serve import (
        Predictor,
        make_http_server,
        write_predictions_jsonl,
    )

    if args.artifact and args.ckpt:
        raise SystemExit("pass either --ckpt or --artifact, not both")
    if args.artifact:
        from multimodalrouting_tpu.artifact import ExportedPredictor

        pred = ExportedPredictor(args.artifact)
    else:
        if not args.ckpt:
            raise SystemExit("one of --ckpt or --artifact is required")
        pred = Predictor(
            args.ckpt, args.family, name=args.name, batch_size=args.batch_size
        )

    if args.export_artifact:
        from multimodalrouting_tpu.artifact import export_serving_artifact

        if args.artifact:
            raise SystemExit("--export-artifact needs --ckpt (a live Predictor)")
        platforms = args.platforms.split(",") if args.platforms else None
        out = export_serving_artifact(pred, args.export_artifact, platforms=platforms)
        print(json.dumps({"artifact": out, "platforms": platforms or ["current"]}))
        return 0

    if args.port is not None:
        pred.warmup()
        server = make_http_server(pred, port=args.port)
        host, port = server.server_address[:2]
        print(f"[serve] http://{host}:{port}  POST /predict  GET /health", flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
        return 0

    cfg = pred.cfg
    if cfg.data.synthetic or not cfg.data.data_root:
        split_ix = {"train": 0, "val": 1, "test": 2}
        if args.split not in split_ix:
            raise SystemExit(f"--split must be train|val|test, got {args.split!r}")
        cohort = _load_data(cfg, cfg.model.task)[split_ix[args.split]]
        stay_ids = None
    else:
        from multimodalrouting_tpu.data.images import make_image_loader
        from multimodalrouting_tpu.data.loader import load_split

        pixels = "uint8" if cfg.encoder.image_uint8_transfer else "normalized"
        arrays = load_split(
            cfg.data.data_root, args.split, task=cfg.model.task,
            image_size=cfg.encoder.image_size,
            image_dtype=np.uint8 if pixels == "uint8" else np.float32,
            # serving uses the deterministic eval transform stack — same
            # pixels the checkpoint's val/test metrics were computed on
            # (build_image_transform maps any non-train split to eval mode)
            image_loader=make_image_loader(
                args.split,
                spec=cfg.encoder.image_transform,
                resize=cfg.encoder.image_resize,
                crop=cfg.encoder.image_size,
                seed=cfg.train.seed,
                root=cfg.data.image_root,
                pixels=pixels,
            ),
        )
        cohort, stay_ids = arrays.batch, arrays.stay_ids
    out_path = args.out or os.path.join(
        args.ckpt or args.artifact, f"predictions_{args.split}.jsonl"
    )
    n = write_predictions_jsonl(pred, cohort, out_path, stay_ids=stay_ids)
    print(json.dumps({"rows": n, "out": out_path, "temperature": pred.temperature}))
    return 0


def cmd_interpret(args) -> int:
    """Interpretability sweep / inference demo on a gated-concat checkpoint."""
    import csv

    import jax

    from multimodalrouting_tpu.audit.sweep import (
        gated_model_sweep,
        print_inference_demo,
        sweep_to_rows,
    )
    from multimodalrouting_tpu.ckpt import load_config, restore_checkpoint
    from multimodalrouting_tpu.data.batches import Batch
    from multimodalrouting_tpu.routes import ROUTES_7, route_mask_from_presence
    from multimodalrouting_tpu.train.state import create_train_state

    cfg = load_config(args.ckpt, args.name)
    model = _build(cfg, "gated_concat")
    _, _, test_b = _load_data(cfg, cfg.model.task)
    n = min(test_b.batch_size, args.max_samples)
    test_b = Batch(*(None if v is None else v[:n] for v in test_b))
    variables = model.init(jax.random.PRNGKey(0), test_b, train=False)
    state = create_train_state(cfg, model, variables)
    state = restore_checkpoint(args.ckpt, state, name=args.name)
    # restored leaves are host numpy; put them on device ONCE — otherwise
    # every jitted eval call re-uploads the full ~1GB param tree through the
    # (remote) device transport, ~17s per batch on the axon tunnel
    state = jax.device_put(state)
    vars_eval = {"params": state.ema_params if state.ema_params is not None else state.params}
    if state.batch_stats:
        vars_eval["batch_stats"] = state.batch_stats
    out = model.apply(vars_eval, test_b, train=False)

    avail = route_mask_from_presence(test_b.has_l, test_b.has_n, test_b.has_i, ROUTES_7)
    sweep = gated_model_sweep(
        cfg, vars_eval["params"], {k: np.asarray(v) for k, v in out.pooled.items()},
        avail=avail, n_mc=args.n_mc,
    )
    print_inference_demo(sweep, k=args.demo_samples)
    if args.out_csv:
        rows = sweep_to_rows(sweep)
        with open(args.out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"[interpret] wrote {len(rows)} rows -> {args.out_csv}")
    return 0


def cmd_unimodal(args) -> int:
    """Unimodal drivers + fairness report (reference 01_BEHRT.py /
    02_BEHRT.py / 01_BioClinicalBert.py / INSPECT/BEHRT.py)."""
    from multimodalrouting_tpu.configs import load_cfg
    from multimodalrouting_tpu.train.unimodal import train_unimodal

    if args.modality == "omop":
        return _cmd_unimodal_omop(args)
    if args.modality == "ct":
        return _cmd_unimodal_ct(args)

    overrides = _parse_sets(args.set or [])
    if args.epochs is not None:
        overrides["train.epochs"] = args.epochs
    if args.task:
        overrides["model.task"] = {"readmit": "mort"}.get(args.task, args.task)
    cfg = load_cfg(args.config, overrides)
    if cfg.data.stream:
        raise SystemExit("unimodal drivers need dense splits; unset data.stream")
    tasks = None
    if args.impressions_csv:
        # INSPECT text-only multitask path (INSPECT/BioClinicalBERT.py):
        # impressions CSV -> per-patient note Batches with age-bucket
        # fairness groups; the label columns found in the CSV are the tasks.
        if args.modality != "note":
            raise SystemExit("--impressions-csv requires --modality note")
        from multimodalrouting_tpu.data.inspect_etl import load_impressions_dataset

        splits = load_impressions_dataset(
            args.impressions_csv,
            max_len=cfg.encoder.text_max_len,
            stride=args.stride,
            max_chunks=cfg.encoder.notes_max_chunks,
            tokenizer_name=cfg.encoder.text_model_name,
            vocab_path=args.vocab,
            seed=cfg.train.seed,
        )
        train_b, val_b, test_b = splits["train"], splits["val"], splits["test"]
        tasks = splits["_tasks"]
        data_task = args.task or "multitask"
    else:
        # multitask labels (mortality/pe/ph) ride the synthetic "multitask" y;
        # readmit is a binary label column in real exports
        data_task = args.task or cfg.model.task
        train_b, val_b, test_b = _load_data(cfg, data_task)
        # reference split protocol for the wide-BEHRT multitask driver:
        # MultilabelStratifiedShuffleSplit 20% test then 5/80 val over the
        # pooled label matrix (Unimodal/MIMIC/BEHRT.py:228-232). Default on
        # for behrt+multitask (what the reference always does there),
        # opt-in/out everywhere via --stratify.
        stratify = (
            args.modality == "behrt" and data_task == "multitask"
            if args.stratify == "auto"
            else args.stratify == "on"
        )
        if stratify:
            from multimodalrouting_tpu.data.batches import concat_batches, take_batch
            from multimodalrouting_tpu.data.stratified import stratified_three_way

            pooled = concat_batches([train_b, val_b, test_b])
            tr_idx, va_idx, te_idx = stratified_three_way(
                np.asarray(pooled.y), seed=cfg.train.seed
            )
            train_b, val_b, test_b = (
                take_batch(pooled, tr_idx),
                take_batch(pooled, va_idx),
                take_batch(pooled, te_idx),
            )
            print(
                f"[stratify] multilabel-stratified split -> train {len(tr_idx)} "
                f"| val {len(va_idx)} | test {len(te_idx)}"
            )
    out_dir = args.out or os.path.join(cfg.out_dir, f"unimodal_{args.modality}")
    os.makedirs(out_dir, exist_ok=True)
    res = train_unimodal(
        cfg, train_b, val_b, test_b,
        modality=args.modality, task=data_task, tasks=tasks, out_dir=out_dir,
    )
    print(json.dumps({
        "modality": args.modality,
        "tasks": list(res.metrics),
        "auroc": {k: float(v.get("auroc", float("nan"))) for k, v in res.metrics.items()},
        "out_dir": out_dir,
    }))
    return 0


def _cmd_unimodal_ct(args) -> int:
    """INSPECT CT-volume multitask driver (the CT branch of the reference's
    CXR/CT image-encoder switch, INSPECT/models/encoders.py:119-207).

    Data: a seeded synthetic CT cohort [B,S,H,W,1] whose pe label is tied to
    the mean intensity of a fixed slab, so the fit is verifiable anywhere
    (no public CT volumes ship with this environment).
    """
    from multimodalrouting_tpu.configs import load_cfg
    from multimodalrouting_tpu.train.unimodal import train_ct

    CT_TASKS = ("pe", "mort1m", "read1m", "ph12m")
    overrides = _parse_sets(args.set or [])
    if args.epochs is not None:
        overrides["train.epochs"] = args.epochs
    cfg = load_cfg(args.config, overrides)

    def split(n, seed):
        r = np.random.default_rng(seed)
        x = r.normal(0.0, 1.0, size=(n, 6, 32, 32, 1)).astype(np.float32)
        slab = x[:, 2:4, 8:24, 8:24, 0].mean(axis=(1, 2, 3))
        y = np.stack(
            [(slab > 0).astype(np.float32)]
            + [r.integers(0, 2, n).astype(np.float32) for _ in range(3)],
            axis=1,
        )
        # make the signal visible above the noise floor at tiny n
        x[:, 2:4, 8:24, 8:24, 0] += np.where(slab > 0, 1.5, -1.5)[:, None, None, None]
        return {"x": x, "y": y, "sens": r.integers(0, 2, n)}

    n = cfg.data.synthetic_n
    data = {"train": split(max(n, 64), cfg.train.seed),
            "val": split(max(n // 4, 32), cfg.train.seed + 1),
            "test": split(max(n // 4, 32), cfg.train.seed + 2)}

    out_dir = args.out or os.path.join(cfg.out_dir, "unimodal_ct")
    os.makedirs(out_dir, exist_ok=True)
    res = train_ct(
        data,
        tasks=CT_TASKS,
        hidden=cfg.model.d,
        backbone=cfg.encoder.vision_backbone,
        lr=cfg.train.lr,
        weight_decay=cfg.train.weight_decay,
        batch_size=cfg.train.batch_size,
        epochs=cfg.train.epochs,
        patience=cfg.train.early_stop_patience,
        seed=cfg.train.seed,
        out_dir=out_dir,
    )
    print(json.dumps({
        "modality": "ct",
        "tasks": list(res.metrics),
        "auroc": {k: float(v.get("auroc", float("nan"))) for k, v in res.metrics.items()},
        "out_dir": out_dir,
    }))
    return 0


def _cmd_unimodal_omop(args) -> int:
    """INSPECT OMOP concept-embedding multitask driver (INSPECT/BEHRT.py).

    Data: `--inspect-csv final_structured_dataset.csv[.gz]` (reference
    schema: 3 concept-name columns + the 4 INSPECT label columns, optional
    `split`/`sens` columns); without it, a seeded synthetic OMOP cohort so
    the driver is exercisable anywhere.
    """
    from multimodalrouting_tpu.configs import load_cfg
    from multimodalrouting_tpu.train.unimodal import train_omop

    OMOP_TASKS = ("pe", "mort1m", "read1m", "ph12m")
    overrides = _parse_sets(args.set or [])
    if args.epochs is not None:
        overrides["train.epochs"] = args.epochs
    cfg = load_cfg(args.config, overrides)

    if args.inspect_csv:
        from multimodalrouting_tpu.data.inspect_etl import load_inspect_structured

        data = load_inspect_structured(args.inspect_csv, seed=cfg.train.seed)
        vocab_sizes = data.pop("_vocab_sizes")
        n_tasks = len(data.pop("_tasks"))
        tasks = OMOP_TASKS[:n_tasks]
    else:
        # synthetic OMOP cohort: proc parity drives the pe label so the fit
        # is verifiable, remaining labels are noise
        def split(n, seed):
            r = np.random.default_rng(seed)
            proc = r.integers(0, 64, n)
            y = np.stack(
                [(proc % 2 == 0).astype(np.float32)]
                + [r.integers(0, 2, n).astype(np.float32) for _ in range(3)],
                axis=1,
            )
            return {"proc": proc, "meas": r.integers(0, 48, n),
                    "drug": r.integers(0, 56, n), "y": y,
                    "sens": r.integers(0, 2, n)}

        n = cfg.data.synthetic_n
        data = {"train": split(max(n, 64), cfg.train.seed),
                "val": split(max(n // 4, 32), cfg.train.seed + 1),
                "test": split(max(n // 4, 32), cfg.train.seed + 2)}
        vocab_sizes, tasks = (64, 48, 56), OMOP_TASKS

    out_dir = args.out or os.path.join(cfg.out_dir, "unimodal_omop")
    os.makedirs(out_dir, exist_ok=True)
    res = train_omop(
        data,
        vocab_sizes=tuple(int(v) for v in vocab_sizes),
        tasks=tasks,
        hidden=cfg.model.d,
        lr=cfg.train.lr,
        weight_decay=cfg.train.weight_decay,
        batch_size=cfg.train.batch_size,
        epochs=cfg.train.epochs,
        patience=cfg.train.early_stop_patience,
        seed=cfg.train.seed,
        out_dir=out_dir,
    )
    print(json.dumps({
        "modality": "omop",
        "tasks": list(res.metrics),
        "auroc": {k: float(v.get("auroc", float("nan"))) for k, v in res.metrics.items()},
        "out_dir": out_dir,
    }))
    return 0


def cmd_etl(args) -> int:
    """Offline ETL drivers (reference L0 layer, SURVEY.md §1).

    Mirrors the reference's CLI scripts as subcommands:
      etl varmap  — cohort/build_varmap_17.py main
      etl cohort  — cohort/build_cohort.py main:590
      etl export  — cohort/export_model_inputs.py main:164
      etl medfuse — MedFuse_Preprocessing/fusion_main.py:27-71 +
                    datasets/ehr_dataset.py get_datasets (listfile +
                    per-stay CSV chain), offline to parquet model inputs
      etl inspect — INSPECT/Data/00+01+02 scripts (cohort merge, long OMOP
                    EHR filtered to study_time, impressions w/ labels)
      etl legacy  — Data/icustay_dataset.py:83-197 (wide lab pivot +
                    PE/PH labels + cleaned concatenated notes)
    Chained, they take a raw MIMIC-style csv.gz dump to the parquet model
    inputs that `cli train --set data.synthetic=false --set
    data.data_root=EXPORT` consumes (same chain as tests/test_integration_chain.py).
    """
    import pandas as pd

    if args.etl_cmd == "varmap":
        from multimodalrouting_tpu.data.varmap import build_varmap

        def _read_dict(name):
            for cand in (name + ".csv.gz", name + ".csv"):
                p = os.path.join(args.data_dir, cand)
                if os.path.exists(p):
                    return pd.read_csv(p)
            raise SystemExit(f"missing {name}.csv[.gz] under {args.data_dir}")

        vm = build_varmap(_read_dict("d_items"), _read_dict("d_labitems"))
        os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
        vm.to_csv(args.out, index=False)
        print(json.dumps({"varmap": args.out, "rows": int(len(vm)),
                          "variables": int(vm["variable"].nunique())}))
        return 0

    if args.etl_cmd == "cohort":
        from multimodalrouting_tpu.data.cohort import CohortConfig, build_cohort

        master = build_cohort(CohortConfig(
            data_dir=args.data_dir,
            out_dir=args.out,
            varmap_path=args.varmap,
            cxr_meta_path=args.cxr_meta,
            notes_path=args.notes,
            listfile_dir=args.listfile_dir,
            seed=args.seed,
            min_age=args.min_age,
            window_hours=args.window_hours,
            bin_hours=args.bin_hours,
            ccs_map9_path=args.ccs_map9,
            ccs_map10_path=args.ccs_map10,
        ))
        print(json.dumps({
            "cohort": args.out, "stays": int(len(master)),
            "splits": {k: int(v) for k, v in
                       master["split"].value_counts().items()},
        }))
        return 0

    if args.etl_cmd == "export":
        from multimodalrouting_tpu.data.exporter import export_model_inputs
        from multimodalrouting_tpu.data.tokenization import ChunkingConfig

        export_model_inputs(
            args.cohort, args.out,
            chunking=ChunkingConfig(
                max_len=args.max_len, stride=args.stride, max_chunks=args.max_chunks
            ),
            tokenizer_name=args.tokenizer,
        )
        files = sorted(os.listdir(args.out))
        print(json.dumps({"export": args.out, "files": files}))
        return 0

    if args.etl_cmd == "medfuse":
        from multimodalrouting_tpu.data.medfuse import medfuse_export

        summary = medfuse_export(
            args.ehr_data_dir, args.task, args.out,
            timestep=args.timestep,
            impute_strategy=args.impute,
            config_path=args.channels_config,
            normalizer_state=args.normalizer_state,
            period_length=args.period_length,
            cxr_data_dir=args.cxr_data_dir,
            icu_stays_csv=args.icu_stays,
            data_pairs=args.data_pairs,
            data_ratio=args.data_ratio,
            seed=args.seed,
        )
        print(json.dumps(summary))
        return 0

    if args.etl_cmd == "inspect":
        from multimodalrouting_tpu.data.inspect_etl import (
            OMOP_TABLES,
            build_long_ehr,
            impressions_with_labels,
            merge_cohort,
        )

        def _read(path, required=True):
            if path is None or not os.path.exists(path):
                if required:
                    raise SystemExit(f"missing required input {path!r}")
                return None
            # sep=None sniffs tsv vs csv (the reference's inputs are tsv)
            return pd.read_csv(path, sep=None, engine="python")

        metadata = _read(args.metadata)
        mapping = _read(args.mapping)
        labels = _read(args.labels)
        splits = _read(args.splits)
        imps = _read(args.impressions, required=False)
        cohort = merge_cohort(metadata, mapping, labels, splits, imps)
        os.makedirs(args.out, exist_ok=True)
        cohort_csv = os.path.join(args.out, "inspect_cohort.csv")
        cohort.to_csv(cohort_csv, index=False)

        outputs = {"cohort": cohort_csv, "rows": int(len(cohort))}
        if args.omop_dir:
            tables = {}
            for name in OMOP_TABLES:
                for cand in (f"{name}.csv.gz", f"{name}.csv"):
                    p = os.path.join(args.omop_dir, cand)
                    if os.path.exists(p):
                        tables[name] = pd.read_csv(p, low_memory=False)
                        break
            demo = _read(args.demographics, required=False)
            long = build_long_ehr(tables, cohort, demographics=demo)
            ehr_csv = os.path.join(args.out, "inspect_long_ehr.csv.gz")
            long.to_csv(ehr_csv, index=False, compression="gzip")
            outputs["long_ehr"] = ehr_csv
            outputs["ehr_rows"] = int(len(long))
        if imps is not None:
            iw = impressions_with_labels(imps, labels)
            iw_csv = os.path.join(args.out, "inspect_impressions_with_labels.csv")
            iw.to_csv(iw_csv, index=False)
            outputs["impressions_with_labels"] = iw_csv
        print(json.dumps(outputs))
        return 0

    if args.etl_cmd == "legacy":
        from multimodalrouting_tpu.data.legacy_cohort import load_legacy_cohort

        structured, notes = load_legacy_cohort(
            args.data_dir, window_hours=args.window_hours, bin_hours=args.bin_hours
        )
        os.makedirs(args.out, exist_ok=True)
        s_csv = os.path.join(args.out, "final_structured_dataset.csv")
        n_csv = os.path.join(args.out, "final_unstructured_notes.csv")
        structured.to_csv(s_csv, index=False)
        # The reference embeds notes offline with BioClinicalBERT into
        # final_unstructured_embeddings.csv (Data/icustay_dataset.py:150-197);
        # here embedding happens at train time through the note encoder
        # (`cli unimodal --modality note`), so the export carries the cleaned
        # concatenated text instead.
        notes.to_csv(n_csv, index=False)
        print(json.dumps({"structured": s_csv, "rows": int(len(structured)),
                          "notes": n_csv, "note_rows": int(len(notes))}))
        return 0

    raise SystemExit(f"unknown etl subcommand {args.etl_cmd!r}")


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="multimodalrouting_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train", help="train a model family")
    tr.add_argument("--family", default="capsule",
                    choices=["capsule", "gated_concat", "fame", "late_fusion", "trimf"])
    tr.add_argument("--task", choices=["mort", "pheno", "multitask"], default=None)
    tr.add_argument("--routes", choices=["7", "10"], default=None)
    tr.add_argument("--stage", default=None,
                    help="step1|step2|step3 (gated_concat) or uni|bi|tri (fame)")
    tr.add_argument("--config", default=None, help="YAML/JSON config file")
    tr.add_argument("--set", action="append", metavar="KEY=VALUE")
    tr.add_argument("--epochs", type=int, default=None)
    tr.add_argument("--out", default=None)
    tr.add_argument("--init-from", default=None,
                    help="checkpoint dir to warm-start from (stage chaining)")
    tr.add_argument("--init-name", default="final")
    tr.add_argument("--resume", default=None,
                    help="checkpoint dir for full resume (optimizer + step)")
    tr.add_argument("--mesh", default=None, metavar="data=N[,model=M]",
                    help="multi-chip mesh spec, e.g. data=8 or data=4,model=2 "
                         "(shorthand for train.num_data_shards/num_model_shards)")
    tr.add_argument("--profile-dir", default=None,
                    help="jax.profiler trace output dir (Perfetto/XProf)")
    tr.set_defaults(fn=cmd_train)

    un = sub.add_parser("unimodal", help="unimodal drivers + fairness report")
    un.add_argument("--modality", default="behrt",
                    choices=["behrt", "note", "omop", "ct"])
    un.add_argument("--task", default=None,
                    choices=["mort", "readmit", "multitask", "pheno"],
                    help="multitask = 3-task mortality/PE/PH (01_BEHRT.py); "
                         "readmit = 30-day readmission (02_BEHRT.py); "
                         "ignored for --modality omop (always 4-task INSPECT)")
    un.add_argument("--inspect-csv", default=None,
                    help="INSPECT final_structured_dataset.csv[.gz] for "
                         "--modality omop (synthetic cohort when omitted)")
    un.add_argument("--impressions-csv", default=None,
                    help="INSPECT radiology impressions csv[.gz] with label "
                         "columns for the text-only 4-task model "
                         "(INSPECT/BioClinicalBERT.py); needs --modality note")
    un.add_argument("--stride", type=int, default=64,
                    help="note chunking stride for --impressions-csv")
    un.add_argument("--vocab", default=None,
                    help="WordPiece vocab.txt for the native tokenizer "
                         "(--impressions-csv path)")
    un.add_argument("--stratify", default="auto", choices=["auto", "on", "off"],
                    help="re-split pooled data with the multilabel-stratified "
                         "protocol (BEHRT.py:228-232: 20%% test, 5/80 val); "
                         "auto = on for --modality behrt --task multitask")
    un.add_argument("--config", default=None)
    un.add_argument("--set", action="append", metavar="KEY=VALUE")
    un.add_argument("--epochs", type=int, default=None)
    un.add_argument("--out", default=None)
    un.set_defaults(fn=cmd_unimodal)

    ev = sub.add_parser("eval", help="evaluate a checkpoint + audit exports")
    ev.add_argument("--ckpt", required=True)
    ev.add_argument("--name", default="final")
    ev.add_argument("--family", default="capsule")
    ev.add_argument("--drop-table", action="store_true")
    ev.add_argument("--out", default=None)
    ev.set_defaults(fn=cmd_eval)

    et = sub.add_parser("etl", help="offline ETL: raw csv.gz -> cohort -> model inputs")
    esub = et.add_subparsers(dest="etl_cmd", required=True)
    ev0 = esub.add_parser("varmap", help="regex-match d_items/d_labitems to the 17 vars")
    ev0.add_argument("--data-dir", required=True, help="dir with d_items/d_labitems csv[.gz]")
    ev0.add_argument("--out", required=True, help="varmap csv path")
    ec = esub.add_parser("cohort", help="full cohort ETL -> NPZ per stay + master csv")
    ec.add_argument("--data-dir", required=True, help="raw MIMIC-style csv.gz dump")
    ec.add_argument("--out", required=True, help="cohort output dir")
    ec.add_argument("--varmap", required=True, help="varmap csv from `etl varmap`")
    ec.add_argument("--cxr-meta", default=None, help="MIMIC-CXR metadata csv[.gz]")
    ec.add_argument("--notes", default=None, help="notes csv[.gz]")
    ec.add_argument("--listfile-dir", default=None, help="MedFuse listfile dir (exact splits)")
    ec.add_argument("--seed", type=int, default=2022)
    ec.add_argument("--min-age", type=float, default=18.0)
    ec.add_argument("--window-hours", type=int, default=48)
    ec.add_argument("--bin-hours", type=int, default=2)
    ec.add_argument("--ccs-map9", default=None)
    ec.add_argument("--ccs-map10", default=None)
    ex = esub.add_parser("export", help="cohort -> parquet model inputs (pretokenized notes)")
    ex.add_argument("--cohort", required=True, help="cohort dir from `etl cohort`")
    ex.add_argument("--out", required=True, help="export output dir (data.data_root)")
    ex.add_argument("--max-len", type=int, default=512)
    ex.add_argument("--stride", type=int, default=64)
    ex.add_argument("--max-chunks", type=int, default=8)
    ex.add_argument("--tokenizer", default="emilyalsentzer/Bio_ClinicalBERT")
    em = esub.add_parser(
        "medfuse",
        help="MedFuse benchmark dir (listfiles + per-stay CSVs) -> model inputs",
    )
    em.add_argument("--ehr-data-dir", required=True,
                    help="dir holding {task}/{split}_listfile.csv + train|test stay CSVs")
    em.add_argument("--task", default="phenotyping",
                    choices=["in-hospital-mortality", "phenotyping"])
    em.add_argument("--out", required=True, help="export output dir (data.data_root)")
    em.add_argument("--timestep", type=float, default=1.0)
    em.add_argument("--impute", default="previous",
                    choices=["zero", "normal_value", "previous", "next"])
    em.add_argument("--channels-config", default=None, help="discretizer channel config JSON")
    em.add_argument("--normalizer-state", default=None,
                    help="normalizer JSON (default: fit on train split)")
    em.add_argument("--period-length", type=float, default=48.0)
    em.add_argument("--cxr-data-dir", default=None,
                    help="dir with resized/**/*.jpg + mimic-cxr-2.0.0-metadata.csv")
    em.add_argument("--icu-stays", default=None, help="all_stays.csv for CXR pairing")
    em.add_argument("--data-pairs", default="partial_ehr_cxr",
                    choices=["paired_ehr_cxr", "paired_ehr", "partial_ehr", "partial_ehr_cxr"])
    em.add_argument("--data-ratio", type=float, default=1.0)
    em.add_argument("--seed", type=int, default=0)
    ei = esub.add_parser(
        "inspect",
        help="INSPECT cohort merge + long OMOP EHR + impressions w/ labels",
    )
    ei.add_argument("--metadata", required=True, help="imaging metadata tsv/csv")
    ei.add_argument("--mapping", required=True,
                    help="impression->person mapping tsv/csv (procedure_DATETIME ok)")
    ei.add_argument("--labels", required=True, help="labels tsv/csv (impression_id keyed)")
    ei.add_argument("--splits", required=True, help="splits tsv/csv")
    ei.add_argument("--impressions", default=None, help="radiology impressions csv")
    ei.add_argument("--omop-dir", default=None,
                    help="dir with condition_occurrence/procedure_occurrence/measurement/drug_exposure csv[.gz]")
    ei.add_argument("--demographics", default=None, help="person-level demographics csv")
    ei.add_argument("--out", required=True, help="output dir")
    el = esub.add_parser(
        "legacy",
        help="single-file legacy pipeline: wide lab pivot + PE/PH labels + notes",
    )
    el.add_argument("--data-dir", required=True, help="raw MIMIC-style csv.gz dump")
    el.add_argument("--out", required=True, help="output dir")
    el.add_argument("--window-hours", type=int, default=24)
    el.add_argument("--bin-hours", type=int, default=2)
    et.set_defaults(fn=cmd_etl)

    pr = sub.add_parser("predict", help="serving: calibrated predictions as JSONL or HTTP")
    pr.add_argument("--ckpt", default=None, help="checkpoint dir (live Predictor)")
    pr.add_argument("--artifact", default=None,
                    help="serve a jax.export artifact dir instead of a checkpoint")
    pr.add_argument("--export-artifact", default=None, metavar="DIR",
                    help="export --ckpt as a self-contained serving artifact and exit")
    pr.add_argument("--platforms", default=None,
                    help="comma list for --export-artifact (e.g. cpu,tpu); "
                         "default: current backend only")
    pr.add_argument("--name", default="final")
    pr.add_argument("--family", default="capsule")
    pr.add_argument("--split", default="test")
    pr.add_argument("--batch-size", type=int, default=None,
                    help="static serving batch (default: training batch size)")
    pr.add_argument("--out", default=None, help="JSONL output path")
    pr.add_argument("--port", type=int, default=None,
                    help="start a JSON HTTP server instead of scoring a split")
    pr.set_defaults(fn=cmd_predict)

    it = sub.add_parser("interpret", help="occlusion + UC/BI/TI sweep + inference demo")
    it.add_argument("--ckpt", required=True)
    it.add_argument("--name", default="final")
    it.add_argument("--n-mc", type=int, default=20)
    it.add_argument("--max-samples", type=int, default=256)
    it.add_argument("--demo-samples", type=int, default=5)
    it.add_argument("--out-csv", default=None)
    it.set_defaults(fn=cmd_interpret)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
