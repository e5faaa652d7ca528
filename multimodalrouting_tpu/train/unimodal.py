"""Unimodal training drivers + fairness report surface.

Parity targets (reference scripts with NO framework counterpart until now):
  * MIMIC-IV/01_BEHRT.py:122-279 — 3-task wide-BEHRT (mortality/PE/PH),
    per-task neg/pos pos_weight BCE summed, grad clip 1.0, plateau(0.1, 2),
    early stop on val loss, then the printed fairness suite (EO / EDDI /
    detailed group metrics) — emitted here as fairness.json.
  * MIMIC-IV/02_BEHRT.py — 30-day readmission variant: same encoder, focal
    loss gamma=2.5 with class-weight pos_weight.
  * MIMIC-IV/01_BioClinicalBert.py — aggregated note embeddings -> MLP with
    focal loss; embeddings come from the frozen chunked BioClinicalBERT
    encoder, computed ONCE per split (the TPU analogue of the reference's
    precomputed-embedding CSV).
  * INSPECT/BEHRT.py:62-90 — OMOP concept-embedding multitask model
    (see train_omop below).
  * INSPECT/BioClinicalBERT.py — radiology-impressions 4-task text model
    (pe/mort1m/read1m/ph12m): per-patient chunked Bio_ClinicalBERT
    embeddings aggregated mean/max/sum -> MLP, focal loss, age-bucket
    fairness groups. Driven as `train_unimodal(modality="note",
    tasks=(...4 INSPECT labels...))` over Batches built by
    data/inspect_etl.py:load_impressions_dataset.

Design: unlike the multimodal loop (train/loop.py), these drivers are small
single-modality fits — one jitted train step over the whole model, simple
host-side epoch loop with plateau + early stopping on val loss, metrics +
fairness JSON written to out_dir.
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodalrouting_tpu.configs import Config
from multimodalrouting_tpu.data.batches import Batch
from multimodalrouting_tpu.metrics.classification import epoch_metrics
from multimodalrouting_tpu.metrics.fairness import fairness_report
from multimodalrouting_tpu.models.inspect import OMOPConceptModel
from multimodalrouting_tpu.models.unimodal import NoteEmbeddingClassifier, WideBEHRTClassifier
from multimodalrouting_tpu.train.losses import bce_with_logits, focal_pos_weight_bce


class UnimodalResult(NamedTuple):
    params: Any
    metrics: Dict[str, Dict[str, float]]  # per task
    fairness: Dict[str, Any]  # per task fairness report
    history: List[Dict[str, float]]


def _pos_weight(y: np.ndarray) -> float:
    """neg/pos class weight (01_BEHRT.py:160-162 / 02_BEHRT class_weight)."""
    pos = float((y > 0.5).sum())
    neg = float((y <= 0.5).sum())
    return neg / pos if pos > 0 else 1.0


def _tasks_for(y: np.ndarray, task: str) -> Tuple[str, ...]:
    if y.ndim == 2 and y.shape[1] == 3:
        return ("mortality", "pe", "ph")
    return ("readmit",) if task == "readmit" else ("mortality",)


def _stack_y(y: np.ndarray) -> np.ndarray:
    return y if y.ndim == 2 else y[:, None]


def _fit(
    model,
    feats_train: np.ndarray,
    y_train: np.ndarray,
    feats_val: np.ndarray,
    y_val: np.ndarray,
    *,
    tasks: Tuple[str, ...],
    loss_kind: str,  # "pos_weight_bce" | "focal"
    focal_gamma: float,
    lr: float,
    weight_decay: float,
    batch_size: int,
    epochs: int,
    patience: int,
    seed: int,
    log_fn: Callable[[str], None],
    dict_output: bool = True,
) -> Tuple[Any, List[Dict[str, float]]]:
    """Shared fit loop: AdamW + clip(1.0), plateau(0.1, 2) and early stop on
    val loss (01_BEHRT.py:165-199 train())."""
    y_train2, y_val2 = _stack_y(y_train), _stack_y(y_val)
    pw = jnp.asarray([_pos_weight(y_train2[:, i]) for i in range(len(tasks))], jnp.float32)

    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.asarray(feats_train[:2]), deterministic=True)
    params = variables["params"]
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),  # 01_BEHRT.py:178 clip_grad_norm_(1.0)
        optax.adamw(learning_rate=1.0, weight_decay=weight_decay),
    )
    # LR applied as a traced multiplier so plateau moves need no recompiles
    opt_state = tx.init(params)

    def loss_fn(p, x, y, drop_rng):
        out = model.apply({"params": p}, x, deterministic=False, rngs={"dropout": drop_rng})
        logits = (
            jnp.stack([out[t] for t in tasks], axis=1) if dict_output else _stack_y(out)
        )
        if loss_kind == "focal":
            per = focal_pos_weight_bce(
                logits, y, gamma=focal_gamma, pos_weight=pw, reduce=False
            )
        else:
            per = bce_with_logits(logits, y, pos_weight=pw, reduce=False)
        # sum of per-task means (01_BEHRT.py:178 `sum(crit[i](...))`)
        return jnp.sum(jnp.mean(per, axis=0))

    @jax.jit
    def train_step(p, o, x, y, lr_scale, drop_rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y, drop_rng)
        updates, o2 = tx.update(grads, o, p)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        return optax.apply_updates(p, updates), o2, loss

    @jax.jit
    def val_logits(p, x):
        out = model.apply({"params": p}, x, deterministic=True)
        return jnp.stack([out[t] for t in tasks], axis=1) if dict_output else _stack_y(out)

    def val_loss(p) -> float:
        logits = np.asarray(val_logits(p, jnp.asarray(feats_val)))
        per = bce_with_logits(
            jnp.asarray(logits), jnp.asarray(y_val2), pos_weight=pw, reduce=False
        )
        return float(jnp.sum(jnp.mean(per, axis=0)))

    n = feats_train.shape[0]
    steps = max(n // batch_size, 1)
    np_rng = np.random.default_rng(seed)
    best, wait, plateau_wait = np.inf, 0, 0
    lr_scale = lr
    best_params = params
    history: List[Dict[str, float]] = []
    for ep in range(epochs):
        order = np_rng.permutation(n)
        tl = []
        for s in range(steps):
            sel = order[s * batch_size : (s + 1) * batch_size]
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(
                params, opt_state,
                jnp.asarray(feats_train[sel]), jnp.asarray(y_train2[sel]),
                jnp.asarray(lr_scale, jnp.float32), sub,
            )
            tl.append(float(loss))
        vl = val_loss(params)
        history.append({"epoch": ep, "train_loss": float(np.mean(tl)), "val_loss": vl})
        log_fn(f"[unimodal ep {ep:02d}] train {np.mean(tl):.4f} | val {vl:.4f}")
        if vl < best - 1e-6:
            best, wait, plateau_wait = vl, 0, 0
            best_params = jax.tree_util.tree_map(jnp.copy, params)
        else:
            wait += 1
            plateau_wait += 1
            if plateau_wait >= 2:  # ReduceLROnPlateau(factor=0.1, patience=2)
                lr_scale *= 0.1
                plateau_wait = 0
                log_fn(f"[unimodal] plateau: lr -> {lr_scale:.2e}")
            if wait >= patience:
                log_fn("[unimodal] early stopping")
                break
    return best_params, history


def _eval_and_fairness(
    model, params, feats, y, sens, tasks, dict_output=True
) -> Tuple[Dict[str, Dict[str, float]], Dict[str, Any]]:
    out = model.apply({"params": params}, jnp.asarray(feats), deterministic=True)
    logits = (
        np.stack([np.asarray(out[t]) for t in tasks], axis=1)
        if dict_output
        else _stack_y(np.asarray(out))
    )
    probs = 1.0 / (1.0 + np.exp(-logits))
    y2 = _stack_y(np.asarray(y))
    metrics = {
        t: epoch_metrics(y2[:, i], probs[:, i]) for i, t in enumerate(tasks)
    }
    fair: Dict[str, Any] = {}
    if sens is not None:
        groups = {"sens": np.asarray(sens)}
        fair = {t: fairness_report(groups, y2[:, i], probs[:, i]) for i, t in enumerate(tasks)}
    return metrics, fair


def _note_embeddings(cfg: Config, batches: List[Batch], seed: int = 0) -> List[np.ndarray]:
    """Frozen chunked BioClinicalBERT pooled embeddings, computed once per
    split (the reference precomputes these to CSV; 01_BioClinicalBert.py).

    Minibatched at train.batch_size with a clipped-gather padded tail so ONE
    static-shape program serves every split — jitting the whole split as one
    program both blows host/device memory at real scale and exceeds the
    remote-compile transport's request limit on tunneled TPU backends.
    """
    from multimodalrouting_tpu.models.clinbert import BioClinBERTEncoder

    e = cfg.encoder
    enc = BioClinBERTEncoder(
        d=e.d,
        vocab_size=e.bert_vocab_size,
        hidden=e.bert_hidden,
        layers=e.bert_layers,
        heads=e.bert_heads,
        intermediate=e.bert_intermediate,
        max_position=e.bert_max_position,
        note_agg=e.note_agg,
        chunk_agg=e.note_chunk_agg,
        gelu=e.bert_gelu,
        dtype=jnp.dtype(cfg.model.dtype),
    )
    bs = max(int(cfg.train.batch_size), 1)

    def sub_notes(b: Batch, idx: np.ndarray):
        return {
            "input_ids": jnp.asarray(np.asarray(b.note_ids)[idx]),
            "attention_mask": jnp.asarray(np.asarray(b.note_attn)[idx]),
            "chunk_mask": jnp.asarray(np.asarray(b.chunk_mask)[idx]),
        }

    variables = enc.init(
        jax.random.PRNGKey(seed), sub_notes(batches[0], np.arange(min(bs, batches[0].batch_size)))
    )
    if e.bert_weights:
        # pretrained body (01_BioClinicalBert.py embeds with the real
        # Bio_ClinicalBERT; random init is only a synthetic-demo fallback)
        from multimodalrouting_tpu.pretrained import load_bert_weights

        variables = dict(variables)
        variables["params"] = dict(variables["params"])
        variables["params"]["bert"] = load_bert_weights(
            e.bert_weights, e.bert_layers, variables["params"]["bert"]
        )
    # params MUST be a jit argument, not a closure capture: closed-over
    # concrete arrays are baked into the HLO as constants, and a ~400 MB
    # constant blob exceeds tunneled remote-compile transport limits
    # (HTTP 413) besides bloating the executable.
    variables = jax.device_put(variables)

    @jax.jit
    def embed(vs, notes):
        _, _, pooled = enc.apply(vs, notes)
        return pooled.astype(jnp.float32)

    out: List[np.ndarray] = []
    for b in batches:
        n = b.batch_size
        parts = []
        for start in range(0, n, bs):
            # pad the tail by repeating the last row (clipped gather keeps
            # the program shape static), trim on host
            idx = np.minimum(np.arange(start, start + bs), n - 1)
            parts.append(
                np.asarray(embed(variables, sub_notes(b, idx)))[: min(bs, n - start)]
            )
        out.append(np.concatenate(parts, axis=0))
    return out


def train_unimodal(
    cfg: Config,
    train_b: Batch,
    val_b: Batch,
    test_b: Optional[Batch] = None,
    *,
    modality: str = "behrt",  # behrt | note
    task: str = "mort",  # mort | readmit (behrt); task label source
    tasks: Optional[Tuple[str, ...]] = None,  # explicit task names (e.g. the
    # 4-task INSPECT impressions label set) override the y-shape inference
    out_dir: Optional[str] = None,
    log_fn: Callable[[str], None] = print,
) -> UnimodalResult:
    """Train one unimodal model and emit metrics + fairness JSON."""
    t = cfg.train
    y_tr, y_va = np.asarray(train_b.y), np.asarray(val_b.y)
    tasks = tuple(tasks) if tasks else _tasks_for(y_tr, task)
    test_b = test_b if test_b is not None else val_b
    y_te = np.asarray(test_b.y)

    if modality == "behrt":
        bsz, n_bins, n_labs = train_b.x_struct.shape
        model = WideBEHRTClassifier(
            n_bins=n_bins,
            n_labs=n_labs,
            d=cfg.encoder.d,
            n_layers=cfg.encoder.structured_layers,
            n_heads=cfg.encoder.structured_heads,
            tasks=tasks,
        )
        feats = [
            np.asarray(b.x_struct).reshape(b.batch_size, -1)
            for b in (train_b, val_b, test_b)
        ]
        dict_output = True
        # readmission uses focal gamma=2.5 (02_BEHRT.py:106); the 3-task
        # driver uses plain pos_weight BCE (01_BEHRT.py:170)
        loss_kind = "focal" if task == "readmit" else "pos_weight_bce"
        focal_gamma = 2.5
        lr = t.lr
    elif modality == "note":
        model = NoteEmbeddingClassifier(hidden=cfg.model.d, num_classes=len(tasks))
        feats = _note_embeddings(cfg, [train_b, val_b, test_b], seed=t.seed)
        dict_output = False
        loss_kind = "focal"
        focal_gamma = 2.0
        lr = t.lr
    else:
        raise ValueError(f"Unknown unimodal modality {modality!r} (behrt|note)")

    params, history = _fit(
        model, feats[0], y_tr, feats[1], y_va,
        tasks=tasks, loss_kind=loss_kind, focal_gamma=focal_gamma,
        lr=lr, weight_decay=t.weight_decay, batch_size=t.batch_size,
        epochs=t.epochs, patience=t.early_stop_patience, seed=t.seed,
        log_fn=log_fn, dict_output=dict_output,
    )
    metrics, fair = _eval_and_fairness(
        model, params, feats[2], y_te, test_b.sens, tasks, dict_output=dict_output
    )
    for name, m in metrics.items():
        log_fn(
            f"[unimodal {modality}:{name}] AUROC {m.get('auroc', float('nan')):.4f} "
            f"F1 {m.get('f1', float('nan')):.4f}"
        )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "unimodal_metrics.json"), "w") as f:
            json.dump({"modality": modality, "tasks": list(tasks), "metrics": metrics,
                       "history": history}, f, indent=2, default=float)
        with open(os.path.join(out_dir, "fairness.json"), "w") as f:
            json.dump(fair, f, indent=2, default=float)
    return UnimodalResult(params=params, metrics=metrics, fairness=fair, history=history)


def train_omop(
    data: Dict[str, Dict[str, np.ndarray]],  # split -> {proc, meas, drug, y[B,K], sens?}
    *,
    vocab_sizes: Tuple[int, int, int],
    tasks: Tuple[str, ...] = ("pe", "mort1m", "read1m", "ph12m"),
    hidden: int = 128,
    lr: float = 1e-3,
    weight_decay: float = 1e-2,
    batch_size: int = 32,
    epochs: int = 20,
    patience: int = 5,
    seed: int = 0,
    out_dir: Optional[str] = None,
    log_fn: Callable[[str], None] = print,
) -> UnimodalResult:
    """INSPECT OMOP concept multitask driver (INSPECT/BEHRT.py:62-90).

    data splits: "train"/"val"(/"test") each mapping proc/meas/drug concept-id
    arrays + y [B, len(tasks)] labels (+ optional sens groups)."""
    from flax import linen as nn

    class _OMOPStacked(nn.Module):
        """Adapter: single stacked [B,3(,T)] id tensor -> (proc, meas, drug)."""

        @nn.compact
        def __call__(self, x, deterministic: bool = True):
            return OMOPConceptModel(
                num_proc_codes=vocab_sizes[0],
                num_meas_codes=vocab_sizes[1],
                num_drug_codes=vocab_sizes[2],
                hidden=hidden,
                tasks=tasks,
                name="omop",
            )(x[:, 0], x[:, 1], x[:, 2], deterministic=deterministic)

    def pack(split):
        d = data[split]
        return (
            np.stack([d["proc"], d["meas"], d["drug"]], axis=1),  # [B, 3(, T)]
            np.asarray(d["y"], np.float32),
        )

    wrapped = _OMOPStacked()
    x_tr, y_tr = pack("train")
    x_va, y_va = pack("val")
    params, history = _fit(
        wrapped, x_tr, y_tr, x_va, y_va,
        tasks=tasks, loss_kind="pos_weight_bce", focal_gamma=2.0,
        lr=lr, weight_decay=weight_decay, batch_size=batch_size,
        epochs=epochs, patience=patience, seed=seed, log_fn=log_fn,
    )
    test_split = "test" if "test" in data else "val"
    x_te, y_te = pack(test_split)
    metrics, fair = _eval_and_fairness(
        wrapped, params, x_te, y_te, data[test_split].get("sens"), tasks
    )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "unimodal_metrics.json"), "w") as f:
            json.dump({"modality": "omop", "tasks": list(tasks), "metrics": metrics,
                       "history": history}, f, indent=2, default=float)
        with open(os.path.join(out_dir, "fairness.json"), "w") as f:
            json.dump(fair, f, indent=2, default=float)
    return UnimodalResult(params=params, metrics=metrics, fairness=fair, history=history)


def train_ct(
    data: Dict[str, Dict[str, np.ndarray]],  # split -> {x[B,S,H,W,C], y[B,K], sens?}
    *,
    tasks: Tuple[str, ...] = ("pe", "mort1m", "read1m", "ph12m"),
    hidden: int = 128,
    backbone: str = "resnet18",
    lr: float = 1e-3,
    weight_decay: float = 1e-2,
    batch_size: int = 32,
    epochs: int = 20,
    patience: int = 5,
    seed: int = 0,
    out_dir: Optional[str] = None,
    log_fn: Callable[[str], None] = print,
) -> UnimodalResult:
    """INSPECT CT-volume multitask driver.

    Parity target: the reference's INSPECT image encoder is a CT/CXR switch
    whose CT branch runs a 2D backbone per slice and averages slice features
    (INSPECT/models/encoders.py:119-207, slice-averaging at :198-206), feeding
    the INSPECT task heads. Here CTVolumeEncoder folds the slice axis into
    the batch for one fused conv program and the four task heads mirror
    train_omop's. Group norm keeps the driver free of mutable batch stats.
    """
    from flax import linen as nn

    from multimodalrouting_tpu.models.inspect import CTVolumeEncoder

    class _CTMultitask(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic: bool = True):
            z = CTVolumeEncoder(
                d=hidden, backbone=backbone, norm_kind="group", name="ct"
            )(x, train=not deterministic)
            return {t: nn.Dense(1, name=f"head_{t}")(z)[:, 0] for t in tasks}

    def pack(split):
        d = data[split]
        return np.asarray(d["x"], np.float32), np.asarray(d["y"], np.float32)

    wrapped = _CTMultitask()
    x_tr, y_tr = pack("train")
    x_va, y_va = pack("val")
    params, history = _fit(
        wrapped, x_tr, y_tr, x_va, y_va,
        tasks=tasks, loss_kind="pos_weight_bce", focal_gamma=2.0,
        lr=lr, weight_decay=weight_decay, batch_size=batch_size,
        epochs=epochs, patience=patience, seed=seed, log_fn=log_fn,
    )
    test_split = "test" if "test" in data else "val"
    x_te, y_te = pack(test_split)
    metrics, fair = _eval_and_fairness(
        wrapped, params, x_te, y_te, data[test_split].get("sens"), tasks
    )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "unimodal_metrics.json"), "w") as f:
            json.dump({"modality": "ct", "tasks": list(tasks), "metrics": metrics,
                       "history": history}, f, indent=2, default=float)
        with open(os.path.join(out_dir, "fairness.json"), "w") as f:
            json.dump(fair, f, indent=2, default=float)
    return UnimodalResult(params=params, metrics=metrics, fairness=fair, history=history)
