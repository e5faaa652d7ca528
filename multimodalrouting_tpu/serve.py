"""Production inference surface: checkpoint -> predictor -> JSONL / HTTP.

The reference has no serving story — inference is demo prints
(`MIMIC-IV/Model/inference_demo.py:242`) or in-main TEST reports inside the
training scripts. This module packages a trained checkpoint as a product:

- **One static-shape jitted program.** Requests are padded (clipped-gather,
  same trick as `train/loop._predict_probs`) to a fixed serving batch, so the
  XLA program compiles once at `warmup()` and every request reuses it — no
  per-request recompiles, which on a remote-AOT TPU tunnel would cost minutes.
- **Calibrated outputs.** The VAL-fitted temperature and per-label decision
  thresholds persisted with the checkpoint (reference
  `MortModel/Paired_Cross_Attention/main.py:3428-3471`) are applied to every
  prediction, so the serving path emits the same calibrated probabilities and
  hard decisions the training run validated.
- **Route-audit per request.** Each prediction carries the per-route
  activations alpha [R] and routing matrix R [R, K] plus the top routes — the
  framework's signature interpretability output (SURVEY.md §5.5), streamed
  from device asynchronously.

Serving is single-device by design: one chip fits the full model with room
to spare (the multi-chip mesh exists for training throughput), so the
predictor deliberately takes no mesh — replicate whole Predictors for
horizontal scale instead.

Request records are plain dicts of (possibly missing) modality arrays;
`batch_from_records` pads/crops them to the checkpoint's static shapes and
derives `has_*` presence flags from which modalities were actually provided
(missing modalities are zeroed AND masked, never silently imputed — the
loader-level `has_i` contract, `data/loader.py`).
"""
from __future__ import annotations

import json
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

from multimodalrouting_tpu.configs import Config
from multimodalrouting_tpu.data.batches import Batch


def _serving_shapes(cfg: Config) -> Dict[str, int]:
    """Static per-sample shapes of the serving program.

    Mirrors `cli._load_data`'s synthetic clipping so a checkpoint trained on
    the synthetic cohort serves the shapes it was validated on; real-cohort
    checkpoints (data_root set) serve the full configured shapes.
    """
    synth = cfg.data.synthetic or not cfg.data.data_root
    return {
        "t": cfg.encoder.structured_seq_len,
        "f": cfg.encoder.structured_n_feats,
        "s": cfg.encoder.notes_max_chunks,
        "l": min(cfg.encoder.text_max_len, 128) if synth else cfg.encoder.text_max_len,
        "hw": min(cfg.encoder.image_size, 96) if synth else cfg.encoder.image_size,
        "k": 25 if cfg.model.task == "pheno" else 1,
    }


def _fit_axis(a: np.ndarray, axis: int, size: int) -> np.ndarray:
    """Pad with zeros (trailing) or crop an axis to `size`."""
    cur = a.shape[axis]
    if cur == size:
        return a
    if cur > size:
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(0, size)
        return a[tuple(sl)]
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - cur)
    return np.pad(a, pad)


def batch_from_records(cfg: Config, records: Sequence[Dict]) -> Batch:
    """Assemble request records into one static-shape host Batch.

    Each record may provide any subset of:
      - ``x_struct`` [T, F] (+ optional ``m_struct`` [T], default all-valid)
      - ``note_ids`` [S, L] int token ids (+ optional ``note_attn`` [S, L],
        default nonzero-id mask; optional ``chunk_mask`` [S], default
        any-token-present)
      - ``image`` [H, W, 3] float
      - ``y`` scalar or [K] (optional; serving never requires labels)
      - ``sens`` scalar group id (optional)
    Presence flags are derived from which modalities the record carries.
    """
    sh = _serving_shapes(cfg)
    n = len(records)
    t, f, s, l, hw, k = sh["t"], sh["f"], sh["s"], sh["l"], sh["hw"], sh["k"]

    x_struct = np.zeros((n, t, f), np.float32)
    m_struct = np.zeros((n, t), np.float32)
    note_ids = np.zeros((n, s, l), np.int32)
    note_attn = np.zeros((n, s, l), np.int32)
    chunk_mask = np.zeros((n, s), np.float32)
    image = np.zeros((n, hw, hw, 3), np.float32)
    has_l = np.zeros((n,), np.float32)
    has_n = np.zeros((n,), np.float32)
    has_i = np.zeros((n,), np.float32)
    y = np.zeros((n,) if k == 1 else (n, k), np.float32)
    sens = np.zeros((n,), np.int32)

    for i, rec in enumerate(records):
        if rec.get("x_struct") is not None:
            xs = np.asarray(rec["x_struct"], np.float32)
            if xs.ndim != 2:
                raise ValueError(f"record {i}: x_struct must be [T,F], got {xs.shape}")
            x_struct[i] = _fit_axis(_fit_axis(xs, 0, t), 1, f)
            if rec.get("m_struct") is not None:
                m_struct[i] = _fit_axis(np.asarray(rec["m_struct"], np.float32), 0, t)
            else:
                m_struct[i, : min(xs.shape[0], t)] = 1.0
            has_l[i] = 1.0
        if rec.get("note_ids") is not None:
            ids = np.asarray(rec["note_ids"], np.int64)
            if ids.ndim != 2:
                raise ValueError(f"record {i}: note_ids must be [S,L], got {ids.shape}")
            ids = _fit_axis(_fit_axis(ids, 0, s), 1, l)
            note_ids[i] = ids.astype(np.int32)
            if rec.get("note_attn") is not None:
                note_attn[i] = _fit_axis(
                    _fit_axis(np.asarray(rec["note_attn"], np.int64), 0, s), 1, l
                ).astype(np.int32)
            else:
                note_attn[i] = (ids != 0).astype(np.int32)
            if rec.get("chunk_mask") is not None:
                chunk_mask[i] = _fit_axis(np.asarray(rec["chunk_mask"], np.float32), 0, s)
            else:
                chunk_mask[i] = (note_attn[i].sum(axis=-1) > 0).astype(np.float32)
            has_n[i] = float(chunk_mask[i].any())
        if rec.get("image") is not None:
            img = np.asarray(rec["image"], np.float32)
            if img.ndim != 3 or img.shape[-1] != 3:
                raise ValueError(f"record {i}: image must be [H,W,3], got {img.shape}")
            image[i] = _fit_axis(_fit_axis(img, 0, hw), 1, hw)
            has_i[i] = 1.0
        if rec.get("y") is not None:
            y[i] = np.asarray(rec["y"], np.float32)
        if rec.get("sens") is not None:
            sens[i] = int(rec["sens"])

    return Batch(
        x_struct=x_struct, m_struct=m_struct, note_ids=note_ids, note_attn=note_attn,
        chunk_mask=chunk_mask, image=image, has_l=has_l, has_n=has_n, has_i=has_i,
        y=y, sens=sens,
    )


def probs_from_logits(logits: np.ndarray, task: str) -> np.ndarray:
    """Logits -> probabilities with the mort 2-class death-logit contrast
    (reference main.py:3092: death_logit = logits[:,1] - logits[:,0])."""
    if task == "mort" and logits.ndim == 2 and logits.shape[-1] == 2:
        return 1.0 / (1.0 + np.exp(-(logits[:, 1] - logits[:, 0])))
    return 1.0 / (1.0 + np.exp(-logits))


def calibrate_probs(probs: np.ndarray, temperature: float) -> np.ndarray:
    """Apply the VAL-fitted temperature in logit space (identity at T=1)."""
    if temperature == 1.0:
        return probs
    eps = 1e-7
    p = np.clip(probs, eps, 1 - eps)
    logits = np.log(p) - np.log1p(-p)
    return 1.0 / (1.0 + np.exp(-logits / temperature))


def decide(probs: np.ndarray, thresholds: Optional[np.ndarray]) -> np.ndarray:
    """Hard decisions from calibrated probs + per-label thresholds."""
    if thresholds is not None:
        th = thresholds if probs.ndim == 2 else float(thresholds[0])
        return (probs >= th).astype(np.int32)
    return (probs >= 0.5).astype(np.int32)


def rows_from_output(
    out: Dict[str, np.ndarray], n: int, routes: Sequence[str], temperature: float
) -> List[Dict]:
    """Per-sample JSON-safe rows (shared by Predictor and ExportedPredictor)."""
    results = []
    for i in range(n):
        row: Dict = {
            "probs": np.round(out["probs"][i], 6).tolist(),
            "pred": out["pred"][i].tolist(),
            "temperature": temperature,
        }
        if "alpha" in out and out["alpha"] is not None:
            a = np.asarray(out["alpha"][i], np.float64).reshape(-1)
            row["alpha"] = {r: round(float(v), 6) for r, v in zip(routes, a)}
            order = np.argsort(-a)[:3]
            row["top_routes"] = [routes[j] for j in order]
        results.append(row)
    return results


class Predictor:
    """Load a checkpoint once; serve calibrated predictions + route audit.

    `predict(batch)` accepts any request size: it is sliced/padded to the
    static serving batch (`batch_size`, default = the training batch size)
    so every call hits the same compiled program.
    """

    def __init__(
        self,
        ckpt_dir: str,
        family: str = "capsule",
        *,
        name: str = "final",
        batch_size: Optional[int] = None,
    ):
        import jax

        from multimodalrouting_tpu.ckpt import load_config, load_meta, restore_checkpoint
        from multimodalrouting_tpu.routes import get_routes
        from multimodalrouting_tpu.train.state import create_train_state, n_route_loss_ema_for
        from multimodalrouting_tpu.train.steps import make_eval_step

        cfg = load_config(ckpt_dir, name)
        self.cfg = cfg
        self.family = family
        self.batch_size = int(batch_size or cfg.train.batch_size)
        self.task = cfg.model.task
        self.ckpt_dir = ckpt_dir

        if family in ("late_fusion", "trimf"):
            from multimodalrouting_tpu.models.baselines import build_baseline

            model = build_baseline(cfg, family)
        else:
            from multimodalrouting_tpu.models.full import build_model

            model = build_model(cfg, family)

        example = batch_from_records(cfg, [{} for _ in range(self.batch_size)])
        variables = model.init(jax.random.PRNGKey(0), example, train=False)
        loss_family = family if family in ("capsule", "gated_concat", "fame") else "fame"
        state = create_train_state(
            cfg, model, variables,
            n_route_loss_ema=n_route_loss_ema_for(cfg, loss_family),
        )
        state = restore_checkpoint(ckpt_dir, state, name=name)
        # one device_put at load: per-request upload of the full param tree
        # through the (remote) transport would dominate serving latency
        self.state = jax.device_put(state)
        self.model = model
        self.loss_family = loss_family
        self._eval_step = make_eval_step(cfg, model, loss_family)

        meta = load_meta(ckpt_dir, name)
        self.temperature = float(meta.get("temperature", 1.0) or 1.0)
        th = meta.get("thresholds")
        self.thresholds = np.asarray(th, np.float64) if th else None
        self.routes: List[str] = list(
            get_routes(cfg.model.routes if family == "capsule" else "7")
        )
        self._lock = threading.Lock()  # jit dispatch is thread-safe; request
        # ordering through the single device queue is what we serialize

    def warmup(self) -> None:
        """Compile the serving program ahead of the first request."""
        self.predict(batch_from_records(self.cfg, [{}]))

    def predict(self, batch: Batch) -> Dict[str, np.ndarray]:
        """Run the serving program; returns calibrated per-sample outputs.

        Output dict: probs [N] or [N,K], pred (thresholded ints), and when
        the family exposes routing: alpha [N,R], r_matrix [N,R,K].
        """
        from multimodalrouting_tpu.train.loop import _predict_probs

        with self._lock:
            probs, alpha, r_matrix = _predict_probs(
                self._eval_step, self.state, batch, self.batch_size, self.task
            )
        probs = calibrate_probs(probs, self.temperature)
        pred = decide(probs, self.thresholds)
        out: Dict[str, np.ndarray] = {"probs": probs, "pred": pred}
        if alpha is not None:
            out["alpha"] = alpha
        if r_matrix is not None:
            out["r_matrix"] = r_matrix
        return out

    def predict_records(self, records: Sequence[Dict]) -> List[Dict]:
        """records (dicts of modality arrays) -> one JSON-safe dict each."""
        batch = batch_from_records(self.cfg, records)
        out = self.predict(batch)
        return self._rows_from_output(out, len(records))

    def _rows_from_output(self, out: Dict[str, np.ndarray], n: int) -> List[Dict]:
        return rows_from_output(out, n, self.routes, self.temperature)


def write_predictions_jsonl(
    predictor: Predictor,
    batch: Batch,
    out_path: str,
    stay_ids: Optional[np.ndarray] = None,
) -> int:
    """Score a whole cohort Batch; one JSON line per stay. Returns row count."""
    out = predictor.predict(batch)
    n = len(out["probs"])
    with open(out_path, "w") as fh:
        for i in range(n):
            row: Dict = {
                "probs": np.round(out["probs"][i], 6).tolist(),
                "pred": out["pred"][i].tolist(),
            }
            if stay_ids is not None:
                row["stay_id"] = int(stay_ids[i])
            if "alpha" in out and out["alpha"] is not None:
                a = np.asarray(out["alpha"][i], np.float64).reshape(-1)
                order = np.argsort(-a)[:3]
                row["top_routes"] = [predictor.routes[j] for j in order]
            fh.write(json.dumps(row) + "\n")
    return n


def make_http_server(predictor: Predictor, port: int = 0, host: str = "127.0.0.1"):
    """A minimal JSON-over-HTTP server around a Predictor.

    POST /predict  body {"records": [...]} -> {"predictions": [...]}
    GET  /health   -> {"ok": true, "family": ..., "task": ..., "routes": [...]}

    Returns the (unstarted) ThreadingHTTPServer; callers own its lifecycle
    (`serve_forever()` / `shutdown()`), so tests can run it on an ephemeral
    port in a thread.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    pred = predictor

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: Dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/health":
                self._send(200, {
                    "ok": True, "family": pred.family, "task": pred.task,
                    "routes": pred.routes, "batch_size": pred.batch_size,
                    "temperature": pred.temperature,
                })
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                records = req.get("records")
                if not isinstance(records, list) or not records:
                    raise ValueError("body must be {'records': [<record>, ...]}")
            except (ValueError, TypeError, KeyError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
                return
            try:
                batch = batch_from_records(pred.cfg, records)
            except (ValueError, TypeError, KeyError) as e:
                self._send(400, {"error": str(e)})  # malformed record shapes
                return
            try:
                out = pred.predict(batch)
                self._send(200, {"predictions": pred._rows_from_output(out, len(records))})
            except Exception as e:  # server-side failure (device/internal),
                # NOT the client's fault: 500 so monitors retry/alert instead
                # of dropping the request as malformed
                self._send(500, {"error": str(e)})

        def log_message(self, fmt, *a):  # quiet: one line per request is noise
            pass

    return ThreadingHTTPServer((host, port), Handler)
