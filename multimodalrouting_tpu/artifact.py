"""Versioned serving artifacts: checkpoint -> serialized StableHLO program.

The reference ships no deployable model artifact at all — "deploying" it
means carrying the full training codebase plus a `.pt` file and re-running
model-construction Python at load (`Model/inference_demo.py:60-150`). This
module packages a trained checkpoint as a **self-contained serving
artifact** the TPU-native way:

- ``program.jaxexp`` — the full eval program (encoders -> MULT -> routing ->
  capsule, EMA weights selected, route masks derived from presence flags)
  exported with :mod:`jax.export` as serialized StableHLO. Loading it needs
  NO model code — flax modules, route registries, and config plumbing stay
  behind at export time; version skew between training code and serving
  fleet disappears.
- ``variables.msgpack`` — the eval weights (EMA when the run tracked it) as
  a plain flax-msgpack tree.
- ``meta.json`` — task/family/routes, the VAL-fitted temperature and
  per-label thresholds (reference main.py:3428-3471), static serving shapes,
  and the full config (so record assembly matches the checkpoint).

Cross-platform: exporting from a CPU process with ``platforms=("cpu","tpu")``
traces the portable XLA path once and lowers it for both targets, so CI can
build and smoke-test the exact artifact a TPU fleet serves. (Exporting from
a TPU process traces the pallas flash-attention kernel, which pins the
artifact to TPU — the default ``platforms=None`` exports for the current
backend only.)

``ExportedPredictor`` duck-types :class:`serve.Predictor` (predict /
predict_records / routes / temperature ...), so the JSONL and HTTP frontends
(`serve.write_predictions_jsonl`, `serve.make_http_server`, `cli predict`)
serve an artifact unchanged.
"""
from __future__ import annotations

import json
import os
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

from multimodalrouting_tpu.data.batches import Batch

_PROGRAM = "program.jaxexp"
_VARIABLES = "variables.msgpack"
_META = "meta.json"

# Batch fields the serving program consumes (y/sens are never inputs to the
# eval forward; note_chunk_embs/chexpert are train-time surfaces).
_FIELDS = (
    "x_struct", "m_struct", "note_ids", "note_attn", "chunk_mask",
    "image", "has_l", "has_n", "has_i",
)


def _batch_arrays(batch: Batch) -> Dict[str, np.ndarray]:
    return {f: np.asarray(getattr(batch, f)) for f in _FIELDS}


def export_serving_artifact(
    predictor,
    out_dir: str,
    *,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Export a loaded :class:`serve.Predictor` as a serving artifact dir.

    The exported program is the same computation `Predictor.predict` runs:
    eval-mode apply with EMA weights, presence-derived route masks, and the
    (frozen) route-loss EMA baked in for loss-based sMRO gates. Calibration
    (temperature/thresholds) is applied host-side by the loader, exactly as
    `Predictor` does, so exported and live predictions match bit-for-bit.
    """
    import jax
    from jax import export as jax_export
    from flax import serialization

    from multimodalrouting_tpu.configs import to_dict
    from multimodalrouting_tpu.routes import get_routes, route_mask_from_presence
    from multimodalrouting_tpu.serve import batch_from_records

    cfg, model, family = predictor.cfg, predictor.model, predictor.family
    state = predictor.state
    routes = get_routes(cfg.model.routes if family == "capsule" else "7")
    track_route_ema = (
        predictor.loss_family == "fame" and cfg.model.smro_gate_mode == "loss_based"
    )

    params = state.ema_params if state.ema_params is not None else state.params
    variables = {"params": jax.device_get(params)}
    if state.batch_stats:
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    rle = (
        np.asarray(jax.device_get(state.route_loss_ema))
        if track_route_ema and getattr(state, "route_loss_ema", None) is not None
        else None
    )

    def serving_fn(variables, arrays):
        batch = Batch(
            x_struct=arrays["x_struct"], m_struct=arrays["m_struct"],
            note_ids=arrays["note_ids"], note_attn=arrays["note_attn"],
            chunk_mask=arrays["chunk_mask"], image=arrays["image"],
            has_l=arrays["has_l"], has_n=arrays["has_n"], has_i=arrays["has_i"],
            y=arrays["has_l"],  # unused by eval forward; keeps Batch total
        )
        kwargs = {}
        if family == "capsule":
            kwargs["route_mask"] = route_mask_from_presence(
                batch.has_l, batch.has_n, batch.has_i, routes
            )
        if rle is not None:
            kwargs["route_losses_ema"] = rle
        out = model.apply(variables, batch, train=False, **kwargs)
        return out.logits, out.alpha, out.r_matrix

    example = batch_from_records(cfg, [{} for _ in range(predictor.batch_size)])
    arrays = _batch_arrays(example)
    kw = {"platforms": list(platforms)} if platforms else {}
    exported = jax_export.export(jax.jit(serving_fn), **kw)(variables, arrays)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PROGRAM), "wb") as fh:
        fh.write(exported.serialize())
    with open(os.path.join(out_dir, _VARIABLES), "wb") as fh:
        fh.write(serialization.msgpack_serialize(variables))
    meta = {
        "format_version": 1,
        "family": family,
        "task": predictor.task,
        "routes": list(predictor.routes),
        "temperature": predictor.temperature,
        "thresholds": (
            None if predictor.thresholds is None else predictor.thresholds.tolist()
        ),
        "batch_size": predictor.batch_size,
        "platforms": list(exported.platforms),
        "config": to_dict(cfg),
    }
    with open(os.path.join(out_dir, _META), "w") as fh:
        json.dump(meta, fh, indent=1)
    return out_dir


class ExportedPredictor:
    """Serve a `export_serving_artifact` directory — no model code needed.

    Duck-types `serve.Predictor`: `predict(batch)` / `predict_records` /
    `warmup` plus the attributes the HTTP/JSONL frontends read, so
    `serve.make_http_server(ExportedPredictor(dir))` works as-is.
    """

    def __init__(self, artifact_dir: str):
        import jax
        from jax import export as jax_export
        from flax import serialization

        from multimodalrouting_tpu.configs import from_dict

        with open(os.path.join(artifact_dir, _META)) as fh:
            meta = json.load(fh)
        if meta.get("format_version") != 1:
            raise ValueError(
                f"unsupported artifact format_version {meta.get('format_version')!r}"
            )
        self.cfg = from_dict(meta["config"])
        self.family: str = meta["family"]
        self.task: str = meta["task"]
        self.routes: List[str] = list(meta["routes"])
        self.temperature = float(meta["temperature"])
        th = meta["thresholds"]
        self.thresholds = None if th is None else np.asarray(th, np.float64)
        self.batch_size = int(meta["batch_size"])
        self.platforms: List[str] = list(meta.get("platforms", []))

        with open(os.path.join(artifact_dir, _PROGRAM), "rb") as fh:
            self._exported = jax_export.deserialize(bytearray(fh.read()))
        with open(os.path.join(artifact_dir, _VARIABLES), "rb") as fh:
            variables = serialization.msgpack_restore(fh.read())
        # one device_put at load, same rationale as Predictor
        self._variables = jax.device_put(variables)
        self._call = jax.jit(self._exported.call)
        self._lock = threading.Lock()

    def warmup(self) -> None:
        from multimodalrouting_tpu.serve import batch_from_records

        self.predict(batch_from_records(self.cfg, [{}]))

    def predict(self, batch: Batch) -> Dict[str, np.ndarray]:
        from multimodalrouting_tpu.serve import calibrate_probs, decide, probs_from_logits

        n = batch.batch_size
        bs = self.batch_size
        probs_l, alphas, rms = [], [], []
        with self._lock:
            for start in range(0, n, bs):
                # clipped-gather padding: the tail request pads to the static
                # serving batch so the exported program never re-specializes
                idx = np.minimum(np.arange(start, start + bs), n - 1)
                sub = Batch(*(None if v is None else v[idx] for v in batch))
                logits, alpha, rm = self._call(self._variables, _batch_arrays(sub))
                k = min(bs, n - start)
                probs_l.append(probs_from_logits(np.asarray(logits), self.task)[:k])
                if alpha is not None:
                    alphas.append(np.asarray(alpha)[:k])
                if rm is not None:
                    rms.append(np.asarray(rm)[:k])
        probs = calibrate_probs(np.concatenate(probs_l, 0), self.temperature)
        out: Dict[str, np.ndarray] = {"probs": probs, "pred": decide(probs, self.thresholds)}
        if alphas:
            out["alpha"] = np.concatenate(alphas, 0)
        if rms:
            out["r_matrix"] = np.concatenate(rms, 0)
        return out

    def predict_records(self, records: Sequence[Dict]) -> List[Dict]:
        from multimodalrouting_tpu.serve import batch_from_records

        batch = batch_from_records(self.cfg, records)
        out = self.predict(batch)
        return self._rows_from_output(out, len(records))

    def _rows_from_output(self, out: Dict[str, np.ndarray], n: int) -> List[Dict]:
        from multimodalrouting_tpu.serve import rows_from_output

        return rows_from_output(out, n, self.routes, self.temperature)
