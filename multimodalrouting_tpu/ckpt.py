"""Checkpointing: one pytree {params, opt_state, ema, batch_stats, step,
config, thresholds} with step-granular resume.

Replaces the reference's torch.save dicts (reference: MIMIC-IV/MortModel/
Paired_Cross_Attention/main.py:3336-3358 last/best/best_f1 checkpoints,
load_checkpoint:2024-2037). Unlike the reference, EMA shadow weights ARE
persisted (the reference rebuilds them per run — SURVEY.md §5.4).

Backends (train.ckpt_backend):
  msgpack (default) — one portable flax-msgpack file per checkpoint
    ({name}.msgpack); state is gathered to host and written synchronously.
  orbax — orbax-checkpoint directory ({name}.orbax/); sharded arrays are
    written per-shard by their owning hosts (no full gather through one
    process), the natural layout for the multi-chip product path.
  orbax_async — orbax with background saves: save_checkpoint returns as soon
    as device buffers are snapshotted and the write proceeds in a background
    thread (wait_for_saves() blocks on completion; restore waits implicitly).

restore_checkpoint auto-detects the on-disk format, so checkpoints written by
either backend restore through the same call (and cross-backend: a run can
resume an orbax checkpoint while configured for msgpack, and vice versa).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
from flax import serialization

from multimodalrouting_tpu.configs import Config, from_dict, to_dict

_ASYNC_CKPTR = None  # lazy singleton AsyncCheckpointer (one background thread)


def _orbax_checkpointer(async_: bool):
    import orbax.checkpoint as ocp

    if not async_:
        return ocp.StandardCheckpointer()
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until all in-flight orbax_async checkpoint writes are durable.

    Call before process exit (train_model does) — async saves otherwise race
    interpreter teardown. No-op for sync backends."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _state_dict(state) -> Dict[str, Any]:
    d = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
    }
    # optional route-loss EMA buffer (loss-based sMRO gate); keyed only when
    # tracked so older checkpoints restore unchanged
    if getattr(state, "route_loss_ema", None) is not None:
        d["route_loss_ema"] = state.route_loss_ema
    return d


def save_checkpoint(
    ckpt_dir: str,
    state,
    cfg: Config,
    *,
    name: str = "last",
    thresholds=None,
    extra: Optional[Dict[str, Any]] = None,
    backend: str = "msgpack",
) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = serialization.to_state_dict(_state_dict(state))
    if backend in ("orbax", "orbax_async"):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"{name}.orbax"))
        ckptr = _orbax_checkpointer(backend == "orbax_async")
        if backend == "orbax_async":
            # an in-flight write to the same name must land before we replace it
            ckptr.wait_until_finished()
        if jax.process_count() > 1:
            # one deleter, fenced on both sides: peers must be done with the
            # old dir before rank 0 removes it, and must not start the new
            # save into a dir that is still being deleted
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_pre_rm:{name}")
            if jax.process_index() == 0 and os.path.exists(path):
                shutil.rmtree(path)  # orbax refuses to overwrite a finalized dir
            multihost_utils.sync_global_devices(f"ckpt_post_rm:{name}")
        elif os.path.exists(path):
            shutil.rmtree(path)  # orbax refuses to overwrite a finalized dir
        if backend == "orbax_async":
            ckptr.save(path, args=ocp.args.StandardSave(payload))
        else:
            # StandardCheckpointer is async under the hood (orbax >= 0.11);
            # 'orbax' means synchronous-on-return, so block on the commit
            ckptr.save(path, payload)
            ckptr.wait_until_finished()
    elif backend == "msgpack":
        path = os.path.join(ckpt_dir, f"{name}.msgpack")
        # multihost: gather cross-process-sharded leaves (ZeRO/TP/PP states)
        # to every host, then only process 0 writes — peers on a shared
        # filesystem must not race the same file (orbax is the per-shard
        # alternative that avoids the full gather)
        from multimodalrouting_tpu.parallel.mesh import host_gather

        host_payload = jax.tree_util.tree_map(host_gather, payload)
        if jax.process_index() == 0:
            with open(path, "wb") as f:
                f.write(serialization.msgpack_serialize(host_payload))
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    if jax.process_index() == 0:  # meta is identical everywhere; one writer
        meta = {
            "config": to_dict(cfg),
            "step": int(jax.device_get(state.step)),
            "thresholds": None if thresholds is None else list(map(float, thresholds)),
            **(extra or {}),
        }
        with open(os.path.join(ckpt_dir, f"{name}.meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    if jax.process_count() > 1:
        # peers must not read (restore/resume) before the writer finishes
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_save:{name}")
    return path


def _cast_like(template, tree):
    """Cast restored leaves to the template's per-leaf dtypes (the template
    defines the run's working precision — e.g. frozen-BERT bf16 at rest must
    survive restoring an fp32-era checkpoint, and vice versa)."""
    import numpy as np

    def cast(t, v):
        if hasattr(t, "dtype") and hasattr(v, "dtype") and t.dtype != v.dtype:
            return np.asarray(v).astype(t.dtype) if isinstance(v, np.ndarray) else v.astype(t.dtype)
        return v

    return jax.tree_util.tree_map(cast, template, tree)


def _convert_bert_layouts(template, restored, changed=None):
    """Auto-convert BERT param layouts between layered (`layer_i/...`) and
    pipeline-parallel (`pp_layers` stacked, parallel/pp.py) wherever the
    template and the restored tree disagree — a PP run can warm-start from a
    replicated-era checkpoint and vice versa. Returns the converted tree;
    appends to `changed` when a conversion happened."""
    if not (isinstance(template, dict) and isinstance(restored, dict)):
        return restored
    if "pp_layers" in template and "layer_0" in restored:
        from multimodalrouting_tpu.parallel.pp import to_pp_layout

        restored = to_pp_layout(restored)
        if changed is not None:
            changed.append("to_pp")
    elif "layer_0" in template and "pp_layers" in restored:
        from multimodalrouting_tpu.parallel.pp import from_pp_layout

        restored = from_pp_layout(restored)
        if changed is not None:
            changed.append("from_pp")
    return {
        k: _convert_bert_layouts(template.get(k), v, changed) if k in template else v
        for k, v in restored.items()
    }


def restore_checkpoint(ckpt_dir: str, state, *, name: str = "last", params_only: bool = False):
    """Restore into an existing TrainState template (shapes must match).

    params_only=True restores params/batch_stats/EMA but keeps the fresh
    optimizer state and step counter — the stage-chaining semantics of the
    reference's step2/step3 warm starts (fresh optimizers per stage; full
    restore is the --resume path). Restored weight leaves are cast to the
    template's dtypes (see _cast_like). BERT param layouts are auto-converted
    when the checkpoint and the template disagree (pipeline-parallel runs use
    the stacked `pp_layers` layout — see _convert_bert_layouts).
    """
    wait_for_saves()  # an orbax_async write of this very checkpoint may be in flight
    path = os.path.join(ckpt_dir, f"{name}.msgpack")
    opath = os.path.abspath(os.path.join(ckpt_dir, f"{name}.orbax"))
    if os.path.exists(path):
        with open(path, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
    elif os.path.isdir(opath):
        import orbax.checkpoint as ocp

        # restore without an abstract target: host numpy arrays with the saved
        # structure — downstream flow (from_state_dict + _cast_like) is then
        # identical to the msgpack path, and re-sharding happens where the
        # caller device-puts the state (train_model replicates over its mesh)
        restored = ocp.StandardCheckpointer().restore(opath)
    else:
        raise FileNotFoundError(f"no checkpoint {name!r} (.msgpack or .orbax) in {ckpt_dir}")
    template = serialization.to_state_dict(_state_dict(state))
    # route-loss EMA (loss-based sMRO): restored when both sides track it;
    # tolerate checkpoints from before the buffer existed. Restored even under
    # params_only — the reference's Trainer carries self.ema across curriculum
    # stages (INSPECT/train_fame.py:102).
    rle = getattr(state, "route_loss_ema", None)
    if rle is not None and "route_loss_ema" in restored:
        rle = serialization.from_state_dict(rle, restored["route_loss_ema"])
    restored.pop("route_loss_ema", None)
    template.pop("route_loss_ema", None)
    layout_changed: list = []
    for key in ("params", "ema_params", "batch_stats"):
        if isinstance(restored.get(key), dict) and isinstance(template.get(key), dict):
            restored[key] = _convert_bert_layouts(
                template[key], restored[key], layout_changed
            )
    if layout_changed and not params_only:
        # optimizer partition trees mirror the param layout and cannot be
        # converted generically — a cross-layout transition is a warm start,
        # not a resume
        raise ValueError(
            "checkpoint and run use different BERT param layouts "
            "(layered vs pipeline-parallel pp_layers); full --resume cannot "
            "carry the optimizer state across layouts — warm-start with "
            "--init-from instead"
        )
    if params_only:
        # merge only the weight subtrees — the optimizer partition structure
        # may legitimately differ across curriculum stages
        out = {}
        for key in ("params", "batch_stats", "ema_params"):
            tmpl = getattr(state, key)
            if tmpl is None:
                out[key] = None
            else:
                out[key] = _cast_like(
                    tmpl, serialization.from_state_dict(tmpl, restored.get(key, template[key]))
                )
        return state.replace(
            params=out["params"],
            batch_stats=out["batch_stats"],
            ema_params=out["ema_params"],
            route_loss_ema=rle,
        )
    sd = {k: v for k, v in _state_dict(state).items() if k != "route_loss_ema"}
    merged = serialization.from_state_dict(sd, restored)
    return state.replace(
        step=merged["step"],
        params=_cast_like(state.params, merged["params"]),
        batch_stats=merged["batch_stats"],
        opt_state=merged["opt_state"],
        ema_params=(
            None
            if state.ema_params is None
            else _cast_like(state.ema_params, merged["ema_params"])
        ),
        route_loss_ema=rle,
    )


def load_meta(ckpt_dir: str, name: str = "last") -> Dict[str, Any]:
    with open(os.path.join(ckpt_dir, f"{name}.meta.json")) as f:
        return json.load(f)


def load_config(ckpt_dir: str, name: str = "last") -> Config:
    return from_dict(load_meta(ckpt_dir, name)["config"])
