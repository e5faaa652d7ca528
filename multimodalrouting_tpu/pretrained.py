"""Pretrained weight initialization on the product train path.

The reference initializes its encoders from pretrained torch checkpoints:
the note encoder via `AutoModel.from_pretrained(model_name)`
(MIMIC-IV/MortModel/encoders.py:241) and the vision backbone via
`torchvision.models.<name>(pretrained=True)` (encoders.py:394). Here both
arrive as torch state_dicts configured on EncoderConfig:

  encoder.bert_weights   — torch.save()d state_dict of an HF BertModel
                           (e.g. emilyalsentzer/Bio_ClinicalBERT), or an HF
                           repo/directory name transformers can resolve
  encoder.vision_weights — torch.save()d state_dict of the torchvision model
                           named by encoder.vision_backbone

`apply_pretrained` splices both into freshly initialized model variables
(leaves cast to the template's dtypes, shapes verified), leaving every other
module at its random init. Called by train_model when no init_state/resume
checkpoint supplies weights.
"""
from __future__ import annotations

import os
from typing import Any, Dict


def _load_state_dict(path: str) -> Dict[str, Any]:
    import torch

    if os.path.exists(path):
        try:
            obj = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # non-tensor pickles (e.g. MedFuse checkpoints wrapping argparse
            # namespaces) need full unpickling — same trust model as the
            # reference's own torch.load of user checkpoints
            obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        if isinstance(obj, dict) and "state_dict" in obj and not any(
            hasattr(v, "shape") for v in obj.values()
        ):
            obj = obj["state_dict"]  # lightning/medfuse-style wrapper
        return obj
    # not a file: treat as an HF repo / local model directory name
    from transformers import AutoModel

    return AutoModel.from_pretrained(path).state_dict()


def _set_in(tree: Dict, path, value) -> Dict:
    """Return a copy of `tree` with the subtree at `path` replaced."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    new = dict(tree)
    new[head] = _set_in(tree[head], rest, value)
    return new


def _cast_checked(template, tree):
    import jax

    def cast(t, v):
        import numpy as np

        v = np.asarray(v)
        if tuple(t.shape) != tuple(v.shape):
            raise ValueError(
                f"pretrained leaf shape {v.shape} != template {t.shape} — "
                "check encoder dims match the checkpoint"
            )
        return v.astype(t.dtype)

    return jax.tree_util.tree_map(cast, template, tree)


def load_bert_weights(path_or_name: str, layers: int, template):
    """HF BertModel state_dict -> BertEncoder params, cast to `template`.

    Handles both param layouts: layered (`layer_i/...`, the default) and
    pipeline-parallel (`pp_layers` stacked leaves, parallel/pp.py)."""
    from multimodalrouting_tpu.models.clinbert import import_hf_bert_params

    imported = import_hf_bert_params(_load_state_dict(path_or_name), layers=layers)
    if "pp_layers" in template:
        from multimodalrouting_tpu.parallel.pp import to_pp_layout

        imported = to_pp_layout(imported)
    return _cast_checked(template, imported)


def apply_pretrained(cfg, variables, log_fn=print):
    """Splice configured pretrained weights into init variables (pure copy)."""
    e = cfg.encoder
    out = variables
    if e.bert_weights:
        tmpl = out["params"]["encoders"]["bbert"]["bert"]
        out = dict(out)
        out["params"] = _set_in(
            out["params"],
            ("encoders", "bbert", "bert"),
            load_bert_weights(e.bert_weights, e.bert_layers, tmpl),
        )
        log_fn(f"[pretrained] note encoder <- {e.bert_weights}")
    if e.vision_weights:
        if e.vision_norm != "batch":
            raise ValueError(
                "encoder.vision_weights needs encoder.vision_norm=batch "
                "(torchvision checkpoints carry BatchNorm running stats)"
            )
        from multimodalrouting_tpu.models.cxr import load_torchvision_backbone

        sd = _load_state_dict(e.vision_weights)
        sub = {
            "params": out["params"]["encoders"]["imgenc"],
            "batch_stats": out["batch_stats"]["encoders"]["imgenc"],
        }
        sub = load_torchvision_backbone(sub, sd, e.vision_backbone)
        out = dict(out)
        out["params"] = _set_in(
            out["params"], ("encoders", "imgenc"), sub["params"]
        )
        out["batch_stats"] = _set_in(
            out["batch_stats"], ("encoders", "imgenc"), sub["batch_stats"]
        )
        log_fn(f"[pretrained] vision backbone <- {e.vision_weights}")
    return out
