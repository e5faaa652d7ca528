"""Interpretability sweep + inference demo for the gated-concat family.

Parity targets:
  * inference demo — reference MIMIC-IV/Model/inference_demo.py:152-233:
    per-sample route gates sorted + uni/bi/tri block means printout.
  * interpretability sweep — reference MIMIC-IV/Model/interpretability.py:
    189-348 (collect_contributions + uc_bi_ti_for_batch): per-route occlusion
    contributions and UC/BI/TI over dataset batches, emitted as a tidy table.

Both rebuild ONLY the light head path (fusion -> gates -> concat -> head)
around cached encoder outputs, exactly like the reference (it re-runs just
the head per occlusion); here the 7 occlusions are one vmapped program and
the UC/BI/TI 8-forward battery is one lax.scan (audit/attribution.py).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalrouting_tpu.audit.attribution import (
    block_weights_from_gates,
    compute_uc_bi_ti,
    route_contributions_occlusion,
)
from multimodalrouting_tpu.configs import Config
from multimodalrouting_tpu.models.fusions import SevenRouteFusion
from multimodalrouting_tpu.routes import ROUTES_7, route_mask_from_presence
from multimodalrouting_tpu.routing.gates import FinalConcatHead, RouteGateNet, concat_routes


def _head_modules(cfg: Config):
    m = cfg.model
    dtype = jnp.dtype(m.dtype)
    fusion = SevenRouteFusion(
        d=m.d,
        feature_mode=m.fusion_feature_mode,
        bi_fusion_mode=m.bi_fusion_mode,
        tri_fusion_mode=m.tri_fusion_mode,
        p_drop=m.fusion_dropout,
        dtype=dtype,
    )
    gate_net = RouteGateNet(num_routes=7, hidden=m.gate_hidden, p_drop=m.fusion_dropout, dtype=dtype)
    head = FinalConcatHead(
        num_routes=7, d=m.d, n_tasks=m.num_classes, p_drop=m.fusion_dropout, dtype=dtype
    )
    return fusion, gate_net, head


def head_forward_from_pooled(
    cfg: Config,
    params: Dict,
    zl: jnp.ndarray,
    zn: jnp.ndarray,
    zi: jnp.ndarray,
    avail: Optional[jnp.ndarray] = None,
):
    """(zL, zN, zI) -> (logits [B], gates [B,7], route_embs stack [B,7,d])."""
    fusion, gate_net, head = _head_modules(cfg)
    route_embs = fusion.apply({"params": params["fusion"]}, zl, zn, zi, True)
    gates = gate_net.apply({"params": params["gate_net"]}, zl, zn, zi, avail, True)
    x_cat, _ = concat_routes(route_embs, gates, ROUTES_7, l2norm=cfg.model.l2norm_each)
    logits = head.apply({"params": params["final_head"]}, x_cat, True)
    stack = jnp.stack([route_embs[r] for r in ROUTES_7], axis=1)
    return logits, gates, stack


def gated_model_sweep(
    cfg: Config,
    params: Dict,
    pooled: Dict[str, np.ndarray],
    avail: Optional[np.ndarray] = None,
    *,
    n_mc: int = 20,
    rng: Optional[jax.Array] = None,
) -> Dict[str, np.ndarray]:
    """Occlusion contributions + UC/BI/TI from cached pooled embeddings."""
    zl, zn, zi = (jnp.asarray(pooled[k]) for k in ("L", "N", "I"))
    logits, gates, stack = head_forward_from_pooled(cfg, params, zl, zn, zi, avail)

    _, _, head = _head_modules(cfg)

    def head_fn(x_cat):
        out = head.apply({"params": params["final_head"]}, x_cat, True)
        return out[:, 0] if out.ndim == 2 else out

    contrib = route_contributions_occlusion(head_fn, stack, gates)

    def f(l, n, i):
        lg, _, _ = head_forward_from_pooled(cfg, params, l, n, i, avail)
        return lg[:, 0] if lg.ndim == 2 else lg

    uc, bi, ti = compute_uc_bi_ti(
        f, zl, zn, zi, rng=rng if rng is not None else jax.random.PRNGKey(0), n_mc=n_mc
    )
    blocks = block_weights_from_gates(gates, ROUTES_7)
    # fp32 on host: bf16 compute dtypes leak ml_dtypes scalars whose
    # __format__ rejects numeric format codes (and surprise CSV writers)
    f32 = lambda x: np.asarray(x, np.float32)  # noqa: E731
    return {
        "logits": f32(logits),
        "gates": f32(gates),
        "route_contrib": f32(contrib),
        "route_emb_norm": f32(jnp.linalg.norm(stack.astype(jnp.float32), axis=-1)),
        "uc": f32(uc),
        "bi": f32(bi),
        "ti": f32(ti),
        "block_uni": f32(blocks["uni"]),
        "block_bi": f32(blocks["bi"]),
        "block_tri": f32(blocks["tri"]),
    }


def sweep_to_rows(sweep: Dict[str, np.ndarray]) -> List[Dict[str, float]]:
    """Tidy per-sample rows (gate__r, route_contrib__r, route_emb_norm__r,
    UC/BI/TI, block means) — interpretability.py:240-257 DataFrame parity."""
    n = len(sweep["logits"])
    rows = []
    for i in range(n):
        row: Dict[str, float] = {
            "logit": float(np.ravel(sweep["logits"][i])[0]),
            "uc": float(np.ravel(sweep["uc"][i])[0]) if np.ndim(sweep["uc"][i]) else float(sweep["uc"][i]),
            "bi": float(np.ravel(sweep["bi"][i])[0]) if np.ndim(sweep["bi"][i]) else float(sweep["bi"][i]),
            "ti": float(np.ravel(sweep["ti"][i])[0]) if np.ndim(sweep["ti"][i]) else float(sweep["ti"][i]),
            "block_uni": float(sweep["block_uni"][i]),
            "block_bi": float(sweep["block_bi"][i]),
            "block_tri": float(sweep["block_tri"][i]),
        }
        for j, r in enumerate(ROUTES_7):
            row[f"gate__{r}"] = float(sweep["gates"][i, j])
            row[f"route_contrib__{r}"] = float(np.ravel(sweep["route_contrib"][i, j])[0])
            row[f"route_emb_norm__{r}"] = float(sweep["route_emb_norm"][i, j])
        rows.append(row)
    return rows


def print_inference_demo(sweep: Dict[str, np.ndarray], k: int = 5) -> str:
    """inference_demo.py printout: top routes per sample + block means."""
    lines = []
    gates = sweep["gates"]
    for i in range(min(k, len(gates))):
        order = np.argsort(-gates[i])
        top = ", ".join(f"{ROUTES_7[j]}={gates[i, j]:.3f}" for j in order)
        lines.append(f"sample {i}: logit={np.ravel(sweep['logits'][i])[0]:+.3f}  {top}")
    lines.append(
        "block means: uni={:.3f} bi={:.3f} tri={:.3f}".format(
            sweep["block_uni"].mean(), sweep["block_bi"].mean(), sweep["block_tri"].mean()
        )
    )
    out = "\n".join(lines)
    print(out)
    return out
