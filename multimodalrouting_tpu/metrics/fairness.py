"""Fairness metrics: EDDI, equalized-odds gap, predictive parity gap.

Parity targets: reference MIMIC-IV/Model/evaluation_metrics.py:69-99 (EDDI,
sign-agnostic over sensitive keys) and Unimodal 01_BEHRT.py:20-108 (EO gap /
predictive parity suites).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def eddi(y_true: np.ndarray, y_prob: np.ndarray, groups: np.ndarray) -> float:
    """Error Distribution Disparity Index: mean absolute deviation of group
    error rates from the overall error rate, normalized by max(err, 1-err)."""
    y_true = np.asarray(y_true, np.float64).ravel()
    y_prob = np.asarray(y_prob, np.float64).ravel()
    groups = np.asarray(groups).ravel()
    err = np.abs(y_prob - y_true)
    overall = err.mean()
    denom = max(overall, 1.0 - overall, 1e-8)
    gaps = []
    for g in np.unique(groups):
        sel = groups == g
        if sel.any():
            gaps.append(abs(err[sel].mean() - overall) / denom)
    return float(np.mean(gaps)) if gaps else 0.0


def equalized_odds_gap(
    y_true: np.ndarray, y_pred: np.ndarray, groups: np.ndarray
) -> Dict[str, float]:
    """Max pairwise TPR and FPR gaps across groups."""
    y_true = np.asarray(y_true).ravel() > 0.5
    y_pred = np.asarray(y_pred).ravel() > 0.5
    groups = np.asarray(groups).ravel()
    tprs, fprs = [], []
    for g in np.unique(groups):
        sel = groups == g
        pos = sel & y_true
        neg = sel & ~y_true
        if pos.any():
            tprs.append(y_pred[pos].mean())
        if neg.any():
            fprs.append(y_pred[neg].mean())
    return {
        "tpr_gap": float(max(tprs) - min(tprs)) if len(tprs) > 1 else 0.0,
        "fpr_gap": float(max(fprs) - min(fprs)) if len(fprs) > 1 else 0.0,
    }


def predictive_parity_gap(
    y_true: np.ndarray, y_pred: np.ndarray, groups: np.ndarray
) -> float:
    """Max pairwise PPV gap across groups."""
    y_true = np.asarray(y_true).ravel() > 0.5
    y_pred = np.asarray(y_pred).ravel() > 0.5
    groups = np.asarray(groups).ravel()
    ppvs = []
    for g in np.unique(groups):
        sel = (groups == g) & y_pred
        if sel.any():
            ppvs.append(y_true[sel].mean())
    return float(max(ppvs) - min(ppvs)) if len(ppvs) > 1 else 0.0
