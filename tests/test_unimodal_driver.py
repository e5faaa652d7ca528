"""Unimodal drivers + readmission label + fairness suite (VERDICT r2 item 5)."""
import json

import numpy as np
import pandas as pd
import pytest

from multimodalrouting_tpu.data.cohort import readmit_30d_label
from multimodalrouting_tpu.metrics.fairness import (
    combined_eddi,
    eddi_subgroups,
    equalized_odds_suite,
    fairness_report,
    group_fairness_metrics,
)
from tests.helpers import tiny_batch, tiny_config


def test_readmit_30d_label_semantics():
    adm = pd.DataFrame({
        "subject_id":           [1,            1,            2,            3,            4],
        "hadm_id":              [10,           11,           20,           30,           40],
        "admittime":  pd.to_datetime([
            "2130-01-01", "2130-02-05", "2130-01-01", "2130-01-01", "2130-01-01"]),
        "dischtime":  pd.to_datetime([
            "2130-01-10", "2130-02-15", "2130-01-05", "2130-01-08", "2130-01-03"]),
        "hospital_expire_flag": [0,            0,            0,            1,            0],
    })
    # subject 1: readmitted 2130-02-05, 26 days after 01-10 discharge -> 1
    # subject 1 second admission: no later admission -> 0
    # subject 2: single admission -> 0
    # subject 3: died in hospital -> 0 even if a later row existed
    # subject 4: single admission -> 0
    lab = readmit_30d_label(adm).set_index("hadm_id")["readmit_30d"]
    assert lab.loc[10] == 1
    assert lab.loc[11] == 0
    assert lab.loc[20] == 0
    assert lab.loc[30] == 0
    assert lab.loc[40] == 0
    # beyond the window -> 0
    adm2 = adm.copy()
    adm2.loc[1, "admittime"] = pd.Timestamp("2130-03-15")  # 64 days later
    lab2 = readmit_30d_label(adm2).set_index("hadm_id")["readmit_30d"]
    assert lab2.loc[10] == 0


def test_equalized_odds_suite_reference_formula():
    # two groups, hand-computed TPR/FPR per 01_BEHRT.py:20-44
    groups = np.array(["a"] * 6 + ["b"] * 6)
    y_true = np.array([1, 1, 0, 0, 1, 0, 1, 1, 0, 0, 0, 1])
    y_pred = np.array([1, 0, 0, 1, 1, 0, 1, 1, 1, 0, 0, 0])
    # group a: TP=2 FN=1 -> TPR=2/3; FP=1 TN=2 -> FPR=1/3
    # group b: TP=2 FN=1 -> TPR=2/3; FP=1 TN=2 -> FPR=1/3
    out = equalized_odds_suite(groups, y_true, y_pred)
    assert out["EOTPR"] == pytest.approx(0.0)
    assert out["EOFPR"] == pytest.approx(0.0)
    # perturb group b to TPR=1/3: |2/3-1/3| / n^2 = (1/3)/4
    y_pred2 = y_pred.copy()
    y_pred2[6] = 0
    out2 = equalized_odds_suite(groups, y_true, y_pred2)
    assert out2["EOTPR"] == pytest.approx((1 / 3) / 4)
    assert out2["EO"] == pytest.approx((out2["EOTPR"] + out2["EOFPR"]) / 2)


def test_eddi_subgroups_reference_formula():
    groups = np.array(["a"] * 4 + ["b"] * 4)
    y_true = np.array([1, 0, 1, 0, 1, 0, 1, 0])
    prob = np.array([0.9, 0.1, 0.2, 0.1, 0.9, 0.8, 0.9, 0.8])
    # preds: a -> [1,0,0,0] errs 1; b -> [1,1,1,1] errs 2
    # overall err = 3/8; denom = 5/8
    # a: (1/4 - 3/8)/(5/8) = -0.2 ; b: (2/4 - 3/8)/(5/8) = 0.2
    overall, sub = eddi_subgroups(groups, y_true, prob)
    assert sub["a"] == pytest.approx(-0.2)
    assert sub["b"] == pytest.approx(0.2)
    # overall = sqrt(0.04+0.04)/2
    assert overall == pytest.approx(np.sqrt(0.08) / 2)
    assert combined_eddi(0.3, 0.4) == pytest.approx(0.25)


def test_fairness_report_shape():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    p = np.clip(y * 0.6 + rng.uniform(0, 0.5, 200), 0, 1)
    sens = {"age": rng.integers(0, 3, 200), "race": rng.integers(0, 2, 200)}
    rep = fairness_report(sens, y, p)
    assert set(rep["attributes"]) == {"age", "race"}
    a = rep["attributes"]["age"]
    assert {"eo", "eddi_overall", "eddi_subgroups", "detail", "predictive_parity_gap"} <= set(a)
    assert set(a["eo"]) == {"EOTPR", "EOFPR", "EO"}
    assert "group_tpr" in a["detail"]
    assert rep["combined_eddi"] >= 0.0


@pytest.mark.slow
def test_unimodal_behrt_multitask_trains(tmp_path):
    from multimodalrouting_tpu.train.unimodal import train_unimodal

    cfg = tiny_config(**{"train.epochs": 5, "train.lr": 1e-3, "train.batch_size": 16})
    tr = tiny_batch(n=64, task="multitask")
    va = tiny_batch(n=32, seed=1, task="multitask")
    res = train_unimodal(
        cfg, tr, va, modality="behrt", task="multitask",
        out_dir=str(tmp_path), log_fn=lambda s: None,
    )
    assert set(res.metrics) == {"mortality", "pe", "ph"}
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]
    assert (tmp_path / "unimodal_metrics.json").exists()
    fair = json.loads((tmp_path / "fairness.json").read_text())
    assert set(fair) == {"mortality", "pe", "ph"}
    assert "sens" in fair["mortality"]["attributes"]


@pytest.mark.slow
def test_unimodal_readmit_focal_trains(tmp_path):
    from multimodalrouting_tpu.train.unimodal import train_unimodal

    cfg = tiny_config(**{"train.epochs": 4, "train.lr": 1e-3, "train.batch_size": 16})
    tr = tiny_batch(n=64)
    va = tiny_batch(n=32, seed=1)
    res = train_unimodal(
        cfg, tr, va, modality="behrt", task="readmit",
        out_dir=str(tmp_path), log_fn=lambda s: None,
    )
    assert list(res.metrics) == ["readmit"]
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]


@pytest.mark.slow
def test_unimodal_note_trains():
    from multimodalrouting_tpu.train.unimodal import train_unimodal

    cfg = tiny_config(**{"train.epochs": 3, "train.lr": 1e-3, "train.batch_size": 16})
    res = train_unimodal(
        cfg, tiny_batch(n=48), tiny_batch(n=16, seed=1),
        modality="note", log_fn=lambda s: None,
    )
    assert list(res.metrics) == ["mortality"]
    assert np.isfinite(res.history[-1]["val_loss"])


@pytest.mark.slow
def test_omop_driver_trains(tmp_path):
    from multimodalrouting_tpu.train.unimodal import train_omop

    rng = np.random.default_rng(0)

    def split(n, seed):
        r = np.random.default_rng(seed)
        proc = r.integers(0, 50, n)
        y = np.stack([
            (proc % 2 == 0).astype(np.float32),  # learnable from proc id
            r.integers(0, 2, n).astype(np.float32),
            r.integers(0, 2, n).astype(np.float32),
            r.integers(0, 2, n).astype(np.float32),
        ], axis=1)
        return {
            "proc": proc, "meas": r.integers(0, 30, n), "drug": r.integers(0, 40, n),
            "y": y, "sens": r.integers(0, 2, n),
        }

    res = train_omop(
        {"train": split(256, 0), "val": split(64, 1)},
        vocab_sizes=(50, 30, 40), hidden=32, epochs=30, batch_size=32,
        lr=5e-3, patience=30,
        out_dir=str(tmp_path), log_fn=lambda s: None,
    )
    assert set(res.metrics) == {"pe", "mort1m", "read1m", "ph12m"}
    # the proc-derived task is learnable
    assert res.metrics["pe"]["auroc"] > 0.8
    assert (tmp_path / "fairness.json").exists()
