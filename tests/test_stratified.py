"""Multilabel-stratified split tests (reference: Unimodal/MIMIC/BEHRT.py:228-232).

The contract: per-label prevalence preserved across train/val/test at the
reference's 75/5/20 sizes, deterministic under a fixed seed, disjoint +
complete coverage — and measurably tighter than a plain random split on
rare labels.
"""
from __future__ import annotations

import numpy as np
import pytest

from multimodalrouting_tpu.data.stratified import (
    iterative_stratification,
    multilabel_stratified_shuffle_split,
    prevalence_gap,
    stratified_three_way,
)


def _labels(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    # 3 labels at the reference tasks' flavor: one common, one mid, one rare
    return np.stack(
        [
            rng.random(n) < 0.30,
            rng.random(n) < 0.10,
            rng.random(n) < 0.03,
        ],
        axis=1,
    ).astype(np.float32)


def test_three_way_sizes_and_coverage():
    y = _labels()
    tr, va, te = stratified_three_way(y, seed=42)
    n = len(y)
    # reference protocol: 20% test, then 5/80 of the rest as val -> 75/5/20
    assert abs(len(te) - 0.20 * n) <= 3
    assert abs(len(va) - 0.05 * n) <= 3
    assert abs(len(tr) - 0.75 * n) <= 3
    allidx = np.concatenate([tr, va, te])
    assert len(allidx) == n
    assert len(np.unique(allidx)) == n  # disjoint + complete


def test_prevalence_preserved_per_label():
    y = _labels()
    tr, va, te = stratified_three_way(y, seed=42)
    overall = y.mean(axis=0)
    for idx, name, tol in ((tr, "train", 0.01), (te, "test", 0.01), (va, "val", 0.03)):
        gap = np.abs(y[idx].mean(axis=0) - overall)
        assert gap.max() < tol, f"{name} prevalence gap {gap} exceeds {tol}"


def test_beats_random_split_on_rare_labels():
    y = _labels(n=600, seed=3)
    strat_tr, strat_te = multilabel_stratified_shuffle_split(y, 0.2, random_state=7)
    worst_strat = prevalence_gap(y, [strat_tr, strat_te])
    rng = np.random.default_rng(7)
    gaps = []
    for _ in range(20):
        perm = rng.permutation(len(y))
        gaps.append(prevalence_gap(y, [perm[: int(0.8 * len(y))], perm[int(0.8 * len(y)) :]]))
    # stratified must beat the MEDIAN random draw (random can fluke one draw)
    assert worst_strat <= np.median(gaps)


def test_seed_stable_and_seed_sensitive():
    y = _labels(n=500, seed=1)
    a = stratified_three_way(y, seed=42)
    b = stratified_three_way(y, seed=42)
    for x, z in zip(a, b):
        np.testing.assert_array_equal(x, z)
    c = stratified_three_way(y, seed=43)
    assert any(len(x) != len(z) or (x != z).any() for x, z in zip(a, c))


def test_single_label_vector_and_validation():
    y = (np.random.default_rng(0).random(300) < 0.2).astype(np.float32)
    tr, te = multilabel_stratified_shuffle_split(y, 0.25, random_state=0)
    assert abs(y[tr].mean() - y[te].mean()) < 0.02
    with pytest.raises(ValueError):
        multilabel_stratified_shuffle_split(y, 1.5)
    with pytest.raises(ValueError):
        iterative_stratification(y, (0.5, 0.2))


def test_label_free_rows_fill_by_capacity():
    y = np.zeros((100, 2), np.float32)  # nothing to stratify on
    fold = iterative_stratification(y, (0.7, 0.3), seed=0)
    assert (fold == 0).sum() == 70
    assert (fold == 1).sum() == 30


@pytest.mark.slow
def test_cli_unimodal_behrt_multitask_stratified(tmp_path):
    """End-to-end: the behrt multitask driver re-splits stratified by default
    and still writes fairness.json under the stratified split."""
    import json
    import subprocess
    import sys

    out = tmp_path / "uni"
    r = subprocess.run(
        [
            sys.executable, "-m", "multimodalrouting_tpu.cli", "unimodal",
            "--modality", "behrt", "--task", "multitask", "--epochs", "2",
            "--out", str(out),
            "--set", "data.synthetic_n=96", "--set", "encoder.d=16",
            "--set", "encoder.structured_layers=1", "--set", "encoder.structured_heads=2",
            "--set", "encoder.structured_seq_len=8", "--set", "encoder.structured_n_feats=6",
            "--set", "train.batch_size=8",
        ],
        capture_output=True, text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[stratify] multilabel-stratified split" in r.stdout
    fair = json.loads((out / "fairness.json").read_text())
    assert set(fair) == {"mortality", "pe", "ph"}
