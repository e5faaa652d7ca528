import numpy as np

from multimodalrouting_tpu.metrics import (
    auprc,
    auroc,
    binary_metrics,
    eddi,
    epoch_metrics,
    equalized_odds_gap,
    expected_calibration_error,
    find_best_thresholds,
    fit_temperature,
    multilabel_metrics,
)


def test_auroc_perfect_and_random():
    y = np.array([0, 0, 1, 1])
    assert auroc(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert auroc(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert abs(auroc(y, np.array([0.5, 0.5, 0.5, 0.5])) - 0.5) < 1e-9
    assert np.isnan(auroc(np.zeros(4), np.arange(4)))


def test_auroc_matches_sklearn_formula():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 500)
    s = rng.normal(size=500) + y * 0.8
    a = auroc(y, s)
    # pairwise definition
    pos, neg = s[y == 1], s[y == 0]
    pairs = (pos[:, None] > neg[None, :]).mean() + 0.5 * (pos[:, None] == neg[None, :]).mean()
    assert abs(a - pairs) < 1e-9


def test_auprc_perfect():
    y = np.array([0, 1, 0, 1])
    assert auprc(y, np.array([0.1, 0.9, 0.2, 0.8])) == 1.0


def test_binary_metrics_keys():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 100)
    s = rng.random(100)
    m = binary_metrics(y, s)
    for k in ("auroc", "auprc", "f1", "precision", "recall", "mcc", "accuracy"):
        assert k in m


def test_multilabel_metrics():
    rng = np.random.default_rng(2)
    y = (rng.random((64, 5)) < 0.3).astype(float)
    s = np.clip(y * 0.6 + rng.random((64, 5)) * 0.4, 0, 1)
    m = multilabel_metrics(y, s)
    assert m["auroc_macro"] > 0.7
    assert len(m["per_label_auroc"]) == 5
    em = epoch_metrics(y, s)
    assert "example_f1" in em


def test_ece_and_temperature():
    rng = np.random.default_rng(3)
    n = 2000
    y_clean = rng.integers(0, 2, n).astype(float)
    # overconfident logits vs noisy labels: 25% label flips make the extreme
    # confidences unjustified, so the fitted temperature must soften (T > 1)
    logits = (y_clean * 2 - 1) * 4.0 + rng.normal(size=n)
    flip = rng.random(n) < 0.25
    y = np.where(flip, 1 - y_clean, y_clean)
    probs = 1 / (1 + np.exp(-logits))
    ece_raw = expected_calibration_error(y, probs)
    t = fit_temperature(logits, y)
    assert t > 1.0, f"expected softening temperature, got {t}"
    probs_cal = 1 / (1 + np.exp(-logits / t))
    assert expected_calibration_error(y, probs_cal) <= ece_raw + 1e-6


def test_threshold_search():
    rng = np.random.default_rng(4)
    y = (rng.random((200, 3)) < 0.2).astype(float)
    s = np.clip(y * 0.5 + rng.random((200, 3)) * 0.5, 0, 1)
    ths, best = find_best_thresholds(y, s)
    assert ths.shape == (3,)
    assert np.all(best >= 0)


def test_fairness_metrics():
    rng = np.random.default_rng(5)
    y = rng.integers(0, 2, 400)
    g = rng.integers(0, 2, 400)
    # biased predictions for group 1
    p = np.clip(y * 0.6 + g * 0.4 + rng.random(400) * 0.2, 0, 1)
    assert eddi(y, p, g) >= 0
    gaps = equalized_odds_gap(y, p > 0.5, g)
    assert gaps["fpr_gap"] > 0.1  # group-1 bias should show


def test_metrics_match_sklearn_exactly():
    """sklearn is the reference's metrics oracle (evaluation_metrics.py,
    main.py epoch_metrics all call sklearn) — assert exact agreement."""
    from sklearn.metrics import (
        average_precision_score,
        f1_score as sk_f1,
        matthews_corrcoef,
        roc_auc_score,
    )
    from multimodalrouting_tpu.metrics.classification import f1_score, mcc

    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 800)
    s = rng.normal(size=800) + y * 0.7
    assert abs(auroc(y, s) - roc_auc_score(y, s)) < 1e-12
    assert abs(auprc(y, s) - average_precision_score(y, s)) < 1e-12
    pred = (s > 0.5).astype(int)
    assert abs(f1_score(y, pred) - sk_f1(y, pred)) < 1e-12
    assert abs(mcc(y, pred) - matthews_corrcoef(y, pred)) < 1e-10


def test_metrics_match_sklearn_with_ties():
    from sklearn.metrics import average_precision_score, roc_auc_score

    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, 400)
    s = np.round(rng.normal(size=400) + y * 0.5, 1)  # heavy ties
    assert abs(auroc(y, s) - roc_auc_score(y, s)) < 1e-12
    assert abs(auprc(y, s) - average_precision_score(y, s)) < 1e-12
