"""Native C++ event binner vs the pandas path — exact parity.

The binner implements the reference's winner-selection + forward-fill
semantics (build_cohort.py:471-543): lowest itemid priority wins per
(stay, bin, variable) cell, ties broken by latest charttime.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from multimodalrouting_tpu.data.cohort import build_stay_matrices
from multimodalrouting_tpu.data.native_binner import bin_events_native, load_native_binner

needs_native = pytest.mark.skipif(
    load_native_binner() is None, reason="no C++ toolchain"
)


def _random_fixture(seed=0, s=12, n_events=4000):
    rng = np.random.default_rng(seed)
    stays = pd.DataFrame(
        {
            "stay_id": np.arange(s) + 100,
            "hadm_id": np.arange(s) + 500,
            "intime": pd.Timestamp("2130-01-01") + pd.to_timedelta(rng.integers(0, 48, s), "h"),
        }
    )
    varmap = pd.DataFrame(
        {
            "itemid": [1, 2, 3, 4, 5, 6],
            "variable": ["hr", "hr", "sbp", "sbp", "glucose", "temp"],
            "priority": [0, 1, 0, 1, 0, 0],
        }
    )
    ce = pd.DataFrame(
        {
            "stay_id": rng.choice(stays["stay_id"], n_events),
            "itemid": rng.choice(varmap["itemid"], n_events),
            "charttime": pd.Timestamp("2130-01-01")
            + pd.to_timedelta(rng.integers(0, 60 * 50, n_events), "m"),
            "valuenum": rng.normal(80, 10, n_events),
            "valueuom": "",
        }
    )
    le = pd.DataFrame(columns=ce.columns.tolist().copy()).assign(hadm_id=[])
    le = pd.DataFrame(
        {
            "hadm_id": rng.choice(stays["hadm_id"], 300),
            "itemid": rng.choice([5, 6], 300),
            "charttime": pd.Timestamp("2130-01-01")
            + pd.to_timedelta(rng.integers(0, 60 * 50, 300), "m"),
            "valuenum": rng.normal(120, 20, 300),
            "valueuom": "",
        }
    )
    return stays, varmap, ce, le


@needs_native
def test_native_matches_pandas_end_to_end():
    stays, varmap, ce, le = _random_fixture()
    x_n, m_n, vars_n = build_stay_matrices(stays, varmap, ce, le, use_native=True)
    x_p, m_p, vars_p = build_stay_matrices(stays, varmap, ce, le, use_native=False)
    assert vars_n == vars_p
    np.testing.assert_array_equal(m_n, m_p)
    np.testing.assert_allclose(x_n, x_p, rtol=1e-6, equal_nan=True)
    assert m_n.sum() > 0  # fixture actually hits cells


@needs_native
def test_priority_and_time_tiebreaks():
    # one cell, competing events: priority 0 must beat priority 1 even when
    # older; among equal priority the latest charttime wins
    rows = np.zeros(4, np.int64)
    bins = np.zeros(4, np.int64)
    vcols = np.zeros(4, np.int64)
    prs = np.array([1, 0, 0, 1], np.int64)
    ts = np.array([400, 100, 50, 300], np.int64)
    vals = np.array([9.0, 1.0, 2.0, 8.0])
    x, m = bin_events_native(rows, bins, vcols, prs, ts, vals, 1, 2, 1, fill=False)
    assert m[0, 0, 0] == 1
    assert x[0, 0, 0] == 1.0  # priority 0, t=100 beats priority 0, t=50


@needs_native
def test_forward_fill_matches_numpy_semantics():
    rows = np.array([0, 0], np.int64)
    bins = np.array([1, 3], np.int64)
    vcols = np.array([0, 0], np.int64)
    prs = np.zeros(2, np.int64)
    ts = np.array([1, 2], np.int64)
    vals = np.array([5.0, 7.0])
    x, m = bin_events_native(rows, bins, vcols, prs, ts, vals, 1, 5, 1, fill=True)
    got = x[0, :, 0]
    assert np.isnan(got[0])  # leading bins stay NaN
    np.testing.assert_allclose(got[1:], [5.0, 5.0, 7.0, 7.0])
    np.testing.assert_array_equal(m[0, :, 0], [0, 1, 0, 1, 0])  # mask = observed only
