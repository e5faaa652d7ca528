"""MedFuse preprocessing + INSPECT family tests."""
import jax
import numpy as np
import pytest

from multimodalrouting_tpu.data.medfuse import (
    Discretizer,
    Normalizer,
    PairingConfig,
    build_pairing_index,
)
from multimodalrouting_tpu.models.inspect import CTVolumeEncoder, OMOPConceptModel


def test_discretizer_binning_and_masks():
    disc = Discretizer(timestep=1.0, store_masks=True, impute_strategy="zero")
    header = ["Hours", "Heart Rate", "Glucose"]
    rows = [
        ["0.2", "80", ""],
        ["0.8", "85", "120"],  # same bin as 0.2 -> overwrites HR
        ["2.5", "", "140"],
    ]
    data, out_header = disc.transform(rows, header=header, end=4.0)
    assert data.shape[0] == int(4.0 / 1.0 + 1 - 1e-6)
    hr_col = out_header.index("Heart Rate")
    glu_col = out_header.index("Glucose")
    assert data[0, hr_col] == 85.0  # later value wins within bin
    assert data[0, glu_col] == 120.0
    assert data[2, glu_col] == 140.0
    # mask block appended
    m_hr = out_header.index("mask->Heart Rate")
    assert data[0, m_hr] == 1 and data[1, m_hr] == 0


def test_discretizer_categorical_and_imputation():
    cfg = {
        "id_to_channel": ["GCS", "HR"],
        "is_categorical_channel": {"GCS": True},
        "possible_values": {"GCS": ["1", "2", "3"]},
        "normal_values": {"GCS": "3", "HR": "86"},
    }
    disc = Discretizer(timestep=1.0, config=cfg, impute_strategy="previous", store_masks=False)
    rows = [["0.5", "2", "70"], ["3.5", "", ""]]
    data, header = disc.transform(rows, header=["Hours", "GCS", "HR"], end=4.0)
    assert header[:3] == ["GCS->1", "GCS->2", "GCS->3"]
    np.testing.assert_array_equal(data[0, :3], [0, 1, 0])
    # previous-imputation carries bin0's values forward
    np.testing.assert_array_equal(data[2, :3], [0, 1, 0])
    assert data[2, 3] == 70.0
    # normal_value seeds before any observation? bin before first obs uses it
    disc_nv = Discretizer(timestep=1.0, config=cfg, impute_strategy="normal_value", store_masks=False)
    data_nv, _ = disc_nv.transform(rows, header=["Hours", "GCS", "HR"], end=4.0)
    assert data_nv[1, 3] == 86.0


def test_normalizer_streaming():
    rng = np.random.default_rng(0)
    x1 = rng.normal(3.0, 2.0, size=(100, 4))
    x2 = rng.normal(3.0, 2.0, size=(150, 4))
    nz = Normalizer()
    nz.feed(x1)
    nz.feed(x2)
    nz.finalize()
    full = np.vstack([x1, x2])
    np.testing.assert_allclose(nz.means, full.mean(0), rtol=1e-9)
    np.testing.assert_allclose(nz.stds, full.std(0, ddof=1), rtol=1e-9)
    out = nz.transform(full)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)


def test_normalizer_save_load(tmp_path):
    nz = Normalizer()
    nz.feed(np.arange(20, dtype=float).reshape(10, 2))
    path = str(tmp_path / "norm.json")
    nz.save(path)
    nz2 = Normalizer().load(path)
    np.testing.assert_allclose(nz2.means, nz.means)


@pytest.mark.parametrize(
    "mode,expected_len",
    [
        ("paired_ehr_cxr", 3),
        ("paired_ehr", 3),
        ("radiology", 3),
        ("partial_ehr", 6),
        ("partial_ehr_cxr", 3 + 1),  # 3 paired + ratio 0.5 * 3 unpaired
    ],
)
def test_pairing_modes(mode, expected_len):
    ehr = [f"s{i}" for i in range(6)]
    paired = ["s0", "s1", "s2"]
    dicoms = ["d0", "d1", "d2"]
    cfg = PairingConfig(data_pairs=mode, data_ratio=0.5, split="train")
    idx = build_pairing_index(ehr, paired, dicoms, cfg)
    assert len(idx) == expected_len
    if mode == "partial_ehr_cxr":
        # val forces ratio 0 -> only paired; test forces 1.0 -> all
        v = build_pairing_index(ehr, paired, dicoms, PairingConfig(mode, 0.5, "val"))
        t = build_pairing_index(ehr, paired, dicoms, PairingConfig(mode, 0.5, "test"))
        assert len(v) == 3 and len(t) == 6


@pytest.mark.slow
def test_ct_volume_encoder():
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32, 1)).astype(np.float32)
    slice_mask = np.array([[1, 1, 0], [1, 1, 1]], np.float32)
    enc = CTVolumeEncoder(d=16)
    params = enc.init(jax.random.PRNGKey(0), x, slice_mask)
    out = enc.apply(params, x, slice_mask)
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_omop_concept_model():
    model = OMOPConceptModel(num_proc_codes=50, num_meas_codes=60, num_drug_codes=70, hidden=32)
    proc = np.array([1, 2, 3])
    meas = np.array([[4, 5], [6, 7], [8, 9]])  # sequences pool
    drug = np.array([10, 11, 12])
    params = model.init(jax.random.PRNGKey(0), proc, meas, drug)
    out = model.apply(params, proc, meas, drug)
    assert set(out) == {"pe", "mort1m", "read1m", "ph12m"}
    assert out["pe"].shape == (3,)
