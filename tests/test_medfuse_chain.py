"""MedFuse dataset-directory chain: listfile + per-stay CSVs -> export.

Covers the reference's EHRdataset (MedFuse_Preprocessing/datasets/
ehr_dataset.py:12-110), the fusion_main.py:27-71 driver chain, and the
loadmetadata CXR pairing (datasets/fusion.py:105-141), end-to-end into the
parquet model inputs the runtime loader consumes.
"""
import json
import os

import numpy as np
import pandas as pd
import pytest

from multimodalrouting_tpu.data.medfuse import (
    Discretizer,
    Normalizer,
    continuous_fields,
    fit_normalizer,
    load_listfile,
    load_medfuse_stay,
    medfuse_export,
    pair_cxr_metadata,
    read_timeseries_csv,
)

CHANNELS = {
    "id_to_channel": ["Heart Rate", "GCS"],
    "is_categorical_channel": {"GCS": True},
    "possible_values": {"GCS": ["1", "2", "3"]},
    "normal_values": {"Heart Rate": "86", "GCS": "3"},
}


def _write_ts(path, rows):
    with open(path, "w") as f:
        f.write("Hours,Heart Rate,GCS\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")


def _make_tree(tmp_path, task="phenotyping", classes=("CHF", "Sepsis", "Shock")):
    """Fake MedFuse benchmark dir: 3 train stays (one shared with val per the
    reference layout), 2 test stays."""
    root = tmp_path / "ehr"
    tdir = root / task / "train"
    xdir = root / task / "test"
    tdir.mkdir(parents=True)
    xdir.mkdir(parents=True)
    rng = np.random.default_rng(0)

    def rand_rows(n, t_max=47.0):
        hours = np.sort(rng.uniform(0, t_max, n))
        return [
            [f"{h:.2f}", f"{rng.uniform(60, 100):.1f}", str(rng.integers(1, 4))]
            for h in hours
        ]

    names = {}
    for i, split_stays in enumerate([("train", 3), ("test", 2)]):
        split, n = split_stays
        d = tdir if split == "train" else xdir
        for k in range(n):
            name = f"100{i}{k}_episode1_timeseries.csv"
            _write_ts(d / name, rand_rows(12))
            names.setdefault(split, []).append(name)

    header = "stay,period_length,stay_id," + ",".join(classes)

    def lf(path, rows):
        with open(path, "w") as f:
            f.write(header + "\n")
            for r in rows:
                f.write(r + "\n")

    def labs(bits):
        return ",".join(bits[: len(classes)])

    lf(root / task / "train_listfile.csv", [
        f"{names['train'][0]},48.0,101,{labs(['1', '0', '1'])}",
        f"{names['train'][1]},48.0,102,{labs(['0', '1', '0'])}",
    ])
    # val stays live in train/ (ehr_dataset.py get_datasets)
    lf(root / task / "val_listfile.csv",
       [f"{names['train'][2]},48.0,103,{labs(['1', '1', '0'])}"])
    lf(root / task / "test_listfile.csv", [
        f"{names['test'][0]},48.0,201,{labs(['0', '0', '1'])}",
        f"{names['test'][1]},48.0,202,{labs(['1', '0', '0'])}",
    ])
    return str(root), names


def test_read_timeseries_time_bound_break(tmp_path):
    """Rows after the first out-of-bound hour are dropped even if a later row
    would be in-bound again (the reference `break`s, ehr_dataset.py:55-58)."""
    p = tmp_path / "x.csv"
    _write_ts(p, [[0.5, 80, 2], [50.0, 90, 3], [10.0, 70, 1]])
    rows, header = read_timeseries_csv(str(p), time_bound=48.0)
    assert header[0] == "Hours"
    assert [r[0] for r in rows] == ["0.5"]


def test_listfile_parse_and_stay_semantics(tmp_path):
    root, _ = _make_tree(tmp_path)
    lf = load_listfile(os.path.join(root, "phenotyping", "train_listfile.csv"))
    assert lf.classes == ["CHF", "Sepsis", "Shock"]
    assert lf.data_map[lf.names[0]]["stay_id"] == 101.0
    disc = Discretizer(timestep=1.0, store_masks=True,
                       impute_strategy="previous", config=CHANNELS)
    data, y = load_medfuse_stay(
        os.path.join(root, "phenotyping", "train"), lf.names[0],
        lf.data_map[lf.names[0]], disc, None, period_length=48.0)
    # end = listfile period 48.0 -> 48 bins at timestep 1.0
    assert data.shape[0] == int(48.0 / 1.0 + 1 - 1e-6)
    assert y.tolist() == [1.0, 0.0, 1.0]


def test_period_length_fallback_when_time_zero(tmp_path):
    root, _ = _make_tree(tmp_path)
    lf = load_listfile(os.path.join(root, "phenotyping", "train_listfile.csv"))
    name = lf.names[0]
    lf.data_map[name]["time"] = 0.0  # ehr_dataset.py:97: ts>0 else period
    disc = Discretizer(timestep=2.0, config=CHANNELS)
    data, _ = load_medfuse_stay(
        os.path.join(root, "phenotyping", "train"), name, lf.data_map[name],
        disc, None, period_length=24.0)
    assert data.shape[0] == int(24.0 / 2.0 + 1 - 1e-6)


def test_fit_normalizer_zero_mean_on_train(tmp_path):
    root, _ = _make_tree(tmp_path)
    lf = load_listfile(os.path.join(root, "phenotyping", "train_listfile.csv"))
    disc = Discretizer(timestep=1.0, store_masks=True,
                       impute_strategy="previous", config=CHANNELS)
    norm = fit_normalizer(os.path.join(root, "phenotyping", "train"), lf, disc)
    cont = continuous_fields(disc.output_header)
    # one-hot + mask columns are NOT in the normalized field set
    assert disc.output_header[cont[0]] == "Heart Rate"
    assert all("->" not in disc.output_header[i] for i in cont)
    rows = []
    for name in lf.names:
        d, _ = load_medfuse_stay(os.path.join(root, "phenotyping", "train"),
                                 name, lf.data_map[name], disc, norm)
        rows.append(d)
    hr = np.concatenate(rows)[:, cont[0]]
    assert abs(hr.mean()) < 1e-3  # standardized over the fit split


def _cxr_fixture(tmp_path, stay_ids=(101, 201)):
    """resized/ JPEG tree + metadata/all_stays CSVs pairing the given stays."""
    from PIL import Image

    cxr = tmp_path / "cxr"
    (cxr / "resized").mkdir(parents=True)
    meta_rows, stay_rows = [], []
    for i, sid in enumerate(stay_ids):
        dicom = f"d{sid}"
        img = Image.fromarray(
            (np.random.default_rng(sid).uniform(0, 255, (32, 32, 3))).astype(np.uint8))
        img.save(cxr / "resized" / f"{dicom}.jpg")
        meta_rows.append({
            "subject_id": 9000 + i, "dicom_id": dicom, "StudyDate": 21800105,
            "StudyTime": 120000.0, "ViewPosition": "AP",
        })
        stay_rows.append({
            "subject_id": 9000 + i, "stay_id": sid,
            "intime": "2180-01-05 00:00:00", "outtime": "2180-01-08 00:00:00",
        })
    pd.DataFrame(meta_rows).to_csv(cxr / "mimic-cxr-2.0.0-metadata.csv", index=False)
    stays_csv = tmp_path / "all_stays.csv"
    pd.DataFrame(stay_rows).to_csv(stays_csv, index=False)
    return str(cxr), str(stays_csv)


def test_pair_cxr_metadata_window_and_ap_filter():
    meta = pd.DataFrame([
        # AP in window (kept), lateral in window (view-filtered),
        # AP out of window (time-filtered), later AP in window (wins)
        {"subject_id": 1, "dicom_id": "a", "StudyDate": 21800105,
         "StudyTime": 60000.0, "ViewPosition": "AP"},
        {"subject_id": 1, "dicom_id": "b", "StudyDate": 21800105,
         "StudyTime": 70000.0, "ViewPosition": "LATERAL"},
        {"subject_id": 1, "dicom_id": "c", "StudyDate": 21800120,
         "StudyTime": 60000.0, "ViewPosition": "AP"},
        {"subject_id": 1, "dicom_id": "d", "StudyDate": 21800105,
         "StudyTime": 90000.0, "ViewPosition": "AP"},
    ])
    stays = pd.DataFrame([{
        "subject_id": 1, "stay_id": 7,
        "intime": "2180-01-05 00:00:00", "outtime": "2180-01-09 00:00:00",
    }])
    out = pair_cxr_metadata(meta, stays, task="phenotyping")
    assert list(out["dicom_id"]) == ["d"]  # latest in-window AP
    # IHM window = intime + 48h: a study on day 8 would be excluded
    meta2 = meta.copy()
    meta2.loc[meta2.dicom_id == "d", "StudyDate"] = 21800108
    out2 = pair_cxr_metadata(meta2, stays, task="in-hospital-mortality")
    assert list(out2["dicom_id"]) == ["a"]


def test_medfuse_export_end_to_end(tmp_path):
    from multimodalrouting_tpu.data.images import make_image_loader
    from multimodalrouting_tpu.data.loader import load_split

    root, _ = _make_tree(tmp_path)
    cxr_dir, stays_csv = _cxr_fixture(tmp_path, stay_ids=(101, 201))
    cfg_path = tmp_path / "channels.json"
    cfg_path.write_text(json.dumps(CHANNELS))
    out = str(tmp_path / "export")
    summary = medfuse_export(
        root, "phenotyping", out,
        timestep=1.0, config_path=str(cfg_path),
        cxr_data_dir=cxr_dir, icu_stays_csv=stays_csv,
        data_pairs="partial_ehr_cxr", data_ratio=1.0,
    )
    assert summary["paired_stays"] == 2
    # partial_ehr_cxr: train = paired + ratio*unpaired draws; val forces
    # ratio 0.0 (paired only); test forces 1.0
    with open(os.path.join(out, "splits.json")) as f:
        splits = json.load(f)
    assert 101 in splits["train"] and len(splits["train"]) == 2
    assert splits["val"] == []  # val's only stay (103) is unpaired, ratio 0
    assert 201 in splits["test"] and len(splits["test"]) == 2

    arrs = load_split(out, "train", task="pheno", image_size=32,
                      image_loader=make_image_loader("val", resize=32, crop=32))
    b = arrs.batch
    assert b.y.shape[1] == 3  # CCS_* phenotype columns
    sid_list = arrs.stay_ids.tolist()
    i101 = sid_list.index(101)
    assert b.has_i[i101] == 1.0 and b.image[i101].std() > 0
    unpaired = [i for i, s in enumerate(sid_list) if s != 101]
    assert all(b.has_i[i] == 0.0 for i in unpaired)
    assert b.has_n.sum() == 0  # MedFuse has no notes
    # normalized HR column: in-bin values overwrite + previous-impute applied,
    # grid is [T=48, F=2 cont/onehot + masks]
    assert b.x_struct.shape[1] == 48
    labels = pd.read_parquet(os.path.join(out, "labels.parquet")).set_index("stay_id")
    assert labels.loc[101][[c for c in labels.columns if c.startswith("CCS_")]].tolist() == [1.0, 0.0, 1.0]


def test_medfuse_export_ihm_labels(tmp_path):
    from multimodalrouting_tpu.data.loader import load_split

    root, _ = _make_tree(tmp_path, task="in-hospital-mortality", classes=("y_true",))
    cfg_path = tmp_path / "channels.json"
    cfg_path.write_text(json.dumps(CHANNELS))
    out = str(tmp_path / "export")
    summary = medfuse_export(root, "in-hospital-mortality", out,
                             config_path=str(cfg_path), data_pairs="partial_ehr")
    assert summary["classes"] == ["y_true"]
    arrs = load_split(out, "train", task="mort", image_size=32)
    assert arrs.batch.y.tolist() == [1.0, 0.0]


def test_medfuse_cli_smoke(tmp_path, capsys):
    from multimodalrouting_tpu.cli import main

    root, _ = _make_tree(tmp_path)
    cfg_path = tmp_path / "channels.json"
    cfg_path.write_text(json.dumps(CHANNELS))
    rc = main([
        "etl", "medfuse", "--ehr-data-dir", root, "--task", "phenotyping",
        "--out", str(tmp_path / "exp"), "--channels-config", str(cfg_path),
        "--data-pairs", "partial_ehr",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["splits"] == {"train": 2, "val": 1, "test": 2}
    assert os.path.exists(os.path.join(tmp_path, "exp", "medfuse_normalizer.json"))


def test_medfuse_export_radiology_rejected(tmp_path):
    with pytest.raises(ValueError, match="radiology"):
        medfuse_export(str(tmp_path), "phenotyping", str(tmp_path / "o"),
                       data_pairs="radiology")
