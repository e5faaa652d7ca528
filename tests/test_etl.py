"""End-to-end ETL test on synthetic raw MIMIC-style CSVs:
varmap -> cohort build -> export -> runtime load -> Batch."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from multimodalrouting_tpu.data.cohort import (
    CohortConfig,
    apply_cohort_filters,
    build_cohort,
    link_cxr_to_stays,
    load_cxr_metadata,
    make_labels,
    normalize_value,
    patient_level_split,
)
from multimodalrouting_tpu.data.exporter import export_model_inputs
from multimodalrouting_tpu.data.loader import load_split
from multimodalrouting_tpu.data.tokenization import ChunkingConfig, chunk_token_ids, tokenize_stay_notes
from multimodalrouting_tpu.data.varmap import build_varmap


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    """Synthetic raw MIMIC-IV dump: 12 patients, HR + Glucose events."""
    d = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(0)
    n = 12
    base = pd.Timestamp("2130-01-01 00:00:00")

    patients = pd.DataFrame(
        {
            "subject_id": range(n),
            "anchor_age": rng.integers(15, 90, n),
            "anchor_year": 2130,
            "gender": rng.choice(["M", "F"], n),
        }
    )
    intimes = [base + pd.Timedelta(hours=int(h)) for h in rng.integers(0, 24, n)]
    los_h = rng.integers(30, 120, n)  # some stays < 48h
    icustays = pd.DataFrame(
        {
            "subject_id": range(n),
            "hadm_id": range(100, 100 + n),
            "stay_id": range(1000, 1000 + n),
            "intime": intimes,
            "outtime": [t + pd.Timedelta(hours=int(h)) for t, h in zip(intimes, los_h)],
        }
    )
    admissions = pd.DataFrame(
        {
            "hadm_id": range(100, 100 + n),
            "admittime": intimes,
            "dischtime": icustays["outtime"],
            "deathtime": [
                icustays["outtime"][i] if i % 5 == 0 else pd.NaT for i in range(n)
            ],
            "hospital_expire_flag": [(1 if i % 5 == 0 else 0) for i in range(n)],
        }
    )
    diagnoses = pd.DataFrame(
        {
            "hadm_id": list(range(100, 100 + n)) * 2,
            "icd_code": ["4280" if i % 2 == 0 else "49121" for i in range(2 * n)],
            "icd_version": [9] * 2 * n,
        }
    )
    for name, df in [
        ("patients", patients),
        ("icustays", icustays),
        ("admissions", admissions),
        ("diagnoses_icd", diagnoses),
    ]:
        df.to_csv(d / f"{name}.csv.gz", index=False, compression="gzip")

    # dictionaries
    d_items = pd.DataFrame(
        {
            "itemid": [220045, 211],
            "label": ["Heart Rate", "Heart Rate"],
            "abbreviation": ["HR", "HR"],
            "linksto": ["chartevents"] * 2,
            "unitname": ["bpm", "bpm"],
        }
    )
    d_labitems = pd.DataFrame(
        {"itemid": [50931], "label": ["Glucose"], "fluid": ["blood"], "unitname": ["mg/dL"]}
    )
    d_items.to_csv(d / "d_items.csv.gz", index=False, compression="gzip")
    d_labitems.to_csv(d / "d_labitems.csv.gz", index=False, compression="gzip")

    # events: HR every 3h in chartevents; glucose twice in labevents
    ce_rows, le_rows = [], []
    for i in range(n):
        for h in range(0, 48, 3):
            ce_rows.append(
                {
                    "stay_id": 1000 + i,
                    "charttime": intimes[i] + pd.Timedelta(hours=h),
                    "itemid": 220045,
                    "valuenum": 60 + rng.normal() * 8 + i,
                    "valueuom": "bpm",
                }
            )
        for h in (2, 30):
            le_rows.append(
                {
                    "hadm_id": 100 + i,
                    "charttime": intimes[i] + pd.Timedelta(hours=h),
                    "itemid": 50931,
                    "valuenum": 100 + i,
                    "valueuom": "mg/dL",
                }
            )
    pd.DataFrame(ce_rows).to_csv(d / "chartevents.csv.gz", index=False, compression="gzip")
    pd.DataFrame(le_rows).to_csv(d / "labevents.csv.gz", index=False, compression="gzip")

    # CXR metadata: one study per even patient at +10h
    meta = pd.DataFrame(
        {
            "subject_id": [i for i in range(n) if i % 2 == 0],
            "study_id": [5000 + i for i in range(n) if i % 2 == 0],
            "dicom_id": [f"dcm{i}" for i in range(n) if i % 2 == 0],
            "StudyDate": [int((intimes[i] + pd.Timedelta(hours=10)).strftime("%Y%m%d")) for i in range(n) if i % 2 == 0],
            "StudyTime": [float((intimes[i] + pd.Timedelta(hours=10)).strftime("%H%M%S")) for i in range(n) if i % 2 == 0],
        }
    )
    meta.to_csv(d / "cxr_metadata.csv.gz", index=False, compression="gzip")

    # notes
    notes = pd.DataFrame(
        {
            "hadm_id": range(100, 100 + n),
            "charttime": [intimes[i] + pd.Timedelta(hours=5) for i in range(n)],
            "text": [f"Patient {i} [**Name**] stable. Continue monitoring." for i in range(n)],
        }
    )
    notes.to_csv(d / "notes.csv.gz", index=False, compression="gzip")
    return d


def test_normalize_value():
    assert abs(normalize_value("Temperature", 98.6, "F", "c") - 37.0) < 1e-6
    assert abs(normalize_value("Glucose", 100, "mg/dL", "mmol/l") - 5.55) < 1e-6
    assert normalize_value("HeartRate", 70, "bpm", "") == 70


def test_varmap_builder(raw_dir):
    d_items = pd.read_csv(raw_dir / "d_items.csv.gz")
    d_lab = pd.read_csv(raw_dir / "d_labitems.csv.gz")
    vm = build_varmap(d_items, d_lab)
    assert set(vm["variable"]) == {"HeartRate", "Glucose"}
    hr = vm[vm["variable"] == "HeartRate"]
    # MetaVision-first: itemids >= 220000 sort ahead of CareVue ids
    assert hr.iloc[0]["itemid"] == 220045 and hr.iloc[0]["priority"] == 1
    assert list(hr["itemid"]) == [220045, 211]


def test_cohort_filters_and_labels(raw_dir):
    from multimodalrouting_tpu.data.cohort import load_core

    admissions, patients, icustays, diagnoses = load_core(str(raw_dir))
    labels = make_labels(icustays, admissions, patients, diagnoses)
    assert "mortality" in labels and "COPD_bronchiectasis" in labels
    assert labels["COPD_bronchiectasis"].sum() > 0  # 491.21 roots hit

    stays = apply_cohort_filters(labels, admissions)
    # adults only, >=48h stays, no deaths inside window
    assert (stays["age"] >= 18).all()
    hours = (stays["outtime"] - stays["intime"]).dt.total_seconds() / 3600
    assert (hours >= 48).all()


def test_split_partition():
    sids = pd.Series(range(100))
    tr, va, te = patient_level_split(sids)
    assert len(tr) + len(va) + len(te) == 100
    assert not (tr & va) and not (tr & te) and not (va & te)


def test_cxr_linking(raw_dir):
    from multimodalrouting_tpu.data.cohort import load_core

    admissions, patients, icustays, diagnoses = load_core(str(raw_dir))
    meta = load_cxr_metadata(str(raw_dir / "cxr_metadata.csv.gz"))
    assert meta["studydatetime"].notna().all()
    linked = link_cxr_to_stays(icustays, meta)
    have = linked["dicom_id"].notna()
    assert have.sum() > 0
    # only even subjects have studies
    assert set(linked.loc[have, "subject_id"] % 2) == {0}


def test_chunking_geometry():
    cfg = ChunkingConfig(max_len=16, stride=4, max_chunks=3)
    ids = list(range(1, 40))
    chunks, attn = chunk_token_ids(ids, cfg)
    assert chunks.shape == (3, 16)
    assert chunks[0, 0] == 101  # CLS
    # overlap: step = body - stride = 10; window 1 starts at id 11
    assert chunks[1, 1] == ids[10]
    ids_short, attn_s = chunk_token_ids([5, 6], cfg)
    assert ids_short.shape[0] == 1 and attn_s[0].sum() == 4  # CLS + 2 + SEP

    t_ids, t_attn, cmask = tokenize_stay_notes("hello world again", None, cfg)
    assert t_ids.shape == (3, 16) and cmask[0] == 1.0


@pytest.mark.slow
def test_full_pipeline(raw_dir, tmp_path):
    d_items = pd.read_csv(raw_dir / "d_items.csv.gz")
    d_lab = pd.read_csv(raw_dir / "d_labitems.csv.gz")
    vm = build_varmap(d_items, d_lab)
    vm_path = tmp_path / "varmap.csv"
    vm.to_csv(vm_path, index=False)

    cohort_dir = tmp_path / "cohort"
    cfg = CohortConfig(
        data_dir=str(raw_dir),
        out_dir=str(cohort_dir),
        varmap_path=str(vm_path),
        cxr_meta_path=str(raw_dir / "cxr_metadata.csv.gz"),
        notes_path=str(raw_dir / "notes.csv.gz"),
    )
    master = build_cohort(cfg)
    assert len(master) > 0
    assert os.path.exists(cohort_dir / "normalization.json")
    with open(cohort_dir / "normalization.json") as f:
        norm = json.load(f)
    assert set(norm["variables"]) == {"HeartRate", "Glucose"}

    # NPZ contents: forward-filled z-scored matrices
    sid = int(master["stay_id"].iloc[0])
    z = np.load(cohort_dir / "stays" / f"{sid}.npz")
    assert z["x"].shape == (24, 2)  # 48h / 2h bins x 2 vars
    assert np.isfinite(z["x"]).all()
    # HR sampled every 3h: after ffill most bins carry values -> nonzero variance
    assert np.abs(z["x"][:, 0]).sum() > 0

    export_dir = tmp_path / "export"
    export_model_inputs(
        str(cohort_dir), str(export_dir), chunking=ChunkingConfig(max_len=32, max_chunks=2)
    )
    for f_ in ("structured_48h.parquet", "notes_48h.parquet", "images_48h.parquet", "labels.parquet", "splits.json"):
        assert os.path.exists(export_dir / f_), f_

    arrays = load_split(str(export_dir), "train", image_size=32)
    b = arrays.batch
    n = b.batch_size
    assert n > 0
    assert b.x_struct.shape == (n, 24, 2)
    assert b.note_ids.shape == (n, 2, 32)
    assert b.image.shape == (n, 32, 32, 3)
    assert b.has_n.sum() > 0


def test_cli_etl_chain(raw_dir, tmp_path):
    """`cli etl varmap|cohort|export` chain (reference L0 CLI drivers:
    build_varmap_17.py, build_cohort.py main:590, export_model_inputs.py
    main:164) produces a loadable export."""
    from multimodalrouting_tpu.cli import main

    vm = tmp_path / "varmap.csv"
    assert main(["etl", "varmap", "--data-dir", str(raw_dir), "--out", str(vm)]) == 0
    assert pd.read_csv(vm)["variable"].nunique() >= 2

    cohort = tmp_path / "cohort"
    assert main([
        "etl", "cohort", "--data-dir", str(raw_dir), "--out", str(cohort),
        "--varmap", str(vm),
        "--cxr-meta", str(raw_dir / "cxr_metadata.csv.gz"),
        "--notes", str(raw_dir / "notes.csv.gz"),
    ]) == 0
    assert (cohort / "cohort_master.csv.gz").exists()
    assert (cohort / "normalization.json").exists()

    export = tmp_path / "export"
    assert main([
        "etl", "export", "--cohort", str(cohort), "--out", str(export),
        "--max-len", "32", "--max-chunks", "2",
    ]) == 0
    for f_ in ("structured_48h.parquet", "notes_48h.parquet",
               "images_48h.parquet", "labels.parquet", "splits.json"):
        assert (export / f_).exists(), f_

    arrays = load_split(str(export), "train", image_size=32)
    assert arrays.batch.batch_size > 0
    assert arrays.batch.note_ids.shape[1:] == (2, 32)


def test_cli_etl_legacy(raw_dir, tmp_path):
    """`cli etl legacy` (Data/icustay_dataset.py:83-197 semantics): wide
    lab_{itemid}_b{bin} structured frame + PE/PH labels + cleaned notes."""
    from multimodalrouting_tpu.cli import main

    out = tmp_path / "legacy"
    assert main(["etl", "legacy", "--data-dir", str(raw_dir),
                 "--out", str(out)]) == 0
    structured = pd.read_csv(out / "final_structured_dataset.csv")
    assert {"stay_id", "mortality", "pe", "ph"} <= set(structured.columns)
    lab_cols = [c for c in structured.columns if c.startswith("lab_")]
    assert lab_cols  # the 0-24h glucose event lands in a lab_50931_b1 column
    notes = pd.read_csv(out / "final_unstructured_notes.csv")
    assert len(notes) > 0
    # de-identification brackets removed by clean_note_text
    assert not notes["text"].str.contains(r"\[\*\*", regex=True).any()


def test_cli_etl_inspect(tmp_path):
    """`cli etl inspect` (INSPECT/Data 00+01+02): cohort merge with the
    reference's impression-keyed mapping schema, OMOP long EHR filtered to
    study_time, impressions joined with labels."""
    from multimodalrouting_tpu.cli import main

    d = tmp_path / "in"
    d.mkdir()
    # reference schema: metadata has impression_id only; mapping carries
    # person_id + procedure_DATETIME (00_...py:25-37)
    pd.DataFrame({"impression_id": [1, 2], "modality": ["CT", "CT"]}).to_csv(
        d / "metadata.tsv", sep="\t", index=False)
    pd.DataFrame({
        "impression_id": [1, 2], "person_id": [70, 80],
        "procedure_DATETIME": ["2130-05-01", "2130-06-01"],
    }).to_csv(d / "mapping.tsv", sep="\t", index=False)
    pd.DataFrame({
        "impression_id": [1, 2], "person_id": [70, 80],  # stray, dropped
        "pe_positive_nlp": [1, 0], "1_month_mortality": [0, 1],
    }).to_csv(d / "labels.tsv", sep="\t", index=False)
    pd.DataFrame({"impression_id": [1], "split_name": ["test"]}).to_csv(
        d / "splits.tsv", sep="\t", index=False)
    pd.DataFrame({"impression_id": [1, 2],
                  "impressions": ["PE seen", "clear"]}).to_csv(
        d / "impressions.csv", index=False)
    omop = d / "omop"
    omop.mkdir()
    pd.DataFrame({
        "person_id": [70, 70, 80],
        "condition_concept_id": [101, 102, 103],
        "condition_start_DATETIME": ["2130-04-01", "2130-05-15", "2130-05-20"],
    }).to_csv(omop / "condition_occurrence.csv", index=False)

    out = tmp_path / "out"
    assert main([
        "etl", "inspect",
        "--metadata", str(d / "metadata.tsv"), "--mapping", str(d / "mapping.tsv"),
        "--labels", str(d / "labels.tsv"), "--splits", str(d / "splits.tsv"),
        "--impressions", str(d / "impressions.csv"), "--omop-dir", str(omop),
        "--out", str(out),
    ]) == 0
    cohort = pd.read_csv(out / "inspect_cohort.csv")
    assert sorted(cohort["split"]) == ["test", "train"]  # missing -> train
    assert "study_time" in cohort.columns  # procedure_DATETIME renamed
    long = pd.read_csv(out / "inspect_long_ehr.csv.gz")
    # person 70's 05-15 event is after its 05-01 study_time -> filtered
    assert sorted(long["concept_id"]) == [101, 103]
    iw = pd.read_csv(out / "inspect_impressions_with_labels.csv")
    assert {"impressions", "pe_positive_nlp"} <= set(iw.columns)
