"""Unimodal models, legacy cohort pipeline, INSPECT ETL tests."""
import jax
import numpy as np
import pandas as pd
import pytest

from multimodalrouting_tpu.data.inspect_etl import (
    build_long_ehr,
    concept_vocab,
    filter_omop_to_study_time,
    impressions_with_labels,
    merge_cohort,
)
from multimodalrouting_tpu.data.legacy_cohort import pe_ph_labels, pivot_labs_wide
from multimodalrouting_tpu.models.unimodal import NoteEmbeddingClassifier, WideBEHRTClassifier


def test_wide_behrt_classifier():
    x = np.random.default_rng(0).normal(size=(4, 12 * 5)).astype(np.float32)
    model = WideBEHRTClassifier(n_bins=12, n_labs=5, d=32, n_layers=1, n_heads=4)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert set(out) == {"mortality", "pe", "ph"}
    assert out["pe"].shape == (4,)


def test_note_embedding_classifier():
    emb = np.random.default_rng(1).normal(size=(6, 768)).astype(np.float32)
    model = NoteEmbeddingClassifier(hidden=32)
    params = model.init(jax.random.PRNGKey(0), emb)
    out = model.apply(params, emb)
    assert out.shape == (6,)


def test_pe_ph_labels():
    dx = pd.DataFrame(
        {
            "hadm_id": [1, 1, 2, 3],
            "icd_code": ["415.11", "4280", "416.0", "4939"],
            "icd_version": [9, 9, 9, 9],
        }
    )
    lab = pe_ph_labels(dx).set_index("hadm_id")
    assert lab.loc[1, "pe"] == 1 and lab.loc[1, "ph"] == 0
    assert lab.loc[2, "ph"] == 1
    assert lab.loc[3, "pe"] == 0 and lab.loc[3, "ph"] == 0


def test_pivot_labs_wide():
    base = pd.Timestamp("2130-01-01")
    stays = pd.DataFrame({"hadm_id": [1], "stay_id": [10], "intime": [base]})
    le = pd.DataFrame(
        {
            "hadm_id": [1, 1, 1],
            "itemid": [50931, 50931, 50912],
            "charttime": [base + pd.Timedelta(hours=h) for h in (1, 3, 30)],
            "valuenum": [100.0, 110.0, 5.0],
        }
    )
    wide = pivot_labs_wide(le, stays, window_hours=24, bin_hours=2)
    assert wide.loc[0, "lab_50931_b0"] == 100.0
    assert wide.loc[0, "lab_50931_b1"] == 110.0
    # event at +30h excluded from 24h window
    assert not any("50912" in c for c in wide.columns)


def test_inspect_merge_and_omop_filter():
    metadata = pd.DataFrame(
        {"impression_id": [1, 2], "patient_id": [7, 8],
         "study_time": pd.to_datetime(["2130-05-01", "2130-06-01"])}
    )
    mapping = pd.DataFrame({"patient_id": [7, 8], "person_id": [70, 80]})
    labels = pd.DataFrame({"impression_id": [1, 2], "pe_positive_nlp": [1, 0]})
    splits = pd.DataFrame({"impression_id": [1], "split": ["test"]})
    imps = pd.DataFrame({"impression_id": [1, 2], "impressions": ["PE seen", "clear"]})
    cohort = merge_cohort(metadata, mapping, labels, splits, imps)
    assert list(cohort["split"]) == ["test", "train"]

    events = pd.DataFrame(
        {
            "person_id": [70, 70, 80],
            "condition_concept_id": [101, 102, 103],
            "condition_start_DATETIME": pd.to_datetime(
                ["2130-04-01", "2130-05-15", "2130-05-20"]
            ),
        }
    )
    kept = filter_omop_to_study_time(events, cohort, "condition_start_DATETIME")
    # person 70: event after its 05-01 study time dropped; person 80 keeps its
    assert set(kept["condition_concept_id"]) == {101, 103}

    long = build_long_ehr({"condition_occurrence": events}, cohort)
    assert list(long.columns[:4]) == ["person_id", "concept_id", "event_time", "table"]
    vocab = concept_vocab(long, "condition_occurrence")
    assert all(v >= 1 for v in vocab.values())

    iw = impressions_with_labels(imps, labels)
    assert "pe_positive_nlp" in iw.columns


def test_load_inspect_structured_reference_semantics(tmp_path):
    """FinalStructuredDataset parity (INSPECT/BEHRT.py:23-60): fillna,
    whole-file factorize, int labels, split column honored."""
    from multimodalrouting_tpu.data.inspect_etl import load_inspect_structured

    df = pd.DataFrame({
        "procedure_concept_name": ["a", "b", "a", None, "c", "b"],
        "measurement_concept_name": ["x", "x", "y", "y", "x", None],
        "drug_concept_name": ["d1", "d2", "d1", "d2", "d3", "d3"],
        "pe_positive_nlp": [1, 0, 1, 0, "1", None],
        "1_month_mortality": [0, 0, 1, 1, 0, 0],
        "1_month_readmission": [0, 1, 0, 0, 1, 0],
        "12_month_PH": [1, 1, 0, 0, 0, 1],
        "split": ["train", "train", "val", "test", "train", "val"],
        "sens": ["m", "f", "m", "f", "m", "f"],
    })
    csv = tmp_path / "final_structured_dataset.csv.gz"
    df.to_csv(csv, index=False, compression="gzip")

    data = load_inspect_structured(str(csv))
    vocab_sizes = data.pop("_vocab_sizes")
    tasks = data.pop("_tasks")
    assert set(data) == {"train", "val", "test"}
    # factorize over the WHOLE file: proc has a,b,None->'missing',c = 4 codes
    assert vocab_sizes == (4, 3, 3)
    assert len(tasks) == 4
    assert data["train"]["proc"].shape == (3,)
    assert data["val"]["proc"].shape == (2,)
    assert data["test"]["proc"].shape == (1,)
    # same concept string -> same id across splits ("a" rows 0 and 2)
    assert data["train"]["proc"][0] == data["val"]["proc"][0]
    # labels coerced: "1" -> 1, None -> 0
    assert data["train"]["y"][2, 0] == 1.0  # row 4 "1"
    assert data["val"]["y"][1, 0] == 0.0  # row 5 None
    assert data["train"]["y"].dtype == np.float32
    assert list(data["train"]["sens"]) == ["m", "f", "m"]


def test_load_inspect_structured_seeded_split(tmp_path):
    from multimodalrouting_tpu.data.inspect_etl import load_inspect_structured

    n = 40
    df = pd.DataFrame({
        "procedure_concept_name": [f"p{i % 5}" for i in range(n)],
        "measurement_concept_name": [f"m{i % 3}" for i in range(n)],
        "drug_concept_name": [f"d{i % 4}" for i in range(n)],
        "pe_positive_nlp": [i % 2 for i in range(n)],
        "1_month_mortality": [0] * n,
        "1_month_readmission": [0] * n,
        "12_month_PH": [1] * n,
    })
    csv = tmp_path / "s.csv"
    df.to_csv(csv, index=False)
    d1 = load_inspect_structured(str(csv), seed=7)
    d2 = load_inspect_structured(str(csv), seed=7)
    total = sum(len(d1[s]["proc"]) for s in ("train", "val", "test"))
    assert total == n
    np.testing.assert_array_equal(d1["val"]["proc"], d2["val"]["proc"])


def _impressions_csv(tmp_path, n=48, rows_per_patient=(1, 2)):
    """Synthetic radiology-impressions CSV (INSPECT/BioClinicalBERT.py CONFIG
    schema: person_id, impression_text, label columns, year_of_birth)."""
    rng = np.random.default_rng(0)
    rows = []
    for pid in range(n):
        pe = int(pid % 2)
        for r in range(rows_per_patient[pid % len(rows_per_patient)]):
            text = ("pulmonary embolism seen in segmental artery"
                    if pe else "lungs are clear no acute process")
            rows.append({
                "person_id": pid,
                "impression_text": f"{text} scan {r}",
                "pe_positive_nlp": pe,
                "1_month_mortality": int(rng.random() < 0.3),
                "year_of_birth": int(2130 - rng.integers(20, 95)),
            })
    csv = tmp_path / "radiology_impressions_with_all_labels.csv.gz"
    pd.DataFrame(rows).to_csv(csv, index=False, compression="gzip")
    return csv


def test_load_impressions_dataset(tmp_path):
    """Reference semantics (INSPECT/BioClinicalBERT.py main:171-223): notes
    grouped per patient, labels deduplicated, age buckets as sens groups,
    deterministic stratified-intent split."""
    from multimodalrouting_tpu.data.inspect_etl import (
        assign_age_bucket,
        load_impressions_dataset,
    )

    assert assign_age_bucket(25) == "18-29"
    assert assign_age_bucket(70) == "70-89"
    assert assign_age_bucket(95) == "90+"
    assert assign_age_bucket(None) == "unknown"

    csv = _impressions_csv(tmp_path, n=40)
    d = load_impressions_dataset(
        str(csv), max_len=16, stride=4, max_chunks=2,
        seed=3, test_frac=0.2, val_frac=0.1,
    )
    assert d["_tasks"] == ("pe_positive_nlp", "1_month_mortality")
    sizes = {s: d[s].batch_size for s in ("train", "val", "test")}
    assert sum(sizes.values()) == 40  # one row per PATIENT, not per note
    assert sizes["test"] == 8 and sizes["val"] == 4
    for s in ("train", "val", "test"):
        b = d[s]
        assert b.note_ids.shape[1:] == (2, 16)
        assert b.y.shape == (b.batch_size, 2)
        # every patient has text -> has_n all ones, other modalities absent
        assert b.has_n.all() and not b.has_l.any() and not b.has_i.any()
        assert b.sens is not None and b.sens.shape == (b.batch_size,)
    # split carries both pe classes everywhere (the retry loop's invariant)
    for s in ("train", "val", "test"):
        assert {0.0, 1.0} <= set(np.unique(np.asarray(d[s].y)[:, 0]))
    # deterministic
    d2 = load_impressions_dataset(
        str(csv), max_len=16, stride=4, max_chunks=2,
        seed=3, test_frac=0.2, val_frac=0.1,
    )
    np.testing.assert_array_equal(d["val"].note_ids, d2["val"].note_ids)


def test_load_impressions_groups_multirow_patients(tmp_path):
    from multimodalrouting_tpu.data.inspect_etl import load_impressions_dataset

    df = pd.DataFrame({
        "person_id": [1, 1, 2],
        "impression_text": ["first note", "second note", "other patient"],
        "pe_positive_nlp": [1, 1, 0],
        "1_month_mortality": [0, 0, 1],
    })
    csv = tmp_path / "i.csv"
    df.to_csv(csv, index=False)
    d = load_impressions_dataset(str(csv), max_len=16, stride=4, max_chunks=2)
    total = sum(d[s].batch_size for s in ("train", "val", "test"))
    assert total == 2  # patient 1's two notes concatenated into one row


@pytest.mark.slow
def test_cli_unimodal_note_impressions(tmp_path, capsys):
    """`cli unimodal --modality note --impressions-csv` end-to-end: the
    INSPECT text-only multitask model (INSPECT/BioClinicalBERT.py) — chunked
    frozen-BERT embeddings -> MLP, metrics + age-bucket fairness JSON."""
    import json as _json

    from multimodalrouting_tpu import cli

    csv = _impressions_csv(tmp_path, n=48)
    out = tmp_path / "run"
    rc = cli.main([
        "unimodal", "--modality", "note", "--impressions-csv", str(csv),
        "--epochs", "4", "--out", str(out), "--stride", "4",
        "--set", "encoder.d=32", "--set", "model.d=32",
        "--set", "encoder.bert_hidden=32", "--set", "encoder.bert_layers=1",
        "--set", "encoder.bert_heads=4", "--set", "encoder.bert_intermediate=64",
        "--set", "encoder.bert_max_position=64",
        "--set", "encoder.notes_max_chunks=2", "--set", "encoder.text_max_len=16",
        "--set", "train.batch_size=8",
    ])
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["modality"] == "note"
    assert set(res["auroc"]) == {"pe_positive_nlp", "1_month_mortality"}
    assert (out / "unimodal_metrics.json").exists()
    fair = _json.loads((out / "fairness.json").read_text())
    assert set(fair) == {"pe_positive_nlp", "1_month_mortality"}


@pytest.mark.slow
def test_cli_unimodal_omop_synthetic(tmp_path, capsys):
    """`cli unimodal --modality omop` end-to-end on the synthetic cohort."""
    import json as _json

    from multimodalrouting_tpu import cli

    rc = cli.main([
        "unimodal", "--modality", "omop", "--epochs", "8",
        "--out", str(tmp_path),
        "--set", "data.synthetic_n=128", "--set", "model.d=32",
        "--set", "train.batch_size=32", "--set", "train.lr=5e-3",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = _json.loads(out)
    assert res["modality"] == "omop"
    assert set(res["auroc"]) == {"pe", "mort1m", "read1m", "ph12m"}
    assert (tmp_path / "unimodal_metrics.json").exists()
    assert (tmp_path / "fairness.json").exists()


@pytest.mark.slow  # per-slice conv stacks on CPU
def test_cli_unimodal_ct_synthetic(tmp_path, capsys):
    """`cli unimodal --modality ct` end-to-end: the CT branch of the
    reference's image-encoder switch (INSPECT/models/encoders.py:119-207)
    trains on synthetic volumes whose pe label is slab-intensity-derived,
    so the fit must beat chance on that task."""
    import json as _json

    from multimodalrouting_tpu import cli

    rc = cli.main([
        "unimodal", "--modality", "ct", "--epochs", "6",
        "--out", str(tmp_path),
        "--set", "data.synthetic_n=96", "--set", "model.d=32",
        "--set", "train.batch_size=32", "--set", "train.lr=1e-3",
        "--set", "encoder.vision_backbone=resnet18",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = _json.loads(out)
    assert res["modality"] == "ct"
    assert set(res["auroc"]) == {"pe", "mort1m", "read1m", "ph12m"}
    assert res["auroc"]["pe"] > 0.6, f"slab-intensity pe task should learn: {res['auroc']}"
    assert (tmp_path / "unimodal_metrics.json").exists()
    assert (tmp_path / "fairness.json").exists()
