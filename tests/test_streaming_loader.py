"""Streaming loader (VERDICT r2 item 9): memory-bounded batch iteration."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from multimodalrouting_tpu.data.loader import load_split
from multimodalrouting_tpu.data.streaming import StreamStats, iter_split_batches


def _write_export(out_dir, n_stays, t=4, f=2, s=1, l=8, seed=0):
    """Synthetic export in the exporter's parquet schema (data/exporter.py)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    stay_ids = list(range(1000, 1000 + n_stays))

    srows = []
    for sid in stay_ids:
        for b in range(t):
            srows.append({"stay_id": sid, "bin": b,
                          **{f"v{j}": float(rng.normal()) for j in range(f)}})
    pd.DataFrame(srows).to_parquet(os.path.join(out_dir, "structured_48h.parquet"), index=False)

    nrows = []
    for sid in stay_ids:
        ids = rng.integers(1, 100, size=(s, l)).astype(np.int32)
        nrows.append({
            "stay_id": sid,
            "input_ids": ids.reshape(-1).tolist(),
            "attention_mask": np.ones((s, l), np.int32).reshape(-1).tolist(),
            "chunk_mask": [1.0] * s,
            "n_chunks": s, "shape_s": s, "shape_l": l,
        })
    pd.DataFrame(nrows).to_parquet(os.path.join(out_dir, "notes_48h.parquet"), index=False)

    pd.DataFrame({
        "stay_id": stay_ids,
        "has_image": [0] * n_stays,  # no decode in this test
    }).to_parquet(os.path.join(out_dir, "images_48h.parquet"), index=False)

    pd.DataFrame({
        "stay_id": stay_ids,
        "mortality": rng.integers(0, 2, n_stays).astype(np.int8),
        "readmit_30d": rng.integers(0, 2, n_stays).astype(np.int8),
    }).to_parquet(os.path.join(out_dir, "labels.parquet"), index=False)

    splits = {
        "train": stay_ids[: int(n_stays * 0.8)],
        "val": stay_ids[int(n_stays * 0.8):],
        "test": [],
    }
    with open(os.path.join(out_dir, "splits.json"), "w") as fjson:
        json.dump(splits, fjson)
    return splits


def test_streaming_matches_load_split(tmp_path):
    _write_export(str(tmp_path), 50)
    dense = load_split(str(tmp_path), "train", task="mort", image_size=8)
    got_ids, got = [], []
    for batch, sids in iter_split_batches(
        str(tmp_path), "train", batch_size=8, task="mort", image_size=8
    ):
        got.append(batch)
        got_ids.extend(sids.tolist())
    assert got_ids == dense.stay_ids.tolist()
    x = np.concatenate([np.asarray(b.x_struct) for b in got])
    np.testing.assert_allclose(x, np.asarray(dense.batch.x_struct))
    ids = np.concatenate([np.asarray(b.note_ids) for b in got])
    np.testing.assert_array_equal(ids, np.asarray(dense.batch.note_ids))
    y = np.concatenate([np.asarray(b.y) for b in got])
    np.testing.assert_allclose(y, np.asarray(dense.batch.y))
    hn = np.concatenate([np.asarray(b.has_n) for b in got])
    np.testing.assert_allclose(hn, np.asarray(dense.batch.has_n))


def test_streaming_task_readmit_and_remainder(tmp_path):
    _write_export(str(tmp_path), 21)
    labels = pd.read_parquet(tmp_path / "labels.parquet").set_index("stay_id")
    batches = list(iter_split_batches(
        str(tmp_path), "train", batch_size=4, task="readmit", image_size=8
    ))
    n_total = sum(b.batch_size for b, _ in batches)
    assert n_total == 16  # 80% of 21 -> 16 train stays
    for b, sids in batches:
        for i, sid in enumerate(sids):
            assert float(b.y[i]) == float(labels.loc[int(sid), "readmit_30d"])


def test_streaming_is_memory_bounded_10k(tmp_path):
    """10k-stay export: the join buffer must stay tiny (aligned files), and
    assembled arrays only ever cover one batch."""
    _write_export(str(tmp_path), 10_000, t=2, f=2, s=1, l=4)
    stats = StreamStats()
    seen = 0
    for batch, _ in iter_split_batches(
        str(tmp_path), "train", batch_size=256, task="mort", image_size=4,
        rows_per_read=512, stats=stats,
    ):
        seen += batch.batch_size
    assert seen == 8_000
    assert stats.stays_seen == 8_000
    # bounded join: orders of magnitude below the split size
    assert stats.max_buffered_stays <= 64, stats.max_buffered_stays


def test_streaming_shuffle_buffer_permutes_but_preserves_set(tmp_path):
    splits = _write_export(str(tmp_path), 60)
    ordered = [
        int(s)
        for _, sids in iter_split_batches(str(tmp_path), "train", batch_size=8, image_size=4)
        for s in sids
    ]
    shuffled = [
        int(s)
        for _, sids in iter_split_batches(
            str(tmp_path), "train", batch_size=8, image_size=4,
            shuffle_buffer=16, seed=3,
        )
        for s in sids
    ]
    assert sorted(ordered) == sorted(shuffled) == sorted(splits["train"])
    assert ordered != shuffled


def test_streaming_split_trains_end_to_end(tmp_path):
    """StreamingSplit drives train_model: sequential pulls, same semantics."""
    from multimodalrouting_tpu.data.loader import load_split as _ls
    from multimodalrouting_tpu.data.streaming import StreamingSplit
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import train_model
    from tests.helpers import tiny_config

    _write_export(str(tmp_path), 40, t=4, f=2, s=1, l=8)
    cfg = tiny_config(**{
        "encoder.structured_seq_len": 4, "encoder.structured_n_feats": 2,
        "encoder.notes_max_chunks": 1, "encoder.text_max_len": 8,
        "encoder.image_size": 16,
        "train.batch_size": 8, "train.epochs": 2,
        "train.use_ema": False, "train.sampler_mode": "none",
        "train.route_dropout_p": 0.0, "train.encoder_warmup_epochs": 0,
    })
    tr = StreamingSplit(str(tmp_path), "train", task="mort",
                        image_size=16, shuffle_buffer=16, seed=0)
    assert tr.batch_size == 32  # 80% of 40
    va = _ls(str(tmp_path), "val", task="mort", image_size=16).batch
    model = CapsuleRoutingModel(cfg=cfg)
    res = train_model(cfg, model, tr, va, family="capsule", log_fn=lambda s: None)
    assert len(res.history) == 2
    assert np.isfinite(res.history[-1]["train_loss"])
    # each epoch saw the whole split once (4 batches of 8)
    assert tr.stats.batches_emitted == 8


def test_streaming_split_rejects_random_access_features(tmp_path):
    from multimodalrouting_tpu.data.streaming import StreamingSplit
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import train_model
    from tests.helpers import tiny_batch, tiny_config

    _write_export(str(tmp_path), 16, t=4, f=2, s=1, l=8)
    tr = StreamingSplit(str(tmp_path), "train", task="mort", image_size=16)
    va = tiny_batch(n=8)
    cfg = tiny_config(**{
        "encoder.structured_seq_len": 4, "encoder.structured_n_feats": 2,
        "encoder.notes_max_chunks": 1, "encoder.text_max_len": 8,
        "encoder.image_size": 16,
        "train.batch_size": 8, "train.epochs": 1, "train.use_ema": False,
        "train.chunk_bucketing": True,
    })
    model = CapsuleRoutingModel(cfg=cfg)
    with pytest.raises(ValueError, match="random access"):
        train_model(cfg, model, tr, va, family="capsule", log_fn=lambda s: None)


def test_streaming_weighted_sampler_oversamples_positives(tmp_path):
    """enable_sampler('sqrt') must shift the emitted label mix toward the
    reference sampler's expectation p_pos' = pos*w_pos/(neg + pos*w_pos)."""
    from multimodalrouting_tpu.data.streaming import StreamingSplit

    _write_export(str(tmp_path), 200, t=4, f=2, s=1, l=8, seed=3)
    # make the cohort imbalanced: relabel so ~10% positives
    import pandas as pd  # noqa: PLC0415

    labels = pd.read_parquet(os.path.join(str(tmp_path), "labels.parquet"))
    rng = np.random.default_rng(0)
    labels["mortality"] = (rng.random(len(labels)) < 0.1).astype(np.int8)
    labels.to_parquet(os.path.join(str(tmp_path), "labels.parquet"), index=False)

    tr = StreamingSplit(str(tmp_path), "train", task="mort", image_size=16,
                        shuffle_buffer=32, seed=0)
    base = np.concatenate([np.asarray(b.y) for b in tr.epoch_iter(0, 8)])
    tr.enable_sampler("sqrt")
    got = np.concatenate([np.asarray(b.y) for b in tr.epoch_iter(0, 8)])

    pos = base.sum()
    neg = len(base) - pos
    w_pos = float(np.clip(np.sqrt(neg / max(pos, 1)), 1.0, 5.0))
    expect = pos * w_pos / (neg + pos * w_pos)
    assert got.mean() > base.mean() * 1.5, (got.mean(), base.mean())
    assert abs(got.mean() - expect) < 0.12, (got.mean(), expect)
    # epoch length stays ~N in expectation
    assert abs(len(got) - len(base)) <= len(base) * 0.35


def test_streaming_split_trains_with_sqrt_sampler(tmp_path):
    from multimodalrouting_tpu.data.loader import load_split as _ls
    from multimodalrouting_tpu.data.streaming import StreamingSplit
    from multimodalrouting_tpu.models.full import CapsuleRoutingModel
    from multimodalrouting_tpu.train.loop import train_model
    from tests.helpers import tiny_config

    _write_export(str(tmp_path), 40, t=4, f=2, s=1, l=8)
    cfg = tiny_config(**{
        "encoder.structured_seq_len": 4, "encoder.structured_n_feats": 2,
        "encoder.notes_max_chunks": 1, "encoder.text_max_len": 8,
        "encoder.image_size": 16,
        "train.batch_size": 8, "train.epochs": 1,
        "train.use_ema": False, "train.sampler_mode": "sqrt",
        "train.route_dropout_p": 0.0, "train.encoder_warmup_epochs": 0,
    })
    tr = StreamingSplit(str(tmp_path), "train", task="mort",
                        image_size=16, shuffle_buffer=16, seed=0)
    va = _ls(str(tmp_path), "val", task="mort", image_size=16).batch
    res = train_model(cfg, CapsuleRoutingModel(cfg=cfg), tr, va,
                      family="capsule", log_fn=lambda s: None)
    assert np.isfinite(res.history[-1]["train_loss"])
