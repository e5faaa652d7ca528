"""Serving path (serve.py + `cli predict`): static-shape predictor,
calibration application, record assembly, JSONL and HTTP surfaces.

The reference has no serving surface (inference = demo prints,
`Model/inference_demo.py`); these tests pin the productionized contract.
"""
import json
import os
import urllib.request

import numpy as np
import pytest

from multimodalrouting_tpu.data.batches import Batch
from tests.helpers import tiny_batch, tiny_config

pytestmark = pytest.mark.slow  # trains a tiny checkpoint end-to-end

from tests.test_cli_and_baselines import TINY_SETS


def _sets():
    out = []
    for s in TINY_SETS:
        out += ["--set", s]
    return out


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from multimodalrouting_tpu.cli import main

    out = str(tmp_path_factory.mktemp("serve") / "run")
    rc = main(
        ["train", "--family", "capsule", "--task", "mort", "--routes", "10",
         "--epochs", "1", "--out", out] + _sets()
    )
    assert rc == 0
    return out


@pytest.fixture(scope="module")
def predictor(tiny_ckpt):
    from multimodalrouting_tpu.serve import Predictor

    return Predictor(tiny_ckpt, "capsule", name="final")


def test_predictor_matches_eval_path(predictor, tiny_ckpt):
    """Predictor probs == the eval-path probs with the saved temperature."""
    import jax

    from multimodalrouting_tpu.ckpt import load_config, load_meta, restore_checkpoint
    from multimodalrouting_tpu.models.full import build_model
    from multimodalrouting_tpu.train.loop import _predict_probs
    from multimodalrouting_tpu.train.state import create_train_state, n_route_loss_ema_for
    from multimodalrouting_tpu.train.steps import make_eval_step

    cfg = load_config(tiny_ckpt, "final")
    batch = tiny_batch(n=cfg.train.batch_size, seed=7)

    model = build_model(cfg, "capsule")
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = create_train_state(
        cfg, model, variables, n_route_loss_ema=n_route_loss_ema_for(cfg, "capsule")
    )
    state = restore_checkpoint(tiny_ckpt, state, name="final")
    eval_step = make_eval_step(cfg, model, "capsule")
    probs_ref, _, _ = _predict_probs(eval_step, state, batch, cfg.train.batch_size, "mort")
    t = float(load_meta(tiny_ckpt, "final").get("temperature", 1.0) or 1.0)
    if t != 1.0:
        eps = 1e-7
        p = np.clip(probs_ref, eps, 1 - eps)
        lg = np.log(p) - np.log1p(-p)
        probs_ref = 1.0 / (1.0 + np.exp(-lg / t))

    out = predictor.predict(batch)
    np.testing.assert_allclose(out["probs"], probs_ref, rtol=1e-5, atol=1e-6)
    assert out["pred"].shape == out["probs"].shape
    assert out["alpha"].shape[1] == 10


def test_padding_invariance(predictor):
    """A ragged request (n != serving batch) scores each row identically to
    the full-batch path — the clipped-gather padding never leaks pad rows."""
    full = tiny_batch(n=predictor.batch_size, seed=11)
    ragged_n = predictor.batch_size - 1 or 1
    ragged = Batch(*(None if v is None else v[:ragged_n] for v in full))

    p_full = predictor.predict(full)["probs"][:ragged_n]
    p_ragged = predictor.predict(ragged)["probs"]
    assert len(p_ragged) == ragged_n
    np.testing.assert_allclose(p_ragged, p_full, rtol=1e-5, atol=1e-6)


def test_batch_from_records_presence_and_shapes(tiny_ckpt):
    from multimodalrouting_tpu.ckpt import load_config
    from multimodalrouting_tpu.serve import batch_from_records

    cfg = load_config(tiny_ckpt, "final")
    t, f = cfg.encoder.structured_seq_len, cfg.encoder.structured_n_feats
    s, l = cfg.encoder.notes_max_chunks, min(cfg.encoder.text_max_len, 128)
    recs = [
        {"x_struct": np.ones((t, f)), "image": np.ones((64, 64, 3))},  # image cropped
        {"note_ids": np.ones((1, 8), np.int64)},  # chunks/len padded up
        {},  # fully missing
    ]
    b = batch_from_records(cfg, recs)
    assert b.x_struct.shape == (3, t, f)
    assert b.note_ids.shape == (3, s, l)
    # presence derived from provided modalities only
    np.testing.assert_array_equal(b.has_l, [1, 0, 0])
    np.testing.assert_array_equal(b.has_n, [0, 1, 0])
    np.testing.assert_array_equal(b.has_i, [1, 0, 0])
    # default attn mask = nonzero ids; padded tail stays masked
    assert b.note_attn[1, 0, :8].sum() == 8
    assert b.note_attn[1, 0, 8:].sum() == 0
    assert b.chunk_mask[1].sum() == 1


def test_predict_records_routes(predictor):
    recs = [
        {"x_struct": np.random.default_rng(0).normal(size=(12, 16))},
        {},
    ]
    rows = predictor.predict_records(recs)
    assert len(rows) == 2
    for row in rows:
        p = row["probs"][0] if isinstance(row["probs"], list) else row["probs"]
        assert 0.0 <= p <= 1.0
        assert set(row["alpha"].keys()) == set(predictor.routes)
        assert len(row["top_routes"]) == 3


def test_cli_predict_jsonl(tiny_ckpt, capsys):
    from multimodalrouting_tpu.cli import main

    out_path = os.path.join(tiny_ckpt, "preds.jsonl")
    rc = main(["predict", "--ckpt", tiny_ckpt, "--family", "capsule",
               "--out", out_path])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rows = [json.loads(ln) for ln in open(out_path)]
    assert summary["rows"] == len(rows) > 0
    assert "probs" in rows[0] and "pred" in rows[0] and "top_routes" in rows[0]


def test_http_server_roundtrip(predictor):
    import threading

    from multimodalrouting_tpu.serve import make_http_server

    server = make_http_server(predictor, port=0)  # ephemeral port
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        host, port = server.server_address[:2]
        base = f"http://{host}:{port}"

        with urllib.request.urlopen(f"{base}/health", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["ok"] and health["routes"] == predictor.routes

        body = json.dumps({"records": [{"x_struct": [[0.1] * 16] * 12}, {}]}).encode()
        req = urllib.request.Request(
            f"{base}/predict", data=body, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
        assert len(payload["predictions"]) == 2
        assert "alpha" in payload["predictions"][0]

        # malformed request -> 400, server stays alive
        bad = urllib.request.Request(f"{base}/predict", data=b"{}",
                                     headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        # malformed record shapes -> 400 too
        bad_rec = json.dumps({"records": [{"image": [1.0, 2.0]}]}).encode()
        req2 = urllib.request.Request(f"{base}/predict", data=bad_rec,
                                      headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req2, timeout=30)
        assert ei.value.code == 400
        with urllib.request.urlopen(f"{base}/health", timeout=30) as resp:
            assert json.loads(resp.read())["ok"]
    finally:
        server.shutdown()
        th.join(timeout=10)


def test_http_server_side_failure_is_500(predictor, monkeypatch):
    """A device/internal failure must surface as 500 (retry/alert), never as
    400 (client drops the request as malformed)."""
    import threading

    from multimodalrouting_tpu.serve import make_http_server

    def boom(batch):
        raise RuntimeError("device transport lost")

    monkeypatch.setattr(predictor, "predict", boom)
    server = make_http_server(predictor, port=0)
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        host, port = server.server_address[:2]
        body = json.dumps({"records": [{}]}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 500
    finally:
        server.shutdown()
        th.join(timeout=10)


def test_cli_predict_split_selection(tiny_ckpt, capsys):
    """Synthetic path must honor --split (was: always scored test) and
    reject unknown splits."""
    from multimodalrouting_tpu.cli import main

    out_val = os.path.join(tiny_ckpt, "preds_val.jsonl")
    rc = main(["predict", "--ckpt", tiny_ckpt, "--family", "capsule",
               "--split", "val", "--out", out_val])
    assert rc == 0
    capsys.readouterr()
    out_test = os.path.join(tiny_ckpt, "preds_test.jsonl")
    rc = main(["predict", "--ckpt", tiny_ckpt, "--family", "capsule",
               "--split", "test", "--out", out_test])
    assert rc == 0
    capsys.readouterr()
    p_val = [json.loads(ln)["probs"] for ln in open(out_val)]
    p_test = [json.loads(ln)["probs"] for ln in open(out_test)]
    assert p_val != p_test, "val and test splits scored identically — split ignored"

    with pytest.raises(SystemExit):
        main(["predict", "--ckpt", tiny_ckpt, "--split", "nope"])
