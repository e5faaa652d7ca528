"""Serving artifacts (artifact.py): jax.export roundtrip, Predictor parity,
CLI export/serve, cross-platform export.

The reference has no deployable model artifact (deployment = the full
training codebase + a .pt file); these tests pin the exported-program
contract: an artifact scores requests identically to the live Predictor
without any model-construction code.
"""
import json
import os
import urllib.request

import numpy as np
import pytest

from multimodalrouting_tpu.data.batches import Batch
from tests.helpers import tiny_batch

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

    out = str(tmp_path_factory.mktemp("artifact") / "run")
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


@pytest.fixture(scope="module")
def artifact_dir(predictor, tmp_path_factory):
    from multimodalrouting_tpu.artifact import export_serving_artifact

    out = str(tmp_path_factory.mktemp("artifact") / "art")
    export_serving_artifact(predictor, out)
    assert os.path.exists(os.path.join(out, "program.jaxexp"))
    assert os.path.exists(os.path.join(out, "variables.msgpack"))
    assert os.path.exists(os.path.join(out, "meta.json"))
    return out


def test_exported_matches_live_predictor(predictor, artifact_dir):
    """ExportedPredictor probs/alpha/R == live Predictor on the same batch."""
    from multimodalrouting_tpu.artifact import ExportedPredictor

    ex = ExportedPredictor(artifact_dir)
    batch = tiny_batch(n=predictor.batch_size, seed=3)
    live = predictor.predict(batch)
    exported = ex.predict(batch)
    np.testing.assert_allclose(exported["probs"], live["probs"], rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(exported["pred"], live["pred"])
    np.testing.assert_allclose(exported["alpha"], live["alpha"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        exported["r_matrix"], live["r_matrix"], rtol=1e-6, atol=1e-7
    )
    assert ex.temperature == predictor.temperature
    assert ex.routes == predictor.routes


def test_exported_padding_invariance(artifact_dir):
    """Ragged requests pad to the static program without leaking pad rows."""
    from multimodalrouting_tpu.artifact import ExportedPredictor

    ex = ExportedPredictor(artifact_dir)
    full = tiny_batch(n=ex.batch_size, seed=5)
    ragged_n = ex.batch_size - 1 or 1
    ragged = Batch(*(None if v is None else v[:ragged_n] for v in full))
    p_full = ex.predict(full)["probs"][:ragged_n]
    p_ragged = ex.predict(ragged)["probs"]
    assert len(p_ragged) == ragged_n
    np.testing.assert_allclose(p_ragged, p_full, rtol=1e-6, atol=1e-7)


def test_exported_records_and_http(artifact_dir):
    """predict_records rows + the HTTP frontend work off the artifact alone."""
    import threading

    from multimodalrouting_tpu.artifact import ExportedPredictor
    from multimodalrouting_tpu.serve import make_http_server

    ex = ExportedPredictor(artifact_dir)
    rows = ex.predict_records([{"x_struct": np.ones((12, 16))}, {}])
    assert len(rows) == 2
    assert set(rows[0]["alpha"].keys()) == set(ex.routes)

    server = make_http_server(ex, port=0)
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        host, port = server.server_address[:2]
        with urllib.request.urlopen(f"http://{host}:{port}/health", timeout=30) as r:
            assert json.loads(r.read())["ok"]
        body = json.dumps({"records": [{}]}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert len(json.loads(r.read())["predictions"]) == 1
    finally:
        server.shutdown()
        th.join(timeout=10)


def test_cli_export_and_serve(tiny_ckpt, tmp_path, capsys):
    from multimodalrouting_tpu.cli import main

    art = str(tmp_path / "art")
    rc = main(["predict", "--ckpt", tiny_ckpt, "--family", "capsule",
               "--export-artifact", art])
    assert rc == 0
    capsys.readouterr()

    out_path = str(tmp_path / "preds.jsonl")
    rc = main(["predict", "--artifact", art, "--out", out_path])
    assert rc == 0
    rows = [json.loads(ln) for ln in open(out_path)]
    assert len(rows) > 0 and "probs" in rows[0] and "top_routes" in rows[0]

    # artifact predictions == checkpoint predictions on the same split
    ck_out = str(tmp_path / "preds_ckpt.jsonl")
    rc = main(["predict", "--ckpt", tiny_ckpt, "--family", "capsule",
               "--out", ck_out])
    assert rc == 0
    p_art = [json.loads(ln)["probs"] for ln in open(out_path)]
    p_ck = [json.loads(ln)["probs"] for ln in open(ck_out)]
    np.testing.assert_allclose(p_art, p_ck, rtol=1e-5, atol=1e-6)

    with pytest.raises(SystemExit):
        main(["predict", "--ckpt", tiny_ckpt, "--artifact", art])
    with pytest.raises(SystemExit):
        main(["predict"])


def test_cross_platform_export(predictor, tmp_path):
    """platforms=(cpu,tpu) lowers both from a CPU process; the cpu leg runs
    and matches the live path (the tpu leg is what a fleet loads)."""
    from multimodalrouting_tpu.artifact import ExportedPredictor, export_serving_artifact

    out = str(tmp_path / "xplat")
    export_serving_artifact(predictor, out, platforms=("cpu", "tpu"))
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert set(meta["platforms"]) == {"cpu", "tpu"}

    ex = ExportedPredictor(out)
    batch = tiny_batch(n=ex.batch_size, seed=9)
    np.testing.assert_allclose(
        ex.predict(batch)["probs"], predictor.predict(batch)["probs"],
        rtol=1e-6, atol=1e-7,
    )
