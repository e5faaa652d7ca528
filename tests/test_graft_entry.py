"""Driver entry points: multichip dryrun on the virtual CPU mesh."""
import importlib.util
import os

import jax
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.dist]  # 8-device sharded train-step compiles


def _load_graft():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    _load_graft().dryrun_multichip(8)


def test_dryrun_multichip_odd():
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    _load_graft().dryrun_multichip(3)  # odd count -> pure data-parallel mesh
