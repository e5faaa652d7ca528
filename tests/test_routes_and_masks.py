import jax.numpy as jnp
import numpy as np
import pytest

from multimodalrouting_tpu import routes as R
from multimodalrouting_tpu.ops.masked import masked_last, masked_max, masked_mean, masked_softmax


def test_taxonomies():
    assert R.get_routes("7") == ("L", "N", "I", "LN", "LI", "NI", "LNI")
    assert R.get_routes(10) == ("L", "N", "I", "LN", "NL", "LI", "IL", "NI", "IN", "LNI")
    with pytest.raises(ValueError):
        R.get_routes("9")


def test_route_mask_from_presence_7():
    has_l = jnp.array([1.0, 1.0, 0.0])
    has_n = jnp.array([1.0, 0.0, 1.0])
    has_i = jnp.array([0.0, 1.0, 1.0])
    m = R.route_mask_from_presence(has_l, has_n, has_i, R.ROUTES_7)
    expect = np.array(
        [
            [1, 1, 0, 1, 0, 0, 0],  # L,N present
            [1, 0, 1, 0, 1, 0, 0],  # L,I present
            [0, 1, 1, 0, 0, 1, 0],  # N,I present
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(np.asarray(m), expect)


def test_route_mask_from_presence_10_directional_pairs_share_mask():
    m = R.route_mask_from_presence(
        jnp.array([1.0]), jnp.array([1.0]), jnp.array([0.0]), R.ROUTES_10
    )
    m = np.asarray(m)[0]
    byname = dict(zip(R.ROUTES_10, m))
    assert byname["LN"] == byname["NL"] == 1
    assert byname["LI"] == byname["IL"] == 0
    assert byname["NI"] == byname["IN"] == 0
    assert byname["LNI"] == 0


def test_stage_masks():
    rm, bm = R.block_mask_for_stage("bi", R.ROUTES_7)
    np.testing.assert_array_equal(np.asarray(rm), [1, 1, 1, 1, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(bm), [1, 1, 0])
    rm10, _ = R.block_mask_for_stage("uni", R.ROUTES_10)
    assert rm10.sum() == 3


def test_masked_mean_matches_manual():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)).astype(np.float32))
    m = jnp.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], dtype=jnp.float32)
    out = masked_mean(x, m)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0, :2].mean(0)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x[1].mean(0)), rtol=1e-6)


def test_masked_mean_all_zero_mask_is_zero():
    x = jnp.ones((1, 4, 2))
    m = jnp.zeros((1, 4))
    np.testing.assert_array_equal(np.asarray(masked_mean(x, m)), 0.0)


def test_masked_last():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    m = jnp.array([[1, 1, 0, 0]], dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(masked_last(x, m))[0], np.asarray(x[0, 1]))
    m0 = jnp.zeros((1, 4))
    np.testing.assert_array_equal(np.asarray(masked_last(x, m0)), 0.0)


def test_masked_max_and_softmax():
    x = jnp.array([[[5.0, 1.0], [9.0, 2.0], [0.0, 3.0]]])
    m = jnp.array([[1, 0, 1]], dtype=jnp.float32)
    out = masked_max(x, m)
    np.testing.assert_array_equal(np.asarray(out), [[5.0, 3.0]])

    logits = jnp.array([[1.0, 2.0, 3.0]])
    sm = masked_softmax(logits, jnp.array([[1, 1, 0]]))
    assert np.asarray(sm)[0, 2] < 1e-6
    np.testing.assert_allclose(np.asarray(sm).sum(), 1.0, rtol=1e-5)


def test_process_local_batch_slice_single_process():
    from multimodalrouting_tpu.parallel.distributed import process_local_batch_slice

    s = process_local_batch_slice(32)
    assert (s.start, s.stop) == (0, 32)
