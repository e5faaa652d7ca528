"""CXR decode + transform pipeline tests (data/images.py).

Covers the round-2 VERDICT item 1: torchvision-semantics transforms
(reference: MIMIC-IV/MortModel/Paired_Cross_Attention/main.py:907-925
build_image_transform; MedFuse_Preprocessing/datasets/cxr_dataset.py:64-86
get_transforms), the decode path, and the has_i regression — route masks
must claim image presence only when pixels were actually decoded
(reference loader substitutes a zero tensor and keeps has_image=1;
data/loader.py deliberately does not).

torchvision is not installed in this image, so affine parity is checked
against an independent matrix-algebra oracle: compose the forward affine
from elementary numpy matrices (the documented T(c+t)·R·S·SHy·SHx·T(-c)
decomposition) and assert our closed-form inverse actually inverts it.
"""
import json
import math
import os

import numpy as np
import pandas as pd
import pytest

from multimodalrouting_tpu.data.images import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ImageTransform,
    build_image_transform,
    decode_image,
    find_image_path_column,
    inverse_affine_matrix,
    make_image_loader,
    to_normalized_array,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


# ---------------------------------------------------------------------------
# Affine matrix: independent matrix-algebra oracle
# ---------------------------------------------------------------------------


def _forward_affine_3x3(center, angle, translate, scale, shear):
    """T(c+t) · R(angle) · S(scale) · SHy(sy) · SHx(sx) · T(-c), built from
    elementary matrices (torchvision's documented decomposition)."""
    rot = math.radians(angle)
    sx, sy = (math.radians(s) for s in shear)
    cx, cy = center
    tx, ty = translate

    def T(x, y):
        return np.array([[1, 0, x], [0, 1, y], [0, 0, 1]], float)

    R = np.array(
        [[math.cos(rot), -math.sin(rot), 0], [math.sin(rot), math.cos(rot), 0], [0, 0, 1]],
        float,
    )
    S = np.diag([scale, scale, 1.0])
    SHx = np.array([[1, -math.tan(sx), 0], [0, 1, 0], [0, 0, 1]], float)
    SHy = np.array([[1, 0, 0], [-math.tan(sy), 1, 0], [0, 0, 1]], float)
    return T(cx + tx, cy + ty) @ R @ S @ SHy @ SHx @ T(-cx, -cy)


@pytest.mark.parametrize(
    "angle,translate,scale,shear",
    [
        (0.0, (0.0, 0.0), 1.0, (0.0, 0.0)),
        (10.0, (3.0, -2.0), 0.97, (5.0, 0.0)),
        (-37.5, (-8.0, 4.0), 1.12, (0.0, 0.0)),
        (45.0, (10.0, 10.0), 0.85, (12.0, -7.0)),
    ],
)
def test_inverse_affine_matrix_inverts_forward(angle, translate, scale, shear):
    center = (112.0, 112.0)
    fwd = _forward_affine_3x3(center, angle, translate, scale, shear)
    m = inverse_affine_matrix(center, angle, translate, scale, shear)
    inv = np.array([[m[0], m[1], m[2]], [m[3], m[4], m[5]], [0, 0, 1]], float)
    np.testing.assert_allclose(fwd @ inv, np.eye(3), atol=1e-9)


def test_inverse_affine_identity_is_identity():
    m = inverse_affine_matrix((16.0, 16.0), 0.0, (0.0, 0.0), 1.0, (0.0, 0.0))
    np.testing.assert_allclose(m, [1, 0, 0, 0, 1, 0], atol=1e-12)


# ---------------------------------------------------------------------------
# Transform stacks
# ---------------------------------------------------------------------------


def _gradient_image(w=300, h=260):
    """Non-square colored gradient so resize/crop/grayscale are observable."""
    x = np.linspace(0, 255, w, dtype=np.float32)
    y = np.linspace(0, 255, h, dtype=np.float32)
    r = np.tile(x, (h, 1))
    g = np.tile(y[:, None], (1, w))
    b = np.full((h, w), 128.0, np.float32)
    return Image.fromarray(np.stack([r, g, b], -1).astype(np.uint8))


def test_eval_transform_shape_and_determinism():
    tfm = build_image_transform("val", resize=64, crop=48)
    img = _gradient_image()
    a = tfm(img)
    b = tfm(img)
    assert a.shape == (48, 48, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)  # eval path has no randomness


def test_flagship_grayscale_channels_equal():
    tfm = build_image_transform("test", spec="flagship", resize=64, crop=48)
    out = tfm(_gradient_image())
    # undo per-channel normalization: all three gray channels held one value
    pix = out * np.asarray(IMAGENET_STD, np.float32) + np.asarray(IMAGENET_MEAN, np.float32)
    np.testing.assert_allclose(pix[..., 0], pix[..., 1], atol=1.01 / 255)
    np.testing.assert_allclose(pix[..., 0], pix[..., 2], atol=1.01 / 255)


def test_medfuse_spec_keeps_color():
    tfm = build_image_transform("test", spec="medfuse", resize=64, crop=48)
    out = tfm(_gradient_image())
    pix = out * np.asarray(IMAGENET_STD, np.float32) + np.asarray(IMAGENET_MEAN, np.float32)
    assert np.abs(pix[..., 0] - pix[..., 1]).max() > 0.1  # R and G gradients differ


def test_eval_resize_center_crop_golden():
    """Solid-color image: resize/crop are value-preserving, so the output is
    exactly (v/255 - mean)/std everywhere — a closed-form golden value."""
    v = 200
    img = Image.new("RGB", (300, 260), (v, v, v))
    out = build_image_transform("val", spec="medfuse", resize=64, crop=48)(img)
    want = (v / 255.0 - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )
    np.testing.assert_allclose(out, np.broadcast_to(want, out.shape), atol=1e-5)


def test_train_transform_seeded_reproducibility():
    img = _gradient_image()
    t1 = ImageTransform(split="train", spec="flagship", resize=64, crop=48, seed=7)
    t2 = ImageTransform(split="train", spec="flagship", resize=64, crop=48, seed=7)
    a, b = t1(img), t2(img)
    assert a.shape == (48, 48, 3)
    np.testing.assert_array_equal(a, b)
    t3 = ImageTransform(split="train", spec="flagship", resize=64, crop=48, seed=8)
    assert np.abs(a - t3(img)).max() > 0  # different seed, different draw
    t1.reseed(7)
    np.testing.assert_array_equal(a, t1(img))


def test_train_transform_medfuse_center_crop_shape():
    img = _gradient_image()
    out = ImageTransform(split="train", spec="medfuse", resize=64, crop=48, seed=0)(img)
    assert out.shape == (48, 48, 3) and np.isfinite(out).all()


def test_center_crop_pads_small_images():
    # torchvision CenterCrop zero-pads images smaller than the crop
    img = Image.new("RGB", (20, 20), (255, 255, 255))
    tfm = ImageTransform(split="eval", spec="medfuse", resize=16, crop=48)
    out = tfm(img)
    assert out.shape == (48, 48, 3)
    pix = out * np.asarray(IMAGENET_STD, np.float32) + np.asarray(IMAGENET_MEAN, np.float32)
    assert pix[0, 0].max() < 1e-3  # corner is zero padding
    assert pix[24, 24].min() > 0.99  # center is the white image


def test_to_normalized_array_grayscale_input():
    arr = to_normalized_array(Image.new("L", (8, 8), 100))
    assert arr.shape == (8, 8, 3)
    want = (100 / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(arr[0, 0], want, atol=1e-6)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def test_decode_jpeg_roundtrip(tmp_path):
    p = tmp_path / "x.jpg"
    _gradient_image(64, 64).save(p, quality=95)
    img = decode_image(str(p))
    assert img is not None and img.size == (64, 64)


def test_decode_missing_and_corrupt(tmp_path):
    assert decode_image(str(tmp_path / "nope.jpg")) is None
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not an image at all")
    assert decode_image(str(bad)) is None
    assert decode_image("") is None


def test_find_image_path_column_order():
    assert find_image_path_column(["foo", "image_path", "cxr_path"]) == "cxr_path"
    assert find_image_path_column(["img_path"]) == "img_path"
    assert find_image_path_column(["nothing"]) is None


def test_make_image_loader_row_handling(tmp_path):
    p = tmp_path / "a.jpg"
    Image.new("RGB", (64, 64), (10, 200, 30)).save(p)
    load = make_image_loader("val", resize=40, crop=32)
    row = pd.Series({"cxr_path": str(p), "has_image": 1})
    out = load(row)
    assert out is not None and out.shape == (32, 32, 3)
    assert load(pd.Series({"cxr_path": None})) is None
    assert load(pd.Series({"cxr_path": float("nan")})) is None
    assert load(pd.Series({"unrelated": "x"})) is None
    # relative path + root resolution
    load_root = make_image_loader("val", resize=40, crop=32, root=str(tmp_path))
    assert load_root(pd.Series({"cxr_path": "a.jpg"})) is not None


# ---------------------------------------------------------------------------
# has_i regression: presence is asserted only when pixels were decoded
# ---------------------------------------------------------------------------


def _tiny_export(tmp_path, image_paths):
    """Minimal export dir: 3 stays, second one carries an image row."""
    d = tmp_path / "export"
    os.makedirs(d, exist_ok=True)
    sids = [1, 2, 3]
    rows = [{"stay_id": s, "bin": b, "v0": float(s + b)} for s in sids for b in range(4)]
    pd.DataFrame(rows).to_parquet(d / "structured_48h.parquet", index=False)
    notes = pd.DataFrame(
        [
            {
                "stay_id": s,
                "input_ids": [101, 5, 102, 0],
                "attention_mask": [1, 1, 1, 0],
                "chunk_mask": [1.0],
                "n_chunks": 1,
                "shape_s": 1,
                "shape_l": 4,
            }
            for s in sids
        ]
    )
    notes.to_parquet(d / "notes_48h.parquet", index=False)
    images = pd.DataFrame(
        {
            "stay_id": sids,
            "has_image": [0, 1, 1],
            "cxr_path": [None, image_paths.get(2), image_paths.get(3)],
        }
    )
    images.to_parquet(d / "images_48h.parquet", index=False)
    pd.DataFrame({"stay_id": sids, "mortality": [0, 1, 0]}).to_parquet(
        d / "labels.parquet", index=False
    )
    with open(d / "splits.json", "w") as f:
        json.dump({"train": sids, "val": [], "test": []}, f)
    return str(d)


def test_has_i_false_without_image_loader(tmp_path):
    from multimodalrouting_tpu.data.loader import load_split

    d = _tiny_export(tmp_path, {2: "x.jpg", 3: "y.jpg"})
    arrays = load_split(d, "train", image_size=32)  # no image_loader
    # parquet has has_image=1 for stays 2,3 but no pixels were decoded
    np.testing.assert_array_equal(arrays.batch.has_i, [0.0, 0.0, 0.0])
    assert float(np.abs(arrays.batch.image).sum()) == 0.0


def test_has_i_true_only_for_decoded_pixels(tmp_path):
    from multimodalrouting_tpu.data.loader import load_split

    good = tmp_path / "good.jpg"
    Image.new("RGB", (64, 64), (200, 100, 50)).save(good)
    # stay 2 -> real jpeg, stay 3 -> missing file (has_image=1 in parquet!)
    d = _tiny_export(tmp_path, {2: str(good), 3: str(tmp_path / "missing.jpg")})
    loader = make_image_loader("val", resize=40, crop=32)
    arrays = load_split(d, "train", image_size=32, image_loader=loader)
    np.testing.assert_array_equal(arrays.batch.has_i, [0.0, 1.0, 0.0])
    assert float(np.abs(arrays.batch.image[1]).sum()) > 0
    assert float(np.abs(arrays.batch.image[2]).sum()) == 0.0


def test_cli_load_data_passes_image_loader(tmp_path, monkeypatch):
    """cli._load_data wires the split-appropriate image loader (round-2 gap:
    it never passed one, so real cohorts trained on all-zero images)."""
    from multimodalrouting_tpu import cli
    from multimodalrouting_tpu.configs import Config, apply_overrides

    good = tmp_path / "im.jpg"
    Image.new("RGB", (64, 64), (90, 90, 90)).save(good)
    d = _tiny_export(tmp_path, {2: str(good), 3: str(good)})
    cfg = apply_overrides(
        Config(),
        {
            "data.synthetic": False,
            "data.data_root": d,
            "encoder.image_size": 32,
            "encoder.image_resize": 40,
        },
    )
    tr, va, te = cli._load_data(cfg, "mort")
    assert float(tr.has_i.sum()) == 2.0
    assert float(np.abs(tr.image).sum()) > 0


# ---------------------------------------------------------------------------
# uint8 host->device transfer + on-device normalization
# (encoder.image_uint8_transfer; models/cxr.py normalize_pixels)
# ---------------------------------------------------------------------------


def test_uint8_pixels_device_normalize_bitwise():
    """pixels="uint8" + on-device normalize == the host fp32 path, bitwise
    (same fp32 op order: /255, -mean, /std)."""
    import jax.numpy as jnp

    from multimodalrouting_tpu.models.cxr import normalize_pixels

    img = _gradient_image()
    host = build_image_transform("val", resize=64, crop=48)(img)
    u8 = build_image_transform("val", resize=64, crop=48, pixels="uint8")(img)
    assert u8.dtype == np.uint8 and u8.shape == (48, 48, 3)
    dev = np.asarray(normalize_pixels(jnp.asarray(u8[None]), jnp.asarray([1.0])))
    np.testing.assert_array_equal(dev[0], host)


def test_uint8_absent_image_reaches_encoder_as_zero():
    """Absent stays (has_i=0, zero-filled uint8 buffer) must normalize to
    exact fp32 zeros — matching the float path's zero buffer — not to the
    -mean/std constant a black image would produce."""
    import jax.numpy as jnp

    from multimodalrouting_tpu.models.cxr import normalize_pixels

    u8 = jnp.zeros((2, 8, 8, 3), jnp.uint8)
    out = np.asarray(normalize_pixels(u8, jnp.asarray([0.0, 1.0])))
    np.testing.assert_array_equal(out[0], np.zeros((8, 8, 3), np.float32))
    # present-but-black differs from absent (it IS the normalized black frame)
    assert float(np.abs(out[1]).sum()) > 0


def test_float_pixels_pass_through_unchanged():
    import jax.numpy as jnp

    from multimodalrouting_tpu.models.cxr import normalize_pixels

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)), jnp.float32)
    out = normalize_pixels(x, jnp.asarray([0.0, 1.0]))
    assert out is x  # no-op on the already-normalized float path


def test_loader_uint8_dtype_and_model_prob_equality(tmp_path):
    """load_split(image_dtype=uint8) + uint8 loader feeds the model the same
    normalized pixels as the fp32 path: forward probs match."""
    import jax

    from multimodalrouting_tpu.data.loader import load_split

    good = tmp_path / "good.jpg"
    Image.fromarray(
        np.random.default_rng(3).integers(0, 255, (64, 64, 3), np.uint8).astype(np.uint8)
    ).save(good)
    d = _tiny_export(tmp_path, {2: str(good), 3: str(tmp_path / "missing.jpg")})

    f32 = load_split(d, "train", image_size=32,
                     image_loader=make_image_loader("val", resize=40, crop=32))
    u8 = load_split(d, "train", image_size=32,
                    image_loader=make_image_loader("val", resize=40, crop=32,
                                                   pixels="uint8"),
                    image_dtype=np.uint8)
    assert u8.batch.image.dtype == np.uint8
    np.testing.assert_array_equal(f32.batch.has_i, u8.batch.has_i)

    from multimodalrouting_tpu.models.full import build_model
    from tests.helpers import tiny_config

    cfg = tiny_config(**{
        "model.routes": "7", "model.num_classes": 2,
        "encoder.structured_n_feats": 1, "encoder.structured_seq_len": 4,
        "encoder.notes_max_chunks": 1, "encoder.text_max_len": 4,
        "encoder.image_size": 32,
    })
    model = build_model(cfg, "capsule")
    variables = model.init(jax.random.PRNGKey(0), f32.batch, train=False)
    out_f32 = model.apply(variables, f32.batch, train=False)
    out_u8 = model.apply(variables, u8.batch, train=False)
    np.testing.assert_allclose(
        np.asarray(out_f32[0], np.float32), np.asarray(out_u8[0], np.float32),
        rtol=1e-5, atol=1e-5,
    )
