"""Chest X-ray image encoder (MedFuse-style ResNet / DenseNet backbone).

Behavioral parity target: reference MIMIC-IV/MortModel/Paired_Cross_Attention/
encoders.py:516-793 (MedFuseImageEncoder + ImageEncoder) — torchvision
ResNet34 backbone with the classifier replaced, a 14-class CheXpert auxiliary
head + BCE (MedFuse parity), pooled features projected Linear(512 -> d), and
layer4 spatial tokens [B, H4*W4, d] for cross-attention (the reference
captures them with a forward hook; here the backbone simply returns both).

TPU-first: NHWC layout, flax BatchNorm with a `batch_stats` collection (or
GroupNorm for stats-free tests), convolutions compiled straight onto the MXU.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# torchvision Normalize constants (data/images.py applies the same pair on
# the host-side float path)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_pixels(image, has_i):
    """On-device ToTensor + Normalize for uint8 batches (the
    encoder.image_uint8_transfer path: hosts ship raw uint8 pixels, 4x
    fewer bytes, and XLA fuses this into the stem conv). Bit-matches
    data/images.py:to_normalized_array — same fp32 op order — and
    multiplies by has_i so absent stays reach the encoder as exact zeros,
    identical to the float path's zero-filled buffer. Float inputs
    (already normalized host-side, or synthetic) pass through untouched."""
    if image.dtype != jnp.uint8:
        return image
    x = image.astype(jnp.float32) / jnp.float32(255.0)
    x = (x - jnp.asarray(IMAGENET_MEAN, jnp.float32)) / jnp.asarray(IMAGENET_STD, jnp.float32)
    return x * has_i.astype(jnp.float32)[:, None, None, None]


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    norm: Any = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        residual = x
        y = conv(self.filters, 3, self.stride, "conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, 3, 1, "conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = conv(self.filters, 1, self.stride, "downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """ResNet-18/34 (BasicBlock) in NHWC; returns (pooled [B,C], fmap [B,H,W,C])."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet34
    width: int = 64
    norm_kind: str = "batch"  # batch | group
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm_kind == "batch":
            norm = lambda name: nn.BatchNorm(  # noqa: E731
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )
        else:
            norm = lambda name: nn.GroupNorm(  # noqa: E731
                num_groups=32, dtype=self.dtype, param_dtype=self.param_dtype, name=name
            )

        x = nn.Conv(
            self.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv1",
        )(x.astype(self.dtype))
        x = norm("bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for stage, n_blocks in enumerate(self.stage_sizes):
            filters = self.width * (2**stage)
            for block in range(n_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(
                    filters=filters,
                    stride=stride,
                    norm=norm,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x)

        fmap = x  # layer4 output [B, H4, W4, C]
        pooled = jnp.mean(x, axis=(1, 2))  # global average pool
        return pooled, fmap


class DenseLayer(nn.Module):
    """DenseNet bottleneck layer: BN-ReLU-Conv1x1(4k)-BN-ReLU-Conv3x3(k),
    output concatenated onto the input (torchvision _DenseLayer semantics)."""

    growth: int
    bn_size: int = 4
    norm: Any = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        y = nn.relu(self.norm(name="bn1")(x))
        y = conv(self.bn_size * self.growth, 1, "conv1")(y)
        y = nn.relu(self.norm(name="bn2")(y))
        y = conv(self.growth, 3, "conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    """DenseNet-121 (MedFuse's CXR backbone) in NHWC; returns
    (pooled [B,1024], fmap [B,H4,W4,1024]) like ResNet above.

    Parity target: the reference builds any torchvision backbone by name and
    strips its `classifier` head (MIMIC-IV/MortModel/encoders.py:385-424);
    densenet121 is MedFuse's published default. Growth 32, blocks
    (6,12,24,16), bn_size 4, transition compression 0.5, final BN-ReLU."""

    block_sizes: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32
    init_features: int = 64
    norm_kind: str = "batch"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm_kind == "batch":
            norm = lambda name: nn.BatchNorm(  # noqa: E731
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )
        else:
            # every DenseNet-121 channel count is a multiple of 32
            norm = lambda name: nn.GroupNorm(  # noqa: E731
                num_groups=32, dtype=self.dtype, param_dtype=self.param_dtype, name=name
            )

        x = nn.Conv(
            self.init_features, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="conv0",
        )(x.astype(self.dtype))
        x = nn.relu(norm("bn0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for stage, n_layers in enumerate(self.block_sizes):
            for layer in range(n_layers):
                x = DenseLayer(
                    growth=self.growth, norm=norm, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"block{stage + 1}_layer{layer}",
                )(x)
            if stage < len(self.block_sizes) - 1:
                # transition: BN-ReLU-Conv1x1(C/2)-AvgPool2
                x = nn.relu(norm(f"transition{stage + 1}_bn")(x))
                x = nn.Conv(
                    x.shape[-1] // 2, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"transition{stage + 1}_conv",
                )(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        x = nn.relu(norm("bn_final")(x))
        fmap = x  # final dense-block output [B, H4, W4, 1024]
        pooled = jnp.mean(x, axis=(1, 2))
        return pooled, fmap


BACKBONES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "densenet121": (6, 12, 24, 16),
}


def import_torchvision_backbone_params(state_dict, backbone: str):
    """Convert a torchvision state_dict into this module's backbone variables.

    The reference trains from ImageNet-pretrained torchvision backbones
    (`torchvision.models.<name>(pretrained=True)`, MortModel/encoders.py:394);
    this importer lets those exact checkpoints (or MedFuse-finetuned ones)
    initialize the NHWC flax backbone. `state_dict` maps torchvision key names
    to tensors/ndarrays (a raw `model.state_dict()`, incl. BatchNorm running
    stats); the classifier head (`fc.*` / `classifier.*`) is ignored.

    Returns {"params": ..., "batch_stats": ...} for the `backbone` submodule
    (norm_kind="batch" layout). Conv weights transpose OIHW -> HWIO.
    """
    import numpy as np

    if backbone not in BACKBONES:
        raise ValueError(f"Unsupported backbone {backbone!r}")
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(key):
        return {"kernel": sd[key + ".weight"].transpose(2, 3, 1, 0)}

    def bn(key):
        p = {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}
        s = {"mean": sd[key + ".running_mean"], "var": sd[key + ".running_var"]}
        return p, s

    params: dict = {}
    stats: dict = {}

    def put(name, module):
        if isinstance(module, tuple):  # (bn_params, bn_stats)
            params[name], stats[name] = module
        else:
            params[name] = module

    if backbone.startswith("densenet"):
        put("conv0", conv("features.conv0"))
        put("bn0", bn("features.norm0"))
        n_trans = len(BACKBONES[backbone]) - 1
        for i, n_layers in enumerate(BACKBONES[backbone], start=1):
            for j in range(1, n_layers + 1):
                base = f"features.denseblock{i}.denselayer{j}"
                blk: dict = {}
                blk_stats: dict = {}
                for our, tv in (("bn1", "norm1"), ("bn2", "norm2")):
                    blk[our], blk_stats[our] = bn(f"{base}.{tv}")
                blk["conv1"] = conv(f"{base}.conv1")
                blk["conv2"] = conv(f"{base}.conv2")
                params[f"block{i}_layer{j - 1}"] = blk
                stats[f"block{i}_layer{j - 1}"] = blk_stats
            if i <= n_trans:
                put(f"transition{i}_bn", bn(f"features.transition{i}.norm"))
                put(f"transition{i}_conv", conv(f"features.transition{i}.conv"))
        put("bn_final", bn("features.norm5"))
    else:  # resnet18/34 (BasicBlock)
        put("conv1", conv("conv1"))
        put("bn1", bn("bn1"))
        for stage, n_blocks in enumerate(BACKBONES[backbone], start=1):
            for b in range(n_blocks):
                base = f"layer{stage}.{b}"
                blk = {"conv1": conv(f"{base}.conv1"), "conv2": conv(f"{base}.conv2")}
                blk_stats = {}
                blk["bn1"], blk_stats["bn1"] = bn(f"{base}.bn1")
                blk["bn2"], blk_stats["bn2"] = bn(f"{base}.bn2")
                if f"{base}.downsample.0.weight" in sd:
                    blk["downsample_conv"] = conv(f"{base}.downsample.0")
                    blk["downsample_bn"], blk_stats["downsample_bn"] = bn(
                        f"{base}.downsample.1"
                    )
                params[f"layer{stage}_block{b}"] = blk
                stats[f"layer{stage}_block{b}"] = blk_stats

    return {"params": params, "batch_stats": stats}


def load_torchvision_backbone(variables, state_dict, backbone: str):
    """Splice imported torchvision weights into full ImageEncoder variables
    (projection/CheXpert heads keep their existing initialization). Verifies
    leaf shapes against the template before replacing."""
    import jax

    imported = import_torchvision_backbone_params(state_dict, backbone)
    out = {k: dict(v) for k, v in variables.items()}
    for col in ("params", "batch_stats"):
        tmpl = variables[col]["backbone"]

        def cast(t, v):
            if tuple(t.shape) != tuple(v.shape):
                raise ValueError(f"shape mismatch: template {t.shape} vs imported {v.shape}")
            return v.astype(t.dtype)

        new = jax.tree_util.tree_map(cast, tmpl, imported[col])
        out[col] = {**variables[col], "backbone": new}
    return out


class ImageEncoder(nn.Module):
    """Pooled embedding + layer4 spatial tokens + CheXpert aux logits.

    __call__: x [B,H,W,3] -> (tokens [B,P,d], token_mask [B,P], pooled [B,d],
    chexpert_logits [B,vision_num_classes]).
    """

    d: int = 256
    vision_backbone: str = "resnet34"
    vision_num_classes: int = 14
    norm_kind: str = "batch"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        if self.vision_backbone not in BACKBONES:
            raise ValueError(f"Unsupported backbone {self.vision_backbone!r}")
        if self.vision_backbone.startswith("densenet"):
            feats, fmap = DenseNet(
                block_sizes=BACKBONES[self.vision_backbone],
                norm_kind=self.norm_kind,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="backbone",
            )(x, train=train)
        else:
            feats, fmap = ResNet(
                stage_sizes=BACKBONES[self.vision_backbone],
                norm_kind=self.norm_kind,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="backbone",
            )(x, train=train)

        # CheXpert auxiliary head (MedFuse parity; reference encoders.py:558-559)
        chexpert = nn.Dense(
            self.vision_num_classes, dtype=self.dtype, param_dtype=self.param_dtype, name="chexpert_head"
        )(feats)

        pooled = nn.Dense(self.d, dtype=self.dtype, param_dtype=self.param_dtype, name="proj")(feats)

        b, h, w, c = fmap.shape
        tokens = fmap.reshape(b, h * w, c)
        tokens = nn.Dense(
            self.d, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="token_proj"
        )(tokens)
        token_mask = jnp.ones((b, h * w), dtype=jnp.float32)
        return tokens, token_mask, pooled, chexpert
