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
