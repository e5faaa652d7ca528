"""Torchvision pretrained-weight import for the CXR backbones.

The reference initializes its image encoders from torchvision's
ImageNet-pretrained models (`torchvision.models.<name>(pretrained=True)`,
MortModel/encoders.py:394). torchvision is not installed here, so the oracle
is a minimal torch reimplementation that reproduces torchvision's module
hierarchy EXACTLY (state_dict key names and all published hyperparameters) —
the same random state_dict is then loaded into torch (NCHW) and, via
import_torchvision_backbone_params, into the flax backbone (NHWC), and the
eval-mode forwards must agree numerically (convs, BN running stats, pooling).
"""
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

pytestmark = pytest.mark.slow


# ---- minimal torchvision-naming torch models (oracles) ----------------------


class TvBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(idt + y)


class TvResNet(tnn.Module):
    """torchvision.models.resnet18/34 feature extractor (fc stripped)."""

    def __init__(self, stage_sizes):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for stage, n in enumerate(stage_sizes, start=1):
            cout = 64 * 2 ** (stage - 1)
            blocks = []
            for b in range(n):
                stride = 2 if stage > 1 and b == 0 else 1
                blocks.append(TvBasicBlock(cin, cout, stride))
                cin = cout
            setattr(self, f"layer{stage}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for stage in (1, 2, 3, 4):
            x = getattr(self, f"layer{stage}")(x)
        return x.mean(dim=(2, 3)), x  # (pooled, layer4 fmap)


class TvDenseLayer(tnn.Module):
    def __init__(self, cin, growth, bn_size=4):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return torch.cat([x, y], dim=1)


class TvDenseNet(tnn.Module):
    """torchvision.models.densenet121 feature extractor (classifier stripped)."""

    def __init__(self, block_sizes=(6, 12, 24, 16), growth=32, init_features=64):
        super().__init__()
        feats = OrderedDict(
            conv0=tnn.Conv2d(3, init_features, 7, 2, 3, bias=False),
            norm0=tnn.BatchNorm2d(init_features),
            relu0=tnn.ReLU(),
            pool0=tnn.MaxPool2d(3, 2, 1),
        )
        c = init_features
        for i, n in enumerate(block_sizes, start=1):
            layers = OrderedDict()
            for j in range(1, n + 1):
                layers[f"denselayer{j}"] = TvDenseLayer(c, growth)
                c += growth
            feats[f"denseblock{i}"] = tnn.Sequential(layers)
            if i < len(block_sizes):
                feats[f"transition{i}"] = tnn.Sequential(
                    OrderedDict(
                        norm=tnn.BatchNorm2d(c),
                        relu=tnn.ReLU(),
                        conv=tnn.Conv2d(c, c // 2, 1, bias=False),
                        pool=tnn.AvgPool2d(2, 2),
                    )
                )
                c //= 2
        feats["norm5"] = tnn.BatchNorm2d(c)
        self.features = tnn.Sequential(feats)

    def forward(self, x):
        x = F.relu(self.features(x))
        return x.mean(dim=(2, 3)), x


# ---- shared harness ----------------------------------------------------------


def _randomize_bn_stats(model, seed):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def _compare(backbone_name, tv_model, atol):
    import jax
    import jax.numpy as jnp

    from multimodalrouting_tpu.models.cxr import (
        ImageEncoder,
        load_torchvision_backbone,
    )

    tv_model.eval()
    with torch.no_grad():
        _randomize_bn_stats(tv_model, seed=1)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_pooled, t_fmap = tv_model(torch.from_numpy(x).permute(0, 3, 1, 2))

    enc = ImageEncoder(d=32, vision_backbone=backbone_name, norm_kind="batch")
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_torchvision_backbone(
        variables, tv_model.state_dict(), backbone_name
    )

    # drive through the full encoder (eval mode = running stats)
    tokens, mask, pooled, chexpert = enc.apply(variables, jnp.asarray(x))
    assert np.isfinite(np.asarray(pooled)).all()

    # compare the raw backbone outputs
    from multimodalrouting_tpu.models.cxr import BACKBONES, DenseNet, ResNet

    if backbone_name.startswith("densenet"):
        mod = DenseNet(block_sizes=BACKBONES[backbone_name], norm_kind="batch")
    else:
        mod = ResNet(stage_sizes=BACKBONES[backbone_name], norm_kind="batch")
    sub_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    j_pooled, j_fmap = mod.apply(sub_vars, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(j_fmap), t_fmap.permute(0, 2, 3, 1).numpy(), atol=atol, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_pooled), t_pooled.numpy(), atol=atol, rtol=1e-4
    )


def test_resnet18_import_matches_torch_golden():
    _compare("resnet18", TvResNet((2, 2, 2, 2)), atol=3e-4)


def test_densenet121_import_matches_torch_golden():
    _compare("densenet121", TvDenseNet(), atol=1e-3)


def test_import_rejects_shape_mismatch():
    import jax
    import jax.numpy as jnp

    from multimodalrouting_tpu.models.cxr import (
        ImageEncoder,
        load_torchvision_backbone,
    )

    tv = TvResNet((2, 2, 2, 2))
    enc = ImageEncoder(d=8, vision_backbone="resnet34", norm_kind="batch")
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    with pytest.raises((ValueError, KeyError)):
        load_torchvision_backbone(variables, tv.state_dict(), "resnet34")
