"""Encoder golden tests.

torchvision is not installed here (zero egress), so these tests construct
torch models with torchvision's exact module/state_dict naming and random
weights, port them through sat_tpu.compat.torch_encoder, and assert
activation equality — validating conv padding, pooling, batch-norm and the
NHWC<->NCHW weight mapping end to end. Shapes for 224 inputs are asserted
separately at the annotation-grid level."""

from collections import OrderedDict

import numpy as np
import pytest

# Heavy tier (~4 min (torch-built goldens)); deselect with -m "not heavy".
pytestmark = pytest.mark.heavy
import torch
import torch.nn as nn

from sat_tpu.models.encoder import (
    encoder_forward,
    init_encoder_params,
    vgg19_layer_plan,
    RESNET152_BLOCKS,
    DENSENET161_BLOCKS,
    DENSENET_GROWTH,
    DENSENET_INIT,
    DENSENET_BN_SIZE,
)
from sat_tpu.compat.torch_encoder import (
    encoder_params_from_state_dict,
    save_encoder_npz,
    load_encoder_npz,
)


def randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, (nn.BatchNorm2d,)):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)


# ----------------------------------------------------- torchvision doubles

def build_torch_vgg19_features():
    """vgg19 `features` with the final maxpool dropped (reference
    encoder.py:26), state_dict keys `features.{idx}.*`."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512]
    layers, cin = [], 3
    for entry in cfg:
        if entry == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, entry, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            cin = entry
    features = nn.Sequential(*layers)
    return nn.Sequential(OrderedDict([("features", features)]))


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride, downsample):
        super().__init__()
        cout = width * self.expansion
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet152Body(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, padding=1)
        cin = 64
        for li, n_blocks in enumerate(RESNET152_BLOCKS, start=1):
            width = 64 * (2 ** (li - 1))
            stride = 1 if li == 1 else 2
            blocks = []
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                down = None
                if bi == 0:
                    down = nn.Sequential(
                        nn.Conv2d(cin, width * 4, 1, stride=s, bias=False),
                        nn.BatchNorm2d(width * 4))
                blocks.append(TorchBottleneck(cin, width, s, down))
                cin = width * 4
            setattr(self, f"layer{li}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return x


class TorchDenseLayer(nn.Module):
    def __init__(self, cin):
        super().__init__()
        inter = DENSENET_BN_SIZE * DENSENET_GROWTH
        self.norm1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, inter, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(inter)
        self.conv2 = nn.Conv2d(inter, DENSENET_GROWTH, 3, padding=1, bias=False)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        out = self.conv1(self.relu(self.norm1(x)))
        out = self.conv2(self.relu(self.norm2(out)))
        return torch.cat([x, out], dim=1)


class TorchDenseNet161Features(nn.Module):
    """torchvision densenet161.features minus norm5 (reference encoder.py:21)."""

    def __init__(self):
        super().__init__()
        features = nn.Module()
        features.conv0 = nn.Conv2d(3, DENSENET_INIT, 7, stride=2, padding=3, bias=False)
        features.norm0 = nn.BatchNorm2d(DENSENET_INIT)
        ch = DENSENET_INIT
        for bi, n_layers in enumerate(DENSENET161_BLOCKS, start=1):
            block = nn.Module()
            for lj in range(1, n_layers + 1):
                setattr(block, f"denselayer{lj}", TorchDenseLayer(ch))
                ch += DENSENET_GROWTH
            setattr(features, f"denseblock{bi}", block)
            if bi < 4:
                trans = nn.Module()
                trans.norm = nn.BatchNorm2d(ch)
                trans.conv = nn.Conv2d(ch, ch // 2, 1, bias=False)
                setattr(features, f"transition{bi}", trans)
                ch //= 2
        self.features = features
        self.out_channels = ch

    def forward(self, x):
        f = self.features
        x = nn.functional.max_pool2d(
            nn.functional.relu(f.norm0(f.conv0(x))), 3, 2, padding=1)
        for bi in range(1, 5):
            block = getattr(f, f"denseblock{bi}")
            for lj in range(1, len(DENSENET161_BLOCKS) * 100):
                layer = getattr(block, f"denselayer{lj}", None)
                if layer is None:
                    break
                x = layer(x)
            if bi < 4:
                t = getattr(f, f"transition{bi}")
                x = nn.functional.avg_pool2d(t.conv(nn.functional.relu(t.norm(x))), 2, 2)
        return x


# ------------------------------------------------------------------- tests

def _nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


def test_vgg19_matches_torch_and_grid_order():
    torch.manual_seed(0)
    model = build_torch_vgg19_features().eval()
    params = encoder_params_from_state_dict("vgg19", model.state_dict())
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2))
    ours = encoder_forward(params, "vgg19", x)
    assert ours.shape == (2, 4 * 4, 512)
    ref_grid = _nhwc(ref).reshape(2, -1, 512)  # permute+flatten = reference order
    np.testing.assert_allclose(np.asarray(ours), ref_grid, atol=2e-4)


def test_resnet152_matches_torch():
    torch.manual_seed(1)
    model = TorchResNet152Body().eval()
    randomize_bn(model)
    params = encoder_params_from_state_dict("resnet152", model.state_dict())
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2))
    ours = encoder_forward(params, "resnet152", x)
    ref_grid = _nhwc(ref).reshape(1, -1, 2048)
    assert ours.shape == ref_grid.shape
    np.testing.assert_allclose(np.asarray(ours), ref_grid, atol=5e-3, rtol=1e-3)


def test_densenet161_matches_torch():
    torch.manual_seed(2)
    model = TorchDenseNet161Features().eval()
    randomize_bn(model)
    assert model.out_channels == 2208  # the reference's claimed 1920 is wrong
    params = encoder_params_from_state_dict("densenet161", model.state_dict())
    x = np.random.default_rng(2).normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2))
    ours = encoder_forward(params, "densenet161", x)
    ref_grid = _nhwc(ref).reshape(1, -1, 2208)
    assert ours.shape == ref_grid.shape
    np.testing.assert_allclose(np.asarray(ours), ref_grid, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("network,grid,dim", [
    ("vgg19", 196, 512), ("resnet152", 49, 2048), ("densenet161", 49, 2208)])
def test_annotation_grid_shapes_at_224(network, grid, dim):
    import jax
    params = init_encoder_params(jax.random.PRNGKey(0), network)
    x = np.zeros((1, 224, 224, 3), np.float32)
    out = encoder_forward(params, network, x)
    assert out.shape == (1, grid, dim)


def test_npz_round_trip(tmp_path):
    import jax
    params = init_encoder_params(jax.random.PRNGKey(3), "vgg19")
    path = str(tmp_path / "vgg.npz")
    save_encoder_npz(path, params)
    loaded = load_encoder_npz(path, init_encoder_params(jax.random.PRNGKey(4), "vgg19"))
    for op in vgg19_layer_plan():
        if op[0] == "conv":
            name = f"conv{op[1]}"
            np.testing.assert_array_equal(np.asarray(params[name]["w"]),
                                          loaded[name]["w"])


def test_bf16_compute_path():
    import jax
    params = init_encoder_params(jax.random.PRNGKey(5), "vgg19")
    x = np.random.default_rng(6).normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.1
    f32 = encoder_forward(params, "vgg19", x)
    bf16 = encoder_forward(params, "vgg19", x, compute_dtype="bfloat16")
    assert bf16.dtype == np.float32  # grid returned in f32
    rel = np.abs(np.asarray(bf16) - np.asarray(f32)).mean() / (np.abs(np.asarray(f32)).mean() + 1e-8)
    assert rel < 0.1


def test_s2d_conv1_equivalence():
    """Space-to-depth first conv (serving MXU-utilization lever,
    _conv1_s2d_kernel): identical annotation grid up to f32 summation
    order, full VGG19 stack at 64px."""
    import jax
    params = init_encoder_params(jax.random.PRNGKey(7), "vgg19")
    x = np.random.default_rng(8).normal(size=(2, 64, 64, 3)).astype(np.float32)
    base = np.asarray(encoder_forward(params, "vgg19", x))
    s2d = np.asarray(encoder_forward(params, "vgg19", x, s2d_conv1=True))
    np.testing.assert_allclose(s2d, base, atol=1e-4, rtol=1e-4)


def test_s2d_roundtrip_and_kernel_layout():
    from sat_tpu.models.encoder import (
        _conv1_s2d_kernel, conv2d, depth_to_space, space_to_depth)
    rng = np.random.default_rng(9)
    x = np.asarray(rng.normal(size=(2, 8, 8, 3)), np.float32)
    assert np.array_equal(np.asarray(depth_to_space(space_to_depth(x))), x)
    w = np.asarray(rng.normal(size=(3, 3, 3, 4)), np.float32)
    ref = np.asarray(conv2d(x, w))
    got = np.asarray(depth_to_space(conv2d(space_to_depth(x),
                                           _conv1_s2d_kernel(w))))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_port_torchvision_tool_roundtrip(tmp_path):
    """Drive the offline weight-porting tool itself (tools/
    port_torchvision.py): torch-saved state_dict file -> .npz ->
    load_encoder_npz, equal to the direct in-memory import."""
    import os
    import sys

    import jax

    model = build_torch_vgg19_features()
    sd_path = str(tmp_path / "vgg19.pth")
    torch.save(model.state_dict(), sd_path)
    out = str(tmp_path / "vgg19.npz")

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools)
    try:
        import port_torchvision
        port_torchvision.port_encoder("vgg19", sd_path, out)
    finally:
        sys.path.remove(tools)

    loaded = load_encoder_npz(
        out, init_encoder_params(jax.random.PRNGKey(0), "vgg19"))
    direct = encoder_params_from_state_dict("vgg19", model.state_dict())
    for op in vgg19_layer_plan():
        if op[0] == "conv":
            name = f"conv{op[1]}"
            np.testing.assert_array_equal(np.asarray(loaded[name]["w"]),
                                          np.asarray(direct[name]["w"]))
            np.testing.assert_array_equal(np.asarray(loaded[name]["b"]),
                                          np.asarray(direct[name]["b"]))
