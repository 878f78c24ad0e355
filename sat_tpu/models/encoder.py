"""Frozen CNN encoders emitting annotation grids, TPU-native (NHWC, jitted).

Capability parity with the reference Encoder (reference encoder.py:5-40):
  vgg19       — features minus the final maxpool -> (B, 14, 14, 512)
  resnet152   — body minus avgpool/fc           -> (B, 7, 7, 2048)
  densenet161 — features minus norm5            -> (B, 7, 7, 2208)

The output is reshaped (B, H, W, C) -> (B, L, C); NHWC row-major flattening
matches the reference's permute(0,2,3,1).view(B,-1,C) ordering
(encoder.py:33-40) element-for-element.

The encoder is inference-only: the reference freezes VGG weights and never
passes encoder params to the optimizer for any backbone (reference
encoder.py:29-31 — the freeze loop is, notably, *inside* the vgg branch
only — and train.py:71), and always runs encoder.eval(); so batch-norm here
uses running statistics unconditionally and no param is ever trained.

Note: the reference claims densenet161 emits 1920 channels
(encoder.py:22); torchvision's densenet161 actually emits 2208 before
norm5, so the reference's densenet path cannot run. We implement the
correct 2208.

Pretrained weights are ported offline from torchvision state_dicts
(tools/port_torchvision.py -> sat_tpu.compat.torch_encoder); param trees
mirror torchvision's module names to make that mapping mechanical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-5

# ---------------------------------------------------------------- helpers

def conv2d(x, w, stride=1, padding="SAME"):
    """NHWC conv with HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def max_pool(x, window=2, stride=2, padding="VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), padding)


def avg_pool(x, window=2, stride=2):
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        "VALID")
    return summed / (window * window)


def batch_norm(x, bn):
    """Inference-mode BN with running statistics."""
    inv = jax.lax.rsqrt(bn["var"] + BN_EPS)
    return (x - bn["mean"]) * inv * bn["scale"] + bn["bias"]


def _kaiming_conv(rng, kh, kw, cin, cout, dtype=jnp.float32):
    fan_out = kh * kw * cout
    std = jnp.sqrt(2.0 / fan_out)
    return jax.random.normal(rng, (kh, kw, cin, cout), dtype) * std


def _bn_init(ch, dtype=jnp.float32):
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype),
            "mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}


# ---------------------------------------------------------------- VGG19

# torchvision vgg19.features layout; 'M' = maxpool. The final 'M' (feature
# index 36) is dropped per the reference (encoder.py:26).
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512]


def vgg19_layer_plan():
    """[('conv', torchvision_feature_index, out_ch) | ('pool',)] sequence."""
    plan, idx = [], 0
    for entry in VGG19_CFG:
        if entry == "M":
            plan.append(("pool",))
            idx += 1
        else:
            plan.append(("conv", idx, entry))
            idx += 2  # Conv2d + ReLU
    return plan


def init_vgg19_params(rng, dtype=jnp.float32):
    params, cin = {}, 3
    for op in vgg19_layer_plan():
        if op[0] == "conv":
            _, idx, cout = op
            rng, sub = jax.random.split(rng)
            params[f"conv{idx}"] = {
                "w": _kaiming_conv(sub, 3, 3, cin, cout, dtype),
                "b": jnp.zeros((cout,), dtype)}
            cin = cout
    return params


def space_to_depth(x, block: int = 2):
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C); channel layout (a, b, c) with
    `a`/`b` the fine row/col phase — the layout `_conv1_s2d_kernel` maps."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // block, block, W // block, block, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, H // block, W // block, block * block * C)


def depth_to_space(x, block: int = 2):
    """Inverse of `space_to_depth`: (B, P, Q, b*b*c) -> (B, P*b, Q*b, c)."""
    B, P, Q, C = x.shape
    c = C // (block * block)
    x = x.reshape(B, P, Q, block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, P * block, Q * block, c)


def _conv1_s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Transform a 3x3 stride-1 SAME kernel (3,3,Cin,Cout) into the
    equivalent coarse kernel (3,3,4*Cin,4*Cout) over space-to-depth input.

    The first VGG conv contracts only kh*kw*Cin = 27 values per output — a
    fraction of the MXU's 128 reduction lanes, so the implicit GEMM runs at
    ~21% lane utilization. Folding a 2x2 pixel block into channels raises
    the contraction to 108 lanes (~84%); each output-phase block (di,dj)
    reads the fine rows 2p+di-1..2p+di+1, which a 3x3 coarse footprint
    covers exactly (unused taps are structural zeros). Same multiply-adds
    as the original conv up to f32 summation order; fine-grid SAME padding
    maps 1:1 onto coarse SAME padding.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "transform derived for 3x3 stride-1 SAME"
    K = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            oc = (di * 2 + dj) * cout
            for dy in range(kh):
                for dx in range(kw):
                    r, s = di + dy - 1, dj + dx - 1       # fine offsets
                    P, a = (r + 2) // 2 - 1, (r + 2) % 2  # coarse tap, phase
                    Q, b = (s + 2) // 2 - 1, (s + 2) % 2
                    ic = (a * 2 + b) * cin
                    K = K.at[P + 1, Q + 1, ic:ic + cin,
                             oc:oc + cout].set(w[dy, dx])
    return K


def vgg19_forward(params, x, s2d_conv1: bool = False):
    plan = vgg19_layer_plan()
    if s2d_conv1:
        p = params["conv0"]
        y = conv2d(space_to_depth(x), _conv1_s2d_kernel(p["w"]))
        x = jax.nn.relu(depth_to_space(y) + p["b"])
        plan = plan[1:]
    for op in plan:
        if op[0] == "pool":
            x = max_pool(x)
        else:
            _, idx, _ = op
            p = params[f"conv{idx}"]
            x = jax.nn.relu(conv2d(x, p["w"]) + p["b"])
    return x  # (B, 14, 14, 512) for 224 input


# ---------------------------------------------------------------- ResNet152

RESNET152_BLOCKS = (3, 8, 36, 3)
RESNET_EXPANSION = 4


def init_resnet152_params(rng, dtype=jnp.float32):
    def split():
        nonlocal rng
        rng, sub = jax.random.split(rng)
        return sub

    params = {"conv1": {"w": _kaiming_conv(split(), 7, 7, 3, 64, dtype)},
              "bn1": _bn_init(64, dtype)}
    cin = 64
    for li, n_blocks in enumerate(RESNET152_BLOCKS, start=1):
        width = 64 * (2 ** (li - 1))
        cout = width * RESNET_EXPANSION
        stride = 1 if li == 1 else 2
        blocks = []
        for bi in range(n_blocks):
            s = stride if bi == 0 else 1
            block = {
                "conv1": {"w": _kaiming_conv(split(), 1, 1, cin, width, dtype)},
                "bn1": _bn_init(width, dtype),
                "conv2": {"w": _kaiming_conv(split(), 3, 3, width, width, dtype)},
                "bn2": _bn_init(width, dtype),
                "conv3": {"w": _kaiming_conv(split(), 1, 1, width, cout, dtype)},
                "bn3": _bn_init(cout, dtype),
            }
            if bi == 0:
                block["downsample"] = {
                    "conv": {"w": _kaiming_conv(split(), 1, 1, cin, cout, dtype)},
                    "bn": _bn_init(cout, dtype)}
            blocks.append(block)
            cin = cout
        params[f"layer{li}"] = blocks
    return params


def _bottleneck(block, x, stride):
    out = jax.nn.relu(batch_norm(conv2d(x, block["conv1"]["w"]), block["bn1"]))
    # Explicit (1,1) padding: XLA SAME pads asymmetrically under stride 2,
    # torch's Conv2d(padding=1) does not.
    out = jax.nn.relu(batch_norm(
        conv2d(out, block["conv2"]["w"], stride, padding=[(1, 1), (1, 1)]),
        block["bn2"]))
    out = batch_norm(conv2d(out, block["conv3"]["w"]), block["bn3"])
    if "downsample" in block:
        x = batch_norm(conv2d(x, block["downsample"]["conv"]["w"], stride),
                       block["downsample"]["bn"])
    return jax.nn.relu(out + x)


def _stack_pytrees(trees):
    """Stack a list of identically-structured pytrees leaf-wise (axis 0)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def resnet152_forward(params, x, scan_blocks: bool = False):
    """`scan_blocks=True` runs each layer's identical non-downsample
    bottlenecks as ONE `lax.scan` body over weight-stacked params instead
    of 44 unrolled copies. Same math in the same order (the scanned body is
    the identical `_bottleneck` call; bitwise-asserted in
    tests/test_encoder.py), but the HLO shrinks from ~152 conv layers to
    ~20 — the unrolled whole-program e2e HLO is what exceeded the axon
    remote-compile endpoint's HTTP-413 upload cap (bench.py leg_resnet),
    and scan also cuts compile time. Off by default only because the
    unrolled form gives XLA cross-block scheduling freedom; measured e2e
    deltas decide which the bench uses."""
    x = conv2d(x, params["conv1"]["w"], stride=2,
               padding=[(3, 3), (3, 3)])
    x = jax.nn.relu(batch_norm(x, params["bn1"]))
    x = max_pool(x, window=3, stride=2, padding=[(0, 0), (1, 1), (1, 1), (0, 0)])
    for li in range(1, 5):
        blocks = params[f"layer{li}"]
        x = _bottleneck(blocks[0], x, 1 if li == 1 else 2)
        if scan_blocks and len(blocks) > 2:
            def _body(h, blk):
                return _bottleneck(blk, h, 1), None
            x, _ = jax.lax.scan(_body, x, _stack_pytrees(blocks[1:]))
        else:
            for block in blocks[1:]:
                x = _bottleneck(block, x, 1)
    return x  # (B, 7, 7, 2048)


# ---------------------------------------------------------------- DenseNet161

DENSENET161_BLOCKS = (6, 12, 36, 24)
DENSENET_GROWTH = 48
DENSENET_INIT = 96
DENSENET_BN_SIZE = 4


def init_densenet161_params(rng, dtype=jnp.float32):
    def split():
        nonlocal rng
        rng, sub = jax.random.split(rng)
        return sub

    params = {"conv0": {"w": _kaiming_conv(split(), 7, 7, 3, DENSENET_INIT, dtype)},
              "norm0": _bn_init(DENSENET_INIT, dtype)}
    ch = DENSENET_INIT
    for bi, n_layers in enumerate(DENSENET161_BLOCKS, start=1):
        layers = []
        for _ in range(n_layers):
            inter = DENSENET_BN_SIZE * DENSENET_GROWTH
            layers.append({
                "norm1": _bn_init(ch, dtype),
                "conv1": {"w": _kaiming_conv(split(), 1, 1, ch, inter, dtype)},
                "norm2": _bn_init(inter, dtype),
                "conv2": {"w": _kaiming_conv(split(), 3, 3, inter, DENSENET_GROWTH, dtype)},
            })
            ch += DENSENET_GROWTH
        params[f"block{bi}"] = layers
        if bi < 4:
            out = ch // 2
            params[f"trans{bi}"] = {
                "norm": _bn_init(ch, dtype),
                "conv": {"w": _kaiming_conv(split(), 1, 1, ch, out, dtype)}}
            ch = out
    return params  # final ch == 2208


def _dense_layer(layer, x):
    out = jax.nn.relu(batch_norm(x, layer["norm1"]))
    out = conv2d(out, layer["conv1"]["w"])
    out = jax.nn.relu(batch_norm(out, layer["norm2"]))
    out = conv2d(out, layer["conv2"]["w"])
    return jnp.concatenate([x, out], axis=-1)


def densenet161_forward(params, x):
    x = conv2d(x, params["conv0"]["w"], stride=2, padding=[(3, 3), (3, 3)])
    x = jax.nn.relu(batch_norm(x, params["norm0"]))
    x = max_pool(x, window=3, stride=2, padding=[(0, 0), (1, 1), (1, 1), (0, 0)])
    for bi in range(1, 5):
        for layer in params[f"block{bi}"]:
            x = _dense_layer(layer, x)
        if bi < 4:
            t = params[f"trans{bi}"]
            x = jax.nn.relu(batch_norm(x, t["norm"]))
            x = conv2d(x, t["conv"]["w"])
            x = avg_pool(x)
    return x  # (B, 7, 7, 2208) — pre-norm5, per the reference's slicing


# ---------------------------------------------------------------- façade

_FORWARD = {"vgg19": vgg19_forward, "resnet152": resnet152_forward,
            "densenet161": densenet161_forward}
_INIT = {"vgg19": init_vgg19_params, "resnet152": init_resnet152_params,
         "densenet161": init_densenet161_params}


def init_encoder_params(rng, network: str, dtype=jnp.float32):
    return _INIT[network](rng, dtype)


def encoder_forward(params, network: str, images: jnp.ndarray,
                    compute_dtype=None, s2d_conv1: bool = False,
                    scan_blocks: bool = False) -> jnp.ndarray:
    """images (B, 224, 224, 3) NHWC -> annotation grid (B, L, C).

    `compute_dtype=jnp.bfloat16` casts inputs/params for MXU-friendly conv
    throughput; the annotation grid is returned in float32 either way.
    `s2d_conv1` (vgg19 only) runs the first conv in space-to-depth form —
    same math, 4x the MXU reduction-lane utilization on the 3-channel conv.
    `scan_blocks` (resnet152 only) collapses the repeated bottleneck blocks
    into `lax.scan` bodies — identical math, ~8x smaller HLO.
    """
    if compute_dtype is not None:
        params = jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params)
        images = images.astype(compute_dtype)
    if network == "vgg19" and s2d_conv1:
        x = vgg19_forward(params, images, s2d_conv1=True)
    elif network == "resnet152" and scan_blocks:
        x = resnet152_forward(params, images, scan_blocks=True)
    else:
        x = _FORWARD[network](params, images)
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C).astype(jnp.float32)
