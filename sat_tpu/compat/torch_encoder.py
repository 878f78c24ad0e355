"""Port torchvision encoder state_dicts into sat_tpu param trees.

Works on plain mappings of name -> array (torch tensors or numpy), so the
conversion runs offline wherever a torchvision checkpoint file exists and
the result ships as an .npz consumed via `--encoder-weights` (the reference
instead downloads pretrained models at Encoder construction time,
reference encoder.py:14-24 — impossible in a zero-egress TPU pod).

Conventions: torch conv weights are OIHW -> ours are HWIO (transpose
2,3,1,0); torch Linear/BN naming maps as weight->scale, bias->bias,
running_mean->mean, running_var->var.
"""

from __future__ import annotations

import numpy as np

from sat_tpu.models.encoder import (
    vgg19_layer_plan,
    RESNET152_BLOCKS,
    DENSENET161_BLOCKS,
)


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv_w(t):
    return np.ascontiguousarray(_np(t).transpose(2, 3, 1, 0))


def _bn(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"])}


def vgg19_params_from_state_dict(sd) -> dict:
    """torchvision vgg19: keys `features.{idx}.weight/bias`. Also accepts a
    bare `{idx}.weight` schema (a stripped nn.Sequential's state_dict, as the
    reference's Encoder would produce)."""
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    params = {}
    for op in vgg19_layer_plan():
        if op[0] != "conv":
            continue
        _, idx, _ = op
        params[f"conv{idx}"] = {"w": _conv_w(sd[f"{prefix}{idx}.weight"]),
                                "b": _np(sd[f"{prefix}{idx}.bias"])}
    return params


def resnet152_params_from_state_dict(sd) -> dict:
    params = {"conv1": {"w": _conv_w(sd["conv1.weight"])},
              "bn1": _bn(sd, "bn1")}
    for li, n_blocks in enumerate(RESNET152_BLOCKS, start=1):
        blocks = []
        for bi in range(n_blocks):
            p = f"layer{li}.{bi}"
            block = {}
            for ci in (1, 2, 3):
                block[f"conv{ci}"] = {"w": _conv_w(sd[f"{p}.conv{ci}.weight"])}
                block[f"bn{ci}"] = _bn(sd, f"{p}.bn{ci}")
            if f"{p}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": {"w": _conv_w(sd[f"{p}.downsample.0.weight"])},
                    "bn": _bn(sd, f"{p}.downsample.1")}
            blocks.append(block)
        params[f"layer{li}"] = blocks
    return params


def densenet161_params_from_state_dict(sd) -> dict:
    params = {"conv0": {"w": _conv_w(sd["features.conv0.weight"])},
              "norm0": _bn(sd, "features.norm0")}
    for bi, n_layers in enumerate(DENSENET161_BLOCKS, start=1):
        layers = []
        for lj in range(1, n_layers + 1):
            p = f"features.denseblock{bi}.denselayer{lj}"
            layers.append({
                "norm1": _bn(sd, f"{p}.norm1"),
                "conv1": {"w": _conv_w(sd[f"{p}.conv1.weight"])},
                "norm2": _bn(sd, f"{p}.norm2"),
                "conv2": {"w": _conv_w(sd[f"{p}.conv2.weight"])},
            })
        params[f"block{bi}"] = layers
        if bi < 4:
            t = f"features.transition{bi}"
            params[f"trans{bi}"] = {"norm": _bn(sd, f"{t}.norm"),
                                    "conv": {"w": _conv_w(sd[f"{t}.conv.weight"])}}
    return params


ENCODER_IMPORTERS = {
    "vgg19": vgg19_params_from_state_dict,
    "resnet152": resnet152_params_from_state_dict,
    "densenet161": densenet161_params_from_state_dict,
}


def encoder_params_from_state_dict(network: str, sd) -> dict:
    return ENCODER_IMPORTERS[network](sd)


def save_encoder_npz(path: str, params: dict) -> None:
    import jax
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for key_path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in key_path)
        arrays[name] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_encoder_npz(path: str, template: dict) -> dict:
    """Restore an .npz (written by save_encoder_npz) into the structure of
    `template` (an init_encoder_params tree)."""
    import jax
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for key_path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in key_path)
        arr = data[name]
        assert arr.shape == np.shape(leaf), f"{name}: {arr.shape} vs {np.shape(leaf)}"
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
