"""Checkpointing.

Two tiers, a strict superset of the reference:

  1. Per-epoch decoder weights + `model_config.json`, mirroring the
     reference's `torch.save(decoder.state_dict(), 'model/model_{net}_{e}.pth')`
     (reference train.py:102-110) — here a flat `.npz` of the decoder param
     tree. Reference `.pth` files are also *loadable* via
     sat_tpu.compat.decoder_params_from_state_dict (strict -> non-strict
     fallback, like generate_caption.py:65-69).
  2. Orbax full train-state checkpoints (params + Adam moments + step +
     epoch) for crash-resume — capability the reference lacks (its resume is
     warm-start only; optimizer state is never saved, SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax


def _flatten_with_names(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for key_path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in key_path)
        out[name] = np.asarray(leaf)
    return out


def tree_save_npz(path: str, tree) -> None:
    np.savez(path, **_flatten_with_names(tree))


def tree_load_npz(path: str, template):
    """Load an npz written by tree_save_npz into `template`'s structure."""
    data = np.load(path)
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for key_path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in key_path)
        arr = data[name]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {np.shape(leaf)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), leaves)


def save_decoder_checkpoint(checkpoint_dir: str, network: str, epoch: int,
                            params) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, f"model_{network}_{epoch}.npz")
    tree_save_npz(path, params)
    return path


def load_decoder_checkpoint(path: str, template, strict: bool = True):
    """Load decoder params from either our .npz or a reference torch .pth.

    Mirrors the reference's strict -> non-strict fallback
    (generate_caption.py:65-69) when `strict=False` is needed.
    """
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch
        from sat_tpu.compat import decoder_params_from_state_dict
        sd = torch.load(path, map_location="cpu")
        try:
            return decoder_params_from_state_dict(sd, template, strict=True)
        except KeyError:
            if strict:
                raise
            print("Strict loading failed, loading with strict=False")
            return decoder_params_from_state_dict(sd, template, strict=False)
    return tree_load_npz(path, template)


# ------------------------------------------------------------------ orbax

def save_train_state(checkpoint_dir: str, step: int, state_tree) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(checkpoint_dir, "orbax", str(step)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state_tree, force=True)
    ckptr.wait_until_finished()


def latest_train_state_step(checkpoint_dir: str) -> Optional[int]:
    root = os.path.join(checkpoint_dir, "orbax")
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(steps) if steps else None


def restore_train_state(checkpoint_dir: str, step: int, template):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(checkpoint_dir, "orbax", str(step)))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
