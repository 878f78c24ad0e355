"""Import reference PyTorch decoder checkpoints into sat_tpu param trees.

The reference releases decoder `state_dict()` files (reference
train.py:102-104; README Dropbox checkpoints) with this key schema
(reference decoder.py:40-66):

  embedding.weight                      (V, E)
  init_h.{weight,bias}  init_c.{...}    E x D  (torch Linear is (out, in))
  f_beta.{weight,bias}
  attention.{U,W,v}.{weight,bias}
  lstm.{weight_ih,weight_hh,bias_ih,bias_hh}
  f_h/f_z/f_out.{weight,bias}           (ado only)
  deep_output.{weight,bias}

We store linears as (in, out), so weights transpose on import. Gate order
inside the LSTM weights (i, f, g, o) is identical in both frameworks, so
the 4H blocks carry over unchanged.

`strict=False` mirrors the reference's fallback load
(generate_caption.py:65-69): missing keys keep their current values and
unexpected keys are ignored.
"""

from __future__ import annotations

import numpy as np


def decoder_params_from_state_dict(state_dict, params: dict,
                                   strict: bool = True) -> dict:
    """Return a copy of `params` with values replaced from a torch
    state_dict (a mapping of name -> array-like; torch tensors accepted)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    import copy
    new = copy.deepcopy(jax_to_numpy(params))

    consumed = set()

    def take_linear(tname, tree):
        for suffix, key in (("weight", "w"), ("bias", "b")):
            full = f"{tname}.{suffix}"
            if full in sd:
                arr = sd[full].T if suffix == "weight" else sd[full]
                tree[key] = np.ascontiguousarray(arr)
                consumed.add(full)
            elif strict:
                raise KeyError(f"missing key in state_dict: {full}")

    if "embedding.weight" in sd:
        new["embedding"] = sd["embedding.weight"]
        consumed.add("embedding.weight")
    elif strict:
        raise KeyError("missing key in state_dict: embedding.weight")

    take_linear("init_h", new["init_h"])
    take_linear("init_c", new["init_c"])
    take_linear("f_beta", new["f_beta"])
    take_linear("attention.U", new["attention"]["U"])
    take_linear("attention.W", new["attention"]["W"])
    take_linear("attention.v", new["attention"]["v"])
    take_linear("deep_output", new["deep_output"])

    for tname, key in (("weight_ih", "w_ih"), ("weight_hh", "w_hh"),
                       ("bias_ih", "b_ih"), ("bias_hh", "b_hh")):
        full = f"lstm.{tname}"
        if full in sd:
            arr = sd[full].T if tname.startswith("weight") else sd[full]
            new["lstm"][key] = np.ascontiguousarray(arr)
            consumed.add(full)
        elif strict:
            raise KeyError(f"missing key in state_dict: {full}")

    if "ado" in new:
        take_linear("f_h", new["ado"]["f_h"])
        take_linear("f_z", new["ado"]["f_z"])
        take_linear("f_out", new["ado"]["f_out"])

    if strict:
        unexpected = set(sd) - consumed
        if unexpected:
            raise KeyError(f"unexpected keys in state_dict: {sorted(unexpected)}")
    return new


def state_dict_from_decoder_params(params: dict) -> dict:
    """Inverse of `decoder_params_from_state_dict`: export a sat_tpu decoder
    param tree as a reference-schema state_dict (name -> np.float32 array),
    ready for `torch.save({k: torch.from_numpy(v) ...})` and
    `Decoder.load_state_dict` on the reference side (its key schema per
    reference decoder.py:40-66, saves per train.py:102-104).

    Linears stored here as (in, out) transpose back to torch's (out, in);
    the LSTM's (i, f, g, o) gate blocks carry over unchanged (same order in
    both frameworks). `f_h`/`f_z`/`f_out` are emitted only when the tree
    has an `ado` branch — matching a reference Decoder constructed with the
    same flag."""
    p = jax_to_numpy(params)
    sd = {}

    def put_linear(tname, tree):
        sd[f"{tname}.weight"] = np.ascontiguousarray(
            np.asarray(tree["w"], dtype=np.float32).T)
        sd[f"{tname}.bias"] = np.asarray(tree["b"], dtype=np.float32)

    sd["embedding.weight"] = np.asarray(p["embedding"], dtype=np.float32)
    put_linear("init_h", p["init_h"])
    put_linear("init_c", p["init_c"])
    put_linear("f_beta", p["f_beta"])
    put_linear("attention.U", p["attention"]["U"])
    put_linear("attention.W", p["attention"]["W"])
    put_linear("attention.v", p["attention"]["v"])
    put_linear("deep_output", p["deep_output"])
    for tname, key in (("weight_ih", "w_ih"), ("weight_hh", "w_hh"),
                       ("bias_ih", "b_ih"), ("bias_hh", "b_hh")):
        arr = np.asarray(p["lstm"][key], dtype=np.float32)
        if tname.startswith("weight"):
            arr = np.ascontiguousarray(arr.T)
        sd[f"lstm.{tname}"] = arr
    if "ado" in p:
        put_linear("f_h", p["ado"]["f_h"])
        put_linear("f_z", p["ado"]["f_z"])
        put_linear("f_out", p["ado"]["f_out"])
    return sd


def jax_to_numpy(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
