"""Bahdanau-style soft attention over the annotation grid.

Computes, per batch row (reference attention.py:14-21):

    e      = v . tanh(W a_l + U h)     for each of the L annotation vectors
    alpha  = softmax(e)                 over L
    z      = sum_l alpha_l a_l          (context)

`W a_l` depends only on the image features, so the train/decode loops
precompute it once per image (`precompute_attention_keys`) and every
timestep pays just the small `U h` matmul plus the L-length softmax —
the per-step work the fused Pallas kernel later absorbs entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _linear_init(rng, fan_in, fan_out, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
    weight and bias."""
    k = 1.0 / jnp.sqrt(fan_in)
    rw, rb = jax.random.split(rng)
    return {"w": jax.random.uniform(rw, (fan_in, fan_out), dtype, -k, k),
            "b": jax.random.uniform(rb, (fan_out,), dtype, -k, k)}


def init_attention_params(rng: jax.Array, encoder_dim: int,
                          embedding_size: int, dtype=jnp.float32) -> dict:
    rU, rW, rv = jax.random.split(rng, 3)
    return {
        "U": _linear_init(rU, embedding_size, embedding_size, dtype),
        "W": _linear_init(rW, encoder_dim, embedding_size, dtype),
        "v": _linear_init(rv, embedding_size, 1, dtype),
    }


def precompute_attention_keys(params: dict, features: jnp.ndarray) -> jnp.ndarray:
    """W a + b_W for all annotation vectors: (B, L, D) -> (B, L, E)."""
    return features @ params["W"]["w"] + params["W"]["b"]


def soft_attention(params: dict, features: jnp.ndarray, hidden: jnp.ndarray,
                   keys: jnp.ndarray | None = None,
                   middle_dtype=None):
    """(context (B, D), alpha (B, L)) for features (B, L, D), hidden (B, E).

    `middle_dtype` (e.g. jnp.bfloat16) casts the (B, L, E) tanh
    intermediate — the training step's dominant saved activation — to a
    narrower type: autodiff then stores the bf16 tensor instead of f32,
    halving the HBM traffic of the backward pass. Scores, softmax, and the
    context reduction stay f32. None (default) = exact f32 reference
    numerics.
    """
    if keys is None:
        keys = precompute_attention_keys(params, features)
    u_h = hidden @ params["U"]["w"] + params["U"]["b"]        # (B, E)
    if middle_dtype is not None:
        att = jnp.tanh(keys.astype(middle_dtype)
                       + u_h.astype(middle_dtype)[:, None, :])  # (B, L, E)
        e = (att @ params["v"]["w"].astype(middle_dtype)
             ).astype(jnp.float32)[..., 0] + params["v"]["b"][0]
    else:
        att = jnp.tanh(keys + u_h[:, None, :])                # (B, L, E)
        e = (att @ params["v"]["w"])[..., 0] + params["v"]["b"][0]  # (B, L)
    alpha = jax.nn.softmax(e, axis=1)
    context = (features * alpha[..., None]).sum(axis=1)       # (B, D)
    return context, alpha
