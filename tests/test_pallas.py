"""Pallas fused-attention kernel equivalence tests (interpret mode on the
CPU backend; on-device equivalence is exercised by bench/verify runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sat_tpu.models.attention import (
    init_attention_params,
    precompute_attention_keys,
    soft_attention,
)
from sat_tpu.ops.fused_attention import fused_soft_attention


@pytest.mark.parametrize("B,L,E,D", [
    (5, 9, 64, 48),      # odd batch -> exercises padding path
    (8, 196, 128, 96),   # full grid row
    (1, 49, 64, 64),     # single row, resnet-style grid
])
def test_fused_attention_matches_reference(B, L, E, D):
    params = init_attention_params(jax.random.PRNGKey(0), D, E)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, L, D)),
                        dtype=jnp.float32)
    h = jnp.asarray(np.random.default_rng(1).normal(size=(B, E)),
                    dtype=jnp.float32)
    keys = precompute_attention_keys(params, feats)
    ctx_ref, alpha_ref = soft_attention(params, feats, h, keys)
    ctx, alpha = fused_soft_attention(params, feats, h, keys, interpret=True)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha).sum(axis=1), 1.0, atol=1e-5)


def test_fused_attention_gradient_not_required():
    """The kernel is an inference path; ensure calling it under stop_gradient
    composes (used in beam search, never differentiated)."""
    params = init_attention_params(jax.random.PRNGKey(0), 32, 32)
    feats = jnp.ones((2, 4, 32))
    h = jnp.ones((2, 32))
    keys = precompute_attention_keys(params, feats)
    ctx, alpha = jax.lax.stop_gradient(
        fused_soft_attention(params, feats, h, keys, interpret=True))
    assert ctx.shape == (2, 32) and alpha.shape == (2, 4)
