"""Custom-VJP fused attention: gradient equivalence with the XLA path
(interpret mode on CPU), including flow through both outputs (context and
alpha — the doubly-stochastic regularizer differentiates alpha)."""

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


def _setup(B, L, E, D, seed=0):
    params = init_attention_params(jax.random.PRNGKey(seed), D, E)
    feats = jnp.asarray(np.random.default_rng(seed).normal(size=(B, L, D)),
                        dtype=jnp.float32)
    h = jnp.asarray(np.random.default_rng(seed + 1).normal(size=(B, E)),
                    dtype=jnp.float32)
    return params, feats, h


@pytest.mark.parametrize("B,L,E,D", [(5, 9, 64, 48), (8, 12, 128, 96)])
def test_grads_match_xla(B, L, E, D):
    params, feats, h = _setup(B, L, E, D)
    w1 = jnp.asarray(np.random.default_rng(9).normal(size=(D,)), jnp.float32)
    w2 = jnp.asarray(np.random.default_rng(10).normal(size=(L,)), jnp.float32)

    def loss(fn):
        def inner(p, f, hh):
            keys = precompute_attention_keys(p, f)
            ctx, alpha = fn(p, f, hh, keys)
            # exercise both outputs, like CE + attention regularizer do
            return (ctx @ w1).sum() + ((alpha * w2) ** 2).sum()
        return inner

    ref_grads = jax.grad(loss(soft_attention), argnums=(0, 1, 2))(
        params, feats, h)
    fused_grads = jax.grad(
        loss(lambda p, f, hh, k: fused_soft_attention(p, f, hh, k,
                                                      interpret=True)),
        argnums=(0, 1, 2))(params, feats, h)

    flat_ref = jax.tree_util.tree_leaves(ref_grads)
    flat_fused = jax.tree_util.tree_leaves(fused_grads)
    assert len(flat_ref) == len(flat_fused)
    for a, b in zip(flat_fused, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_decoder_forward_grad_with_fused_attention():
    """decoder_forward differentiates end-to-end with the fused path on."""
    import dataclasses
    from sat_tpu.models import DecoderConfig, init_decoder_params, decoder_forward
    from sat_tpu.utils.metrics import (attention_regularization,
                                       reference_packed_cross_entropy)

    base = DecoderConfig(vocab_size=30, encoder_dim=32, use_tf=True,
                         use_attention=True)
    fused = dataclasses.replace(base, fused_attention=True)
    params = init_decoder_params(jax.random.PRNGKey(0), base)
    feats = np.random.default_rng(0).normal(size=(3, 6, 32)).astype(np.float32)
    caps = np.random.default_rng(1).integers(4, 30, size=(3, 7)).astype(np.int32)

    def loss(cfg):
        def inner(p):
            preds, alphas = decoder_forward(p, cfg, feats, caps)
            return (reference_packed_cross_entropy(preds, caps[:, 1:])
                    + attention_regularization(alphas, 1.0))
        return inner

    g_base = jax.grad(loss(base))(params)
    g_fused = jax.grad(loss(fused))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_base)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
