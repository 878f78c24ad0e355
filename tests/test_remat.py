"""Scan-body rematerialization (`DecoderConfig.remat_scan` / `--remat-scan`).

`jax.checkpoint` on the decoder's per-timestep scan body changes only WHERE
the backward pass gets its intermediates (recompute vs. saved residuals),
never the math: forward outputs must be bit-identical and gradients equal to
the non-remat path for every flag combination (tf/autoregressive, ado, bf16
attention middle, dropout on).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sat_tpu.models import DecoderConfig, init_decoder_params, decoder_forward
from sat_tpu.utils.metrics import (attention_regularization,
                                   reference_packed_cross_entropy)

B, L, D, V, T1 = 4, 9, 32, 40, 8


def _data(seed=0):
    feats = np.random.default_rng(seed).normal(size=(B, L, D)).astype(np.float32)
    caps = np.random.default_rng(seed + 1).integers(4, V, size=(B, T1)).astype(np.int32)
    return jnp.asarray(feats), jnp.asarray(caps)


@pytest.mark.parametrize("tf", [True, False])
@pytest.mark.parametrize("ado", [True, False])
def test_forward_bit_identical(tf, ado):
    base = DecoderConfig(vocab_size=V, encoder_dim=D, use_tf=tf, use_ado=ado,
                         use_attention=True)
    remat = dataclasses.replace(base, remat_scan=True)
    params = init_decoder_params(jax.random.PRNGKey(0), base)
    feats, caps = _data()
    p0, a0 = jax.jit(lambda p: decoder_forward(p, base, feats, caps))(params)
    p1, a1 = jax.jit(lambda p: decoder_forward(p, remat, feats, caps))(params)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


@pytest.mark.parametrize("tf", [True, False])
@pytest.mark.parametrize("bf16_att", [False, True])
def test_grads_match(tf, bf16_att):
    base = DecoderConfig(vocab_size=V, encoder_dim=D, use_tf=tf,
                         use_attention=True, bf16_attention=bf16_att)
    remat = dataclasses.replace(base, remat_scan=True)
    params = init_decoder_params(jax.random.PRNGKey(1), base)
    feats, caps = _data(seed=3)

    def loss(cfg):
        def inner(p):
            preds, alphas = decoder_forward(p, cfg, feats, caps)
            return (reference_packed_cross_entropy(preds, caps[:, 1:])
                    + attention_regularization(alphas.astype(jnp.float32), 1.0))
        return inner

    g0 = jax.jit(jax.grad(loss(base)))(params)
    g1 = jax.jit(jax.grad(loss(remat)))(params)
    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    assert len(leaves0) == len(leaves1)
    # Same ops on the same inputs in a different schedule: XLA may fuse
    # differently, so allow float-reassociation-level tolerance only.
    for a, b in zip(leaves1, leaves0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_grads_match_with_dropout():
    """Dropout masks are re-derived from the same per-step rng under remat,
    so gradients stay equal with train=True."""
    base = DecoderConfig(vocab_size=V, encoder_dim=D, use_tf=False,
                         use_attention=True, dropout_rate=0.5)
    remat = dataclasses.replace(base, remat_scan=True)
    params = init_decoder_params(jax.random.PRNGKey(2), base)
    feats, caps = _data(seed=7)
    rng = jax.random.PRNGKey(123)

    def loss(cfg):
        def inner(p):
            preds, _ = decoder_forward(p, cfg, feats, caps, rng=rng, train=True)
            return reference_packed_cross_entropy(preds, caps[:, 1:])
        return inner

    g0 = jax.jit(jax.grad(loss(base)))(params)
    g1 = jax.jit(jax.grad(loss(remat)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_config_plumbs_remat_flag():
    from sat_tpu.config import build_arg_parser, config_from_args
    args = build_arg_parser().parse_args(["--remat-scan"])
    cfg = config_from_args(args)
    assert cfg.remat_scan is True
    assert "remat_scan" not in cfg.reference_dict()  # extension, not parity
