"""Fused-attention decode path composed into beam search (interpret mode on
CPU): tokens must match the unfused golden-tested path exactly."""

import dataclasses

import numpy as np

import jax

from sat_tpu.models import DecoderConfig, init_decoder_params
from sat_tpu.models.beam import beam_search, beam_search_batched, extract_caption


def test_beam_with_fused_attention_matches_unfused():
    V, D, L = 40, 64, 9
    base = DecoderConfig(vocab_size=V, encoder_dim=D, use_attention=True)
    fused = dataclasses.replace(base, fused_attention=True)
    params = init_decoder_params(jax.random.PRNGKey(0), base)
    for seed in range(3):
        feats = np.random.default_rng(seed).normal(size=(L, D)).astype(np.float32)
        t_base, a_base = extract_caption(beam_search(params, base, feats, 3))
        t_fused, a_fused = extract_caption(beam_search(params, fused, feats, 3))
        assert t_base == t_fused
        np.testing.assert_allclose(a_base, a_fused, atol=1e-5)


def test_batched_beam_with_fused_attention():
    V, D, L = 30, 32, 4
    fused = DecoderConfig(vocab_size=V, encoder_dim=D, use_attention=True,
                          fused_attention=True)
    params = init_decoder_params(jax.random.PRNGKey(1), fused)
    feats = np.random.default_rng(7).normal(size=(2, L, D)).astype(np.float32)
    res = beam_search_batched(params, fused, feats, 2)
    assert res.tokens.shape[0] == 2
