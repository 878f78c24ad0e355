"""Stochastic decoding: determinism by key, temperature->greedy limit,
top-k/top-p truncation correctness."""

import numpy as np

import jax
import jax.numpy as jnp

from sat_tpu.models import DecoderConfig, init_decoder_params
from sat_tpu.models.beam import greedy_caption, sample_caption

V, D, L, B = 40, 32, 9, 4


def _setup(seed=0):
    cfg = DecoderConfig(vocab_size=V, encoder_dim=D, use_attention=True)
    params = init_decoder_params(jax.random.PRNGKey(seed), cfg)
    feats = np.random.default_rng(seed).normal(size=(B, L, D)).astype(np.float32)
    return cfg, params, feats


def test_sampling_deterministic_per_key():
    cfg, params, feats = _setup()
    t1, l1 = sample_caption(params, cfg, feats, jax.random.PRNGKey(1))
    t2, l2 = sample_caption(params, cfg, feats, jax.random.PRNGKey(1))
    t3, _ = sample_caption(params, cfg, feats, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert (np.asarray(t1) != np.asarray(t3)).any()


def test_low_temperature_approaches_greedy():
    cfg, params, feats = _setup(seed=3)
    toks_s, _ = sample_caption(params, cfg, feats, jax.random.PRNGKey(0),
                               temperature=1e-4)
    toks_g, _ = greedy_caption(params, cfg, feats)
    np.testing.assert_array_equal(np.asarray(toks_s), np.asarray(toks_g))


def test_top_k_one_is_greedy():
    cfg, params, feats = _setup(seed=5)
    toks_s, _ = sample_caption(params, cfg, feats, jax.random.PRNGKey(0),
                               top_k=1)
    toks_g, _ = greedy_caption(params, cfg, feats)
    np.testing.assert_array_equal(np.asarray(toks_s), np.asarray(toks_g))


def test_top_p_small_is_greedy():
    cfg, params, feats = _setup(seed=7)
    toks_s, _ = sample_caption(params, cfg, feats, jax.random.PRNGKey(0),
                               top_p=1e-6)
    toks_g, _ = greedy_caption(params, cfg, feats)
    np.testing.assert_array_equal(np.asarray(toks_s), np.asarray(toks_g))


def test_sampling_is_jittable():
    cfg, params, feats = _setup(seed=9)
    f = jax.jit(lambda p, x, r: sample_caption(p, cfg, x, r, temperature=0.8,
                                               top_k=5, top_p=0.9))
    toks, lengths = f(params, feats, jax.random.PRNGKey(4))
    assert toks.shape == (B, 51) and lengths.shape == (B,)


def test_degenerate_sampling_params_rejected():
    """top_p=0 empties the nucleus (every logit -inf -> categorical
    silently emits token 0 forever); negative top_k crashes deep inside
    lax.top_k. Both must fail loudly at the API boundary (review r3)."""
    import pytest

    from sat_tpu.engine.serving import build_caption_fn
    from sat_tpu.models.encoder import init_encoder_params

    cfg, params, feats = _setup()
    for kw in ({"top_p": 0.0}, {"top_p": -0.5}, {"top_p": 1.5},
               {"top_k": -1}, {"temperature": -1.0}):
        with pytest.raises(ValueError):
            sample_caption(params, cfg, feats, jax.random.PRNGKey(0), **kw)
    # the serving closure rejects at BUILD time (CLI startup), before any
    # request traces
    enc = init_encoder_params(jax.random.PRNGKey(0), "vgg19")
    with pytest.raises(ValueError):
        build_caption_fn("vgg19", cfg, enc, params, beam_size=1,
                         decode="sample", top_p=0.0)
    # valid edges still accepted: top_p=1 / top_k=0 disable truncation
    sample_caption(params, cfg, feats, jax.random.PRNGKey(0),
                   top_p=1.0, top_k=0, temperature=0.0)
