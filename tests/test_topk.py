"""exact_topk (Pallas, interpret mode on CPU) == jax.lax.top_k, exactly.

The beam search's token parity rests on lax.top_k's tie behavior (lower
index wins, models/beam.py:25), so the kernel must reproduce values AND
indices bit-for-bit on adversarial inputs: duplicate values, whole rows of
-inf (retired beam images), rows shorter than the block, k == N.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sat_tpu.ops.topk import exact_topk


def _check(x, k, block_b=8):
    x = jnp.asarray(x, jnp.float32)
    ref_v, ref_i = jax.lax.top_k(x, k)
    got_v, got_i = exact_topk(x, k, block_b=block_b, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


@pytest.mark.parametrize("B,N,k", [(8, 257, 5), (16, 64, 5), (3, 40, 7),
                                   (8, 130, 1)])
def test_random(B, N, k):
    x = np.random.default_rng(B * N + k).normal(size=(B, N))
    _check(x, k)


def test_massive_ties():
    rng = np.random.default_rng(0)
    # values drawn from just 3 distinct levels -> ties everywhere
    x = rng.choice([1.0, 2.0, 3.0], size=(8, 100))
    _check(x, 6)


def test_neg_inf_rows_and_partial():
    x = np.random.default_rng(1).normal(size=(8, 50)).astype(np.float32)
    x[2, :] = -np.inf                     # fully retired image
    x[5, 10:] = -np.inf                   # mostly masked row
    x[6, :3] = -np.inf
    _check(x, 5)


def test_duplicates_of_the_max():
    x = np.zeros((8, 33), np.float32)
    x[:, 7] = 5.0
    x[:, 19] = 5.0
    x[:, 3] = 5.0
    _check(x, 4)


def test_nan_ranks_as_neg_inf_in_range():
    """NaN candidates must never produce the out-of-range sentinel index
    (review r4: a NaN row used to emit index N for every slot, which the
    beam's parent gather silently clamps). lax.top_k's NaN placement is
    backend-defined so no cross-impl exactness is contracted; the kernel
    ranks NaN as -inf — deterministic and always in range."""
    import jax.numpy as jnp

    from sat_tpu.ops.topk import exact_topk

    x = np.random.default_rng(9).normal(size=(8, 50)).astype(np.float32)
    x[1, 7] = np.nan                      # one poisoned candidate
    x[4, :] = np.nan                      # fully poisoned row
    got_v, got_i = exact_topk(jnp.asarray(x), 5, interpret=True)
    got_v, got_i = np.asarray(got_v), np.asarray(got_i)
    assert got_i.min() >= 0 and got_i.max() < 50
    # single-NaN row: identical to the same row with that entry at -inf
    x2 = x.copy()
    x2[1, 7] = -np.inf
    x2[4, :] = -np.inf
    import jax
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(x2), 5)
    np.testing.assert_array_equal(got_i, np.asarray(ref_i))
    # the all-NaN row selects columns 0..4 like an all--inf row
    np.testing.assert_array_equal(got_i[4], np.arange(5))


def test_k_equals_n():
    x = np.random.default_rng(2).normal(size=(4, 9))
    _check(x, 9, block_b=4)


def test_ragged_batch_blocks():
    # B not a multiple of block_b: last grid block is padded
    x = np.random.default_rng(3).normal(size=(13, 200))
    _check(x, 5, block_b=8)


def test_beam_shapes():
    # Flickr8k flagship: (B, K*V) = (64, 5*2633), with live-mask -infs
    rng = np.random.default_rng(4)
    x = rng.normal(size=(8, 5 * 263)).astype(np.float32)  # scaled-down V
    x[:, 263:] = -np.inf                  # step-1 row-0-only expansion shape
    _check(x, 5)


def test_beam_with_pallas_topk_is_token_identical():
    """The full batched beam with pallas_topk=True (the default since the
    1.085x A/B landed) must produce exactly the lax.top_k formulation's
    tokens/scores (the kernel is exact incl. tie order)."""
    import torch
    from tests._reference import import_reference
    from sat_tpu.compat import decoder_params_from_state_dict
    from sat_tpu.models import DecoderConfig, init_decoder_params
    from sat_tpu.models.beam import beam_search_batched

    V, D, L = 40, 32, 9
    torch.manual_seed(2)
    ref = import_reference("decoder").Decoder(V, D, tf=False, ado=False,
                                              bert=False, attention=True)
    ref.eval()
    cfg = DecoderConfig(vocab_size=V, encoder_dim=D, use_attention=True)
    params = decoder_params_from_state_dict(
        ref.state_dict(), init_decoder_params(jax.random.PRNGKey(0), cfg))
    feats = np.random.default_rng(8).normal(size=(6, L, D)).astype(np.float32)
    a = beam_search_batched(params, cfg, feats, 5, pallas_topk=False)
    b = beam_search_batched(params, cfg, feats, 5, pallas_topk=True)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.found), np.asarray(b.found))
    np.testing.assert_array_equal(np.asarray(a.length), np.asarray(b.length))
    np.testing.assert_allclose(np.asarray(a.score), np.asarray(b.score),
                               atol=1e-5)


def test_pallas_topk_auto_default(monkeypatch):
    """pallas_topk=None (the default) auto-resolves: the exact kernel runs
    unless fast_topk is requested, and an explicit True beside fast_topk
    still raises (flip decision: 1.085x on-device A/B, 2026-08-19)."""
    import pytest

    import sat_tpu.ops.topk as topk_mod
    from sat_tpu.models import DecoderConfig, init_decoder_params
    from sat_tpu.models.beam import beam_search_batched

    cfg = DecoderConfig(vocab_size=23, encoder_dim=16, use_attention=True)
    params = init_decoder_params(jax.random.PRNGKey(1), cfg)
    feats = np.random.default_rng(5).normal(size=(3, 9, 16)).astype(np.float32)

    calls = []
    real = topk_mod.exact_topk

    def spy(x, k, **kw):
        calls.append(k)
        return real(x, k, **kw)

    monkeypatch.setattr(topk_mod, "exact_topk", spy)

    beam_search_batched(params, cfg, feats, 3, max_steps=4)
    assert calls, "default (auto) beam must route top-k through the kernel"

    calls.clear()
    beam_search_batched(params, cfg, feats, 3, max_steps=4, pallas_topk=False)
    assert not calls, "explicit False must keep the lax formulation"

    beam_search_batched(params, cfg, feats, 3, max_steps=4, fast_topk=True)
    assert not calls, "fast_topk under auto must take approx_max_k, not raise"

    with pytest.raises(ValueError, match="mutually exclusive"):
        beam_search_batched(params, cfg, feats, 3, max_steps=4,
                            fast_topk=True, pallas_topk=True)
