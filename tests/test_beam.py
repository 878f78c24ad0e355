"""Golden tests: fixed-shape masked beam search vs. the reference's
dynamically-shrinking Python beam (decoder.py:160-269), identical weights."""

import numpy as np
import pytest
import torch

from tests._reference import import_reference

from sat_tpu.models import DecoderConfig, init_decoder_params
from sat_tpu.models.beam import beam_search, beam_search_batched, extract_caption
from sat_tpu.compat import decoder_params_from_state_dict

ref_decoder_mod = import_reference("decoder")

V, D, L = 40, 32, 9


def make_pair(ado=False, attention=True, seed=0):
    import jax
    torch.manual_seed(seed)
    ref = ref_decoder_mod.Decoder(V, D, tf=False, ado=ado, bert=False,
                                  attention=attention)
    ref.eval()
    cfg = DecoderConfig(vocab_size=V, encoder_dim=D, use_ado=ado,
                        use_attention=attention)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    params = decoder_params_from_state_dict(ref.state_dict(), params)
    return ref, cfg, params


def run_reference_beam(ref, features, beam_size):
    feats = torch.tensor(features).unsqueeze(0).expand(beam_size, L, D)
    with torch.no_grad():
        sentence, alpha = ref.caption(feats, beam_size)
    return sentence, np.asarray(alpha)


@pytest.mark.parametrize("beam_size", [1, 3, 5])
@pytest.mark.parametrize("ado,attention", [(False, True), (True, True),
                                           (False, False)])
def test_beam_matches_reference(beam_size, ado, attention):
    ref, cfg, params = make_pair(ado=ado, attention=attention,
                                 seed=beam_size + 7 * ado + 13 * attention)
    for in_seed in (0, 1):
        feats = np.random.default_rng(in_seed).normal(size=(L, D)).astype(np.float32)
        ref_sentence, ref_alpha = run_reference_beam(ref, feats, beam_size)
        result = beam_search(params, cfg, feats, beam_size)
        tokens, alphas = extract_caption(result)
        assert tokens == ref_sentence, (
            f"beam={beam_size} ado={ado} att={attention} seed={in_seed}")
        if len(ref_sentence) > 1:  # completed: alphas comparable
            np.testing.assert_allclose(alphas, ref_alpha, atol=1e-4)


def test_beam_fallback_when_no_completion():
    """Rig the output head so <eos> can never win: the reference hits the
    51-step cap and returns [0] (decoder.py:256-258); ours must too."""
    ref, cfg, params = make_pair(seed=3)
    with torch.no_grad():
        ref.deep_output.bias[1] = -1e9
        ref.deep_output.bias[39] = -1e9  # no other stop id in-range anyway
    params = decoder_params_from_state_dict(ref.state_dict(), params)
    feats = np.random.default_rng(5).normal(size=(L, D)).astype(np.float32)
    ref_sentence, _ = run_reference_beam(ref, feats, 3)
    result = beam_search(params, cfg, feats, 3)
    tokens, alphas = extract_caption(result)
    assert ref_sentence == [0]
    assert tokens == [0]
    assert not bool(result.found)
    assert alphas.shape == (1, L)


def test_beam_batched_matches_single():
    import jax
    ref, cfg, params = make_pair(seed=11)
    feats = np.random.default_rng(2).normal(size=(4, L, D)).astype(np.float32)
    batched = beam_search_batched(params, cfg, feats, 3)
    for i in range(4):
        single = beam_search(params, cfg, feats[i], 3)
        t_b, _ = extract_caption(jax.tree_util.tree_map(lambda x: x[i], batched))
        t_s, _ = extract_caption(single)
        assert t_b == t_s


def test_beam_is_jittable():
    import jax
    ref, cfg, params = make_pair(seed=21)
    feats = np.random.default_rng(4).normal(size=(L, D)).astype(np.float32)
    jitted = jax.jit(lambda p, f: beam_search(p, cfg, f, 3))
    r1 = jitted(params, feats)
    r2 = beam_search(params, cfg, feats, 3)
    assert extract_caption(r1)[0] == extract_caption(r2)[0]
