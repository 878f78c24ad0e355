"""Golden tests: sat_tpu decoder vs. the reference PyTorch decoder with
identical weights (transferred via sat_tpu.compat) on identical inputs."""

import numpy as np
import pytest
import torch

from tests._reference import import_reference

from sat_tpu.models import (
    DecoderConfig,
    init_decoder_params,
    init_lstm_state,
    decoder_forward,
)
from sat_tpu.compat import decoder_params_from_state_dict

ref_decoder_mod = import_reference("decoder")

V, D, B, L, CAP_LEN = 40, 32, 3, 9, 8


def make_pair(tf=True, ado=False, attention=True, seed=0):
    torch.manual_seed(seed)
    ref = ref_decoder_mod.Decoder(V, D, tf=tf, ado=ado, bert=False,
                                  attention=attention)
    ref.eval()
    cfg = DecoderConfig(vocab_size=V, encoder_dim=D, use_tf=tf, use_ado=ado,
                        use_bert=False, use_attention=attention)
    import jax
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    params = decoder_params_from_state_dict(ref.state_dict(), params)
    return ref, cfg, params


def random_inputs(seed=1):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, L, D)).astype(np.float32)
    caps = rng.integers(4, V, size=(B, CAP_LEN)).astype(np.int64)
    caps[:, 0] = 0  # <start>
    caps[:, -1] = 1  # <eos>
    return feats, caps


def test_init_lstm_state_matches_reference():
    ref, cfg, params = make_pair()
    feats, _ = random_inputs()
    with torch.no_grad():
        h_ref, c_ref = ref.get_init_lstm_state(torch.tensor(feats))
    h, c = init_lstm_state(params, feats)
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("tf,ado,attention", [
    (True, False, True),    # plain attention + TF (flagship config)
    (True, True, True),     # + advanced deep output
    (True, False, False),   # no attention (uniform alpha, mean context)
    (False, False, True),   # autoregressive (argmax feedback)
    (False, True, False),   # autoregressive + ado, no attention
])
def test_forward_matches_reference(tf, ado, attention):
    ref, cfg, params = make_pair(tf=tf, ado=ado, attention=attention)
    feats, caps = random_inputs()
    with torch.no_grad():
        preds_ref, alphas_ref = ref(torch.tensor(feats), torch.tensor(caps))
    preds, alphas = decoder_forward(params, cfg, feats, caps, train=False)
    assert preds.shape == (B, CAP_LEN - 1, V)
    assert alphas.shape == (B, CAP_LEN - 1, L)
    np.testing.assert_allclose(np.asarray(preds), preds_ref.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(alphas), alphas_ref.numpy(),
                               atol=1e-5)


def test_forward_is_jittable_and_matches_eager():
    import jax
    ref, cfg, params = make_pair(tf=True, ado=True, attention=True)
    feats, caps = random_inputs()
    jitted = jax.jit(lambda p, f, c: decoder_forward(p, cfg, f, c))
    preds_j, alphas_j = jitted(params, feats, caps)
    preds_e, alphas_e = decoder_forward(params, cfg, feats, caps)
    np.testing.assert_allclose(np.asarray(preds_j), np.asarray(preds_e),
                               atol=1e-5)


def test_dropout_active_in_train_mode():
    import jax
    _, cfg, params = make_pair(tf=True)
    feats, caps = random_inputs()
    r1, r2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    p1, _ = decoder_forward(params, cfg, feats, caps, rng=r1, train=True)
    p2, _ = decoder_forward(params, cfg, feats, caps, rng=r2, train=True)
    p3, _ = decoder_forward(params, cfg, feats, caps, train=False)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))  # rng-dependent
    assert not np.allclose(np.asarray(p1), np.asarray(p3))  # differs from eval


def test_bert_config_shapes_and_frozen_embedding():
    import jax
    import jax.numpy as jnp
    cfg = DecoderConfig(vocab_size=999, encoder_dim=D, use_tf=True,
                        use_bert=True, use_attention=True)
    assert cfg.embedding_size == 768 and cfg.effective_vocab_size == 30522
    assert cfg.start_token == 101
    table = np.random.default_rng(0).normal(size=(30522, 768)).astype(np.float32)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg,
                                 bert_embeddings=table)
    feats = np.random.default_rng(1).normal(size=(2, L, D)).astype(np.float32)
    caps = np.random.default_rng(2).integers(0, 30522, size=(2, 6))

    def loss(p):
        preds, _ = decoder_forward(p, cfg, feats, caps)
        return (preds ** 2).mean()

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["embedding"]).max()) == 0.0  # frozen
    assert float(jnp.abs(grads["lstm"]["w_ih"]).max()) > 0.0


def test_bf16_attention_middle_close_to_f32():
    """bf16 attention tanh intermediate (DecoderConfig.bf16_attention): the
    forward stays within bf16 rounding of the f32 reference path, the
    attention maps remain a valid distribution, and gradients stay close in
    relative terms. Default-off must be bit-identical to f32."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    _, cfg, params = make_pair(tf=True, ado=True, attention=True)
    cfg_bf16 = dataclasses.replace(cfg, bf16_attention=True)
    feats, caps = random_inputs()

    p32, a32 = decoder_forward(params, cfg, feats, caps, train=False)
    pbf, abf = decoder_forward(params, cfg_bf16, feats, caps, train=False)
    np.testing.assert_allclose(np.asarray(pbf), np.asarray(p32),
                               atol=8e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(abf), np.asarray(a32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(abf).sum(-1), 1.0, atol=1e-5)

    # default-off path is the exact f32 graph
    cfg_off = dataclasses.replace(cfg, bf16_attention=False)
    poff, _ = decoder_forward(params, cfg_off, feats, caps, train=False)
    assert np.array_equal(np.asarray(poff), np.asarray(p32))

    def loss(p, c):
        preds, alphas = decoder_forward(p, c, feats, caps, train=False)
        return ((preds ** 2).mean()
                + ((1.0 - alphas.sum(axis=1)) ** 2).mean())

    # Per-element grad comparisons are brittle under bf16 (relu gates flip
    # discretely at rounding boundaries); require normwise closeness.
    g32 = jax.grad(lambda p: loss(p, cfg))(params)
    gbf = jax.grad(lambda p: loss(p, cfg_bf16))(params)
    for (kp, l32), (_, lbf) in zip(
            jax.tree_util.tree_flatten_with_path(g32)[0],
            jax.tree_util.tree_flatten_with_path(gbf)[0]):
        name = "/".join(str(getattr(p, "key", p)) for p in kp)
        if name == "attention/v/b":
            # True gradient is exactly zero (a constant shift of every
            # pre-softmax score): both values are float noise.
            continue
        a, b = np.asarray(l32, np.float64), np.asarray(lbf, np.float64)
        denom = np.linalg.norm(a) + 1e-12
        rel = np.linalg.norm(b - a) / denom
        assert rel < 0.05, f"{name}: normwise grad error {rel:.4f}"


def test_strict_import_rejects_mismatched_checkpoint():
    import jax
    ref, cfg, params = make_pair(tf=True, ado=True)
    sd = {k: v for k, v in ref.state_dict().items() if "f_out" not in k}
    with pytest.raises(KeyError):
        decoder_params_from_state_dict(sd, params, strict=True)
    # non-strict mirrors the reference's fallback (generate_caption.py:65-69)
    out = decoder_params_from_state_dict(sd, params, strict=False)
    assert out["ado"]["f_out"]["w"].shape == (512, V)
