"""Multi-device tests on the virtual 8-CPU mesh: sharding placement,
dp/tp train-step execution, and equivalence with single-device math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sat_tpu.models.decoder import DecoderConfig, init_decoder_params
from sat_tpu.models.encoder import init_encoder_params
from sat_tpu.parallel import (
    TrainState,
    batch_sharding,
    init_train_state,
    make_mesh,
    make_train_step,
    param_sharding,
    replicated,
)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def _setup(n_data, n_model, vocab=64):
    mesh = make_mesh(n_data, n_model)
    cfg = DecoderConfig(vocab_size=vocab, encoder_dim=512, use_tf=True,
                        use_attention=True)
    rng = jax.random.PRNGKey(0)
    enc_p = init_encoder_params(jax.random.PRNGKey(1), "vgg19")
    dec_p = init_decoder_params(rng, cfg)
    shard = param_sharding(mesh, dec_p, shard_vocab=n_model > 1)
    dec_p = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s),
                                   dec_p, shard)
    enc_p = jax.device_put(enc_p, replicated(mesh))
    return mesh, cfg, enc_p, dec_p


def _batch(mesh, B, vocab=64):
    imgs = np.random.default_rng(0).normal(size=(B, 32, 32, 3)).astype(np.float32)
    caps = np.random.default_rng(1).integers(4, vocab, size=(B, 9)).astype(np.int32)
    caps[:, 0] = 0
    return (jax.device_put(imgs, batch_sharding(mesh)),
            jax.device_put(caps, batch_sharding(mesh)))


def test_vocab_sharding_places_heads_on_model_axis():
    mesh, cfg, enc_p, dec_p = _setup(4, 2)
    emb_shard = dec_p["embedding"].sharding
    assert emb_shard.spec[0] == "model"
    head_shard = dec_p["deep_output"]["w"].sharding
    assert head_shard.spec[1] == "model"
    lstm_shard = dec_p["lstm"]["w_ih"].sharding
    assert lstm_shard.spec == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
def test_train_step_runs_on_mesh(n_data, n_model):
    mesh, cfg, enc_p, dec_p = _setup(n_data, n_model)
    state = init_train_state(dec_p)
    imgs, caps = _batch(mesh, 2 * n_data)
    step = make_train_step(cfg, "vgg19", alpha_c=1.0)
    state, metrics = step(state, enc_p, imgs, caps, jnp.float32(1e-3),
                          jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # params keep their shardings through the update (specs compare modulo
    # trailing Nones: PartitionSpec('model',) == ('model', None) semantically)
    def _norm(spec):
        parts = tuple(spec)
        while parts and parts[-1] is None:
            parts = parts[:-1]
        return parts
    assert _norm(state.params["embedding"].sharding.spec) == \
        _norm(dec_p["embedding"].sharding.spec)


def test_dp_matches_single_device_math():
    """Loss and update on an 8-way data mesh == 1-device mesh, same batch."""
    results = {}
    for n_data in (1, 8):
        mesh, cfg, enc_p, dec_p = _setup(n_data, 1)
        state = init_train_state(dec_p)
        imgs, caps = _batch(mesh, 8)
        step = make_train_step(cfg, "vgg19", alpha_c=1.0)
        state, metrics = step(state, enc_p, imgs, caps, jnp.float32(1e-3),
                              jax.random.PRNGKey(3))
        results[n_data] = (float(metrics["loss"]),
                           np.asarray(state.params["deep_output"]["b"]))
    assert results[1][0] == pytest.approx(results[8][0], rel=1e-5)
    np.testing.assert_allclose(results[1][1], results[8][1], atol=1e-6)


def test_graft_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None
