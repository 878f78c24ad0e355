"""Feature-cache training path: identical numerics to the image path
(frozen eval-mode encoder), faster epochs, loaders skip pixels."""

import os

import numpy as np
import pytest

# Heavy tier (~30 min on the 1-core pod); deselect with -m "not heavy".
pytestmark = pytest.mark.heavy

from tests._synth import build_synth_dataset

from sat_tpu.config import Config
from sat_tpu.data import generate_json_data


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fcache"))
    build_synth_dataset(root, n_train=4, n_val=2, n_test=2, caps_per_img=2,
                        image_size=32)
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 8)
    return root


def _cfg(data_root, tmp_path, **kw):
    base = dict(data=data_root, network="vgg19", image_size=32, batch_size=4,
                epochs=1, tf=True, attention=True, log_interval=1,
                checkpoint_dir=str(tmp_path), perform_test=False, seed=11)
    base.update(kw)
    return Config(**base)


def test_cached_matches_uncached_numerics(data_root, tmp_path):
    """Same seed, one epoch each way: parameters must match to float32
    tolerance (the encoder is frozen + eval, so features are identical)."""
    from sat_tpu.engine.loop import Trainer
    results = {}
    for cached in (False, True):
        tr = Trainer(_cfg(data_root, tmp_path / str(cached),
                          cache_features=cached))
        tr.train_epoch(1)
        results[cached] = {
            "params": np.asarray(tr.state.params["deep_output"]["b"]),
            "val": tr.validate(1),
        }
    np.testing.assert_allclose(results[True]["params"],
                               results[False]["params"], atol=1e-5)
    assert results[True]["val"]["loss"] == pytest.approx(
        results[False]["val"]["loss"], rel=1e-4)
    assert results[True]["val"]["bleu1"] == pytest.approx(
        results[False]["val"]["bleu1"], abs=1e-6)


def test_cached_loader_skips_images(data_root, tmp_path):
    from sat_tpu.engine.loop import Trainer
    tr = Trainer(_cfg(data_root, tmp_path, cache_features=True))
    imgs, caps, _, idxs = next(tr.train_loader.epoch(0))
    assert imgs is None          # pixels never re-decoded
    assert idxs.shape == caps.shape[:1]
    feats = tr._step_inputs("train", imgs, idxs)
    assert feats.shape == (len(idxs), 4, 512)  # 32px vgg -> 2x2 grid
    # dedup: 4 unique images, 8 rows (host cache is freed once banked;
    # host_features reads back from the bank)
    assert tr.host_features("train").shape[0] == 4
    assert tr.row_map["train"].shape[0] == 8


def test_bf16_bank_halves_residency_close_numerics(data_root, tmp_path):
    """--bank-dtype bfloat16: bank HBM residency halves; training numerics
    stay within bf16 feature-rounding tolerance of the f32 bank."""
    import jax.numpy as jnp
    from sat_tpu.engine.loop import Trainer
    runs = {}
    for dt in ("float32", "bfloat16"):
        tr = Trainer(_cfg(data_root, tmp_path / dt, cache_features=True,
                          bank_dtype=dt))
        assert tr.use_bank
        feats = tr.bank["train"]["feats"]
        assert feats.dtype == (jnp.bfloat16 if dt == "bfloat16"
                               else jnp.float32)
        tr.train_epoch(1)
        runs[dt] = {"params": np.asarray(tr.state.params["deep_output"]["b"]),
                    "val": tr.validate(1),
                    "nbytes": feats.nbytes}
    assert runs["bfloat16"]["nbytes"] * 2 == runs["float32"]["nbytes"]
    assert np.isfinite(runs["bfloat16"]["val"]["loss"])
    np.testing.assert_allclose(runs["bfloat16"]["params"],
                               runs["float32"]["params"], atol=5e-3)
    assert runs["bfloat16"]["val"]["loss"] == pytest.approx(
        runs["float32"]["val"]["loss"], rel=5e-2)


def test_fast_metrics_skips_offinterval_syncs(data_root, tmp_path):
    from sat_tpu.engine.loop import Trainer
    cfg = _cfg(data_root, tmp_path, cache_features=True, fast_metrics=True,
               log_interval=2, batch_size=2)  # 8 rows -> 4 batches
    tr = Trainer(cfg)
    tr.train_epoch(1)
    # meters are train_epoch-local; the observable contract is that training
    # still advances one optimizer step per batch with syncs skipped
    assert int(tr.state.step) == 4


def test_steps_per_dispatch_parity(data_root, tmp_path, capsys):
    """--steps-per-dispatch K must be BIT-identical to per-batch dispatch:
    same params after the epoch, same optimizer step count, same printed
    batch lines in the same order (only the host round-trip count drops).
    batch_size=2 on 8 rows -> 4 batches; K=3 exercises both the (3, B)
    block and the (1, B) remainder block."""
    import jax
    from sat_tpu.engine.loop import Trainer
    runs = {}
    for K in (1, 3):
        tr = Trainer(_cfg(data_root, tmp_path / f"k{K}", cache_features=True,
                          batch_size=2, steps_per_dispatch=K))
        assert (tr.train_block is not None) == (K > 1)
        capsys.readouterr()                      # drop construction chatter
        tr.train_epoch(1)
        out = capsys.readouterr().out
        runs[K] = {
            "params": jax.tree_util.tree_map(np.asarray, tr.state.params),
            "step": int(tr.state.step),
            "lines": [l for l in out.splitlines()
                      if l.startswith("Train Batch")],
        }
    assert runs[3]["step"] == runs[1]["step"] == 4
    assert runs[3]["lines"] == runs[1]["lines"]
    leaves1 = jax.tree_util.tree_leaves(runs[1]["params"])
    leaves3 = jax.tree_util.tree_leaves(runs[3]["params"])
    for a, b in zip(leaves1, leaves3):
        np.testing.assert_array_equal(a, b)


def test_steps_per_dispatch_partial_tail_batch(data_root, tmp_path):
    """batch_size=3 on 8 rows -> [3, 3, 2]: one (2, 3) block plus the
    partial tail through the per-batch step; must match K=1 bitwise."""
    import jax
    from sat_tpu.engine.loop import Trainer
    params = {}
    for K in (1, 2):
        tr = Trainer(_cfg(data_root, tmp_path / f"t{K}", cache_features=True,
                          batch_size=3, steps_per_dispatch=K))
        tr.train_epoch(1)
        assert int(tr.state.step) == 3
        params[K] = jax.tree_util.tree_map(np.asarray, tr.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(params[1]),
                    jax.tree_util.tree_leaves(params[2])):
        np.testing.assert_array_equal(a, b)


def test_steps_per_dispatch_preempt_at_block_boundary(data_root, tmp_path):
    """A preemption request in block mode checkpoints at the end of the
    current block (offset = multiple of K) and resume continues to the
    same final params as an uninterrupted blocked run."""
    import jax
    import pytest as _pytest
    from sat_tpu.engine.loop import Trainer, TrainingPreempted
    kw = dict(cache_features=True, batch_size=2, steps_per_dispatch=3,
              epochs=1)

    tr_ref = Trainer(_cfg(data_root, tmp_path / "whole", **kw))
    tr_ref.train_epoch(1)

    tr = Trainer(_cfg(data_root, tmp_path / "pre", **kw))
    tr.request_preempt()
    with _pytest.raises(TrainingPreempted):
        tr.train_epoch(1)
    assert int(tr.state.step) == 3       # the first (3, B) block ran

    tr2 = Trainer(_cfg(data_root, tmp_path / "pre", resume=True, **kw))
    assert tr2._resume_batch_offset == 3
    tr2.train_epoch(1)
    assert int(tr2.state.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(tr_ref.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blocked_validation_parity(data_root, tmp_path, capsys):
    """Blocked validation (--steps-per-dispatch K) must be BIT-identical to
    the per-batch eval pipeline: same meters, same printed batch lines,
    same BLEU, same returned dict. batch_size=3 over the 4 val rows ->
    [3, 1]: one (1, 3) block plus the partial tail through the per-batch
    step."""
    import jax
    from sat_tpu.engine.loop import Trainer
    runs = {}
    for K in (1, 2):
        tr = Trainer(_cfg(data_root, tmp_path / f"v{K}", cache_features=True,
                          batch_size=3, steps_per_dispatch=K))
        assert (tr.eval_block is not None) == (K > 1)
        capsys.readouterr()                      # drop construction chatter
        res = tr.validate(1)
        out = capsys.readouterr().out
        runs[K] = (res, [l for l in out.splitlines()
                         if l.startswith("EvalMode")])
    assert runs[2][1] == runs[1][1] and len(runs[1][1]) > 0
    assert runs[2][0] == runs[1][0]


def test_blocked_validation_preempt(data_root, tmp_path):
    """A preemption request during blocked validation checkpoints the epoch
    as complete and raises, mirroring the per-batch eval loop."""
    import pytest as _pytest
    from sat_tpu.engine.loop import Trainer, TrainingPreempted
    from sat_tpu.engine import checkpoint as ckpt
    tr = Trainer(_cfg(data_root, tmp_path, cache_features=True,
                      batch_size=2, steps_per_dispatch=2))
    tr.request_preempt()
    with _pytest.raises(TrainingPreempted):
        tr.validate(1)
    assert ckpt.latest_train_state_step(str(tmp_path)) is not None


def test_feature_cache_dir_roundtrip(data_root, tmp_path, capsys):
    """--feature-cache-dir: first run publishes per-split feature files,
    second run loads them bit-identically without re-encoding; a different
    encoder-weight source (here: a different init seed) must MISS."""
    from sat_tpu.engine.loop import Trainer
    kw = dict(cache_features=True, batch_size=2,
              feature_cache_dir=str(tmp_path / "fc"))
    tr1 = Trainer(_cfg(data_root, tmp_path / "a", **kw))
    out1 = capsys.readouterr().out
    assert out1.count("Saved feature cache") == 3          # train/val/test
    tr2 = Trainer(_cfg(data_root, tmp_path / "b", **kw))
    out2 = capsys.readouterr().out
    assert out2.count("Loaded cached features") == 3
    assert "Saved feature cache" not in out2
    for split in ("train", "val", "test"):
        np.testing.assert_array_equal(tr1.host_features(split),
                                      tr2.host_features(split))
    tr3 = Trainer(_cfg(data_root, tmp_path / "c", seed=12, **kw))
    out3 = capsys.readouterr().out
    assert "Loaded cached features" not in out3
    assert out3.count("Saved feature cache") == 3


def test_blocked_validation_multiblock_parity(data_root, tmp_path, capsys):
    """batch_size=1 over the 4 val rows -> 4 full batches; K=2 -> two
    (2, 1) blocks, exercising the one-behind pending chain between eval
    blocks (the single-block case never holds a pending block while
    dispatching another). Must match per-batch bitwise."""
    from sat_tpu.engine.loop import Trainer
    runs = {}
    for K in (1, 2):
        tr = Trainer(_cfg(data_root, tmp_path / f"m{K}", cache_features=True,
                          batch_size=1, steps_per_dispatch=K))
        capsys.readouterr()
        res = tr.validate(1)
        out = capsys.readouterr().out
        runs[K] = (res, [l for l in out.splitlines()
                         if l.startswith("EvalMode")])
    assert runs[2][1] == runs[1][1] and len(runs[1][1]) > 0
    assert runs[2][0] == runs[1][0]


def test_steps_per_dispatch_without_bank_falls_back(data_root, tmp_path,
                                                    capsys):
    """--steps-per-dispatch without the HBM bank must warn and actually
    run per-batch (review r3: the warning branch skipped building the
    per-batch steps entirely and crashed with AttributeError)."""
    from sat_tpu.engine.loop import Trainer
    tr = Trainer(_cfg(data_root, tmp_path, cache_features=False,
                      batch_size=4, steps_per_dispatch=8))
    out = capsys.readouterr().out
    assert "falling back to per-batch dispatch" in out
    assert tr.train_block is None and tr.eval_block is None
    tr.train_epoch(1)
    assert int(tr.state.step) == 2
    res = tr.validate(1)
    assert np.isfinite(res["loss"])


def test_feature_cache_dir_invalidates_on_image_change(data_root, tmp_path,
                                                       capsys):
    """Regenerating an image in place (same path, new mtime) must MISS the
    feature cache — the key fingerprints each image file, not just its
    path (review r3)."""
    import glob
    from sat_tpu.engine.loop import Trainer
    kw = dict(cache_features=True, batch_size=2,
              feature_cache_dir=str(tmp_path / "fc"))
    Trainer(_cfg(data_root, tmp_path / "a", **kw))
    img = sorted(glob.glob(f"{data_root}/imgs/*.png"))[0]
    os.utime(img, (os.path.getmtime(img) + 10,) * 2)
    capsys.readouterr()
    Trainer(_cfg(data_root, tmp_path / "b", **kw))
    out = capsys.readouterr().out
    # the touched image lives in exactly one split -> one miss, two hits
    assert out.count("Saved feature cache") == 1
    assert out.count("Loaded cached features") == 2
