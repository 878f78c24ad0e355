"""End-to-end engine tests on a synthetic dataset: smoke training run
(the reference's de-facto integration test is `--epochs=1 --frac=0.02`,
README.md:51), checkpoint round trips, resume, and caption generation."""

import json
import os

import numpy as np
import pytest

# Heavy tier (~5 min); deselect with -m "not heavy".
pytestmark = pytest.mark.heavy

from tests._synth import build_synth_dataset

from sat_tpu.config import Config
from sat_tpu.data import generate_json_data


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("engine_data"))
    build_synth_dataset(root, n_train=6, n_val=3, n_test=3, caps_per_img=2,
                        image_size=32)
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 10)
    return root


def make_cfg(data_root, tmp_path, **kw):
    defaults = dict(
        data=data_root, network="vgg19", image_size=32, batch_size=4,
        epochs=1, tf=True, ado=False, attention=True, fraction=1.0,
        log_interval=1, checkpoint_dir=str(tmp_path / "model"),
        perform_test=True, seed=7, lr=1e-3)
    defaults.update(kw)
    return Config(**defaults)


def test_smoke_training_run(data_root, tmp_path, capsys):
    from sat_tpu.engine.loop import run_training
    cfg = make_cfg(data_root, tmp_path)
    result = run_training(cfg)
    out = capsys.readouterr().out
    assert "Train Batch: [0/" in out
    assert "BLEU-1" in out
    assert 0.0 <= result["bleu1"] <= 1.0
    assert np.isfinite(result["loss"])
    # reference-parity artifacts
    assert os.path.exists(cfg.checkpoint_dir + "/model_vgg19_1.npz")
    mc = json.load(open(cfg.checkpoint_dir + "/model_config.json"))
    assert mc["network"] == "vgg19" and mc["tf"] is True
    assert sorted(mc.keys()) == sorted([
        "batch_size", "epochs", "lr", "step_size", "alpha_c", "perform_test",
        "seed", "log_interval", "data", "network", "model", "tf", "ado",
        "fraction", "bert", "attention"])
    # test-mode attention visualizations were written
    viz = [d for d in os.listdir(cfg.checkpoint_dir) if d.startswith("attention_viz")]
    assert viz, "expected attention visualizations from the test pass"


def test_training_decreases_loss(data_root, tmp_path):
    """Overfit 6 images for a few epochs; loss must drop substantially."""
    from sat_tpu.engine.loop import Trainer
    cfg = make_cfg(data_root, tmp_path, epochs=0, lr=5e-3, perform_test=False)
    tr = Trainer(cfg)
    import jax.numpy as jnp, jax
    imgs, caps, _, _idxs = next(tr.train_loader.epoch(0))
    from sat_tpu.engine.loop import _pad_batch
    (imgs, caps), _ = _pad_batch([imgs, caps], tr.n_data)
    d_imgs, d_caps = tr._put(imgs, caps)
    losses = []
    for step in range(30):
        rng = jax.random.fold_in(tr.dropout_rng, step)
        tr.state, metrics = tr.train_step(tr.state, tr.enc_params, d_imgs,
                                          d_caps, jnp.float32(5e-3), rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::6]


def test_resume_from_orbax(data_root, tmp_path):
    from sat_tpu.engine.loop import Trainer
    cfg = make_cfg(data_root, tmp_path, epochs=1, perform_test=False)
    t1 = Trainer(cfg)
    t1.fit()
    step_after = int(t1.state.step)
    assert step_after > 0
    cfg2 = make_cfg(data_root, tmp_path, epochs=2, perform_test=False,
                    resume=True)
    t2 = Trainer(cfg2)
    assert t2.start_epoch == 2
    assert int(t2.state.step) == step_after
    np.testing.assert_allclose(
        np.asarray(t2.state.params["deep_output"]["b"]),
        np.asarray(t1.state.params["deep_output"]["b"]))


def test_warm_start_from_npz(data_root, tmp_path):
    from sat_tpu.engine.loop import Trainer
    cfg = make_cfg(data_root, tmp_path, epochs=1, perform_test=False)
    t1 = Trainer(cfg)
    path = t1.save_epoch(1)
    cfg2 = make_cfg(data_root, tmp_path, model=path, perform_test=False)
    t2 = Trainer(cfg2)
    np.testing.assert_allclose(
        np.asarray(t2.state.params["lstm"]["w_ih"]),
        np.asarray(t1.state.params["lstm"]["w_ih"]))


def test_generate_caption_cli_path(data_root, tmp_path):
    """Drive generate_caption's load + beam + viz through its functions."""
    from sat_tpu.engine.loop import Trainer
    cfg = make_cfg(data_root, tmp_path, epochs=0, perform_test=False)
    tr = Trainer(cfg)
    tr.save_epoch(1)
    import generate_caption as gc
    model_path = cfg.checkpoint_dir + "/model_vgg19_1.npz"
    lcfg, dcfg, enc_p, dec_p, word_dict, tok = gc.load_model(model_path)
    assert lcfg.network == "vgg19" and word_dict is not None
    img_path = json.load(open(f"{data_root}/train_img_paths.json"))[0]
    out_path = str(tmp_path / "viz.png")
    assert lcfg.image_size == 32  # restored from the sat_config.json sidecar
    tokens, alpha = gc.generate_caption_visualization(
        img_path, lcfg, dcfg, enc_p, dec_p, word_dict, tok,
        beam_size=3, out_path=out_path)
    assert os.path.exists(out_path)
    assert len(tokens) >= 1
