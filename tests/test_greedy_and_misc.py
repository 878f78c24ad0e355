"""Greedy decode, legacy accuracy parity, StepLR schedule, experiment
runner configs."""

import numpy as np
import pytest
import torch

from tests._reference import import_reference

ref_utils = import_reference("utils")


def test_legacy_accuracy_matches_reference():
    from sat_tpu.utils.metrics import legacy_accuracy
    rng = np.random.default_rng(0)
    preds = rng.normal(size=(12, 30)).astype(np.float32)
    targets = rng.integers(0, 30, size=(12,))
    ref = ref_utils.accuracy(torch.tensor(preds), torch.tensor(targets), 3)
    ours = float(legacy_accuracy(preds, targets, 3))
    assert ours == pytest.approx(ref, abs=1e-4)


def test_greedy_matches_beam_size_1():
    import jax
    from sat_tpu.models import DecoderConfig, init_decoder_params
    from sat_tpu.models.beam import beam_search, extract_caption, greedy_caption

    cfg = DecoderConfig(vocab_size=40, encoder_dim=32, use_attention=True)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    feats = np.random.default_rng(1).normal(size=(3, 9, 32)).astype(np.float32)
    toks, lengths = greedy_caption(params, cfg, feats)
    assert toks.shape[0] == 3
    for i in range(3):
        b = beam_search(params, cfg, feats[i], 1)
        t_beam, _ = extract_caption(b)
        if bool(b.found):
            # beam tokens include the start token; greedy emits from step 1
            n = int(lengths[i])
            assert t_beam[1:] == np.asarray(toks[i])[:n + 1].tolist()


def test_decode_single_image_modes():
    """generate_caption's --decode surface: every mode returns a sentence
    that starts with the start token and alphas aligned row-for-row."""
    import jax
    from sat_tpu.models import DecoderConfig, init_decoder_params
    from generate_caption import decode_single_image

    cfg = DecoderConfig(vocab_size=40, encoder_dim=32, use_attention=True)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    feats = np.random.default_rng(1).normal(size=(9, 32)).astype(np.float32)

    for mode in ("beam", "greedy", "sample"):
        sentence, alpha = decode_single_image(
            cfg, params, feats, decode=mode, beam_size=2, temperature=0.7,
            top_k=5, seed=3)
        assert len(sentence) >= 1
        assert alpha.shape == (len(sentence), 9)
        if mode != "beam" or len(sentence) > 1:
            # beam's no-completion fallback is [0] + the final attention map
            # (reference decoder.py:256-258); every other shape starts with
            # the start token and an all-ones alpha row.
            assert sentence[0] == cfg.start_token
            np.testing.assert_allclose(alpha[0], np.ones(9), atol=1e-6)

    # greedy via the CLI helper == greedy_caption directly
    from sat_tpu.models.beam import greedy_caption
    toks, lengths = greedy_caption(params, cfg, feats[None])
    n = min(int(lengths[0]) + 1, toks.shape[1])
    sentence, _ = decode_single_image(cfg, params, feats, decode="greedy")
    assert sentence == [cfg.start_token] + np.asarray(toks[0])[:n].tolist()


def test_step_lr_schedule():
    from sat_tpu.engine.loop import step_lr
    # reference: StepLR(step_size=5, gamma=0.1), stepped after each epoch
    assert step_lr(1e-4, 1, 5) == pytest.approx(1e-4)
    assert step_lr(1e-4, 5, 5) == pytest.approx(1e-4)
    assert step_lr(1e-4, 6, 5) == pytest.approx(1e-5)
    assert step_lr(1e-4, 11, 5) == pytest.approx(1e-6)


def test_experiment_configs_parse():
    import train_models
    from sat_tpu.config import build_arg_parser
    parser = build_arg_parser()
    for name, flags in train_models.EXPERIMENTS.items():
        args = parser.parse_args(flags)
        assert args.data.startswith("data/"), name


def test_bert_beam_stop_ids():
    """BERT-mode beam must treat ids {1, 0} as terminators (the reference's
    'quickfix' for SEP-after-PAD data, decoder.py:224-226) and start from
    [CLS]=101."""
    import jax
    import numpy as np
    from sat_tpu.models import DecoderConfig, init_decoder_params
    from sat_tpu.models.beam import beam_search, extract_caption

    cfg = DecoderConfig(vocab_size=999, encoder_dim=16, use_bert=True,
                        use_attention=True)
    table = np.random.default_rng(0).normal(
        scale=0.05, size=(30522, 768)).astype(np.float32)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg,
                                 bert_embeddings=table)
    # rig the head so id 0 ([PAD], a bert-mode stop id) always wins
    b = np.zeros(30522, np.float32)
    b[0] = 50.0
    params["deep_output"]["b"] = b
    feats = np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32)
    res = beam_search(params, cfg, feats, 2)
    tokens, _ = extract_caption(res)
    assert bool(res.found)
    assert tokens[0] == 101          # starts from [CLS]
    assert tokens[-1] == 0           # terminated by the bert stop id


def test_evaluate_cli(tmp_path, monkeypatch, capsys):
    """evaluate.py: full val pass from a saved checkpoint, no training."""
    import os
    import sys

    import numpy as np

    from tests._synth import build_synth_dataset
    from sat_tpu.config import Config
    from sat_tpu.data import generate_json_data
    from sat_tpu.engine.loop import Trainer

    root = str(tmp_path / "data")
    os.makedirs(root)
    build_synth_dataset(root, n_train=2, n_val=3, n_test=2, caps_per_img=2,
                        image_size=32)
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 8)
    cfg = Config(data=root, network="vgg19", image_size=32, batch_size=4,
                 epochs=0, tf=True, attention=True, log_interval=1,
                 checkpoint_dir=str(tmp_path / "model"), perform_test=False)
    Trainer(cfg).save_epoch(1)

    import evaluate
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--model", str(tmp_path / "model" / "model_vgg19_1.npz"),
        "--split", "val"])
    evaluate.main()
    out = capsys.readouterr().out
    assert "VALIDATION Batch: [0/" in out.replace("EvalMode.", "")
    assert "BLEU-1" in out
