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
