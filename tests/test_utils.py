"""Unit tests for meters and jnp metrics, golden-checked against the
reference's torch implementations (imported read-only from /root/reference)."""

import numpy as np
import pytest
import torch

from tests._reference import import_reference

ref_utils = import_reference("utils")

from sat_tpu.utils import AverageMeter, sequence_accuracy, calculate_caption_lengths
from sat_tpu.utils.metrics import (
    reference_packed_cross_entropy,
    attention_regularization,
    repetition_penalty,
)


def test_average_meter_matches_reference():
    ours, theirs = AverageMeter(), ref_utils.AverageMeter()
    for val, n in [(2.0, 3), (5.0, 1), (0.5, 10)]:
        ours.update(val, n)
        theirs.update(val, n)
        assert ours.val == theirs.val
        assert ours.avg == pytest.approx(theirs.avg)
        assert ours.sum == pytest.approx(theirs.sum)
        assert ours.count == theirs.count


@pytest.mark.parametrize("k", [1, 5])
def test_sequence_accuracy_matches_reference(k):
    rng = np.random.default_rng(0)
    preds = rng.normal(size=(4, 7, 30)).astype(np.float32)
    targets = rng.integers(0, 30, size=(4, 7))
    targets[0, 5:] = 3  # padding
    ref = ref_utils.sequence_accuracy(
        torch.tensor(preds), torch.tensor(targets), k, ignore_index=3)
    ours = sequence_accuracy(preds, targets, k, ignore_index=3)
    assert float(ours) == pytest.approx(ref, abs=1e-4)


def test_sequence_accuracy_all_padding_is_zero():
    preds = np.zeros((2, 3, 5), np.float32)
    targets = np.full((2, 3), 3)
    assert float(sequence_accuracy(preds, targets, 1, ignore_index=3)) == 0.0


def test_caption_lengths_match_reference():
    rng = np.random.default_rng(1)
    captions = rng.integers(0, 20, size=(6, 9))
    skip = (3, 0, 1)
    ref = ref_utils.calculate_caption_lengths(
        torch.tensor(captions), torch.tensor(list(skip)))
    assert int(calculate_caption_lengths(captions, skip)) == ref


def test_packed_cross_entropy_matches_reference_packing():
    """Reference: pack_padded_sequence with lengths len-1, then CE mean
    (train.py:150-161). Check our closed form equals torch's computation."""
    from torch.nn.utils.rnn import pack_padded_sequence
    rng = np.random.default_rng(2)
    B, T, V = 3, 6, 11
    preds = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = rng.integers(0, V, size=(B, T))
    tp, tt = torch.tensor(preds), torch.tensor(targets)
    packed_t = pack_padded_sequence(tt, [T - 1] * B, batch_first=True)[0]
    packed_p = pack_padded_sequence(tp, [T - 1] * B, batch_first=True)[0]
    ref = torch.nn.functional.cross_entropy(packed_p, packed_t).item()
    ours = float(reference_packed_cross_entropy(preds, targets))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_attention_regularization_formula():
    rng = np.random.default_rng(3)
    alphas = rng.uniform(size=(2, 5, 9)).astype(np.float32)
    t = torch.tensor(alphas)
    ref = (2.0 * ((1 - t.sum(1)) ** 2).mean()).item()
    assert float(attention_regularization(alphas, 2.0)) == pytest.approx(ref, rel=1e-5)


def test_repetition_penalty_matches_reference():
    rng = np.random.default_rng(4)
    preds = rng.normal(size=(3, 8, 12)).astype(np.float32)
    # The reference fn lives in train.py whose import drags in heavy deps;
    # check our implementation against a direct hand computation of the same
    # formula (train.py:357-384).
    pred_tokens = preds.argmax(axis=2)
    shifted = np.concatenate([pred_tokens[:, :1], pred_tokens[:, :-1]], axis=1)
    reps = (pred_tokens == shifted).astype(np.float32)
    mask = (shifted != 3) & (shifted != 0)
    expected = (reps[:, 1:] * mask[:, 1:]).sum() / preds.shape[0] * 1.5
    ours = float(repetition_penalty(preds, (3, 0), beta=1.5))
    assert ours == pytest.approx(float(expected), rel=1e-5)


def test_count_parameters_total():
    from sat_tpu.utils import count_parameters
    params = {"a": np.zeros((3, 4)), "b": {"w": np.zeros(5), "frozen": np.zeros(100)}}
    lines = []
    total = count_parameters(params, trainable_filter=lambda n: "frozen" not in n,
                             print_fn=lines.append)
    assert total == 17
    assert any("Total Trainable Params: 17" in l for l in lines)
