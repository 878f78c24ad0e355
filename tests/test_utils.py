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


def test_metric_logger_image_channel(tmp_path):
    """log_image (the reference's W&B attention-viz channel, train.py:317,
    431-433) records the path+caption in the JSONL backend."""
    import json as _json
    from sat_tpu.utils.logging import MetricLogger
    jl = str(tmp_path / "m.jsonl")
    png = str(tmp_path / "viz.png")
    open(png, "wb").write(b"\x89PNG fake")
    lg = MetricLogger(jsonl_path=jl)
    lg.log_image("attention_viz/e1_b0_i0", png, caption="a dog runs")
    lg.finish()
    rows = [_json.loads(l) for l in open(jl)]
    assert rows[0]["image"] == "attention_viz/e1_b0_i0"
    assert rows[0]["path"] == png
    assert rows[0]["caption"] == "a dog runs"


def test_masked_metrics_row_mask():
    """Row-masked variants: padded duplicate rows must not change the
    statistics computed over the real rows."""
    import jax.numpy as jnp
    from sat_tpu.utils.metrics import (attention_regularization,
                                       reference_packed_cross_entropy,
                                       sequence_accuracy)
    rng = np.random.default_rng(0)
    preds = rng.normal(size=(4, 6, 11)).astype(np.float32)
    targets = rng.integers(0, 11, size=(4, 6)).astype(np.int32)
    alphas = rng.uniform(size=(4, 5, 7)).astype(np.float32)
    # pad by repeating the last row twice
    preds_p = np.concatenate([preds, preds[-1:], preds[-1:]])
    targets_p = np.concatenate([targets, targets[-1:], targets[-1:]])
    alphas_p = np.concatenate([alphas, alphas[-1:], alphas[-1:]])
    mask = jnp.asarray([True] * 4 + [False] * 2)

    assert float(reference_packed_cross_entropy(preds, targets)) == \
        pytest.approx(float(reference_packed_cross_entropy(
            preds_p, targets_p, mask)), rel=1e-6)
    assert float(attention_regularization(alphas, 1.0)) == \
        pytest.approx(float(attention_regularization(alphas_p, 1.0, mask)),
                      rel=1e-6)
    assert float(sequence_accuracy(preds, targets, 3, ignore_index=0)) == \
        pytest.approx(float(sequence_accuracy(preds_p, targets_p, 3,
                                              ignore_index=0,
                                              row_mask=mask)), rel=1e-6)


def test_count_parameters_total():
    from sat_tpu.utils import count_parameters
    params = {"a": np.zeros((3, 4)), "b": {"w": np.zeros(5), "frozen": np.zeros(100)}}
    lines = []
    total = count_parameters(params, trainable_filter=lambda n: "frozen" not in n,
                             print_fn=lines.append)
    assert total == 17
    assert any("Total Trainable Params: 17" in l for l in lines)
