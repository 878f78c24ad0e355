"""Token-level metrics and the reference's loss, as pure jnp functions.

Every function replicates the reference's numerics exactly, including its
acknowledged quirks, because BLEU/accuracy parity depends on them:
 - sequence_accuracy masks padding (reference utils.py:44-80);
 - the cross-entropy keeps PAD tokens and drops only the final timestep of
   every row, because the reference feeds constant `length-1` lengths into
   pack_padded_sequence (reference train.py:149-151);
 - the doubly-stochastic attention regularizer is
   alpha_c * mean((1 - sum_t alpha)^2) (reference train.py:154).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def legacy_accuracy(preds: jnp.ndarray, targets: jnp.ndarray, k: int) -> jnp.ndarray:
    """The reference's original, acknowledged-flawed top-k accuracy
    (reference utils.py:22-42), kept for parity with its commentary: it
    counts padding predictions as correct, mishandles k>1 (requires the
    target in a fixed top-k slot), and normalizes by flattened length when
    fed packed sequences. Superseded by `sequence_accuracy`; not used by the
    training loop. preds: (N, V); targets: (N,)."""
    batch_size = targets.shape[0]
    _, pred = jax.lax.top_k(preds, k)
    correct = (pred == targets[:, None])
    return correct.sum() * (100.0 / batch_size)


def sequence_accuracy(preds: jnp.ndarray, targets: jnp.ndarray, k: int,
                      ignore_index: int = 0,
                      row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Top-k token accuracy over non-padding positions, as a percentage.

    preds: (B, T, V) logits; targets: (B, T) int ids.
    Matches reference utils.py:44-80 (mask = targets != ignore_index; a
    position counts if the target id appears anywhere in the top-k logits).
    `row_mask` (B,) bool excludes batch-padding rows (duplicates appended so
    the batch divides a device mesh) from the statistic; None = all rows
    real (single-device reference parity).
    Returns a 0-dim float32 array (0.0 when every position is padding).
    """
    _, topk = jax.lax.top_k(preds, k)                      # (B, T, k)
    correct = (topk == targets[..., None]).any(axis=-1)    # (B, T)
    mask = targets != ignore_index
    if row_mask is not None:
        mask = mask & row_mask[:, None]
    total = mask.sum()
    correct_total = (correct & mask).sum()
    return jnp.where(total > 0, correct_total * 100.0 / jnp.maximum(total, 1), 0.0)


def calculate_caption_lengths(captions: jnp.ndarray, skip_ids,
                              row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Count of tokens not in `skip_ids`, summed over the whole batch
    (reference utils.py:101-107). `captions` is (B, L) int; `skip_ids` a
    static tuple of special-token ids; `row_mask` (B,) bool excludes
    batch-padding rows."""
    skip = jnp.asarray(skip_ids)
    mask = ~(captions[..., None] == skip).any(-1)
    if row_mask is not None:
        mask = mask & row_mask[:, None]
    return mask.sum()


def reference_packed_cross_entropy(preds: jnp.ndarray, targets: jnp.ndarray,
                                   row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean cross-entropy over the first T-1 timesteps of every row.

    The reference packs preds/targets with per-row lengths of `len(row) - 1`
    (train.py:150-151), which — all rows being padded to the same length —
    keeps every row's first T-1 steps (PAD included) and drops the last step.

    `row_mask` (B,) bool excludes batch-padding rows (duplicates appended to
    divide a device mesh) from the mean so padded multi-device batches give
    the same loss — and the same gradients — as the unpadded batch; None
    keeps the reference's plain mean.
    """
    t_keep = preds.shape[1] - 1
    logits = preds[:, :t_keep].reshape(-1, preds.shape[-1])
    labels = targets[:, :t_keep].reshape(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if row_mask is None:
        return nll.mean()
    w = jnp.repeat(row_mask.astype(nll.dtype), t_keep)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


# Alias used by the engine; keeps the descriptive name exported in utils.
masked_mean_cross_entropy = reference_packed_cross_entropy


def attention_regularization(alphas: jnp.ndarray, alpha_c: float,
                             row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Doubly-stochastic attention penalty (reference train.py:154).

    alphas: (B, T, L) attention weights; penalty encourages each spatial
    location's attention, summed over time, to total 1. `row_mask` (B,) bool
    excludes batch-padding rows from the mean.
    """
    sq = (1.0 - alphas.sum(axis=1)) ** 2                  # (B, L)
    if row_mask is None:
        return alpha_c * sq.mean()
    w = row_mask.astype(sq.dtype)[:, None]
    return alpha_c * (sq * w).sum() / jnp.maximum(w.sum() * sq.shape[1], 1.0)


def repetition_penalty(preds: jnp.ndarray, ignore_ids, beta: float = 1.0,
                       row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Penalty on consecutive repeated argmax tokens (reference
    train.py:357-384). Dormant in the reference (call sites commented out,
    train.py:156-159) — wired here behind Config.rep_penalty_beta, which
    defaults to 0.0 (exact reference parity). `row_mask` (B,) bool excludes
    batch-padding rows (their repetitions don't count and the divisor is the
    real row count, matching the reference's per-batch normalization)."""
    pred_tokens = preds.argmax(axis=2)                             # (B, T)
    shifted = jnp.concatenate([pred_tokens[:, :1], pred_tokens[:, :-1]], axis=1)
    repetitions = (pred_tokens == shifted).astype(jnp.float32)
    mask = jnp.ones_like(repetitions, dtype=bool)
    for idx in ignore_ids:
        mask &= shifted != idx
    masked = repetitions[:, 1:] * mask[:, 1:].astype(jnp.float32)
    if row_mask is None:
        return (masked.sum() / pred_tokens.shape[0]) * beta
    w = row_mask.astype(jnp.float32)
    return ((masked * w[:, None]).sum() / jnp.maximum(w.sum(), 1.0)) * beta
