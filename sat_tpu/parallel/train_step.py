"""The pjit-compiled training and evaluation steps.

One jitted program per optimizer step: frozen encoder forward, decoder
forward, loss (reference-parity CE + doubly-stochastic regularizer,
reference train.py:150-162), backward, and Adam update — where the
reference launches ~10 kernels x 26 timesteps per batch from Python
(SURVEY.md §3.1), everything here is a single XLA computation scheduled
onto the mesh. Gradient all-reduce across the `data` axis is emitted by XLA
from the shardings.

Optimizer parity: torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8
added outside the sqrt -> optax `scale_by_adam(eps_root=0)`), with the
learning rate passed in per step so the host drives the reference's StepLR
schedule (lr * 0.1^floor(epoch/step_size), reference train.py:72,100)
without recompiling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from sat_tpu import constants
from sat_tpu.models.decoder import DecoderConfig, decoder_forward
from sat_tpu.models.encoder import encoder_forward
from sat_tpu.utils.metrics import (
    attention_regularization,
    calculate_caption_lengths,
    reference_packed_cross_entropy,
    repetition_penalty,
    sequence_accuracy,
)


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def make_optimizer() -> optax.GradientTransformation:
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0)


def apply_update(tx, state: TrainState, grads, lr) -> TrainState:
    """Adam update + step increment — the ONE copy of the update rule
    (review r4: it was pasted verbatim into the plain, bank, and blocked
    step builders; make_bank_train_block's bit-identical-numerics promise
    depends on all paths applying exactly this sequence). The lr rides
    OUTSIDE scale_by_adam (negated here) so the schedule changes per call
    without retracing."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, opt_state=opt_state,
                      step=state.step + 1)


def init_train_state(params: dict) -> TrainState:
    tx = make_optimizer()
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def special_ids(use_bert: bool):
    """(pad_id, skip_ids) for accuracy masking and caption-length counting
    (reference train.py:143, 174-177)."""
    if use_bert:
        return constants.BERT_PAD, (constants.BERT_PAD, constants.BERT_CLS,
                                    constants.BERT_SEP)
    return constants.PAD, (constants.PAD, constants.START, constants.EOS)


def _loss_and_metrics(dcfg: DecoderConfig, alpha_c: float, params, features,
                      captions, rng, train: bool, row_mask=None,
                      rep_penalty_beta: float = 0.0):
    """`row_mask` (B,) bool marks the real rows of a batch that was padded
    (duplicated last row) to divide a device mesh; padded rows are excluded
    from the loss, gradients, and every metric, so multi-device runs report
    the same numbers as the unpadded batch. None = all rows real.

    `rep_penalty_beta` wires the reference's dormant repetition penalty
    (reference train.py:156-159, 357-384) as an optional loss term; 0.0
    (the default) is exact reference parity — the term is not even traced.
    """
    preds, alphas = decoder_forward(params, dcfg, features, captions,
                                    rng=rng, train=train)
    targets = captions[:, 1:]
    ce = reference_packed_cross_entropy(preds, targets, row_mask)
    att_reg = attention_regularization(alphas, alpha_c, row_mask)
    loss = ce + att_reg
    pad_id, skip_ids = special_ids(dcfg.use_bert)
    if rep_penalty_beta:
        # ignore ids per the reference's commented call site
        # (train.py:156-159): [padding_idx, start_idx].
        loss = loss + repetition_penalty(preds, (pad_id, dcfg.start_token),
                                         rep_penalty_beta, row_mask)
    metrics = {
        "loss": loss,
        "acc1": sequence_accuracy(preds, targets, 1, ignore_index=pad_id,
                                  row_mask=row_mask),
        "acc5": sequence_accuracy(preds, targets, 5, ignore_index=pad_id,
                                  row_mask=row_mask),
        "caption_length": calculate_caption_lengths(captions, skip_ids,
                                                    row_mask),
    }
    return loss, (metrics, preds, alphas)


def make_train_step(dcfg: DecoderConfig, network: str, alpha_c: float,
                    bf16_encoder: bool = False, from_features: bool = False,
                    rep_penalty_beta: float = 0.0):
    """Returns jitted `step(state, enc_params, imgs, captions, lr, rng,
    row_mask=None) -> (state, metrics)`.

    With `from_features=True` the third argument is the precomputed
    annotation grid (B, L, D) and the encoder is skipped entirely — the
    feature-cache training path (identical numerics: the encoder is frozen
    and always in eval mode, reference train.py:122 + encoder.py:29-31).

    `row_mask` (B,) bool excludes batch-padding rows from loss/grads/metrics
    (multi-device meshes pad batches to divide the data axis); None = all
    rows real.
    """
    tx = make_optimizer()
    compute_dtype = jnp.bfloat16 if bf16_encoder else None

    def step_fn(state: TrainState, enc_params, imgs, captions, lr, rng,
                row_mask=None):
        if from_features:
            features = imgs
        else:
            features = jax.lax.stop_gradient(
                encoder_forward(enc_params, network, imgs, compute_dtype))

        (loss, aux), grads = jax.value_and_grad(
            lambda p: _loss_and_metrics(dcfg, alpha_c, p, features,
                                        captions, rng, True, row_mask,
                                        rep_penalty_beta),
            has_aux=True)(state.params)
        metrics = aux[0]
        return apply_update(tx, state, grads, lr), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_bank_train_step(dcfg: DecoderConfig, alpha_c: float,
                         rep_penalty_beta: float = 0.0):
    """Feature-bank training step: the entire frozen-encoder feature cache
    lives in HBM and the host ships only row indices per step.

    Measured on v5e (Flickr8k-scale, B=64): host-side feature gather +
    25MB/step transfers run ~255 rows/s; this on-device gather runs
    ~7,200 rows/s — the input pipeline, not compute, is the binding
    constraint once features are cached.

    Returns jitted `step(state, feat_bank (U, L, D), caps_bank (N, T),
    img_idx (B,), row_idx (B,), lr, rng, row_mask=None) -> (state, metrics)`.
    """
    tx = make_optimizer()

    def step_fn(state: TrainState, feat_bank, caps_bank, img_idx, row_idx,
                lr, rng, row_mask=None):
        # astype is a no-op for f32 banks; a bfloat16 bank (--bank-dtype)
        # is widened right after the gather so the decoder math stays f32.
        features = feat_bank[img_idx].astype(jnp.float32)
        captions = caps_bank[row_idx]
        (loss, aux), grads = jax.value_and_grad(
            lambda p: _loss_and_metrics(dcfg, alpha_c, p, features,
                                        captions, rng, True, row_mask,
                                        rep_penalty_beta),
            has_aux=True)(state.params)
        metrics = aux[0]
        return apply_update(tx, state, grads, lr), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_bank_train_block(dcfg: DecoderConfig, alpha_c: float,
                          rep_penalty_beta: float = 0.0):
    """K optimizer steps in ONE dispatch: `lax.scan` over stacked index
    batches from the HBM feature bank.

    Bank-mode steps are a few ms of device time, so per-step wall-clock is
    dominated by the host->device dispatch + metric readback round trips
    (documented at 1-30ms each over the tunneled dev chip). Scanning K
    steps inside one jitted program amortizes that overhead K-fold; the
    host ships one (K, B) int32 index block and reads one stacked metrics
    pytree per dispatch.

    Numerics are bit-identical to K consecutive `make_bank_train_step`
    calls: the same per-step computation is scanned, and the per-step
    dropout key is derived in-graph as `fold_in(base_rng, step0 + i)` —
    the exact host-side derivation the per-batch loop uses
    (engine/loop.py train_epoch). Asserted by
    tests/test_feature_cache.py::test_steps_per_dispatch_parity.

    Returns jitted `block(state, feat_bank (U, L, D), caps_bank (N, T),
    img_idx (K, B), row_idx (K, B), lr, base_rng, step0, row_mask (K, B))
    -> (state, metrics)` where each metrics leaf is stacked to (K,).
    """
    tx = make_optimizer()

    def block_fn(state: TrainState, feat_bank, caps_bank, img_idx, row_idx,
                 lr, base_rng, step0, row_mask):
        def one_step(st, xs):
            i, ii, ri, mask = xs
            rng = jax.random.fold_in(base_rng, step0 + i)
            features = feat_bank[ii].astype(jnp.float32)
            captions = caps_bank[ri]
            (loss, aux), grads = jax.value_and_grad(
                lambda p: _loss_and_metrics(dcfg, alpha_c, p, features,
                                            captions, rng, True, mask,
                                            rep_penalty_beta),
                has_aux=True)(st.params)
            return apply_update(tx, st, grads, lr), aux[0]

        k = img_idx.shape[0]
        state, metrics = jax.lax.scan(
            one_step, state, (jnp.arange(k), img_idx, row_idx, row_mask))
        return state, metrics

    return jax.jit(block_fn, donate_argnums=(0,))


def make_bank_eval_block(dcfg: DecoderConfig, alpha_c: float):
    """K eval batches in ONE dispatch (the eval twin of
    `make_bank_train_block`): `lax.scan` over stacked (K, B) index blocks,
    returning stacked metrics and argmax tokens. The per-batch eval loop
    pays ~5 host round trips per batch (4 scalar metric syncs + the token
    readback); the blocked loop pays 2 bulk fetches per K batches.
    Alphas are not returned — the blocked path serves VALIDATION, where
    nothing consumes them (attention viz is TEST-only), so XLA drops their
    (K, B, T, L) stacking entirely.

    Returns jitted `block(params, feat_bank (U, L, D), caps_bank (N, T),
    img_idx (K, B), row_idx (K, B), row_mask (K, B)) -> (metrics, tokens)`
    with each metrics leaf stacked to (K,) and tokens (K, B, T-1).
    """

    def block_fn(params, feat_bank, caps_bank, img_idx, row_idx, row_mask):
        def one_batch(carry, xs):
            ii, ri, mask = xs
            features = feat_bank[ii].astype(jnp.float32)
            captions = caps_bank[ri]
            _, (metrics, preds, _alphas) = _loss_and_metrics(
                dcfg, alpha_c, params, features, captions, None, False,
                mask)
            pred_tokens = preds.argmax(axis=2).astype(jnp.int32)
            return carry, (metrics, pred_tokens)

        _, (metrics, tokens) = jax.lax.scan(
            one_batch, 0, (img_idx, row_idx, row_mask))
        return metrics, tokens

    return jax.jit(block_fn)


def make_bank_eval_step(dcfg: DecoderConfig, alpha_c: float):
    """Feature-bank eval step: indices in, metrics + argmax tokens +
    alphas out."""

    def eval_fn(params, feat_bank, caps_bank, img_idx, row_idx,
                row_mask=None):
        # astype is a no-op for f32 banks; a bfloat16 bank (--bank-dtype)
        # is widened right after the gather so the decoder math stays f32.
        features = feat_bank[img_idx].astype(jnp.float32)
        captions = caps_bank[row_idx]
        _, (metrics, preds, alphas) = _loss_and_metrics(
            dcfg, alpha_c, params, features, captions, None, False, row_mask)
        pred_tokens = preds.argmax(axis=2).astype(jnp.int32)
        return metrics, pred_tokens, alphas

    return jax.jit(eval_fn)


def make_eval_step(dcfg: DecoderConfig, network: str, alpha_c: float,
                   bf16_encoder: bool = False, from_features: bool = False):
    """Returns jitted `eval(params, enc_params, imgs, captions,
    row_mask=None) -> (metrics, pred_tokens (B,T), alphas (B,T,L))`.

    Only argmax token ids leave the device (the reference ships full logits
    to host for `torch.max`, train.py:272,297). `from_features=True` takes
    precomputed annotation grids instead of images."""
    compute_dtype = jnp.bfloat16 if bf16_encoder else None

    def eval_fn(params, enc_params, imgs, captions, row_mask=None):
        if from_features:
            features = imgs
        else:
            features = encoder_forward(enc_params, network, imgs, compute_dtype)
        _, (metrics, preds, alphas) = _loss_and_metrics(
            dcfg, alpha_c, params, features, captions, None, False, row_mask)
        pred_tokens = preds.argmax(axis=2).astype(jnp.int32)
        return metrics, pred_tokens, alphas

    return jax.jit(eval_fn)
