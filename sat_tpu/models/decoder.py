"""Soft-attention LSTM caption decoder as pure functions over a param pytree.

Semantics match the reference Decoder (reference decoder.py:10-158) for all
four feature flags — `tf` (teacher forcing), `ado` (advanced deep output),
`bert` (frozen 30522x768 input embeddings), `attention` (soft attention vs.
uniform mean-pooled context) — but the per-timestep Python loop
(decoder.py:96-133, ~10 kernel launches x 26 steps per batch) becomes a
single `lax.scan` inside one jitted program: the whole teacher-forced or
autoregressive unroll compiles to one XLA computation with the attention
keys precomputed once per image.

Parameter tree (all linear layers stored (in, out)):
  embedding   (V, E)        — N(0,1) init (torch nn.Embedding default);
                              frozen via stop_gradient when use_bert
  init_h/init_c             — D -> E state initializers (decoder.py:43-44)
  f_beta                    — E -> D gating scalar head (decoder.py:48)
  attention   {U, W, v}     — always present, even with use_attention=False
                              (the reference constructs them regardless,
                              decoder.py:52 — param-count parity)
  lstm        {w_ih, w_hh, b_ih, b_hh}   — (E+D) -> E cell (decoder.py:53)
  deep_output               — E -> V simple head (decoder.py:66)
  ado         {f_h, f_z, f_out}          — advanced head (decoder.py:58-63),
                              present only when use_ado
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sat_tpu import constants
from sat_tpu.models.attention import (
    init_attention_params,
    precompute_attention_keys,
    soft_attention,
    _linear_init,
)
from sat_tpu.ops.lstm import init_lstm_params, lstm_cell


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    encoder_dim: int
    use_tf: bool = False
    use_ado: bool = False
    use_bert: bool = False
    use_attention: bool = False
    dropout_rate: float = 0.5
    # Route the attention block through the Pallas fused kernels
    # (sat_tpu.ops.fused_attention): custom-VJP pair whose backward
    # recomputes the (B, L, E) tanh in VMEM instead of materializing it to
    # HBM for the backward pass. Matches XLA numerics; usable in training
    # and inference.
    fused_attention: bool = False
    # Compute the (B, L, E) attention tanh intermediate in bfloat16: halves
    # the training step's dominant saved-activation HBM traffic (the grad is
    # bandwidth-bound on it from B=64 to B=256). Scores/softmax/context stay
    # f32. Off by default (exact f32 reference numerics).
    bf16_attention: bool = False
    # Rematerialize the scan body (jax.checkpoint on the per-timestep step):
    # autodiff then saves only the small per-step carry/outputs and recomputes
    # the (B, L, E) tanh/softmax intermediates during the backward pass
    # instead of writing them to HBM in forward and reading them back in
    # backward. Recompute is the same ops on the same inputs, so forward
    # outputs and gradients are unchanged; only the memory/traffic schedule
    # differs. Targets the measured bandwidth bound of the train grad.
    # DEFAULT ON since the 2026-08-19 harvest: same-process interleaved A/B
    # (bench.py leg_remat / tools/bench_remat.py) measured 2.445x on the f32
    # train grad+update and 1.068x on bf16-attention at B=64 — both past the
    # >1.05x flip rule. `--no-remat-scan` restores the saved-residual
    # baseline for A/B.
    remat_scan: bool = True

    @property
    def embedding_size(self) -> int:
        return constants.BERT_HIDDEN_SIZE if self.use_bert else 512

    @property
    def start_token(self) -> int:
        return constants.BERT_CLS if self.use_bert else constants.START

    @property
    def effective_vocab_size(self) -> int:
        return constants.BERT_VOCAB_SIZE if self.use_bert else self.vocab_size

    @property
    def attention_middle_dtype(self):
        return jnp.bfloat16 if self.bf16_attention else None


def init_decoder_params(rng: jax.Array, cfg: DecoderConfig,
                        bert_embeddings: jnp.ndarray | None = None,
                        dtype=jnp.float32) -> dict:
    E, D, V = cfg.embedding_size, cfg.encoder_dim, cfg.effective_vocab_size
    keys = jax.random.split(rng, 10)
    params = {
        "embedding": (jnp.asarray(bert_embeddings, dtype)
                      if bert_embeddings is not None
                      else jax.random.normal(keys[0], (V, E), dtype)),
        "init_h": _linear_init(keys[1], D, E, dtype),
        "init_c": _linear_init(keys[2], D, E, dtype),
        "f_beta": _linear_init(keys[3], E, D, dtype),
        "attention": init_attention_params(keys[4], D, E, dtype),
        "lstm": init_lstm_params(keys[5], E + D, E, dtype),
        "deep_output": _linear_init(keys[6], E, V, dtype),
    }
    if cfg.use_ado:
        params["ado"] = {
            "f_h": _linear_init(keys[7], E, E, dtype),
            "f_z": _linear_init(keys[8], D, E, dtype),
            "f_out": _linear_init(keys[9], E, V, dtype),
        }
    return params


def embed_tokens(params: dict, cfg: DecoderConfig, ids: jnp.ndarray) -> jnp.ndarray:
    emb = jnp.take(params["embedding"], ids, axis=0)
    if cfg.use_bert:
        emb = jax.lax.stop_gradient(emb)  # frozen BERT table (decoder.py:32-33)
    return emb


def init_lstm_state(params: dict, features: jnp.ndarray):
    """h, c = tanh(Linear(mean_l features)) (reference decoder.py:137-147)."""
    avg = features.mean(axis=1)
    c = jnp.tanh(avg @ params["init_c"]["w"] + params["init_c"]["b"])
    h = jnp.tanh(avg @ params["init_h"]["w"] + params["init_h"]["b"])
    return h, c


def _advanced_deep_output(params: dict, h: jnp.ndarray, context: jnp.ndarray,
                          token_emb: jnp.ndarray) -> jnp.ndarray:
    """relu(f_out(relu(f_h h) + relu(f_z z) + E y)) (reference decoder.py:149-158).
    Note the reference relu's the final logits too; kept verbatim."""
    ado = params["ado"]
    h_t = jax.nn.relu(h @ ado["f_h"]["w"] + ado["f_h"]["b"])
    z_t = jax.nn.relu(context @ ado["f_z"]["w"] + ado["f_z"]["b"])
    combined = h_t + z_t + token_emb
    return jax.nn.relu(combined @ ado["f_out"]["w"] + ado["f_out"]["b"])


def _dropout(x: jnp.ndarray, rate: float, rng: jax.Array | None) -> jnp.ndarray:
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def decode_step(params: dict, cfg: DecoderConfig, features: jnp.ndarray,
                keys: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
                token_emb: jnp.ndarray, dropout_rng: jax.Array | None = None):
    """One decode timestep (reference decoder.py:96-125).

    features: (B, L, D) annotation grid; keys: precomputed W-projection of
    features; token_emb: (B, E) input-token embedding.
    Returns (h', c', logits (B, V), alpha (B, L), context (B, D)).
    """
    L = features.shape[1]
    if cfg.use_attention:
        if cfg.fused_attention:
            from sat_tpu.ops.fused_attention import fused_soft_attention
            context, alpha = fused_soft_attention(params["attention"],
                                                  features, h, keys)
        else:
            context, alpha = soft_attention(
                params["attention"], features, h, keys,
                middle_dtype=cfg.attention_middle_dtype)
        gate = jax.nn.sigmoid(h @ params["f_beta"]["w"] + params["f_beta"]["b"])
        gated_context = gate * context
    else:
        alpha = jnp.full(features.shape[:2], 1.0 / L, features.dtype)
        context = features.mean(axis=1)
        gated_context = context

    x = jnp.concatenate([token_emb, gated_context], axis=-1)
    h, c = lstm_cell(params["lstm"], x, h, c)

    h_dropped = _dropout(h, cfg.dropout_rate, dropout_rng)
    if cfg.use_ado:
        logits = _advanced_deep_output(params, h_dropped, context, token_emb)
    else:
        logits = h_dropped @ params["deep_output"]["w"] + params["deep_output"]["b"]
    return h, c, logits, alpha, context


def decoder_forward(params: dict, cfg: DecoderConfig, features: jnp.ndarray,
                    captions: jnp.ndarray, rng: jax.Array | None = None,
                    train: bool = False):
    """Full unroll over max_timespan = caption_length - 1 steps.

    Teacher-forced (cfg.use_tf): step t consumes the ground-truth token t
    (reference decoder.py:109). Otherwise autoregressive: step t consumes the
    argmax of step t-1's logits, starting from the start token
    (decoder.py:130-133). Dropout on h before the output head when train=True
    (decoder.py:121-125).

    Returns (preds (B, T, V), alphas (B, T, L)).
    """
    B = features.shape[0]
    T = captions.shape[1] - 1
    h, c = init_lstm_state(params, features)
    keys = precompute_attention_keys(params["attention"], features)
    if cfg.bf16_attention and cfg.use_attention:
        # keys and features are RE-READ from HBM on every one of the T scan
        # steps, forward and backward — the train step's dominant
        # irreducible traffic. Storing them bf16 halves it; the f32
        # originals are only needed once (init state above).
        keys = keys.astype(jnp.bfloat16)
        features = features.astype(jnp.bfloat16)

    use_dropout = train and rng is not None

    if cfg.use_tf:
        token_embs = embed_tokens(params, cfg, captions[:, :T])  # (B, T, E)

        # Teacher forcing needs no logits inside the recurrence, so the scan
        # carries only the cheap LSTM/attention states and the output head
        # runs ONCE over all timesteps afterwards — one (B*T, E) @ (E, V)
        # MXU matmul for forward and backward instead of T small ones.
        # Identical math to the per-step head; golden tests pin it.
        def step(carry, emb_t):
            h, c = carry
            L = features.shape[1]
            if cfg.use_attention:
                if cfg.fused_attention:
                    from sat_tpu.ops.fused_attention import fused_soft_attention
                    context, alpha = fused_soft_attention(
                        params["attention"], features, h, keys)
                else:
                    context, alpha = soft_attention(
                        params["attention"], features, h, keys,
                        middle_dtype=cfg.attention_middle_dtype)
                gate = jax.nn.sigmoid(h @ params["f_beta"]["w"]
                                      + params["f_beta"]["b"])
                gated_context = gate * context
            else:
                alpha = jnp.full(features.shape[:2], 1.0 / L, features.dtype)
                context = features.mean(axis=1)
                gated_context = context
            x = jnp.concatenate([emb_t, gated_context], axis=-1)
            h, c = lstm_cell(params["lstm"], x, h, c)
            return (h, c), (h, context, alpha)

        if cfg.remat_scan:
            # prevent_cse=False: inside lax.scan the CSE workaround is
            # unnecessary (per jax.checkpoint docs) and would block XLA opts.
            step = jax.checkpoint(step, prevent_cse=False)
        (_, _), (hs, ctxs, alphas) = jax.lax.scan(
            step, (h, c), jnp.swapaxes(token_embs, 0, 1))
        hs = jnp.swapaxes(hs, 0, 1)          # (B, T, E)
        ctxs = jnp.swapaxes(ctxs, 0, 1)      # (B, T, D)

        h_do = _dropout(hs, cfg.dropout_rate, rng if use_dropout else None)
        if cfg.use_ado:
            preds = _advanced_deep_output(params, h_do, ctxs, token_embs)
        else:
            preds = (h_do @ params["deep_output"]["w"]
                     + params["deep_output"]["b"])
        return preds, jnp.swapaxes(alphas, 0, 1)
    else:
        start = jnp.full((B,), cfg.start_token, jnp.int32)
        prev_emb = embed_tokens(params, cfg, start)

        def step(carry, rng_t):
            h, c, prev_emb = carry
            h, c, logits, alpha, _ = decode_step(
                params, cfg, features, keys, h, c, prev_emb,
                rng_t if use_dropout else None)
            next_ids = logits.argmax(axis=1)  # decoder.py:132
            next_emb = embed_tokens(params, cfg, next_ids)
            return (h, c, next_emb), (logits, alpha)

        if cfg.remat_scan:
            # prevent_cse=False: inside lax.scan the CSE workaround is
            # unnecessary (per jax.checkpoint docs) and would block XLA opts.
            step = jax.checkpoint(step, prevent_cse=False)
        # per-step dropout keys are an autoregressive-path concern only;
        # the tf branch draws its single mask from the raw rng above
        step_rngs = (jax.random.split(rng, T) if use_dropout
                     else jnp.zeros((T, 2), jnp.uint32))
        (_, _, _), (preds, alphas) = jax.lax.scan(step, (h, c, prev_emb), step_rngs)

    return jnp.swapaxes(preds, 0, 1), jnp.swapaxes(alphas, 0, 1)
