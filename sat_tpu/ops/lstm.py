"""LSTM cell as a pure function.

Gate math and memory layout follow the convention the reference's
nn.LSTMCell uses (reference decoder.py:53, :115) — gates ordered
(input, forget, cell, output) — but weights are stored `(in, out)` so the
step is two MXU-friendly `x @ W` matmuls:

    gates = x @ w_ih + h @ w_hh + b_ih + b_hh
    i, f, g, o = split(gates, 4, axis=-1)
    c' = sigmoid(f) * c + sigmoid(i) * tanh(g)
    h' = sigmoid(o) * tanh(c')
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_lstm_params(rng: jax.Array, input_size: int, hidden_size: int,
                     dtype=jnp.float32) -> dict:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init for all weights and biases,
    matching torch.nn.LSTMCell's default initializer."""
    k = 1.0 / jnp.sqrt(hidden_size)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    return {
        "w_ih": jax.random.uniform(r1, (input_size, 4 * hidden_size), dtype, -k, k),
        "w_hh": jax.random.uniform(r2, (hidden_size, 4 * hidden_size), dtype, -k, k),
        "b_ih": jax.random.uniform(r3, (4 * hidden_size,), dtype, -k, k),
        "b_hh": jax.random.uniform(r4, (4 * hidden_size,), dtype, -k, k),
    }


def lstm_cell(params: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """One step. x: (B, I); h, c: (B, H) -> (h', c')."""
    gates = (x @ params["w_ih"] + h @ params["w_hh"]
             + params["b_ih"] + params["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new
