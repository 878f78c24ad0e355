"""scan_blocks resnet152 path: bitwise equality with the unrolled form.

The weight-stacked `lax.scan` over identical bottleneck blocks
(encoder.py resnet152_forward) exists to shrink the whole-program HLO
below the axon remote-compile HTTP-413 cap (bench.py leg_resnet); it must
be the *same math in the same order*, so the contract is bitwise, not
allclose. Tested on a block-sliced tree at small resolution to stay in
the fast tier (the full 152-layer unrolled XLA:CPU compile lives in the
heavy tests/test_encoder.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sat_tpu.models.encoder import (
    encoder_forward, init_resnet152_params, resnet152_forward)


def _sliced_params(keep=(3, 3, 4, 2)):
    params = init_resnet152_params(jax.random.PRNGKey(0))
    for li, n in enumerate(keep, start=1):
        params[f"layer{li}"] = params[f"layer{li}"][:n]
    return params


def test_scan_blocks_bitwise_equal():
    params = _sliced_params()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)).astype(np.float32))
    ref = jax.jit(lambda p, v: resnet152_forward(p, v))(params, x)
    scanned = jax.jit(
        lambda p, v: resnet152_forward(p, v, scan_blocks=True))(params, x)
    assert ref.shape == scanned.shape
    assert bool(jnp.all(ref == scanned)), (
        float(jnp.max(jnp.abs(ref - scanned))))


def test_scan_blocks_facade_and_single_block_layer():
    # keep=1 exercises the len(blocks) <= 2 fallback (nothing to scan);
    # the facade must route scan_blocks only for resnet152.
    params = _sliced_params(keep=(1, 2, 3, 1))
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 64, 64, 3)).astype(np.float32))
    ref = encoder_forward(params, "resnet152", x)
    scanned = encoder_forward(params, "resnet152", x, scan_blocks=True)
    assert bool(jnp.all(ref == scanned))
