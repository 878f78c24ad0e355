"""Tunnel-proof device-time measurement.

The axon-tunneled chip has two failure modes for naive timing:
  1. `jax.block_until_ready` can return before execution completes
     (measured: it reported 21 PFLOP/s for one matmul on one v5e chip);
     only a host readback of a scalar truly synchronizes.
  2. The tunnel's round-trip latency swings between ~0.3 ms and ~30 ms
     "phases", so a single dispatch+readback measures the PHASE, not the
     program (measured: scans of length 25 and 102 both cost ~30 ms
     wall-clock while their true per-iteration device cost was ~14 us).

`device_time` removes both: the program under test is repeated N times
INSIDE one jitted call (chained through the carry so XLA cannot CSE the
repeats), a scalar reduction is fetched once, and the per-repetition device
time is the SLOPE between two repetition counts — the fixed round trip
cancels exactly.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _runner(body, n: int, aux=None):
    """jit(carry -> scalar) running `body` n times, chained, CSE-proof.

    `aux` (any pytree, e.g. model params) is passed to the jit as a REAL
    ARGUMENT and forwarded to `body(carry, i, aux)`. Closing over large
    arrays instead bakes them into the StableHLO as inline constants —
    measured 583 MB of HLO text for the ResNet152 e2e body (240 MB of f32
    weights hex-dumped), which is what overflowed the axon remote-compile
    endpoint's HTTP-413 upload cap, not the 152-layer body itself."""

    @jax.jit
    def run(carry, a):
        def step(c, i):
            c = body(c, i, a) if a is not None else body(c, i)
            return c, None
        carry2, _ = jax.lax.scan(step, carry, jnp.arange(n))
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(carry2))

    return lambda carry: run(carry, aux)


def device_time(body, carry0, n_lo: int = 2, n_hi: int = 12,
                reps: int = 5, aux=None) -> float:
    """Median per-execution device seconds of `body(carry, i) -> carry`.

    `body` must thread its output back into its input (same pytree
    structure) so consecutive repetitions depend on each other; use the
    iteration index `i` to perturb inputs if the body would otherwise be
    idempotent. Pass large closed-over pytrees (params, feature banks)
    via `aux` — body is then called as `body(carry, i, aux)` and the
    arrays stay runtime buffers instead of inlined HLO constants (see
    `_runner`).
    """
    lo, hi = _runner(body, n_lo, aux), _runner(body, n_hi, aux)
    float(lo(carry0))   # compile
    float(hi(carry0))

    def once(fn):
        t0 = time.perf_counter()
        float(fn(carry0))         # host readback = the only honest sync
        return time.perf_counter() - t0

    # The tunnel phase also DRIFTS between calls; pair each lo with an
    # immediately-following hi and take the median of per-pair slopes so a
    # phase change corrupts at most the pairs it straddles.
    slopes = []
    for _ in range(reps):
        t_lo = once(lo)
        t_hi = once(hi)
        slopes.append((t_hi - t_lo) / (n_hi - n_lo))
    return max(sorted(slopes)[len(slopes) // 2], 0.0)
