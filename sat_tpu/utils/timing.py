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


def _runner(body, n: int):
    """jit(carry -> scalar) running `body` n times, chained, CSE-proof."""

    @jax.jit
    def run(carry):
        def step(c, i):
            c = body(c, i)
            return c, None
        carry2, _ = jax.lax.scan(step, carry, jnp.arange(n))
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(carry2))

    return run


def device_time(body, carry0, n_lo: int = 2, n_hi: int = 12,
                reps: int = 5) -> float:
    """Median per-execution device seconds of `body(carry, i) -> carry`.

    `body` must thread its output back into its input (same pytree
    structure) so consecutive repetitions depend on each other; use the
    iteration index `i` to perturb inputs if the body would otherwise be
    idempotent.
    """
    lo, hi = _runner(body, n_lo), _runner(body, n_hi)
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
