"""Pallas TPU kernel: exact top-k over the flat beam-candidate row.

`jax.lax.top_k` over the beam's (B, K*V) candidate matrix is the only
component of the 51-step decode loop that measures above its HBM roofline
(docs/ARCHITECTURE.md decode accounting: ~45 us for top-k + reindex
against a ~4 us read roofline for the 3.4 MB candidate block at B=64) —
XLA lowers small-k top-k through a sort-flavored path. For k this small
(beam width 5) iterative selection is strictly cheaper: ONE pass of the
candidates HBM -> VMEM, then k rounds of max/argmin entirely in VMEM on
the VPU.

Selection order matches `lax.top_k` EXACTLY for NaN-free input, including
ties (lower index first — beam-search token parity depends on it,
models/beam.py:25) and all-(-inf) rows (indices 0..k-1 in order, which the
beam's retired-image rows rely on). NaN candidates rank as -inf (the
beam's scores are NaN-free by construction; lax.top_k's own NaN placement
is backend-defined, so no exactness contract is possible there — the
kernel just guarantees deterministic, in-range output). Property-tested
against `lax.top_k` on adversarial inputs (ties, -inf rows, +/-0) in
tests/test_topk.py.

Used by `beam_search_batched` — the DEFAULT selection path since the
on-device A/B landed 1.085x over lax.top_k (6.23 vs 6.77 ms worst-case
51-step beam, B=64 K=5, v5e, 2026-08-19 harvest); exactness means the
flip changes no semantics. `pallas_topk=False` keeps the lax formulation
as the A/B baseline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 8


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, n: int):
    """Iterative k-round exact selection on one (Bt, N) row block.

    Round i: the max over not-yet-taken entries, tie-broken to the lowest
    column — byte-for-byte the sequence `lax.top_k`'s stable descending
    sort produces. `taken` masks selected columns out of both the max and
    the argmin, so duplicate values and all-(-inf) rows select distinct
    columns in ascending order.
    """
    x = x_ref[:]                                            # (Bt, N) f32
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    taken = jnp.zeros(x.shape, jnp.bool_)
    neg_inf = jnp.float32(-jnp.inf)
    # NaN candidates rank as -inf: without this, a NaN row's max is NaN,
    # the equality filter matches nothing, and the argmin would emit the
    # out-of-range sentinel N (downstream beam gathers then silently
    # clamp). lax.top_k's NaN placement is backend-defined, so exact
    # parity is only contracted for NaN-free input (the beam's candidate
    # scores are NaN-free by construction); this just keeps the kernel's
    # output deterministic and in-range when that contract is violated.
    x = jnp.where(jnp.isnan(x), neg_inf, x)
    for i in range(k):                                      # k static, tiny
        xm = jnp.where(taken, neg_inf, x)
        m = jnp.max(xm, axis=1, keepdims=True)              # (Bt, 1)
        # equality may include taken cols when m == -inf; the candidate
        # index filter below excludes them, so ties resolve to the lowest
        # UNtaken column exactly like the stable sort.
        eq = (x == m) & ~taken
        cand = jnp.where(eq, col, n)
        amin = jnp.min(cand, axis=1, keepdims=True)         # (Bt, 1)
        vals_ref[:, i] = m[:, 0]
        idx_ref[:, i] = amin[:, 0]
        taken = taken | (col == amin)
    del i


def exact_topk(x: jnp.ndarray, k: int, block_b: int = DEFAULT_BLOCK_B,
               interpret: bool | None = None):
    """(values (B, k), indices (B, k) int32) == jax.lax.top_k(x, k).

    x must be float32 (the beam's candidate scores are). On non-TPU
    backends the kernel runs in interpret mode automatically.
    """
    if interpret is None:
        # Compile for real TPU backends (incl. the 'axon' PJRT plugin);
        # interpret elsewhere (CPU test meshes).
        interpret = jax.default_backend() == "cpu"
    return _exact_topk(x, k, block_b, interpret)


@functools.partial(jax.jit, static_argnames=("k", "block_b", "interpret"))
def _exact_topk(x: jnp.ndarray, k: int, block_b: int, interpret: bool):
    """One grid program per `block_b` rows; the whole (block_b, N) tile
    lives in VMEM (N=13,165 at the Flickr8k flagship -> ~420 KB per
    8-row tile)."""
    assert x.ndim == 2, f"exact_topk wants (B, N), got {x.shape}"
    assert x.dtype == jnp.float32, f"exact_topk is f32-only, got {x.dtype}"
    B, N = x.shape
    assert 0 < k <= N
    grid = (pl.cdiv(B, block_b),)
    kernel = functools.partial(_topk_kernel, k=k, n=N)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_b, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((block_b, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block_b, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, k), jnp.float32),
                   jax.ShapeDtypeStruct((B, k), jnp.int32)),
        interpret=interpret,
    )(x)
    return vals, idx
