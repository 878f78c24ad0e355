"""Pallas TPU kernel: fused soft-attention decode block.

Computes, entirely in VMEM per batch tile (no HBM round-trip for the big
(B, L, E) intermediate that the unfused XLA graph materializes):

    att   = tanh(keys + u_h[:, None, :])      (Bt, L, E)
    e     = att . v + b_v                     (Bt, L)
    alpha = softmax(e)                        (Bt, L)
    ctx   = sum_l alpha_l * features_l        (Bt, D)

`keys = W·a + b_W` and `u_h = U·h + b_U` stay plain XLA matmuls (MXU work
XLA already schedules optimally); the kernel absorbs everything between
them and the context reduction — the memory-bound middle of every decode
step (51 of them per beam search).

Numerics match sat_tpu.models.attention.soft_attention to float32 rounding;
equivalence is tested in interpret mode on CPU and on-device on TPU.

Measured status (TPU v5e, B=320, L=196, E=D=512): the kernel exactly ties
XLA's fused lowering on the flat-batch attention block (~±1%) — XLA already
avoids materializing the (B, L, E) intermediate here — and *loses* badly
inside `vmap`-of-`while_loop` beam search, where the pallas batching rule
serializes per-image kernel launches. The natively-batched beam
(sat_tpu.models.beam.beam_search_batched) runs flat (B*K) decode rows with
no vmap, and there the kernel ties XLA again (~±1%). It stays opt-in
(DecoderConfig.fused_attention) as the base for future fused-step work;
the default decode path keeps XLA's fusion, which is already optimal here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 8


def _attention_kernel(keys_ref, feats_ref, u_h_ref, v_ref, bv_ref,
                      ctx_ref, alpha_ref):
    # This block is HBM-bandwidth-bound, not FLOP-bound, so everything runs
    # on the VPU as elementwise + reduce (Mosaic cannot lower batched 3D
    # dot_general anyway); the payoff is keeping the (Bt, L, E) tanh
    # intermediate in VMEM instead of round-tripping it through HBM.
    att = jnp.tanh(keys_ref[:] + u_h_ref[:][:, None, :])      # (Bt, L, E)
    e = (att * v_ref[:][None, :, :]).sum(axis=-1) + bv_ref[0, 0]  # (Bt, L)
    alpha = jax.nn.softmax(e, axis=-1)
    alpha_ref[:] = alpha
    ctx_ref[:] = (feats_ref[:] * alpha[:, :, None]).sum(axis=1)  # (Bt, D)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_attention_block(keys: jnp.ndarray, features: jnp.ndarray,
                          u_h: jnp.ndarray, v_w: jnp.ndarray,
                          v_b: jnp.ndarray, block_b: int = DEFAULT_BLOCK_B,
                          interpret: bool = False):
    """keys (B, L, E), features (B, L, D), u_h (B, E), v_w (E, 1), v_b (1,)
    -> (context (B, D), alpha (B, L))."""
    B, L, E = keys.shape
    D = features.shape[-1]
    bt = min(block_b, B)
    pad = (-B) % bt
    if pad:
        keys = jnp.pad(keys, ((0, pad), (0, 0), (0, 0)))
        features = jnp.pad(features, ((0, pad), (0, 0), (0, 0)))
        u_h = jnp.pad(u_h, ((0, pad), (0, 0)))
    Bp = B + pad
    v_row = v_w.reshape(1, E)            # row layout: broadcasts on lanes
    bv = v_b.reshape(1, 1)

    grid = (Bp // bt,)
    ctx, alpha = pl.pallas_call(
        _attention_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, L, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, L), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * L * (E + D),
            bytes_accessed=4 * Bp * L * (E + D),
            transcendentals=Bp * L * (E + 1),
        ),
        interpret=interpret,
    )(keys, features, u_h, v_row, bv)
    if pad:
        ctx, alpha = ctx[:B], alpha[:B]
    return ctx, alpha


def _attention_bwd_kernel(keys_ref, feats_ref, u_h_ref, v_ref, alpha_ref,
                          dctx_ref, dalpha_ref,
                          dkeys_ref, dfeats_ref, du_h_ref, dv_ref, dbv_ref):
    """Backward pass with in-VMEM recompute of the (Bt, L, E) tanh — the
    activation XLA would otherwise store to and re-read from HBM (the
    dominant memory traffic of the training step at B=64, L=196, E=512).

    Saved residuals are only the small alpha (B, L); dv/dbv come out as
    per-block partials summed by the caller."""
    att = jnp.tanh(keys_ref[:] + u_h_ref[:][:, None, :])       # recompute
    alpha = alpha_ref[:]
    dctx = dctx_ref[:]
    feats = feats_ref[:]

    dfeats_ref[:] = alpha[:, :, None] * dctx[:, None, :]
    dalpha_tot = (feats * dctx[:, None, :]).sum(axis=-1) + dalpha_ref[:]
    # softmax VJP: de = alpha * (g - sum(alpha * g))
    de = alpha * (dalpha_tot
                  - (alpha * dalpha_tot).sum(axis=-1, keepdims=True))
    dpre = (de[:, :, None] * v_ref[:][None, :, :]) * (1.0 - att * att)
    dkeys_ref[:] = dpre
    du_h_ref[:] = dpre.sum(axis=1)
    # Per-block partials for the tiny param grads. Mosaic wants >=(8, 128)
    # tiles, so each block writes its partial broadcast over a (8, ...) pad
    # divided by the pad count — the caller's plain sum recovers the total.
    dv_part = (att * de[:, :, None]).sum(axis=(0, 1))            # (E,)
    dv_ref[:] = jnp.broadcast_to(dv_part[None, None, :],
                                 dv_ref.shape) / dv_ref.shape[1]
    dbv_ref[:] = jnp.full(dbv_ref.shape,
                          de.sum() / (dbv_ref.shape[1] * dbv_ref.shape[2]))


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _fused_attention_bwd(keys, features, u_h, v_w, alpha, dctx, dalpha,
                         block_b: int = DEFAULT_BLOCK_B,
                         interpret: bool = False):
    B, L, E = keys.shape
    D = features.shape[-1]
    bt = min(block_b, B)
    pad = (-B) % bt
    if pad:
        zpad3 = lambda a: jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
        zpad2 = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        keys, features = zpad3(keys), zpad3(features)
        u_h, alpha, dctx, dalpha = map(zpad2, (u_h, alpha, dctx, dalpha))
    Bp = B + pad
    v_row = v_w.reshape(1, E)
    G = Bp // bt

    row2 = lambda i: (i, 0)
    row3 = lambda i: (i, 0, 0)
    dkeys, dfeats, du_h, dv_parts, dbv_parts = pl.pallas_call(
        _attention_bwd_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((bt, L, E), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L, D), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, E), row2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L), row2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), row2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L), row2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, L, E), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L, D), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, E), row2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L, E), jnp.float32),
            jax.ShapeDtypeStruct((Bp, L, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, E), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, E), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(keys, features, u_h, v_row, alpha, dctx, dalpha)
    if pad:
        dkeys, dfeats, du_h = dkeys[:B], dfeats[:B], du_h[:B]
    dv = dv_parts.sum(axis=(0, 1)).reshape(E, 1)
    dbv = dbv_parts.sum(axis=(0, 1, 2)).reshape(1)
    return dkeys, dfeats, du_h, dv, dbv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_trainable(keys, features, u_h, v_w, v_b,
                              interpret: bool = False):
    """Differentiable fused attention block: forward and backward are both
    Pallas kernels; only (ctx, alpha) and the original inputs are saved —
    the (B, L, E) tanh activation is recomputed in VMEM on the backward
    pass instead of round-tripping HBM."""
    return fused_attention_block(keys, features, u_h, v_w, v_b,
                                 interpret=interpret)


def _fat_fwd(keys, features, u_h, v_w, v_b, interpret):
    ctx, alpha = fused_attention_block(keys, features, u_h, v_w, v_b,
                                       interpret=interpret)
    return (ctx, alpha), (keys, features, u_h, v_w, alpha)


def _fat_bwd(interpret, residuals, grads):
    keys, features, u_h, v_w, alpha = residuals
    dctx, dalpha = grads
    dkeys, dfeats, du_h, dv, dbv = _fused_attention_bwd(
        keys, features, u_h, v_w, alpha, dctx, dalpha, interpret=interpret)
    return dkeys, dfeats, du_h, dv, dbv


fused_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


def fused_soft_attention(params: dict, features: jnp.ndarray,
                         hidden: jnp.ndarray, keys: jnp.ndarray,
                         interpret: bool | None = None):
    """Drop-in for sat_tpu.models.attention.soft_attention using the Pallas
    kernels (custom VJP: differentiable, usable in training forwards).
    params: the attention param subtree. On non-TPU backends the kernels run
    in interpret mode automatically."""
    if interpret is None:
        # Compile for real TPU backends (incl. the 'axon' PJRT plugin);
        # interpret elsewhere (CPU test meshes).
        interpret = jax.default_backend() == "cpu"
    u_h = hidden @ params["U"]["w"] + params["U"]["b"]
    return fused_attention_trainable(keys, features, u_h, params["v"]["w"],
                                     params["v"]["b"], interpret)
