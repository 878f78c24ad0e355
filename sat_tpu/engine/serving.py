"""AOT serving export: serialize the full caption program to a portable
StableHLO artifact via `jax.export`.

A deployment can load the artifact and run image->caption without any
sat_tpu model code or retracing — the whole encoder + batched-beam pipeline
is one serialized computation with the weights baked in as constants. (The
reference has no serving story at all; its decode is a Python loop over an
eager torch module.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_caption_step(network: str, dcfg, beam_size: int,
                       fast_topk: bool = False,
                       bf16: bool = False, decode: str = "beam",
                       mesh_data: int = 1, temperature: float = 1.0,
                       top_k: int = 0, top_p: float = 1.0,
                       pallas_topk: bool | None = None):
    """The caption computation with params as ARGUMENTS:
    step(enc_params, dec_params, images) -> result dict arrays
    (decode="sample": step(enc_params, dec_params, images, rng)).

    Live servers must jit THIS form: jitting a params-baked closure
    inlines the weights as HLO constants — measured 582 MB of StableHLO
    for a 0.33 MB ResNet152 body (docs/ARCHITECTURE.md round 5), which
    bloats every compile upload and wedged this pod's remote-compile
    endpoint. Params-baked remains correct for AOT export, where a
    standalone artifact is the point (build_caption_fn).

    `fast_topk`/`bf16` select the measured opt-in beam speed modes
    (sat_tpu.models.beam.beam_search_batched) — for deployments that trade
    token-exact reference parity for ~1.36x decode throughput.
    `decode="greedy"` swaps in the argmax fast path (beam=1 semantics
    without top-k machinery); the result dict keeps the same keys — the
    start token is prepended so token extraction matches the beam layout,
    and found reports the honest completion bit (a stop token was emitted
    within max_steps). Unlike beam's not-found rows, truncated greedy rows
    still carry their (truncated) tokens. `decode="sample"` is the
    stochastic variant (temperature / top-k / top-p); the caller supplies
    a fresh PRNG key per batch."""
    from sat_tpu.models.beam import (beam_search_batched, greedy_caption,
                                     sample_caption,
                                     validate_sampling_params)
    from sat_tpu.models.encoder import encoder_forward

    if decode == "sample":
        # Fail at build (CLI startup), not at the first traced
        # request — see validate_sampling_params.
        validate_sampling_params(temperature, top_k, top_p)

    def encode(enc_params, images):
        feats = encoder_forward(enc_params, network, images,
                                jnp.bfloat16 if bf16 else None)
        return feats.astype(jnp.float32)

    def pack_scan(tokens, lengths, alphas):
        """greedy/sample output -> the beam result layout (start prepended).

        The all-ones alpha row for the start token is prepended too, so
        alphas row t belongs to tokens column t exactly like the beam
        layout (and generate_caption.py's direct greedy path) — without
        it every attention map rendered one token late and the final
        token's map was lost (review r4)."""
        B, max_steps = tokens.shape
        start = jnp.full((B, 1), dcfg.start_token, tokens.dtype)
        ones = jnp.ones((B, 1, alphas.shape[-1]), alphas.dtype)
        return {"tokens": jnp.concatenate([start, tokens], axis=1),
                "length": jnp.minimum(lengths, max_steps - 1)
                          .astype(jnp.int32) + 1,
                "score": jnp.zeros((B,), jnp.float32),
                "found": lengths < max_steps,
                "alphas": jnp.concatenate([ones, alphas], axis=1)}

    if decode == "sample":
        def caption(enc_params, dec_params, images, rng):
            return pack_scan(*sample_caption(
                dec_params, dcfg, encode(enc_params, images), rng,
                temperature=temperature, top_k=top_k, top_p=top_p,
                with_alphas=True))
        return caption

    def caption(enc_params, dec_params, images):
        feats = encode(enc_params, images)
        if decode == "greedy":
            return pack_scan(*greedy_caption(dec_params, dcfg, feats,
                                             with_alphas=True))
        res = beam_search_batched(dec_params, dcfg, feats,
                                  beam_size, fast_topk=fast_topk, bf16=bf16,
                                  mesh_data=mesh_data,
                                  pallas_topk=pallas_topk)
        return {"tokens": res.tokens, "length": res.length,
                "score": res.score, "found": res.found,
                "alphas": res.alphas}

    return caption


def build_caption_fn(network: str, dcfg, enc_params, dec_params,
                     beam_size: int, fast_topk: bool = False,
                     bf16: bool = False, decode: str = "beam",
                     mesh_data: int = 1, temperature: float = 1.0,
                     top_k: int = 0, top_p: float = 1.0,
                     pallas_topk: bool | None = None):
    """Closure: images (B, S, S, 3) -> result dict arrays, params baked in
    (decode="sample": (images, rng)). Thin wrapper over build_caption_step
    — use for AOT export (a standalone artifact WANTS baked weights) and
    one-shot CLI paths; live servers should jit build_caption_step and
    pass params per call (see its docstring for the 582 MB lesson)."""
    step = build_caption_step(network, dcfg, beam_size,
                              fast_topk=fast_topk, bf16=bf16, decode=decode,
                              mesh_data=mesh_data, temperature=temperature,
                              top_k=top_k, top_p=top_p,
                              pallas_topk=pallas_topk)
    if decode == "sample":
        return lambda images, rng: step(enc_params, dec_params, images, rng)
    return lambda images: step(enc_params, dec_params, images)


def export_caption_artifact(path: str, network: str, dcfg, enc_params,
                            dec_params, batch_size: int, image_size: int,
                            beam_size: int,
                            platforms: tuple[str, ...] | None = None,
                            fast_topk: bool = False,
                            bf16: bool = False,
                            decode: str = "beam",
                            pallas_topk: bool = False) -> None:
    """Serialize the caption program for `batch_size` images to `path`.

    `pallas_topk` defaults to FALSE here (unlike the live serving path's
    auto-on): exact_topk picks interpret-vs-kernel from
    `jax.default_backend()` at TRACE time, not from the artifact's target
    `platforms` — exporting from a CPU host would bake the slow interpret
    lowering into a TPU artifact, and a TPU-host export for a platforms
    list including cpu would embed a tpu_custom_call the artifact cannot
    run portably (ADVICE r4). The lax.top_k path lowers portably on every
    platform and is token-identical; opt in to the kernel only for a
    single-platform TPU export made from a TPU host."""
    from jax import export as jexport

    if decode == "sample":
        raise ValueError(
            "decode='sample' is not exportable as a single-input artifact "
            "(its closure takes (images, rng)); use beam or greedy for AOT "
            "export, or serve sampling live via serve.py --decode sample")

    fn = build_caption_fn(network, dcfg, enc_params, dec_params, beam_size,
                          fast_topk=fast_topk, bf16=bf16, decode=decode,
                          pallas_topk=pallas_topk)
    spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3),
                                jnp.float32)
    exported = jexport.export(jax.jit(fn),
                              platforms=platforms)(spec)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_caption_artifact(path: str):
    """Load a serialized artifact; returns `fn(images) -> dict` runnable on
    the matching platform with no model code."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda images: exported.call(np.asarray(images, np.float32))
