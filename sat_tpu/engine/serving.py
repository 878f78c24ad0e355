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


def build_caption_fn(network: str, dcfg, enc_params, dec_params,
                     beam_size: int, fast_topk: bool = False,
                     bf16: bool = False):
    """Closure: images (B, S, S, 3) -> BeamResult arrays, params baked in.

    `fast_topk`/`bf16` select the measured opt-in beam speed modes
    (sat_tpu.models.beam.beam_search_batched) — for deployments that trade
    token-exact reference parity for ~1.36x decode throughput."""
    from sat_tpu.models.beam import beam_search_batched
    from sat_tpu.models.encoder import encoder_forward

    def caption(images):
        feats = encoder_forward(enc_params, network, images,
                                jnp.bfloat16 if bf16 else None)
        res = beam_search_batched(dec_params, dcfg, feats.astype(jnp.float32),
                                  beam_size, fast_topk=fast_topk, bf16=bf16)
        return {"tokens": res.tokens, "length": res.length,
                "score": res.score, "found": res.found,
                "alphas": res.alphas}

    return caption


def export_caption_artifact(path: str, network: str, dcfg, enc_params,
                            dec_params, batch_size: int, image_size: int,
                            beam_size: int,
                            platforms: tuple[str, ...] | None = None,
                            fast_topk: bool = False,
                            bf16: bool = False) -> None:
    """Serialize the caption program for `batch_size` images to `path`."""
    from jax import export as jexport

    fn = build_caption_fn(network, dcfg, enc_params, dec_params, beam_size,
                          fast_topk=fast_topk, bf16=bf16)
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
