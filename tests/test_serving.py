"""AOT serving export: serialize, reload, and run the caption artifact with
no model code; outputs must match the live pipeline."""

import numpy as np

import jax

from sat_tpu.engine.serving import (
    build_caption_fn,
    export_caption_artifact,
    load_caption_artifact,
)
from sat_tpu.models import DecoderConfig, init_decoder_params
from sat_tpu.models.encoder import init_encoder_params


def test_export_roundtrip(tmp_path):
    dcfg = DecoderConfig(vocab_size=30, encoder_dim=512, use_attention=True)
    enc = init_encoder_params(jax.random.PRNGKey(0), "vgg19")
    dec = init_decoder_params(jax.random.PRNGKey(1), dcfg)
    path = str(tmp_path / "caption.stablehlo")
    export_caption_artifact(path, "vgg19", dcfg, enc, dec,
                            batch_size=2, image_size=32, beam_size=2)

    imgs = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    live = build_caption_fn("vgg19", dcfg, enc, dec, 2)(imgs)
    served = load_caption_artifact(path)(imgs)
    np.testing.assert_array_equal(np.asarray(live["tokens"]),
                                  np.asarray(served["tokens"]))
    np.testing.assert_array_equal(np.asarray(live["found"]),
                                  np.asarray(served["found"]))


def test_export_fast_modes_roundtrip(tmp_path):
    """The opt-in fast decode modes (approx top-k + bf16 grid storage)
    export and reload like the exact path."""
    dcfg = DecoderConfig(vocab_size=30, encoder_dim=512, use_attention=True)
    enc = init_encoder_params(jax.random.PRNGKey(0), "vgg19")
    dec = init_decoder_params(jax.random.PRNGKey(1), dcfg)
    path = str(tmp_path / "caption_fast.stablehlo")
    export_caption_artifact(path, "vgg19", dcfg, enc, dec,
                            batch_size=2, image_size=32, beam_size=2,
                            fast_topk=True, bf16=True)
    imgs = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    live = build_caption_fn("vgg19", dcfg, enc, dec, 2,
                            fast_topk=True, bf16=True)(imgs)
    served = load_caption_artifact(path)(imgs)
    np.testing.assert_array_equal(np.asarray(live["tokens"]),
                                  np.asarray(served["tokens"]))


def test_export_greedy_roundtrip(tmp_path):
    """Greedy artifact: same export/reload contract as beam."""
    dcfg = DecoderConfig(vocab_size=30, encoder_dim=512, use_attention=True)
    enc = init_encoder_params(jax.random.PRNGKey(0), "vgg19")
    dec = init_decoder_params(jax.random.PRNGKey(1), dcfg)
    path = str(tmp_path / "caption_greedy.stablehlo")
    export_caption_artifact(path, "vgg19", dcfg, enc, dec,
                            batch_size=2, image_size=32, beam_size=1,
                            decode="greedy")
    imgs = np.random.default_rng(0).normal(size=(2, 32, 32, 3)) \
        .astype(np.float32)
    live = build_caption_fn("vgg19", dcfg, enc, dec, 1, decode="greedy")(imgs)
    served = load_caption_artifact(path)(imgs)
    np.testing.assert_array_equal(np.asarray(live["tokens"]),
                                  np.asarray(served["tokens"]))
    np.testing.assert_array_equal(np.asarray(live["length"]),
                                  np.asarray(served["length"]))
    np.testing.assert_array_equal(np.asarray(live["found"]),
                                  np.asarray(served["found"]))
