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


def test_greedy_alpha_layout_matches_beam():
    """pack_scan must prepend the all-ones start alpha row like the beam
    layout (review r4: greedy/sample alphas used to be one row short and
    shifted — attention maps rendered one token late, and the final
    token's map was lost)."""
    dcfg = DecoderConfig(vocab_size=30, encoder_dim=512, use_attention=True)
    enc = init_encoder_params(jax.random.PRNGKey(0), "vgg19")
    dec = init_decoder_params(jax.random.PRNGKey(1), dcfg)
    imgs = np.random.default_rng(0).normal(size=(2, 32, 32, 3)) \
        .astype(np.float32)
    beam_out = build_caption_fn("vgg19", dcfg, enc, dec, 2)(imgs)
    greedy_out = build_caption_fn("vgg19", dcfg, enc, dec, 1,
                                  decode="greedy")(imgs)
    assert greedy_out["alphas"].shape[1] == greedy_out["tokens"].shape[1]
    assert beam_out["alphas"].shape[1] == beam_out["tokens"].shape[1]
    np.testing.assert_array_equal(np.asarray(greedy_out["alphas"][:, 0]),
                                  np.ones_like(np.asarray(
                                      greedy_out["alphas"][:, 0])))


def test_fast_and_pallas_topk_mutually_exclusive():
    """Silently preferring one mode would misrepresent the decode contract
    (fast is approximate, pallas is exact) — must raise at build."""
    import pytest

    from sat_tpu.models.beam import beam_search_batched

    dcfg = DecoderConfig(vocab_size=30, encoder_dim=16, use_attention=True)
    dec = init_decoder_params(jax.random.PRNGKey(1), dcfg)
    feats = np.zeros((2, 4, 16), np.float32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        beam_search_batched(dec, dcfg, feats, 2, fast_topk=True,
                            pallas_topk=True)


def test_flat_layout_bf16_matches_dedup_bf16():
    """dedup=False must honor bf16 like the dedup branch (review r4: the
    flat layout silently decoded f32 under bf16=True, so dedup-vs-flat
    A/Bs at bf16 compared different dtypes). Same cast point -> identical
    tokens between the two layouts."""
    from sat_tpu.models.beam import beam_search_batched

    dcfg = DecoderConfig(vocab_size=40, encoder_dim=32, use_attention=True)
    dec = init_decoder_params(jax.random.PRNGKey(3), dcfg)
    feats = np.random.default_rng(5).normal(size=(3, 9, 32)) \
        .astype(np.float32)
    a = beam_search_batched(dec, dcfg, feats, 3, max_steps=8, bf16=True)
    b = beam_search_batched(dec, dcfg, feats, 3, max_steps=8, bf16=True,
                            dedup=False)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.found), np.asarray(b.found))


def test_export_pallas_topk_default_off(tmp_path, monkeypatch):
    """ADVICE r4: exports default pallas_topk=False (exact_topk picks
    interpret-vs-kernel from the TRACE-time backend, not the artifact's
    target platform — a CPU-host export would bake the interpret lowering
    into a TPU artifact). The parameter threads through when opted in, and
    both exports are token-identical (the kernel is bit-exact)."""
    import sat_tpu.engine.serving as serving_mod

    seen = {}
    real = serving_mod.build_caption_fn

    def spy(*args, **kw):
        seen.update(kw)
        return real(*args, **kw)

    monkeypatch.setattr(serving_mod, "build_caption_fn", spy)
    dcfg = DecoderConfig(vocab_size=30, encoder_dim=512, use_attention=True)
    enc = init_encoder_params(jax.random.PRNGKey(0), "vgg19")
    dec = init_decoder_params(jax.random.PRNGKey(1), dcfg)

    path_lax = str(tmp_path / "lax.stablehlo")
    export_caption_artifact(path_lax, "vgg19", dcfg, enc, dec,
                            batch_size=2, image_size=32, beam_size=2)
    assert seen["pallas_topk"] is False   # the portable default

    path_pl = str(tmp_path / "pallas.stablehlo")
    export_caption_artifact(path_pl, "vgg19", dcfg, enc, dec,
                            batch_size=2, image_size=32, beam_size=2,
                            pallas_topk=True)
    assert seen["pallas_topk"] is True    # opt-in threads through

    imgs = np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32)
    a = load_caption_artifact(path_lax)(imgs)
    b = load_caption_artifact(path_pl)(imgs)
    np.testing.assert_array_equal(np.asarray(a["tokens"]),
                                  np.asarray(b["tokens"]))


def test_caption_step_params_as_args_matches_baked_closure():
    """build_caption_step (params as jit ARGUMENTS — the live-server form)
    must be bitwise-identical to the baked build_caption_fn closure, and
    its lowering must not inline the weights as constants (the round-5
    HTTP-413 finding: a params-baked ResNet152 program lowered to 582 MB
    of StableHLO, 0.33 MB of it actual body)."""
    from sat_tpu.engine.serving import build_caption_step

    dcfg = DecoderConfig(vocab_size=30, encoder_dim=512, use_attention=True)
    enc = init_encoder_params(jax.random.PRNGKey(0), "vgg19")
    dec = init_decoder_params(jax.random.PRNGKey(1), dcfg)
    imgs = np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32)

    for kw in ({}, {"decode": "greedy"}):
        baked = build_caption_fn("vgg19", dcfg, enc, dec, 2, **kw)(imgs)
        step = build_caption_step("vgg19", dcfg, 2, **kw)
        live = jax.jit(step)(enc, dec, imgs)
        for k in ("tokens", "length", "found"):
            np.testing.assert_array_equal(np.asarray(baked[k]),
                                          np.asarray(live[k]))
        # float outputs agree to f32 ulp only: baking params lets XLA
        # constant-fold differently than the runtime-arg schedule
        # (measured max |delta| 3e-8 alphas / 1.2e-7 score); every token
        # decision above is identical
        for k in ("alphas", "score"):
            np.testing.assert_allclose(np.asarray(baked[k]),
                                       np.asarray(live[k]),
                                       rtol=1e-5, atol=1e-6)

    # sample form takes (e, d, images, rng) / (images, rng)
    rng = jax.random.PRNGKey(7)
    skw = dict(decode="sample", temperature=0.8, top_k=4)
    baked = build_caption_fn("vgg19", dcfg, enc, dec, 1, **skw)(imgs, rng)
    live = jax.jit(build_caption_step("vgg19", dcfg, 1, **skw))(
        enc, dec, imgs, rng)
    np.testing.assert_array_equal(np.asarray(baked["tokens"]),
                                  np.asarray(live["tokens"]))

    # the args form's lowering must be FAR smaller than the baked one —
    # even these tiny test params inline megabytes of dense<...> constants
    step = build_caption_step("vgg19", dcfg, 2)
    args_txt = len(jax.jit(step).lower(enc, dec, imgs).as_text())
    baked_txt = len(jax.jit(
        build_caption_fn("vgg19", dcfg, enc, dec, 2)).lower(imgs).as_text())
    assert args_txt * 10 < baked_txt, (args_txt, baked_txt)
