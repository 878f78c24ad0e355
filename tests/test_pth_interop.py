"""Reference `.pth` FILE interop, end-to-end (VERDICT r2 missing #1).

Earlier golden tests transfer reference state_dicts in memory; these drive
the actual on-disk path a user of the reference's released checkpoints
takes: torch.save -> sat_tpu.engine.checkpoint.load_decoder_checkpoint
(mirroring reference generate_caption.py:65-69's strict -> non-strict
fallback) -> token-identical beam captions, plus the evaluate.py CLI on a
.pth model.
"""

import json
import os
import sys

import numpy as np
import pytest
import torch

from tests._reference import import_reference

from sat_tpu.engine.checkpoint import load_decoder_checkpoint
from sat_tpu.models import DecoderConfig, init_decoder_params
from sat_tpu.models.beam import beam_search, extract_caption

ref_decoder_mod = import_reference("decoder")

V, D, L = 40, 32, 9


def _make_ref(ado, seed):
    torch.manual_seed(seed)
    ref = ref_decoder_mod.Decoder(V, D, tf=False, ado=ado, bert=False,
                                  attention=True)
    ref.eval()
    return ref


def _template(ado):
    import jax
    cfg = DecoderConfig(vocab_size=V, encoder_dim=D, use_ado=ado,
                        use_attention=True)
    return cfg, init_decoder_params(jax.random.PRNGKey(1), cfg)


def test_pth_file_load_beam_token_parity(tmp_path):
    """torch.save(state_dict()) -> load_decoder_checkpoint -> beam captions
    token-identical to the live reference module (decoder.py:160-269)."""
    ref = _make_ref(ado=True, seed=5)
    path = str(tmp_path / "model_vgg19_3.pth")
    torch.save(ref.state_dict(), path)

    cfg, template = _template(ado=True)
    params = load_decoder_checkpoint(path, template, strict=True)

    for in_seed in (0, 1):
        feats = np.random.default_rng(in_seed).normal(
            size=(L, D)).astype(np.float32)
        ref_feats = torch.tensor(feats).unsqueeze(0).expand(3, L, D)
        with torch.no_grad():
            ref_sentence, _ = ref.caption(ref_feats, 3)
        tokens, _ = extract_caption(beam_search(params, cfg, feats, 3))
        assert tokens == ref_sentence, f"seed={in_seed}"


def test_pth_strict_failure_raises(tmp_path):
    """A head-mismatched checkpoint must fail loudly under strict=True."""
    ref = _make_ref(ado=False, seed=6)      # no f_h/f_z/f_out in the file
    path = str(tmp_path / "model_noado.pth")
    torch.save(ref.state_dict(), path)
    _, template = _template(ado=True)       # ado template expects them
    with pytest.raises(KeyError):
        load_decoder_checkpoint(path, template, strict=True)


def test_pth_nonstrict_fallback(tmp_path, capsys):
    """strict=False takes the reference's fallback branch
    (generate_caption.py:65-69): shared params load from the file, the
    ado head keeps its fresh init."""
    ref = _make_ref(ado=False, seed=6)
    path = str(tmp_path / "model_noado.pth")
    torch.save(ref.state_dict(), path)
    _, template = _template(ado=True)
    params = load_decoder_checkpoint(path, template, strict=False)
    assert "strict=False" in capsys.readouterr().out

    sd = ref.state_dict()
    np.testing.assert_array_equal(
        np.asarray(params["embedding"]), sd["embedding.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["lstm"]["w_ih"]), sd["lstm.weight_ih"].numpy().T)
    # ado head untouched by the file -> still equals the template init
    np.testing.assert_array_equal(np.asarray(params["ado"]["f_out"]["w"]),
                                  np.asarray(template["ado"]["f_out"]["w"]))


def test_evaluate_cli_with_pth(tmp_path, monkeypatch, capsys):
    """evaluate.py --model x.pth: the CLI path a reference user migrating
    their released decoder checkpoint takes (README claim)."""
    from tests._synth import build_synth_dataset
    from sat_tpu.config import Config
    from sat_tpu.data import generate_json_data

    root = str(tmp_path / "data")
    os.makedirs(root)
    build_synth_dataset(root, n_train=2, n_val=3, n_test=2, caps_per_img=2,
                        image_size=32)
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 8)
    vocab = len(json.load(open(f"{root}/word_dict.json")))

    # a reference-trained decoder for this vocab/encoder combo, on disk
    torch.manual_seed(9)
    ref = ref_decoder_mod.Decoder(vocab, 512, tf=True, ado=False, bert=False,
                                  attention=True)
    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    pth = str(model_dir / "model_vgg19_10.pth")
    torch.save(ref.state_dict(), pth)
    cfg = Config(data=root, network="vgg19", image_size=32, batch_size=4,
                 epochs=0, tf=True, attention=True, log_interval=1,
                 checkpoint_dir=str(model_dir), perform_test=False)
    cfg.save_model_config(str(model_dir / "model_config.json"))

    import evaluate
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--model", pth, "--split", "val"])
    evaluate.main()
    out = capsys.readouterr().out
    assert "Fine-tuning from base model" in out
    assert "BLEU-1" in out
