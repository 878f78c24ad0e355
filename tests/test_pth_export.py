"""Reverse `.pth` interop: a TPU-trained decoder drops back into the
reference ecosystem.

`tools/export_reference_pth.py` takes the per-epoch `.npz` checkpoint and
writes a torch state_dict the reference's
`decoder.load_state_dict(torch.load(path))` (generate_caption.py:65-69)
accepts strictly; the reference module must then beam-decode
token-identically to sat_tpu on the same weights (decoder.py:160-269).
"""

import numpy as np
import torch

from tests._reference import import_reference

from sat_tpu.compat import (decoder_params_from_state_dict,
                            state_dict_from_decoder_params)
from sat_tpu.engine.checkpoint import tree_save_npz
from sat_tpu.models import DecoderConfig, init_decoder_params
from sat_tpu.models.beam import beam_search, extract_caption

ref_decoder_mod = import_reference("decoder")

V, D, L = 40, 32, 9


def _sat_params(ado, seed=3):
    import jax
    cfg = DecoderConfig(vocab_size=V, encoder_dim=D, use_ado=ado,
                        use_attention=True)
    return cfg, init_decoder_params(jax.random.PRNGKey(seed), cfg)


def _export(tmp_path, params, name="model_vgg19_4"):
    from tools.export_reference_pth import main as export_main
    npz = str(tmp_path / f"{name}.npz")
    pth = str(tmp_path / f"{name}.pth")
    tree_save_npz(npz, params)
    export_main(["--model", npz, "--out", pth])
    return pth


def test_export_loads_strict_and_beams_identically(tmp_path):
    cfg, params = _sat_params(ado=True)
    pth = _export(tmp_path, params)

    ref = ref_decoder_mod.Decoder(V, D, tf=False, ado=True, bert=False,
                                  attention=True)
    # strict=True (the default): exported key set must match exactly
    ref.load_state_dict(torch.load(pth))
    ref.eval()

    for in_seed in (0, 1):
        feats = np.random.default_rng(in_seed).normal(
            size=(L, D)).astype(np.float32)
        ref_feats = torch.tensor(feats).unsqueeze(0).expand(3, L, D)
        with torch.no_grad():
            ref_sentence, _ = ref.caption(ref_feats, 3)
        tokens, _ = extract_caption(beam_search(params, cfg, feats, 3))
        assert tokens == ref_sentence, f"seed={in_seed}"


def test_export_no_ado_key_set_matches(tmp_path):
    """A no-ado tree exports exactly the key set a no-ado reference Decoder
    owns — strict load succeeds, and no f_h/f_z/f_out leak out."""
    _, params = _sat_params(ado=False)
    pth = _export(tmp_path, params, name="model_vgg19_noado")
    sd = torch.load(pth)
    assert not any(k.startswith(("f_h.", "f_z.", "f_out.")) for k in sd)
    ref = ref_decoder_mod.Decoder(V, D, tf=False, ado=False, bert=False,
                                  attention=True)
    ref.load_state_dict(sd)


def test_export_import_roundtrip_is_identity():
    """state_dict -> params -> state_dict reproduces every array exactly
    (transposes and gate blocks cancel)."""
    torch.manual_seed(11)
    ref = ref_decoder_mod.Decoder(V, D, tf=False, ado=True, bert=False,
                                  attention=True)
    sd0 = {k: v.numpy() for k, v in ref.state_dict().items()}
    _, template = _sat_params(ado=True)
    params = decoder_params_from_state_dict(sd0, template, strict=True)
    sd1 = state_dict_from_decoder_params(params)
    assert set(sd1) == set(sd0)
    for k in sd0:
        np.testing.assert_array_equal(sd1[k], sd0[k], err_msg=k)
