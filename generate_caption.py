#!/usr/bin/env python
"""Caption-generation CLI — the reference's generate_caption.py surface
(reference generate_caption.py:153-165) on the TPU beam-search path: encode
one image, run the fixed-shape on-device beam (sat_tpu.models.beam), render
the per-word attention grid.

Additions over the reference: `--model-config` defaults to the
model_config.json next to `--model` (the reference requires a W&B run for
local loads, generate_caption.py:35-36), `--beam-size`, `--out` for the
figure path (headless), `--encoder-weights` for ported pretrained encoder
params, and `--decode {beam,greedy,sample}` with temperature/top-k/top-p
knobs (the reference offers beam only). W&B restore is supported when the
package is installed.
"""

import argparse
import json
import os

import numpy as np


def load_model(model_path=None, model_config_path=None, wandb_run=None,
               wandb_model=None, encoder_weights=None, bert_vocab=None):
    import jax
    from sat_tpu.config import Config
    from sat_tpu.engine.checkpoint import load_decoder_checkpoint
    from sat_tpu.models.decoder import DecoderConfig, init_decoder_params
    from sat_tpu.models.encoder import init_encoder_params
    from sat_tpu.compat.torch_encoder import load_encoder_npz

    if wandb_run is not None and wandb_model is not None:
        import wandb
        wandb_run_id = wandb_run.split("/")[2]
        config_name = wandb_model.split("/")[0] + "/model_config.json"
        target = f"model/cache_wandb/{wandb_run_id}/"
        model_path = wandb.restore(name=wandb_model, run_path=wandb_run,
                                   root=target).name
        model_config_path = wandb.restore(name=config_name, run_path=wandb_run,
                                          root=target).name
    elif model_path is not None and model_config_path is None:
        candidate = os.path.join(os.path.dirname(model_path) or ".",
                                 "model_config.json")
        if os.path.exists(candidate):
            model_config_path = candidate
    if model_path is None or model_config_path is None:
        raise ValueError("Model path and config path must be provided if not "
                         "loading from wandb")

    cfg = Config.from_model_config(model_config_path)
    word_dict = None
    tokenizer = None
    if cfg.bert:
        from sat_tpu.data.bert_prep import get_bert_tokenizer
        tokenizer = get_bert_tokenizer(bert_vocab)
        vocabulary_size = 30522
    else:
        word_dict = json.load(open(cfg.data + "/word_dict.json"))
        vocabulary_size = len(word_dict)

    dcfg = DecoderConfig(vocab_size=vocabulary_size, encoder_dim=cfg.encoder_dim,
                         use_ado=cfg.ado, use_bert=cfg.bert,
                         use_attention=cfg.attention)
    rng = jax.random.PRNGKey(0)
    enc_params = init_encoder_params(rng, cfg.network)
    if encoder_weights:
        enc_params = load_encoder_npz(encoder_weights, enc_params)
    else:
        print("WARNING: no --encoder-weights given; encoder uses random "
              "init — captions will be meaningless unless the decoder was "
              "trained against the same random-init encoder (port pretrained "
              "weights with tools/port_torchvision.py)")
    dec_params = init_decoder_params(rng, dcfg)
    dec_params = load_decoder_checkpoint(model_path, dec_params, strict=False)
    return cfg, dcfg, enc_params, dec_params, word_dict, tokenizer


def decode_single_image(dcfg, dec_params, features, decode="beam",
                        beam_size=3, temperature=1.0, top_k=0, top_p=1.0,
                        seed=0):
    """Decode one image's (L, D) annotation grid with the chosen strategy.

    Returns (token_list, alphas (n, L)) shaped like beam's extract_caption:
    the list starts with the start token and its alpha row is all-ones
    (reference decoder.py:173), so the attention grid renders identically
    for every decode mode.
    """
    import jax
    import numpy as np
    from sat_tpu.models import beam as beam_mod

    if decode == "beam":
        result = jax.jit(
            lambda p, f: beam_mod.beam_search(p, dcfg, f, beam_size),
        )(dec_params, features)
        return beam_mod.extract_caption(result)

    feats_b = features[None]
    if decode == "greedy":
        toks, lengths, alphas = jax.jit(
            lambda p, f: beam_mod.greedy_caption(p, dcfg, f, with_alphas=True),
        )(dec_params, feats_b)
    elif decode == "sample":
        toks, lengths, alphas = jax.jit(
            lambda p, f, r: beam_mod.sample_caption(
                p, dcfg, f, r, temperature=temperature, top_k=top_k,
                top_p=top_p, with_alphas=True),
        )(dec_params, feats_b, jax.random.PRNGKey(seed))
    else:
        raise ValueError(f"unknown decode mode {decode!r}")
    toks = np.asarray(toks[0])
    alphas = np.asarray(alphas[0])
    n_incl = min(int(lengths[0]) + 1, toks.shape[0])  # include the stop token
    sentence = [dcfg.start_token] + toks[:n_incl].tolist()
    alpha = np.concatenate(
        [np.ones((1, alphas.shape[1]), alphas.dtype), alphas[:n_incl]])
    return sentence, alpha


def generate_caption_visualization(img_path, cfg, dcfg, enc_params, dec_params,
                                   word_dict, tokenizer, beam_size=3,
                                   smooth=True, out_path=None, decode="beam",
                                   temperature=1.0, top_k=0, top_p=1.0,
                                   seed=0):
    from sat_tpu.data.transforms import load_and_preprocess_image, pil_loader
    from sat_tpu.models.encoder import encoder_forward
    from sat_tpu.utils.viz import save_caption_grid

    img = load_and_preprocess_image(img_path, cfg.image_size)[None]  # (1, S, S, 3)
    features = encoder_forward(enc_params, cfg.network, img)[0]
    sentence, alpha = decode_single_image(
        dcfg, dec_params, features, decode=decode, beam_size=beam_size,
        temperature=temperature, top_k=top_k, top_p=top_p, seed=seed)

    if cfg.bert:
        sentence_tokens = tokenizer.decode(sentence,
                                           skip_special_tokens=False).split()
    else:
        token_dict = {idx: word for word, idx in word_dict.items()}
        sentence_tokens = []
        for word_idx in sentence:
            sentence_tokens.append(token_dict[word_idx])
            if word_idx == word_dict["<eos>"]:
                break

    print("Caption:", " ".join(sentence_tokens))

    # Display image: 256-short-side resize + center 224 crop
    # (reference generate_caption.py:104-115).
    from PIL import Image
    pimg = pil_loader(img_path)
    w, h = pimg.size
    if w > h:
        w, h = int(w * 256 / h), 256
    else:
        w, h = 256, int(h * 256 / w)
    left, top = (w - 224) / 2, (h - 224) / 2
    resized = pimg.resize((w, h), Image.BICUBIC).crop(
        (left, top, left + 224, top + 224))
    disp = np.asarray(resized.convert("RGB"), dtype=np.float32) / 255.0

    out_path = out_path or "caption_visualization.png"
    save_caption_grid(out_path, disp, sentence_tokens, alpha, cfg.grid_side,
                      smooth=smooth)
    print(f"Saved attention visualization to {out_path}")
    return sentence_tokens, alpha


def main():
    from sat_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser(
        description="Show, Attend and Tell Caption Generator")
    parser.add_argument("--img-path", type=str, help="path to image")
    parser.add_argument("--model", type=str, help="path to model parameters")
    parser.add_argument("--model-config", type=str, default=None,
                        help="path to model_config.json (default: next to --model)")
    parser.add_argument("--wandb-run", type=str, help="wandb run path", default=None)
    parser.add_argument("--wandb-model", type=str, help="wandb model path", default=None)
    parser.add_argument("--beam-size", type=int, default=3)
    parser.add_argument("--decode", choices=["beam", "greedy", "sample"],
                        default="beam",
                        help="decoding strategy (default: beam, reference "
                             "parity; greedy = argmax fast path; sample = "
                             "temperature/top-k/top-p)")
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="sampling temperature (--decode sample)")
    parser.add_argument("--top-k", type=int, default=0,
                        help="top-k truncation, 0 = off (--decode sample)")
    parser.add_argument("--top-p", type=float, default=1.0,
                        help="nucleus mass, 1.0 = off (--decode sample)")
    parser.add_argument("--sample-seed", type=int, default=0,
                        help="PRNG seed for --decode sample")
    parser.add_argument("--out", type=str, default=None,
                        help="output path for the attention figure")
    parser.add_argument("--encoder-weights", type=str, default=None,
                        help="ported pretrained encoder .npz")
    parser.add_argument("--bert-vocab", type=str, default=None,
                        help="local bert vocab.txt (offline tokenizer)")
    args = parser.parse_args()

    cfg, dcfg, enc_params, dec_params, word_dict, tokenizer = load_model(
        args.model, args.model_config, args.wandb_run, args.wandb_model,
        args.encoder_weights, args.bert_vocab)
    generate_caption_visualization(args.img_path, cfg, dcfg, enc_params,
                                   dec_params, word_dict, tokenizer,
                                   beam_size=args.beam_size, out_path=args.out,
                                   decode=args.decode,
                                   temperature=args.temperature,
                                   top_k=args.top_k, top_p=args.top_p,
                                   seed=args.sample_seed)


if __name__ == "__main__":
    main()
