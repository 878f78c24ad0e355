#!/usr/bin/env python
"""Batched beam-search captioning of a whole dataset split.

The serving-scale decode path: every batch of images runs image->encoder->
batched fixed-shape beam as one jitted TPU program
(sat_tpu.models.beam.beam_search_batched); the reference can only caption
one image per Python loop (generate_caption.py). Device and host are
software-pipelined over JAX async dispatch (--pipeline-depth, default 2):
while the TPU computes batch N, the host D2H-transfers, token-decodes and
JSONL-writes batch N-1, so neither side idles. Writes one JSON object per
image (path, caption tokens, raw beam score) and reports free-running
corpus BLEU-1..4 against the split's reference captions plus wall-clock
e2e throughput (loader + device + postproc).

    python caption_split.py --model model/model_vgg19_8.npz \
        --split test --beam-size 5 --batch-size 64 --out captions.jsonl
"""

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Batched split captioning")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--model-config", type=str, default=None)
    parser.add_argument("--split", choices=["train", "val", "test"],
                        default="test")
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--decode", choices=["beam", "greedy", "sample"],
                        default="beam",
                        help="decoding strategy (default: beam)")
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="sampling temperature (--decode sample)")
    parser.add_argument("--top-k", type=int, default=0,
                        help="top-k truncation, 0 = off (--decode sample)")
    parser.add_argument("--top-p", type=float, default=1.0,
                        help="nucleus mass, 1.0 = off (--decode sample)")
    parser.add_argument("--sample-seed", type=int, default=0,
                        help="PRNG seed for --decode sample")
    parser.add_argument("--fast-topk", action="store_true", default=False,
                        help="use the TPU-optimized approximate top-k in "
                             "beam search (~1.3x decode; near-ties may "
                             "pick a different beam than the reference)")
    parser.add_argument("--pallas-topk", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="exact Pallas top-k selection kernel in the "
                             "beam (token-identical to lax.top_k; measured "
                             "1.085x on v5e). Default: ON unless "
                             "--fast-topk; --no-pallas-topk forces the "
                             "lax formulation (A/B: tools/bench_topk.py)")
    parser.add_argument("--bf16-decode", action="store_true", default=False,
                        help="store the annotation grid + attention keys "
                             "in bfloat16 during beam search (~1.14x "
                             "decode; scores stay f32; captions matched "
                             "f32 on every tested image but bit parity is "
                             "not guaranteed)")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--mesh-data", type=int, default=1,
                        help="data-parallel serving: shard each batch over "
                             "this many devices (0 = all available). "
                             "Batches are padded to divide the mesh and "
                             "trimmed after decode; results are identical "
                             "to single-device serving")
    parser.add_argument("--pipeline-depth", type=int, default=2,
                        help="in-flight device batches; the host "
                             "post-processes batch N-1 (D2H, token decode, "
                             "JSONL) while the device computes batch N. "
                             "1 = the old fully-synchronous loop")
    parser.add_argument("--fraction", type=float, default=1.0)
    parser.add_argument("--out", type=str, default=None,
                        help="JSONL output path (default: stdout summary only)")
    parser.add_argument("--encoder-weights", type=str, default=None)
    parser.add_argument("--bert-vocab", type=str, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from sat_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    from generate_caption import load_model
    from sat_tpu.data import CaptionDataset, BatchLoader
    from sat_tpu.engine.evaluate import (build_token_dict, compute_bleu,
                                         decode_caption, decode_caption_bert)
    from sat_tpu.models.beam import (beam_search_batched, extract_caption,
                                     greedy_caption, sample_caption)
    from sat_tpu.models.encoder import encoder_forward

    cfg, dcfg, enc_params, dec_params, word_dict, tokenizer = load_model(
        args.model, args.model_config, encoder_weights=args.encoder_weights,
        bert_vocab=args.bert_vocab)

    ds = CaptionDataset(cfg.data, args.split, fraction=args.fraction,
                        bert=cfg.bert, image_size=cfg.image_size)
    loader = BatchLoader(ds, args.batch_size, shuffle=False)
    token_dict = build_token_dict(word_dict) if word_dict else None

    def decode(tokens):
        if cfg.bert:
            return decode_caption_bert(tokens, tokenizer)
        return decode_caption(tokens, word_dict, token_dict)

    rng = jax.random.PRNGKey(args.sample_seed)

    # Data-parallel serving: params replicated, batch dim sharded over the
    # mesh's data axis; XLA partitions the whole image->encoder->beam
    # program (no collectives needed — decode is row-independent). Host
    # batches are padded by repeating the last row so they divide the mesh,
    # and trimmed back after decode (n_batch below stays the real count).
    mesh = None
    pad_to = 1
    if args.mesh_data != 1:
        from sat_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                           replicated)
        mesh = make_mesh(n_data=args.mesh_data, n_model=1)
        pad_to = mesh.shape["data"]
        rep = replicated(mesh)
        enc_params = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, enc_params), rep)
        dec_params = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, dec_params), rep)
        img_sharding = batch_sharding(mesh)

    def put_imgs(imgs):
        if mesh is None:
            return imgs
        n = imgs.shape[0]
        if n % pad_to:
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], pad_to - n % pad_to, axis=0)])
        return jax.device_put(imgs, img_sharding)

    @jax.jit
    def caption_batch(e, d, imgs, r):
        feats = encoder_forward(e, cfg.network, imgs)
        if args.decode == "beam":
            return beam_search_batched(d, dcfg, feats, args.beam_size,
                                       fast_topk=args.fast_topk,
                                       pallas_topk=args.pallas_topk,
                                       bf16=args.bf16_decode,
                                       mesh_data=max(pad_to, 1))
        if args.decode == "greedy":
            return greedy_caption(d, dcfg, feats)
        return sample_caption(d, dcfg, feats, r,
                              temperature=args.temperature,
                              top_k=args.top_k, top_p=args.top_p)

    out_f = open(args.out, "w") if args.out else None
    hypotheses, all_refs = [], []
    n_imgs = 0
    row = 0

    def drain(pending_item):
        """Host half of the pipeline: D2H the finished batch and decode it.
        np.asarray is the sync point (block_until_ready can return early on
        the axon plugin); one transfer per field, then index in numpy —
        per-image device slicing would issue ~8*B tiny transfers over the
        tunnel."""
        nonlocal n_imgs, row
        n_batch, all_captions, result = pending_item
        result = jax.tree_util.tree_map(np.asarray, result)
        n_imgs += n_batch
        for i in range(n_batch):
            res_i = jax.tree_util.tree_map(lambda x: x[i], result)
            if args.decode == "beam":
                tokens, _ = extract_caption(res_i)
                extra = {"score": float(res_i.score),
                         "completed": bool(res_i.found)}
            else:
                toks, length = res_i
                n_incl = min(int(length) + 1, toks.shape[0])
                tokens = [dcfg.start_token] + toks[:n_incl].tolist()
                extra = {"completed": int(length) < toks.shape[0]}
            words = decode(tokens)
            hypotheses.append(words)
            all_refs.append([decode(c) for c in all_captions[i].tolist()])
            if out_f:
                out_f.write(json.dumps({
                    "img_path": ds.img_paths[row],
                    "caption": " ".join(words), **extra}) + "\n")
            row += 1

    # Software pipeline over JAX async dispatch: the jitted call returns
    # futures immediately, so up to --pipeline-depth batches are in flight
    # on the device while the host decodes tokens / writes JSONL for the
    # oldest one. Throughput is wall-clock over the whole loop (per-batch
    # device timing is meaningless once batches overlap).
    from collections import deque
    pending = deque()
    depth = max(1, args.pipeline_depth)
    t0 = time.perf_counter()
    for batch_idx, (imgs, _, all_captions) in enumerate(loader.epoch(0)):
        step_rng = jax.random.fold_in(rng, batch_idx)
        pending.append((len(imgs), all_captions,
                        caption_batch(enc_params, dec_params,
                                      put_imgs(imgs), step_rng)))
        if len(pending) >= depth:
            drain(pending.popleft())
    while pending:
        drain(pending.popleft())
    t_total = time.perf_counter() - t0
    if out_f:
        out_f.close()

    bleu = compute_bleu(all_refs, hypotheses)
    print(json.dumps({
        "split": args.split, "images": n_imgs,
        "decode": args.decode, "beam_size": args.beam_size,
        "captions_per_sec": round(n_imgs / max(t_total, 1e-9), 2),
        **{k: round(v, 4) for k, v in bleu.items()},
    }))


if __name__ == "__main__":
    main()
