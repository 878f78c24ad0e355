#!/usr/bin/env python
"""Standalone evaluation CLI: run the val or test pass (teacher-forced loss,
top-1/5 accuracy, BLEU-1..4, optional attention visualizations) on a saved
checkpoint without training.

The reference can only evaluate as a side effect of train.py; this exposes
the same `run_evaluation` machinery (identical metrics and quirks) directly:

    python evaluate.py --model model/model_vgg19_8.npz --split test
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="Evaluate a checkpoint")
    parser.add_argument("--model", type=str, required=True,
                        help="decoder checkpoint (.npz or reference .pth)")
    parser.add_argument("--model-config", type=str, default=None,
                        help="model_config.json (default: next to --model)")
    parser.add_argument("--split", choices=["val", "test"], default="val")
    parser.add_argument("--fraction", type=float, default=1.0)
    parser.add_argument("--batch-size", type=int, default=None,
                        help="override the config's batch size")
    parser.add_argument("--encoder-weights", type=str, default=None)
    parser.add_argument("--bert-vocab", type=str, default=None)
    parser.add_argument("--cache-features", action="store_true", default=False)
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="blocked validation: K eval batches per jitted "
                             "dispatch (needs --cache-features; identical "
                             "results, K-fold fewer host round trips)")
    parser.add_argument("--feature-cache-dir", type=str, default="",
                        help="persist/reuse precomputed encoder features")
    args = parser.parse_args()

    from sat_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()

    import os
    from sat_tpu.config import Config
    from sat_tpu.engine.loop import Trainer

    config_path = args.model_config or os.path.join(
        os.path.dirname(args.model) or ".", "model_config.json")
    overrides = dict(model=args.model, fraction=args.fraction,
                     perform_test=False, resume=False)
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.encoder_weights:
        overrides["encoder_weights"] = args.encoder_weights
    if args.bert_vocab:
        overrides["bert_vocab"] = args.bert_vocab
    if args.cache_features:
        overrides["cache_features"] = True
    if args.steps_per_dispatch > 1:
        overrides["steps_per_dispatch"] = args.steps_per_dispatch
    if args.feature_cache_dir:
        overrides["feature_cache_dir"] = args.feature_cache_dir
    cfg = Config.from_model_config(config_path, **overrides)

    trainer = Trainer(cfg)
    if args.split == "val":
        trainer.validate(epoch=0)
    else:
        trainer.test(epoch=0)


if __name__ == "__main__":
    main()
