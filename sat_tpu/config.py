"""Configuration for training and inference.

The dataclass mirrors the reference's argparse surface (reference
train.py:438-472) field-for-field so that `vars(args)`-style persistence to
`model_config.json` stays byte-compatible (reference train.py:108-109), while
adding TPU-framework knobs (mesh shape, precision, checkpoint dir) that the
reference lacks. New knobs are excluded from the parity JSON.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Optional

# Fields that exist in the reference's argparse namespace, in its order
# (train.py:440-470). model_config.json must contain exactly these keys.
_REFERENCE_FIELDS = (
    "batch_size",
    "epochs",
    "lr",
    "step_size",
    "alpha_c",
    "perform_test",
    "seed",
    "log_interval",
    "data",
    "network",
    "model",
    "tf",
    "ado",
    "fraction",
    "bert",
    "attention",
)

ENCODER_DIMS = {
    # Annotation-vector dim per encoder backbone (reference encoder.py:17,22,27).
    # NOTE: the reference hardcodes 1920 for densenet161, but torchvision's
    # densenet161 actually emits 2208 channels before norm5 — the reference's
    # densenet path is broken at runtime; we use the correct value.
    "vgg19": 512,
    "resnet152": 2048,
    "densenet161": 2208,
}

ENCODER_GRID = {
    # Spatial grid side for a 224x224 input (reference generate_caption.py:137-140).
    "vgg19": 14,
    "resnet152": 7,
    "densenet161": 7,
}


@dataclass
class Config:
    # --- reference-parity fields (train.py:438-472) ---
    batch_size: int = 64
    epochs: int = 10
    lr: float = 1e-4
    step_size: int = 5           # StepLR epoch interval (gamma fixed at 0.1)
    alpha_c: float = 1.0         # doubly-stochastic attention reg constant
    perform_test: bool = True
    seed: int = 42
    log_interval: int = 100
    data: str = "data/coco"
    network: str = "vgg19"       # vgg19 | resnet152 | densenet161
    model: Optional[str] = None  # warm-start checkpoint path
    tf: bool = False             # teacher forcing
    ado: bool = False            # advanced deep output
    fraction: float = 1.0
    bert: bool = False           # frozen BERT input embeddings
    attention: bool = False      # soft attention on/off

    # --- TPU-framework extensions (not in model_config.json) ---
    mesh_data: int = 0           # 0 = all visible devices on the data axis
    mesh_model: int = 1          # model-axis size (vocab-sharded output head)
    bf16_encoder: bool = False   # run encoder convs in bfloat16
    checkpoint_dir: str = "model"
    resume: bool = False         # auto-resume from latest orbax checkpoint
    bert_embeddings: Optional[str] = None  # .npy with the frozen 30522x768 table
    bert_vocab: Optional[str] = None       # local bert vocab.txt (offline tokenizer)
    encoder_weights: Optional[str] = None  # ported pretrained encoder params (.npz)
    log_jsonl: Optional[str] = None        # JSONL metrics sink
    wandb: bool = False          # enable W&B backend when the package exists
    debug_nans: bool = False     # jax_debug_nans toggle
    profile_dir: Optional[str] = None      # jax.profiler trace output dir
    image_size: int = 224        # input resolution (224 = reference parity)
    cache_features: bool = False # precompute frozen-encoder annotation grids
                                 # once per unique image; numerically
                                 # identical (encoder is frozen + eval mode),
                                 # epochs then cost decoder-only FLOPs
    fused_attention: bool = False  # Pallas fused attention (fwd + custom VJP)
    feature_bank_hbm_gb: float = 6.0  # keep the feature cache in HBM when
                                      # it fits under this budget
    fast_metrics: bool = False   # sync train metrics to host only at
                                 # log-interval batches (reference syncs
                                 # every batch via .item(); that costs
                                 # ~1-3ms/step over the tunnel)
    rep_penalty_beta: float = 0.0  # weight of the reference's dormant
                                   # repetition penalty (train.py:156-159,
                                   # 357-384); 0.0 = reference parity (off)
    dropout_rate: float = 0.5      # decoder output-head dropout rate
                                   # (reference decoder.py:39 nn.Dropout()
                                   # default p=0.5); 0.0 makes the train
                                   # step deterministic — the two
                                   # frameworks draw different dropout
                                   # masks, so cross-framework parity runs
                                   # (tests/test_eval_parity.py) disable it
    bf16_attention: bool = False   # bf16 attention tanh intermediate:
                                   # halves the dominant saved-activation
                                   # HBM traffic of the training backward
                                   # pass; off = exact f32 parity
    remat_scan: bool = True        # jax.checkpoint on the decoder scan
                                   # body: the backward pass recomputes the
                                   # (B, L, E) attention intermediates
                                   # instead of storing them — removes the
                                   # dominant saved-activation HBM traffic
                                   # entirely (vs halving it with
                                   # --bf16-attention); identical numerics.
                                   # DEFAULT ON: measured 2.445x (f32) /
                                   # 1.068x (bf16) same-process A/B,
                                   # 2026-08-19 harvest; --no-remat-scan
                                   # restores the saved-residual baseline
    bank_dtype: str = "float32"    # HBM feature-bank storage dtype
                                   # ("float32" | "bfloat16"); bfloat16
                                   # halves bank residency + gather traffic
                                   # (features are cast back to f32 after
                                   # the per-step gather)
    steps_per_dispatch: int = 1    # bank-mode training: scan K optimizer
                                   # steps inside ONE jitted dispatch
                                   # (amortizes host round trips K-fold;
                                   # bit-identical numerics/meters/stdout).
                                   # 1 = per-batch dispatch, and the only
                                   # mode available off the feature bank
    feature_cache_dir: str = ""    # persist precomputed frozen-encoder
                                   # features to disk, keyed by (network,
                                   # image size, encoder-weights source,
                                   # dataset, split, fraction); reruns
                                   # skip the whole encoder precompute
                                   # pass ("" = recompute every run)
    keep_checkpoints: int = 0      # keep only the newest N orbax
                                   # train-state checkpoints (0 = keep all,
                                   # the reference-like default); decoder
                                   # .npz per-epoch files are never pruned
    image_cache_gb: float = 8.0    # host-RAM budget for the decoded-image
                                   # cache (cap-and-stop; Flickr8k f32 is
                                   # ~4.8 GB and fits, COCO ~68 GB does not
                                   # — use --cache-features there); 0
                                   # disables caching entirely

    @property
    def encoder_dim(self) -> int:
        return ENCODER_DIMS[self.network]

    @property
    def grid_side(self) -> int:
        # VGG19 keeps stride 16 (last pool dropped); ResNet/DenseNet stride 32.
        stride = 16 if self.network == "vgg19" else 32
        return self.image_size // stride

    @property
    def num_annotations(self) -> int:
        return self.grid_side * self.grid_side

    @property
    def embedding_size(self) -> int:
        from sat_tpu import constants
        return constants.BERT_HIDDEN_SIZE if self.bert else 512

    def reference_dict(self) -> dict:
        """The reference-compatible argparse namespace as a dict.

        Matches `vars(args)` of the reference CLI so that model_config.json
        written by us is loadable by reference tooling and vice versa
        (reference train.py:108-109, generate_caption.py:38-46).
        """
        return {k: getattr(self, k) for k in _REFERENCE_FIELDS}

    def save_model_config(self, path: str) -> None:
        """Write the byte-compatible reference model_config.json, plus a
        `sat_config.json` sidecar carrying the TPU-framework extension
        fields (image_size etc.) so checkpoints trained at non-default
        settings reload faithfully."""
        with open(path, "w") as f:
            json.dump(self.reference_dict(), f)
        sidecar = os.path.join(os.path.dirname(path) or ".", "sat_config.json")
        extensions = {k: v for k, v in dataclasses.asdict(self).items()
                      if k not in _REFERENCE_FIELDS}
        with open(sidecar, "w") as f:
            json.dump(extensions, f)

    @classmethod
    def from_model_config(cls, path: str, **overrides) -> "Config":
        with open(path) as f:
            raw = json.load(f)
        sidecar = os.path.join(os.path.dirname(path) or ".", "sat_config.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                raw.update(json.load(f))
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in known}
        kwargs.update(overrides)
        return cls(**kwargs)


def build_arg_parser() -> argparse.ArgumentParser:
    """Argparse surface identical to the reference (train.py:438-472).

    argparse prefix matching makes `--frac` work as an abbreviation of
    `--fraction`, which train_models.py and the README rely on.
    """
    parser = argparse.ArgumentParser(description="Show, Attend and Tell")
    parser.add_argument("--batch-size", type=int, default=64, metavar="N",
                        help="batch size for training (default: 64)")
    parser.add_argument("--epochs", type=int, default=10, metavar="E",
                        help="number of epochs to train for (default: 10)")
    parser.add_argument("--lr", type=float, default=1e-4, metavar="LR",
                        help="learning rate of the decoder (default: 1e-4)")
    parser.add_argument("--step-size", type=int, default=5,
                        help="step size for learning rate annealing (default: 5)")
    parser.add_argument("--alpha-c", type=float, default=1, metavar="A",
                        help="regularization constant (default: 1)")
    parser.add_argument("--perform-test", action="store_true", default=True,
                        help="run the test split after training (default: True)")
    parser.add_argument("--seed", type=int, default=42, metavar="S",
                        help="random seed (default: 42)")
    parser.add_argument("--log-interval", type=int, default=100, metavar="L",
                        help="batches between logged training stats (default: 100)")
    parser.add_argument("--data", type=str, default="data/coco",
                        help="path to data images (default: data/coco)")
    parser.add_argument("--network", choices=["vgg19", "resnet152", "densenet161"],
                        default="vgg19",
                        help="network to use in the encoder (default: vgg19)")
    parser.add_argument("--model", type=str, help="path to model")
    parser.add_argument("--tf", action="store_true", default=False,
                        help="use teacher forcing when training LSTM (default: False)")
    parser.add_argument("--ado", action="store_true", default=False,
                        help="use advanced deep output (default: False)")
    parser.add_argument("--fraction", type=float, default=1.0, metavar="F",
                        help="fraction of dataset to use (default: 1.0)")
    parser.add_argument("--bert", action="store_true", default=False,
                        help="use bert for word embeddings (default: False)")
    parser.add_argument("--attention", action="store_true", default=False,
                        help="use attention (default: False)")
    # --- TPU-framework extensions ---
    parser.add_argument("--mesh-data", type=int, default=0,
                        help="data-parallel mesh axis size (0 = all devices)")
    parser.add_argument("--mesh-model", type=int, default=1,
                        help="model-parallel mesh axis size (vocab sharding)")
    parser.add_argument("--bf16-encoder", action="store_true", default=False,
                        help="run encoder convolutions in bfloat16")
    parser.add_argument("--checkpoint-dir", type=str, default="model",
                        help="directory for checkpoints + model_config.json")
    parser.add_argument("--resume", action="store_true", default=False,
                        help="resume from the latest checkpoint in checkpoint-dir")
    parser.add_argument("--bert-embeddings", type=str, default=None,
                        help=".npy file with the frozen BERT embedding table")
    parser.add_argument("--bert-vocab", type=str, default=None,
                        help="local bert-base-uncased vocab.txt (offline)")
    parser.add_argument("--cache-features", action="store_true", default=False,
                        help="precompute frozen-encoder features once per "
                             "image; identical numerics, much faster epochs")
    parser.add_argument("--image-size", type=int, default=224,
                        help="input resolution (224 = reference parity)")
    parser.add_argument("--fused-attention", action="store_true", default=False,
                        help="use the Pallas fused attention kernels "
                             "(custom VJP; ~7%% faster decoder grad on v5e)")
    parser.add_argument("--feature-bank-hbm-gb", type=float, default=6.0,
                        help="HBM budget for the resident feature bank "
                             "(cache-features mode)")
    parser.add_argument("--dropout-rate", type=float, default=0.5,
                        help="decoder output-head dropout (reference "
                             "decoder.py nn.Dropout() p=0.5); 0 disables")
    parser.add_argument("--fast-metrics", action="store_true", default=False,
                        help="sync train metrics only at log-interval "
                             "batches (default: every batch, like the "
                             "reference)")
    parser.add_argument("--rep-penalty-beta", type=float, default=0.0,
                        help="weight of the repetition penalty loss term "
                             "(the reference's dormant train.py:357-384; "
                             "default 0.0 = off, reference parity)")
    parser.add_argument("--bf16-attention", action="store_true", default=False,
                        help="compute the attention tanh intermediate in "
                             "bfloat16 (halves backward-pass activation "
                             "traffic; default off = exact f32 numerics). "
                             "Only useful WITH --no-remat-scan: under the "
                             "remat default nothing is saved to HBM, and "
                             "the casts measured 2x SLOWER (same-process "
                             "A/B, 2026-08-19: 1.143x no-remat, 0.499x "
                             "remat)")
    parser.add_argument("--remat-scan", action="store_true", default=True,
                        help="rematerialize the decoder scan body: the "
                             "backward pass recomputes attention "
                             "intermediates instead of saving them to HBM "
                             "(identical numerics, different memory/"
                             "traffic schedule). DEFAULT ON — measured "
                             "2.445x (f32) / 1.068x (bf16) train grad "
                             "same-process A/B on v5e")
    parser.add_argument("--no-remat-scan", action="store_false",
                        dest="remat_scan",
                        help="disable scan-body rematerialization (the "
                             "saved-residual A/B baseline path)")
    parser.add_argument("--bank-dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="HBM feature-bank storage dtype; bfloat16 "
                             "halves bank residency and gather traffic "
                             "(default float32 = exact numerics)")
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="bank-mode training: K optimizer steps per "
                             "jitted dispatch (lax.scan); bit-identical "
                             "numerics, K-fold fewer host round trips "
                             "(default 1; needs --cache-features with the "
                             "bank resident in HBM)")
    parser.add_argument("--feature-cache-dir", type=str, default="",
                        help="persist precomputed frozen-encoder features "
                             "to this directory (keyed by network/size/"
                             "weights/dataset/split); reruns skip the "
                             "encoder precompute pass entirely")
    parser.add_argument("--keep-checkpoints", type=int, default=0,
                        help="prune orbax train-state checkpoints beyond "
                             "the newest N (0 = keep all)")
    parser.add_argument("--image-cache-gb", type=float, default=8.0,
                        help="host-RAM budget for the decoded-image cache "
                             "(cap-and-stop; 0 disables caching — for "
                             "COCO-scale data prefer --cache-features)")
    parser.add_argument("--encoder-weights", type=str, default=None,
                        help=".npz with ported pretrained encoder params")
    parser.add_argument("--log-jsonl", type=str, default=None,
                        help="write metrics to this JSONL file")
    parser.add_argument("--wandb", action="store_true", default=False,
                        help="log to Weights & Biases if installed")
    parser.add_argument("--debug-nans", action="store_true", default=False,
                        help="enable jax_debug_nans")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace into this directory")
    return parser


def config_from_args(args: argparse.Namespace) -> Config:
    return Config(**vars(args))
