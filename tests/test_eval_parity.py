"""Full-pipeline parity capstone (VERDICT r3 next #2 / missing #2).

Drives the reference's ACTUAL ``train()`` and ``run_evaluation()``
(/root/reference/train.py:119-192, 198-347, imported read-only) for two
epochs on a tiny synthetic dataset, and this framework's full engine
(``run_training`` -> Trainer.fit, engine/loop.py) on the SAME data with
transferred init, then asserts the composed seam no other test pins as one
number: the per-epoch train/val/test meter averages (loss / top-1 / top-5,
caption-length weighted, train.py:180-187) and the BLEU-1..4 line produced
by decode-to-words -> swapped-argument ``corpus_bleu``
(train.py:249-299, 330-333). Supersedes test_engine's ``0 <= bleu1 <= 1``
bound.

Parameterized over `ado`:
 - ado=False (simple deep output): final logits are a plain linear head,
   continuous everywhere -> ALL meters and BLEU must match tightly.
 - ado=True (the flagship --ado flag): the reference's
   ``advanced_deep_output`` returns ``relu(f_out(...))`` (decoder.py:158)
   — the FINAL LOGITS are ReLU-clamped, so roughly half the vocabulary
   ties at exactly 0.0 at every position (measured here: the 5th-6th
   logit gap is exactly 0.0 in most batches). Top-5 membership inside the
   zero tie-class is arbitrary tie-breaking — torch.topk's tie order is
   unspecified while lax.top_k picks lower indices — so top-5 "accuracy"
   is not a well-defined quantity on this head at all: whenever the
   target sits in the zero class its top-5 membership is a coin flip
   decided by tie order (measured here: up to ~2 flips ≈ 9 points on a
   24-token batch). The ado assertions therefore pin loss / top-1 / BLEU
   tightly (argmax ties break toward the lowest index in BOTH
   frameworks) and only range-check top-5; the simple-output
   parameterization is where top-5 parity is provable — and proven.

Setup shared by both sides:
 - one torch-random-init VGG19 double (tests/test_encoder.py's torchvision
   shape), exported to our side via compat.torch_encoder — the conv-stack
   numerical equivalence itself is covered by the encoder goldens;
 - one torch-init decoder state_dict, loaded on our side through the same
   ``--model`` .pth path users take (compat.torch_decoder);
 - identical batch ORDER everywhere, train AND eval: the reference
   DataLoader replays our BatchLoader's deterministic (seed, epoch)
   permutation via a batch_sampler. Eval order matters because the
   reference weights its meters by non-special caption length while the
   accuracy/loss ratios are normalized by OTHER denominators (non-pad
   tokens / packed length), so the weighted average of per-batch ratios
   depends on the batch PARTITION, not just the row set;
 - dropout disabled on both sides (the frameworks draw different masks).

The reference module needs three environment shims, installed here without
touching its code: a torchvision.transforms stub (import-time only — its
``data_transforms`` is unused, we pass our own transform), a wandb stub
that records ``wandb.log`` payloads (our metric capture), and a torch
proxy in the module's globals that rewrites the hardcoded
``device='mps'`` tensor constructions (train.py:178, 242) to CPU.
"""

import json
import sys
import types

import numpy as np
import pytest

# Heavy tier (two engines x two epochs of VGG19 on CPU); deselect with
# -m "not heavy".
pytestmark = pytest.mark.heavy
import torch
import torch.nn as nn
from torch.utils.data import DataLoader

from tests._reference import import_reference
from tests._synth import build_synth_dataset
from tests.test_encoder import build_torch_vgg19_features

from sat_tpu.config import Config
from sat_tpu.data import generate_json_data
from sat_tpu.data.transforms import preprocess_pil

SEED = 7
BS = 4
EPOCHS = 2
LR = 1e-3
ALPHA_C = 1.0
IMG = 32


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")

    class _T:                              # accepts and ignores any config
        def __init__(self, *a, **k):
            pass

    tvt.Compose = lambda ts: (lambda x: x)
    tvt.Resize = tvt.ToTensor = tvt.Normalize = _T
    tv.transforms = tvt
    # reference encoder.py:2-3 imports the model constructors at module
    # level; never called here (we pass our own encoder double to train())
    tvm = types.ModuleType("torchvision.models")
    tvm.vgg19 = tvm.resnet152 = tvm.densenet161 = _T
    tvm.VGG19_Weights = _T
    tv.models = tvm
    tv.__path__ = []           # make the stub importable as a package
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.models"] = tvm


class _WandbTable:
    def __init__(self, columns=None):
        self.rows = []

    def add_data(self, *row):
        self.rows.append(row)


class _TorchProxy:
    """Stands in for ``torch`` inside the reference train module: train()
    and run_evaluation() build their special-token tensors with a hardcoded
    ``device='mps'`` (train.py:178, 242); everything else passes through."""

    def __getattr__(self, name):
        return getattr(torch, name)

    def tensor(self, *a, **k):
        if k.get("device") == "mps":
            k["device"] = "cpu"
        return torch.tensor(*a, **k)


class _RefEncoderDouble(nn.Module):
    """The reference Encoder's forward contract (encoder.py:33-40) around
    the torch VGG19 double: (B,C,H,W) -> (B, H*W, C) annotation grid."""

    def __init__(self, net):
        super().__init__()
        self.net = net
        for p in self.parameters():      # frozen, like encoder.py:29-31
            p.requires_grad_(False)

    def forward(self, x):
        x = self.net(x)
        x = x.permute(0, 2, 3, 1)
        return x.reshape(x.size(0), -1, x.size(-1))


def _ref_transform(img):
    """Exactly our loader's preprocessing (sat_tpu.data.transforms), CHW
    for torch."""
    arr = preprocess_pil(img, IMG)
    return torch.from_numpy(arr).permute(2, 0, 1).contiguous()


def _batch_order(epoch, n):
    """Replay BatchLoader._epoch_indices on the reference side (same
    (seed, epoch)-keyed permutation, same contiguous batch splits).
    Trainer drives train AND val loaders with the running epoch number,
    and the test pass with the final epoch."""
    order = np.random.default_rng((SEED, epoch)).permutation(n)
    return [order[i:i + BS].tolist() for i in range(0, n, BS)]


def _assert_close(ado, key, got, want):
    if ado and "top5" in key:
        # ill-defined under the ado head's exact zero ties (module
        # docstring); both sides must at least be valid percentages
        assert 0.0 <= got <= 100.0 and 0.0 <= want <= 100.0, key
    else:
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                   err_msg=key)


@pytest.fixture(scope="module", params=[False, True],
                ids=["simple-output", "ado"])
def parity_runs(request, tmp_path_factory):
    ado = request.param
    tmp = tmp_path_factory.mktemp("eval_parity")
    root = str(tmp / "data")
    build_synth_dataset(root, n_train=8, n_val=4, n_test=4, caps_per_img=2,
                        image_size=IMG)
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 10)
    word_dict = json.load(open(f"{root}/word_dict.json"))

    # ---- shared init ----
    torch.manual_seed(0)
    vgg = build_torch_vgg19_features()
    enc_npz = str(tmp / "encoder.npz")
    from sat_tpu.compat.torch_encoder import (encoder_params_from_state_dict,
                                              save_encoder_npz)
    save_encoder_npz(enc_npz,
                     encoder_params_from_state_dict("vgg19", vgg.state_dict()))

    ref_decoder_mod = import_reference("decoder")
    torch.manual_seed(1)
    ref_dec = ref_decoder_mod.Decoder(len(word_dict), 512, tf=True, ado=ado,
                                      bert=False, attention=True)
    ref_dec.dropout = nn.Identity()
    dec_pth = str(tmp / "decoder_init.pth")
    torch.save(ref_dec.state_dict(), dec_pth)

    # ---- our run ----
    jsonl = str(tmp / "ours.jsonl")
    cfg = Config(data=root, network="vgg19", image_size=IMG, batch_size=BS,
                 epochs=EPOCHS, lr=LR, alpha_c=ALPHA_C, seed=SEED,
                 log_interval=1, tf=True, ado=ado, attention=True,
                 dropout_rate=0.0, perform_test=True, model=dec_pth,
                 encoder_weights=enc_npz, log_jsonl=jsonl,
                 checkpoint_dir=str(tmp / "model"))
    from sat_tpu.engine.loop import run_training
    run_training(cfg)
    ours = [json.loads(l) for l in open(jsonl)]

    # ---- reference run ----
    _install_torchvision_stub()
    ref_train = import_reference("train")
    ref_train.torch = _TorchProxy()
    wandb_mod = sys.modules["wandb"]
    ref_logs = []
    saved_wandb = {k: getattr(wandb_mod, k, None) for k in ("log", "Table")}
    wandb_mod.log = lambda d: ref_logs.append(dict(d))
    wandb_mod.Table = _WandbTable
    old_viz = getattr(ref_train, "log_attention_visualization_plot", None)
    # TEST-mode viz needs skimage (stubbed empty); parity here is about the
    # metric line, and our side's viz has its own test (test_engine).
    ref_train.log_attention_visualization_plot = lambda *a, **k: None
    try:
        ref_ds = import_reference("dataset")
        enc = _RefEncoderDouble(vgg).eval()
        train_ds = ref_ds.ImageCaptionDataset(_ref_transform, root, "train")
        val_ds = ref_ds.ImageCaptionDataset(_ref_transform, root, "val")
        test_ds = ref_ds.ImageCaptionDataset(_ref_transform, root, "test")
        optimizer = torch.optim.Adam(ref_dec.parameters(), lr=LR)
        scheduler = torch.optim.lr_scheduler.StepLR(optimizer, 5)
        ce = nn.CrossEntropyLoss()
        for epoch in range(1, EPOCHS + 1):
            loader = DataLoader(train_ds, batch_sampler=_batch_order(
                epoch, len(train_ds)))
            ref_train.train(epoch, enc, ref_dec, optimizer, ce, loader,
                            word_dict, ALPHA_C, log_interval=1)
            ref_train.run_evaluation(
                epoch, enc, ref_dec, ce,
                DataLoader(val_ds, batch_sampler=_batch_order(
                    epoch, len(val_ds))),
                word_dict, ALPHA_C, 1, mode=ref_train.EvalMode.VALIDATION)
            scheduler.step()
        ref_train.run_evaluation(
            EPOCHS, enc, ref_dec, ce,
            DataLoader(test_ds, batch_sampler=_batch_order(
                EPOCHS, len(test_ds))),
            word_dict, ALPHA_C, 1, mode=ref_train.EvalMode.TEST)
    finally:
        if old_viz is not None:
            ref_train.log_attention_visualization_plot = old_viz
        for k, v in saved_wandb.items():   # the stub module is shared
            if v is None:
                delattr(wandb_mod, k)
            else:
                setattr(wandb_mod, k, v)

    return ado, ours, ref_logs


def _rows(logs, key):
    return [r for r in logs if key in r]


def test_train_meter_trajectory_matches(parity_runs):
    """Per-batch cumulative train meters (loss/top1/top5 averages,
    train.py:180-192) match row for row across both epochs."""
    ado, ours_all, ref_all = parity_runs
    ours, ref = _rows(ours_all, "train_loss"), _rows(ref_all, "train_loss")
    assert len(ours) == len(ref) == EPOCHS * 4     # 16 rows / batch 4
    for o, r in zip(ours, ref):
        for k in ("train_loss", "train_top1_acc", "train_top5_acc",
                  "train_loss_raw", "train_top1_acc_raw",
                  "train_top5_acc_raw"):
            _assert_close(ado, k, o[k], r[k])


@pytest.mark.parametrize("mode", ["val", "test"])
def test_eval_epoch_line_matches(parity_runs, mode):
    """The composed run_evaluation output — length-weighted meter averages
    AND the BLEU-1..4 line from decode-to-words -> swapped-arg corpus_bleu
    (train.py:330-333) — matches per epoch."""
    ado, ours_all, ref_all = parity_runs
    ours = _rows(ours_all, f"{mode}_loss")
    ref = _rows(ref_all, f"{mode}_loss")
    assert len(ours) == len(ref) == (EPOCHS if mode == "val" else 1)
    for o, r in zip(ours, ref):
        for k in (f"{mode}_loss", f"{mode}_top1_acc", f"{mode}_top5_acc",
                  f"{mode}_loss_raw", f"{mode}_top1_acc_raw",
                  f"{mode}_top5_acc_raw"):
            _assert_close(ado, k, o[k], r[k])
        # BLEU is computed from argmax token ids: both frameworks break
        # argmax ties toward the lowest index, so even the ado head's
        # zero-tied logits decode identically; equal bar NLTK-internal
        # float summation.
        for k in (f"{mode}_bleu1", f"{mode}_bleu2", f"{mode}_bleu3",
                  f"{mode}_bleu4"):
            np.testing.assert_allclose(o[k], r[k], rtol=1e-9, atol=1e-9,
                                       err_msg=k)
