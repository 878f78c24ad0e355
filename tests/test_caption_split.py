"""caption_split CLI: batched split captioning end-to-end on CPU."""

import json
import sys

import numpy as np
import pytest

from tests._synth import build_synth_dataset


def test_caption_split_cli(tmp_path, monkeypatch, capsys):
    root = str(tmp_path / "data")
    import os
    os.makedirs(root)
    build_synth_dataset(root, n_train=2, n_val=1, n_test=2, caps_per_img=2,
                        image_size=32)
    from sat_tpu.data import generate_json_data
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 8)

    # minimal checkpoint via the Trainer
    from sat_tpu.config import Config
    from sat_tpu.engine.loop import Trainer
    cfg = Config(data=root, network="vgg19", image_size=32, batch_size=4,
                 epochs=0, tf=True, attention=True, log_interval=10,
                 checkpoint_dir=str(tmp_path / "model"), perform_test=False)
    tr = Trainer(cfg)
    tr.save_epoch(1)

    out_path = str(tmp_path / "caps.jsonl")
    import caption_split
    monkeypatch.setattr(sys, "argv", [
        "caption_split.py", "--model", str(tmp_path / "model" / "model_vgg19_1.npz"),
        "--split", "test", "--beam-size", "2", "--batch-size", "2",
        "--out", out_path])
    caption_split.main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["images"] == 4  # 2 test images x 2 captions
    assert summary["beam_size"] == 2
    assert 0.0 <= summary["bleu1"] <= 1.0
    rows = [json.loads(l) for l in open(out_path)]
    assert len(rows) == 4
    assert all("caption" in r and "img_path" in r for r in rows)

    # --pallas-topk (exact selection kernel) is token-identical end-to-end
    out_pl = str(tmp_path / "caps_pl.jsonl")
    monkeypatch.setattr(sys, "argv", [
        "caption_split.py", "--model",
        str(tmp_path / "model" / "model_vgg19_1.npz"),
        "--split", "test", "--beam-size", "2", "--batch-size", "2",
        "--pallas-topk", "--out", out_pl])
    caption_split.main()
    capsys.readouterr()
    rows_pl = [json.loads(l) for l in open(out_pl)]
    assert [r["caption"] for r in rows_pl] == [r["caption"] for r in rows]

    # --decode greedy and --decode sample drive the same CLI surface
    for mode, extra in (("greedy", []),
                        ("sample", ["--temperature", "0.8", "--top-k", "4"])):
        out_m = str(tmp_path / f"caps_{mode}.jsonl")
        monkeypatch.setattr(sys, "argv", [
            "caption_split.py", "--model",
            str(tmp_path / "model" / "model_vgg19_1.npz"),
            "--split", "test", "--decode", mode, "--batch-size", "2",
            "--out", out_m] + extra)
        caption_split.main()
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["decode"] == mode
        assert summary["images"] == 4
        rows = [json.loads(l) for l in open(out_m)]
        assert len(rows) == 4 and all("caption" in r for r in rows)

    # data-parallel serving over the 8-device CPU mesh: batch 3 forces the
    # pad-to-mesh path (3 % 8 != 0); JSONL must match single-device exactly
    out_mesh = str(tmp_path / "caps_mesh.jsonl")
    monkeypatch.setattr(sys, "argv", [
        "caption_split.py", "--model",
        str(tmp_path / "model" / "model_vgg19_1.npz"),
        "--split", "test", "--beam-size", "2", "--batch-size", "3",
        "--mesh-data", "0", "--out", out_mesh])
    caption_split.main()
    capsys.readouterr()
    mesh_rows = [json.loads(l) for l in open(out_mesh)]
    base_rows = [json.loads(l) for l in open(out_path)]
    # captions/terminations exact; scores only approx (the padded mesh batch
    # compiles at a different shape, so float reductions reassociate)
    assert [r["caption"] for r in mesh_rows] == [r["caption"] for r in base_rows]
    assert [r["completed"] for r in mesh_rows] == [r["completed"] for r in base_rows]
    np.testing.assert_allclose([r["score"] for r in mesh_rows],
                               [r["score"] for r in base_rows], rtol=1e-5)

    # pipelining must not change results: depth 1 (fully synchronous) and a
    # depth larger than the batch count produce byte-identical JSONL
    for depth in ("1", "8"):
        out_d = str(tmp_path / f"caps_d{depth}.jsonl")
        monkeypatch.setattr(sys, "argv", [
            "caption_split.py", "--model",
            str(tmp_path / "model" / "model_vgg19_1.npz"),
            "--split", "test", "--beam-size", "2", "--batch-size", "2",
            "--pipeline-depth", depth, "--out", out_d])
        caption_split.main()
        capsys.readouterr()
        assert open(out_d).read() == open(out_path).read()
