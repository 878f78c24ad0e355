"""BERT-mode ENGINE smoke (VERDICT r3 next #7; heavy tier — the XLA-CPU
compile of the 30522-vocab step alone outgrows the fast-tier budget).

The BERT decoder/beam/prep layers are golden-tested in isolation
(test_bert_path, test_decoder, test_beam), and test_bert_path has a
train_epoch+validate smoke — but the engine COMPOSITION had no end-to-end
run: the frozen 30522x768 table riding stop_gradient through the jitted
train step inside Trainer.fit's epoch loop, the reference-parity artifacts
(model_config.json with bert=true, decoder .npz including the frozen
table), and the orbax save -> resume reload with the table re-placed onto
mesh shardings (loop.py resume block).

Reference: decoder.py:21-36 (only BERT's input embeddings are kept,
frozen), train.py:49-60 (bert vocab path).
"""

import json
import os

import numpy as np
import pytest

# Heavy tier (~8 min: XLA-CPU compile of the 30522-vocab train step
# dominates — measured 100s for the 2-batch epoch, plus two Trainer inits
# and a 116MB orbax round trip); deselect with -m "not heavy".
pytestmark = pytest.mark.heavy

from tests._synth import build_synth_dataset, write_synthetic_bert_vocab

from sat_tpu.config import Config
from sat_tpu.data import generate_json_data
from sat_tpu.data.bert_prep import generate_json_data_bert


def test_bert_fit_save_resume(tmp_path):
    root = str(tmp_path / "data")
    build_synth_dataset(root, n_train=4, n_val=2, n_test=2, caps_per_img=2,
                        image_size=32)
    vocab = write_synthetic_bert_vocab(str(tmp_path / "vocab.txt"))
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 10)
    generate_json_data_bert(f"{root}/dataset.json", root, 2, 12,
                            vocab_file=vocab)
    table_path = str(tmp_path / "emb.npy")
    table = np.random.default_rng(0).normal(
        scale=0.02, size=(30522, 768)).astype(np.float32)
    np.save(table_path, table)

    jsonl = str(tmp_path / "m.jsonl")
    cfg = Config(data=root, network="vgg19", image_size=32, batch_size=4,
                 epochs=1, tf=True, ado=False, attention=True, bert=True,
                 bert_vocab=vocab, bert_embeddings=table_path,
                 log_interval=1, checkpoint_dir=str(tmp_path / "model"),
                 perform_test=False, seed=3, log_jsonl=jsonl)
    from sat_tpu.engine.loop import run_training
    result = run_training(cfg)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["bleu1"] <= 1.0

    # reference-parity artifacts: model_config records bert mode; the
    # decoder checkpoint carries the table (so generate_caption can load
    # without --bert-embeddings)
    npz = cfg.checkpoint_dir + "/model_vgg19_1.npz"
    assert os.path.exists(npz)
    mc = json.load(open(cfg.checkpoint_dir + "/model_config.json"))
    assert mc["bert"] is True and mc["network"] == "vgg19"
    saved_emb = np.load(npz)["embedding"]
    np.testing.assert_array_equal(saved_emb, table)  # frozen: never updated

    # per-batch val rows were logged with the WordPiece-decoded BLEU line
    rows = [json.loads(l) for l in open(jsonl)]
    assert any("val_bleu1" in r for r in rows)

    # orbax resume: the frozen table must restore and re-place onto the
    # mesh shardings next to the trained params (loop.py resume block)
    cfg2 = Config(**{**cfg.__dict__, "epochs": 2, "resume": True})
    from sat_tpu.engine.loop import Trainer
    tr2 = Trainer(cfg2)
    assert tr2.start_epoch == 2
    restored_emb = np.asarray(tr2.state.params["embedding"])
    np.testing.assert_array_equal(restored_emb, table)
