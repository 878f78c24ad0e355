"""Offline BERT pipeline tests using a synthetic full-size vocab.txt with
bert-base-uncased's real special-token layout: data-prep artifact parity
with the reference (tokenizer monkeypatched to the local vocab), tokenizer
id pinning, and an end-to-end bert-mode training smoke."""

import json
import os

import numpy as np
import pytest

# Heavy tier (~4 min (BERT goldens)); deselect with -m "not heavy".
pytestmark = pytest.mark.heavy

from tests._reference import import_reference
from tests._synth import build_synth_dataset, write_synthetic_bert_vocab

from sat_tpu import constants
from sat_tpu.data.bert_prep import generate_json_data_bert, get_bert_tokenizer


@pytest.fixture(scope="module")
def bert_vocab(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bertvocab") / "vocab.txt")
    return write_synthetic_bert_vocab(path)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bertdata"))
    build_synth_dataset(root, n_train=4, n_val=2, n_test=2, caps_per_img=2,
                        image_size=32)
    return root


def test_tokenizer_special_ids_match_constants(bert_vocab):
    tok = get_bert_tokenizer(bert_vocab)
    assert tok.pad_token_id == constants.BERT_PAD
    assert tok.cls_token_id == constants.BERT_CLS
    assert tok.sep_token_id == constants.BERT_SEP
    assert tok.vocab_size == constants.BERT_VOCAB_SIZE


def test_bert_prep_matches_reference_artifacts(bert_vocab, synth_root,
                                               tmp_path, monkeypatch):
    from transformers import BertTokenizer
    local = BertTokenizer(vocab_file=bert_vocab, do_lower_case=True)
    monkeypatch.setattr(BertTokenizer, "from_pretrained",
                        classmethod(lambda cls, *a, **k: local))

    ref_mod = import_reference("generate_json_data_bert")
    ref_dir, our_dir = str(tmp_path / "ref"), str(tmp_path / "ours")
    os.makedirs(ref_dir), os.makedirs(our_dir)
    ref_mod.generate_json_data(f"{synth_root}/dataset.json", ref_dir, 2, 12)
    generate_json_data_bert(f"{synth_root}/dataset.json", our_dir, 2, 12,
                            vocab_file=bert_vocab)
    for split in ("train", "val", "test"):
        ref = json.load(open(f"{ref_dir}/{split}_captions_bert.json"))
        ours = json.load(open(f"{our_dir}/{split}_captions_bert.json"))
        assert ours == ref, split
    # the load-bearing quirk: SEP after padding
    row = json.load(open(f"{our_dir}/train_captions_bert.json"))[0]
    assert row[0] == constants.BERT_CLS and row[-1] == constants.BERT_SEP
    assert constants.BERT_PAD in row[1:-1]


def test_bert_training_smoke(bert_vocab, synth_root, tmp_path):
    """End-to-end bert-mode epoch on CPU: frozen synthetic embedding table,
    bert caption artifacts, BLEU with WordPiece decode."""
    from sat_tpu.config import Config
    from sat_tpu.data import generate_json_data
    from sat_tpu.engine.loop import Trainer

    generate_json_data(f"{synth_root}/dataset.json", synth_root, 2, 1, 10)
    generate_json_data_bert(f"{synth_root}/dataset.json", synth_root, 2, 12,
                            vocab_file=bert_vocab)
    table_path = str(tmp_path / "emb.npy")
    np.save(table_path, np.random.default_rng(0)
            .normal(scale=0.02, size=(30522, 768)).astype(np.float32))

    cfg = Config(data=synth_root, network="vgg19", image_size=32,
                 batch_size=4, epochs=1, tf=True, ado=False, attention=True,
                 bert=True, bert_vocab=bert_vocab,
                 bert_embeddings=table_path, log_interval=1,
                 checkpoint_dir=str(tmp_path / "model"), perform_test=False,
                 seed=3)
    tr = Trainer(cfg)
    assert tr.dcfg.use_bert and tr.dcfg.embedding_size == 768
    tr.train_epoch(1)
    result = tr.validate(1)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["bleu1"] <= 1.0
