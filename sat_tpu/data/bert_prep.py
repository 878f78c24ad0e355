"""Offline BERT caption prep, artifact-compatible with the reference
(reference generate_json_data_bert.py:5-62), including its acknowledged
layout quirk: `[CLS] + ids + [PAD]* + [SEP]` — SEP appended *after* the
padding (generate_json_data_bert.py:44-47). The beam search and eval paths
carry matching "quickfix" semantics, so the quirk is load-bearing and kept.

Tokenizer loading is offline-friendly: pass `vocab_file` (a local
bert-base-uncased vocab.txt) to avoid any network access; otherwise a cached
`from_pretrained` is attempted.
"""

from __future__ import annotations

import json
from typing import Optional


def get_bert_tokenizer(vocab_file: Optional[str] = None):
    from transformers import BertTokenizer
    if vocab_file:
        tok = BertTokenizer(vocab_file=vocab_file, do_lower_case=True)
    else:
        tok = BertTokenizer.from_pretrained("bert-base-uncased")
    tok.bos_token = tok.cls_token
    tok.eos_token = tok.sep_token
    return tok


def generate_json_data_bert(split_path: str, data_path: str,
                            max_captions_per_image: int = 5,
                            max_caption_length: int = 30,
                            vocab_file: Optional[str] = None) -> dict:
    split = json.load(open(split_path, "r"))
    tokenizer = get_bert_tokenizer(vocab_file)

    captions = {"train": [], "val": [], "test": []}

    # Pass 1: max encoded length over ALL sentences (uncapped — the
    # reference's length pass ignores max_captions_per_image).
    max_length = 0
    for img in split["images"]:
        for sentence in img["sentences"]:
            encoded = tokenizer.encode(sentence["tokens"], add_special_tokens=True)
            max_length = max(max_length, len(encoded))
    max_length = min(max_length, max_caption_length)
    print(f"Maximum caption length: {max_length}")

    for img in split["images"]:
        caption_count = 0
        for sentence in img["sentences"]:
            if caption_count < max_captions_per_image:
                caption_count += 1
            else:
                break

            raw_sentence = " ".join(sentence["tokens"])
            encoded = tokenizer.encode(raw_sentence, add_special_tokens=False)
            encoded = encoded[:max_length]
            padded = encoded + [tokenizer.pad_token_id] * (max_length - len(encoded))
            # Quirk preserved: SEP after the padding.
            padded = [tokenizer.cls_token_id] + padded + [tokenizer.sep_token_id]

            if img["split"] in captions:
                captions[img["split"]].append(padded)

    for split_name in ("train", "val", "test"):
        with open(f"{data_path}/{split_name}_captions_bert.json", "w") as f:
            json.dump(captions[split_name], f)

    return captions
