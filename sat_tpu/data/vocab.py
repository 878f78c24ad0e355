"""Offline Karpathy-split data prep.

Produces artifacts byte-compatible with the reference's
generate_json_data.py (reference generate_json_data.py:5-78):
`word_dict.json` plus `{train,val,test}_img_paths.json` and
`{train,val,test}_captions.json`, with identical vocabulary id assignment
(first-encounter order, ids offset by 4; special tokens
`<start>=0, <eos>=1, <unk>=2, <pad>=3`) and identical caption layout
(`<start> + ids + <eos> + <pad>*`).

Known deviation: the reference's image-path handling
(generate_json_data.py:25-29) reads an uninitialized `filepath_defined`
variable on the first image whenever `filepath` IS present (COCO), raising
NameError — i.e. the reference only actually works for datasets without
subfolders (Flickr8k). We implement the evident intent: include the
subfolder when `filepath` exists. Flickr8k output is identical.
"""

from __future__ import annotations

import json
from collections import Counter

from sat_tpu import constants


def generate_json_data(split_path: str, data_path: str,
                       max_captions_per_image: int = 5,
                       min_word_count: int = 5,
                       max_caption_length: int = constants.MAX_CAPTION_LENGTH) -> dict:
    split = json.load(open(split_path, "r"))
    word_count = Counter()

    paths = {"train": [], "val": [], "test": []}
    tokens = {"train": [], "val": [], "test": []}

    max_length = 0
    for img in split["images"]:
        caption_count = 0
        for sentence in img["sentences"]:
            if caption_count < max_captions_per_image:
                caption_count += 1
            else:
                break

            subdir = f"/{img['filepath']}" if "filepath" in img else ""
            img_path = f"{data_path}/imgs{subdir}/{img['filename']}"

            if img["split"] in paths:
                paths[img["split"]].append(img_path)
                tokens[img["split"]].append(sentence["tokens"])
            max_length = max(max_length, len(sentence["tokens"]))
            word_count.update(sentence["tokens"])

    words = [w for w in word_count.keys() if word_count[w] >= min_word_count]
    word_dict = {word: idx + 4 for idx, word in enumerate(words)}
    word_dict["<start>"] = constants.START
    word_dict["<eos>"] = constants.EOS
    word_dict["<unk>"] = constants.UNK
    word_dict["<pad>"] = constants.PAD

    with open(data_path + "/word_dict.json", "w") as f:
        json.dump(word_dict, f)

    max_length = min(max_length, max_caption_length)
    captions = {s: process_caption_tokens(tokens[s], word_dict, max_length)
                for s in ("train", "val", "test")}

    for split_name in ("train", "val", "test"):
        with open(f"{data_path}/{split_name}_img_paths.json", "w") as f:
            json.dump(paths[split_name], f)
        with open(f"{data_path}/{split_name}_captions.json", "w") as f:
            json.dump(captions[split_name], f)

    return {"word_dict": word_dict, "max_length": max_length,
            "paths": paths, "captions": captions}


def process_caption_tokens(caption_tokens, word_dict, max_length):
    """`<start> + ids + <eos> + <pad>*` layout, truncating to max_length
    tokens (reference generate_json_data.py:71-78). Every output row has
    length max_length + 2."""
    captions = []
    for tokens in caption_tokens:
        tokens = tokens[:max_length]
        token_idxs = [word_dict.get(token, word_dict["<unk>"]) for token in tokens]
        captions.append([word_dict["<start>"]] + token_idxs + [word_dict["<eos>"]]
                        + [word_dict["<pad>"]] * (max_length - len(tokens)))
    return captions
