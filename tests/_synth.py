"""Synthetic Karpathy-split dataset builder for tests: tiny PNG images plus
a dataset.json in the exact schema generate_json_data expects."""

import json
import os

import numpy as np
from PIL import Image

WORDS = ["a", "dog", "runs", "on", "the", "beach", "cat", "sits", "mat",
         "bird", "flies", "over", "water", "big", "small"]


def build_synth_dataset(root, n_train=4, n_val=2, n_test=2, caps_per_img=3,
                        seed=0, image_size=32):
    """Create root/imgs/*.png and root/dataset.json; returns the split dict."""
    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/imgs", exist_ok=True)
    images = []
    splits = [("train", n_train), ("val", n_val), ("test", n_test)]
    idx = 0
    for split_name, count in splits:
        for _ in range(count):
            fname = f"img_{idx:03d}.png"
            arr = rng.integers(0, 256, size=(image_size, image_size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(f"{root}/imgs/{fname}")
            sentences = []
            for _ in range(caps_per_img):
                length = int(rng.integers(3, 8))
                tokens = [WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(length)]
                sentences.append({"tokens": tokens})
            images.append({"filename": fname, "split": split_name,
                           "sentences": sentences})
            idx += 1
    split = {"images": images}
    with open(f"{root}/dataset.json", "w") as f:
        json.dump(split, f)
    return split


def write_synthetic_bert_vocab(path, words=None):
    """A full 30522-line vocab.txt with bert-base-uncased's special-token
    layout ([PAD]=0, [unused*]=1-99, [UNK]=100, [CLS]=101, [SEP]=102,
    [MASK]=103), so BertTokenizer works offline with the real special ids
    the framework pins in sat_tpu.constants."""
    words = list(words or WORDS)
    lines = ["[PAD]"]
    lines += [f"[unused{i}]" for i in range(99)]
    lines += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    lines += words
    while len(lines) < 30522:
        lines.append(f"[filler{len(lines)}]")
    with open(path, "w") as f:
        f.write("\n".join(lines[:30522]) + "\n")
    return path
