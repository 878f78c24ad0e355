#!/usr/bin/env python
"""Offline BERT caption prep CLI — surface-compatible with the reference's
generate_json_data_bert.py (reference generate_json_data_bert.py:64-72),
plus `--vocab-file` for offline tokenizer loading (no network egress)."""

import argparse

from sat_tpu.data.bert_prep import generate_json_data_bert


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Generate json caption files for BERT tokenization")
    parser.add_argument("--split-path", type=str, default="data/coco/dataset.json")
    parser.add_argument("--data-path", type=str, default="data/coco")
    parser.add_argument("--max-captions", type=int, default=5,
                        help="maximum number of captions per image")
    parser.add_argument("--max-caption-length", type=int, default=30,
                        help="maximum number of tokens in a caption")
    parser.add_argument("--vocab-file", type=str, default=None,
                        help="local bert-base-uncased vocab.txt (offline)")
    args = parser.parse_args()
    generate_json_data_bert(args.split_path, args.data_path, args.max_captions,
                            args.max_caption_length, vocab_file=args.vocab_file)


if __name__ == "__main__":
    main()
