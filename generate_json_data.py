#!/usr/bin/env python
"""Offline data prep CLI — identical surface and artifacts to the
reference's generate_json_data.py (reference generate_json_data.py:81-93)."""

import argparse

from sat_tpu.data import generate_json_data


def main() -> None:
    parser = argparse.ArgumentParser(description="Generate json files")
    parser.add_argument("--split-path", type=str, default="data/coco/dataset.json")
    parser.add_argument("--data-path", type=str, default="data/coco")
    parser.add_argument("--max-captions", type=int, default=5,
                        help="maximum number of captions per image")
    parser.add_argument("--min-word-count", type=int, default=5,
                        help="minimum number of occurences of a word to be "
                             "included in word dictionary")
    parser.add_argument("--max-caption-length", type=int, default=25,
                        help="maximum number of tokens in a caption")
    args = parser.parse_args()
    generate_json_data(args.split_path, args.data_path, args.max_captions,
                       args.min_word_count, args.max_caption_length)


if __name__ == "__main__":
    main()
