#!/usr/bin/env python
"""Experiment runner — the reference's canned experiment sweep
(reference train_models.py:3-163): each experiment is a flag list passed to
train.py via subprocess, run sequentially. Config names and flags mirror the
reference's four headline Flickr8k experiments plus its sweep templates."""

import subprocess
import sys


def run_script(script_name, args):
    command = [sys.executable, script_name] + args
    print("Running:", " ".join(command))
    result = subprocess.run(command)
    if result.returncode != 0:
        print(f"Experiment failed with code {result.returncode}")
    return result.returncode


EXPERIMENTS = {
    # The four headline Flickr8k configs (reference train_models.py:15-57).
    "plain-att": ["--data=data/flickr8k", "--epochs=8", "--tf", "--ado",
                  "--attention"],
    "plain-noatt": ["--data=data/flickr8k", "--epochs=8", "--tf", "--ado"],
    "bert-att": ["--data=data/flickr8k", "--epochs=8", "--tf", "--ado",
                 "--attention", "--bert"],
    "bert-noatt": ["--data=data/flickr8k", "--epochs=8", "--tf", "--ado",
                   "--bert"],
    # Smoke config (README.md:51 quick-run flags).
    "smoke": ["--data=data/flickr8k", "--epochs=1", "--frac=0.02",
              "--log-interval=2", "--tf", "--ado", "--attention"],
    # Sweep templates (reference train_models.py:59-135 runs batch/lr sweeps
    # and fine-tune-from-checkpoint variants of the headline configs).
    "plain-att-bs32": ["--data=data/flickr8k", "--epochs=8", "--tf", "--ado",
                       "--attention", "--batch-size=32"],
    "plain-att-bs128": ["--data=data/flickr8k", "--epochs=8", "--tf", "--ado",
                        "--attention", "--batch-size=128"],
    "plain-att-lr3e4": ["--data=data/flickr8k", "--epochs=8", "--tf", "--ado",
                        "--attention", "--lr=3e-4"],
    "plain-att-finetune": ["--data=data/flickr8k", "--epochs=4", "--tf",
                           "--ado", "--attention",
                           "--model=model/model_vgg19_8.npz"],
    "resnet-att": ["--data=data/flickr8k", "--epochs=8", "--tf", "--ado",
                   "--attention", "--network=resnet152"],
    # Production-fast variant of the headline config: HBM feature bank +
    # K-step dispatch blocks. Bit-identical to per-batch --cache-features
    # training, float32-tolerance-identical to plain-att's image path
    # (both asserted by tests); wall-clock is bounded by device time
    # instead of host link latency.
    "plain-att-fast": ["--data=data/flickr8k", "--epochs=8", "--tf",
                       "--ado", "--attention", "--cache-features",
                       "--steps-per-dispatch=8"],
}


def main():
    names = sys.argv[1:] or ["plain-att", "plain-noatt", "bert-att", "bert-noatt"]
    for name in names:
        if name not in EXPERIMENTS:
            print(f"Unknown experiment '{name}'. Known: {sorted(EXPERIMENTS)}")
            sys.exit(2)
        run_script("train.py", EXPERIMENTS[name])


if __name__ == "__main__":
    main()
