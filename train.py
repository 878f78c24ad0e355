#!/usr/bin/env python
"""Training CLI — argparse surface identical to the reference's train.py
(reference train.py:438-472; `--frac` works via argparse prefix matching),
plus TPU-framework flags (mesh shape, checkpoints, precision; see
`sat_tpu/config.py`)."""

import random

import numpy as np

from sat_tpu.config import build_arg_parser, config_from_args


def set_seed(seed: int) -> None:
    """Host-side seeding (reference train.py:37-43). Device-side RNG is
    keyed from the same seed via jax.random.PRNGKey in the Trainer."""
    np.random.seed(seed)
    random.seed(seed)


def main() -> None:
    args = build_arg_parser().parse_args()
    cfg = config_from_args(args)
    set_seed(cfg.seed)
    from sat_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    from sat_tpu.parallel.distributed import initialize
    initialize()  # no-op on single host; spans the slice on multi-host TPU
    from sat_tpu.engine.loop import run_training
    run_training(cfg)


if __name__ == "__main__":
    main()
