#!/usr/bin/env python
"""Per-backbone encoder roofline study on the real chip (VERDICT r2 next #1).

Measures the frozen-CNN forward (the serving path's dominant cost — ~75% of
e2e at B=64 after the round-2 beam dedup) per backbone and variant:

  vgg19        f32 / f32+s2d / f32-HIGHEST / bf16 / bf16+s2d
  resnet152    f32 / bf16
  densenet161  f32 / bf16

For each: slope-measured device time, TFLOP/s, and MFU against the v5e bf16
peak (FLOPs from XLA cost analysis of the exact compiled program;
measurement lives in sat_tpu.utils.benchmarks, shared with bench.py). s2d =
space-to-depth first conv (models/encoder.py:_conv1_s2d_kernel) — same
math, 4x MXU reduction-lane utilization on the 3-channel conv. HIGHEST =
6-pass f32 emulation (parity headroom A/B; DEFAULT already does
bf16-multiply / f32-accumulate on the MXU).

Round-3 measured results are recorded in docs/ARCHITECTURE.md ("Round 3:
the encoder study"). NOTE: the ResNet152/DenseNet161 programs have wedged
the tunnel's remote-compile endpoint — run them in a phase you can afford
to lose, and one process per A/B comparison.

Usage: python tools/bench_encoder.py [--batch 64] [--networks vgg19,...]
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--networks", default="vgg19,resnet152,densenet161")
    ap.add_argument("--quick", action="store_true",
                    help="vgg19 variants only")
    args = ap.parse_args()

    from sat_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from sat_tpu.utils.benchmarks import measure_encoder_variant

    variants = [("vgg19", None, False, None),
                ("vgg19", None, True, None),
                ("vgg19", None, False, "highest"),
                ("vgg19", jnp.bfloat16, False, None),
                ("vgg19", jnp.bfloat16, True, None)]
    if not args.quick:
        for net in ("resnet152", "densenet161"):
            variants += [(net, None, False, None),
                         (net, jnp.bfloat16, False, None)]
    variants = [v for v in variants if v[0] in args.networks.split(",")]

    for net, dt, s2d, prec in variants:
        try:
            res = measure_encoder_variant(net, args.batch, dt, s2d, prec)
            print(json.dumps(res), flush=True)
        except Exception as e:
            print(json.dumps({"network": net, "s2d_conv1": s2d,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
