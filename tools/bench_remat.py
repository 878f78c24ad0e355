"""A/B the --remat-scan decoder grad against the default saved-residual path.

Measures DEVICE time of the full train-grad+update body (the quantity the
flag targets: the train grad is bandwidth-bound on the T x (B, L, E)
attention intermediates it saves for backward — remat recomputes them
instead). The measurement body is the shared
`sat_tpu.utils.benchmarks.measure_decoder_grad_ab` (also behind bench.py's
`leg_remat`, so the A/B tool and the artifact measure the same program):
in-jit repetition slope, variants interleaved round-robin in one process.

Variants: f32, f32+remat, bf16-att, bf16-att+remat.

Usage: python tools/bench_remat.py [--batch 64] [--rounds 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3,
                    help="interleaved measurement rounds per variant")
    ap.add_argument("--ado", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="--no-ado measures the simple-head decoder A/B")
    args = ap.parse_args()

    from sat_tpu.models.decoder import DecoderConfig
    from sat_tpu.utils.benchmarks import (measure_decoder_grad_ab,
                                          remat_variant_cfgs)

    # Flickr8k flagship shapes: VGG19 14x14 grid, 512-dim features.
    base = DecoderConfig(vocab_size=2633, encoder_dim=512, use_tf=True,
                         use_ado=args.ado, use_attention=True)

    def progress(r, name, dt):
        print(f"# round {r} {name}: {dt * 1e3:.2f} ms/step", file=sys.stderr)

    samples = measure_decoder_grad_ab(remat_variant_cfgs(base),
                                      batch=args.batch, rounds=args.rounds,
                                      progress=progress)
    med = {n: float(np.median(v)) for n, v in samples.items()}
    bad = [n for n, v in med.items() if v <= 0]
    if bad:
        raise SystemExit(f"implausible zero-slope medians for {bad} "
                         f"(RT-dominated glitch phase); samples={samples}")
    out = {"batch": args.batch, "rounds": args.rounds,
           **{f"{n}_ms_per_step": round(v, 3) for n, v in med.items()},
           **{f"{n}_rows_per_sec": round(args.batch / v * 1e3, 1)
              for n, v in med.items()},
           "remat_speedup_f32": round(med["f32"] / med["f32_remat"], 3),
           "remat_speedup_bf16": round(med["bf16"] / med["bf16_remat"], 3)}
    print(out)


if __name__ == "__main__":
    main()
