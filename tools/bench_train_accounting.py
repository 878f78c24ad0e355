#!/usr/bin/env python
"""Train-step time-accounting table (VERDICT r4 next #2).

Extends the decode-step accounting (docs/ARCHITECTURE.md) to the full
train step: per-block device times measured in ONE process that sum to the
measured step, each block against its own compute-or-bandwidth roofline
from XLA cost analysis of the standalone program. This is the table that
reconciles (or corrects) the whole-step `train_hbm_util_pct` field.

Shares its measurement body with bench.py's `accounting` leg
(sat_tpu.utils.benchmarks.measure_train_accounting) so the tool and the
artifact cannot drift.

Usage: python tools/bench_train_accounting.py [--batch 64] [--reps 3]
       [--no-remat]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_tpu.utils.benchmarks import (V5E_HBM_BYTES_PER_SEC, V5E_PEAK_FLOPS,
                                      measure_train_accounting)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true",
                    help="account the saved-residual (--no-remat-scan) "
                         "variant instead of the remat default")
    args = ap.parse_args()

    from sat_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()

    def progress(r, name, dt):
        print(f"  round {r}: {name:10s} {dt * 1e3:8.3f} ms", file=sys.stderr)

    out = measure_train_accounting(batch=args.batch, reps=args.reps,
                                   remat=not args.no_remat,
                                   progress=progress)
    med = {n: float(np.median(v["ms"])) for n, v in out.items()}

    rows = []
    for name in ("step", "grad", "fwd", "head", "head_grad", "adam"):
        v = out[name]
        roof_ms = None
        bound = "?"
        if v["bytes"]:
            t_bw = v["bytes"] / V5E_HBM_BYTES_PER_SEC
            t_fl = (v["flops"] or 0.0) / V5E_PEAK_FLOPS
            roof_ms = max(t_bw, t_fl) * 1e3
            bound = "bandwidth" if t_bw >= t_fl else "compute"
        rows.append((name, med[name], v["flops"], v["bytes"], roof_ms,
                     bound))

    print(f"\n{'block':12s} {'measured':>10s} {'roofline':>10s} "
          f"{'bound':>10s} {'GFLOP':>8s} {'MB':>9s} {'util':>6s}")
    for name, ms, fl, by, roof, bound in rows:
        util = f"{roof / ms * 100:5.1f}%" if roof else "    —"
        print(f"{name:12s} {ms:9.3f}ms "
              f"{(f'{roof:9.3f}ms' if roof else '        —')} {bound:>10s} "
              f"{(fl or 0) / 1e9:8.2f} {(by or 0) / 1e6:9.2f} {util:>6s}")

    derived = {
        "scan_fwd": med["fwd"] - med["head"],
        "head_bwd": med["head_grad"] - med["head"],
        "scan_bwd": med["grad"] - med["fwd"]
                    - (med["head_grad"] - med["head"]),
        "residual (step - grad - adam)": med["step"] - med["grad"]
                                         - med["adam"],
    }
    print("\nderived:")
    for k, v in derived.items():
        print(f"  {k:32s} {v:9.3f}ms")

    whole = out["step"]
    if whole["bytes"]:
        dt = med["step"] / 1e3
        print(f"\nwhole step: {whole['bytes'] / 1e6:.1f} MB cost-analysis "
              f"bytes -> {whole['bytes'] / dt / 1e9:.0f} GB/s achieved "
              f"({whole['bytes'] / dt / V5E_HBM_BYTES_PER_SEC * 100:.1f}% "
              f"of HBM roofline); "
              f"{(whole['flops'] or 0) / dt / 1e12:.1f} TF/s "
              f"({(whole['flops'] or 0) / dt / V5E_PEAK_FLOPS * 100:.1f}% "
              f"MFU)")

    print(json.dumps({"medians_ms": {k: round(v, 3) for k, v in med.items()},
                      "derived_ms": {k: round(v, 3)
                                     for k, v in derived.items()},
                      "samples": {k: [round(s, 3) for s in v["ms"]]
                                  for k, v in out.items()}}))


if __name__ == "__main__":
    main()
