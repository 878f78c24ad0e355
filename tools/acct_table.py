#!/usr/bin/env python
"""Render the train-step accounting table (ARCHITECTURE.md format) from
the harvested `train_acct_*` fields (bench.py `accounting` leg /
tools/bench_train_accounting.py).

Usage: python tools/acct_table.py [path-to-bench_partials.json]
"""

import json
import os
import sys

ROWS = [
    ("scan forward (embed + attention + LSTM)", "scan_fwd", None),
    ("output head + CE forward", "head", "head"),
    ("scan backward (incl. remat recompute)", "scan_bwd", None),
    ("head backward", "head_bwd", None),
    ("Adam update", "adam", "adam"),
    ("residual (dispatch gaps)", "residual", None),
]


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "bench_partials.json")
    f = json.load(open(path))["fields"]

    def g(k):
        return f.get(f"train_acct_{k}_ms")

    if g("step") is None:
        raise SystemExit("no train_acct_* fields harvested yet "
                         "(run the bench 'accounting' leg first)")

    print(f"Train step (B=64, f32, remat default): measured "
          f"{g('step'):.3f} ms whole; grad {g('grad'):.3f} + adam "
          f"{g('adam'):.3f} (sum check: "
          f"{(g('grad') + g('adam')) / g('step') * 100:.0f}% of whole)\n")
    print("| Block | measured | roofline (cost-analysis) | util |")
    print("|---|---|---|---|")
    for label, key, roof_key in ROWS:
        ms = g(key)
        if ms is None:
            continue
        roof = f.get(f"train_acct_{roof_key}_roofline_ms") if roof_key \
            else None
        roof_s = f"{roof:.3f} ms" if roof else "—"
        util = f"{roof / ms * 100:.0f}%" if roof and ms > 0 else "—"
        print(f"| {label} | {ms:.3f} ms | {roof_s} | {util} |")
    for key in ("fwd", "grad", "step"):
        roof = f.get(f"train_acct_{key}_roofline_ms")
        if roof and g(key):
            print(f"| ({key} whole) | {g(key):.3f} ms | {roof:.3f} ms | "
                  f"{roof / g(key) * 100:.0f}% |")


if __name__ == "__main__":
    main()
