"""A/B the exact Pallas top-k (sat_tpu.ops.topk) inside the worst-case
51-step batched beam, against the default lax.top_k (and the opt-in
approx_max_k for context).

Primary number: decode-only device time of the worst-case beam (B=64,
K=5, stop tokens pinned away so all 51 steps run), slope-measured with
variants interleaved in ONE process — the measurement body is the shared
`sat_tpu.utils.benchmarks.measure_beam_ab` (also behind bench.py's
`leg_topk`), and the worst-case decoder recipe is bench's one copy
(`bench._worst_case_decoder`). The pallas kernel is token-exact
(tests/test_topk.py), so any win moves the PARITY serving headline, not
just fast mode.

`--isolated` additionally measures the raw (B, K*V) top-k op alone
(both arms pay the same +scalar chaining pass; compare the delta).

Usage: python tools/bench_topk.py [--batch 64] [--rounds 3] [--isolated]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--isolated", action="store_true")
    args = ap.parse_args()

    import jax

    import bench
    from sat_tpu.utils.benchmarks import measure_beam_ab
    from sat_tpu.utils.timing import device_time

    B, K = args.batch, bench.BEAM
    bench.assert_topk_exact_on_device()
    print("# on-device exactness gate passed", file=sys.stderr)
    cfg, dec_params = bench._worst_case_decoder(bench.ENC_DIM,
                                                jax.random.PRNGKey(0))

    def progress(r, name, dt):
        print(f"# round {r} beam/{name}: {dt * 1e3:.2f} ms", file=sys.stderr)

    samples = measure_beam_ab(
        dec_params, cfg,
        {"lax": {"pallas_topk": False}, "pallas": {"pallas_topk": True},
         "approx": {"fast_topk": True}},
        batch=B, beam=K, rounds=args.rounds, progress=progress)
    med = {n: float(np.median(v)) for n, v in samples.items()}
    bad = [n for n, v in med.items() if v <= 0]
    if bad:
        raise SystemExit(f"implausible zero-slope medians for {bad} "
                         f"(RT-dominated glitch phase); samples={samples}")
    out = {"batch": B, "rounds": args.rounds,
           **{f"beam_{n}_ms": round(v, 3) for n, v in med.items()},
           **{f"beam_{n}_captions_per_sec": round(B / v * 1e3, 1)
              for n, v in med.items()},
           "pallas_speedup": round(med["lax"] / med["pallas"], 3)}

    if args.isolated:
        import jax.numpy as jnp

        from sat_tpu.ops.topk import exact_topk
        cand = jnp.asarray(np.random.default_rng(1)
                           .normal(size=(B, K * bench.VOCAB))
                           .astype(np.float32))

        def iso(fn):
            def body(s, i):
                vals, _ = fn(cand + s)
                return s + 1e-20 * vals.sum()
            return body

        iso_variants = {"lax": iso(lambda x: jax.lax.top_k(x, K)),
                        "pallas": iso(lambda x: exact_topk(x, K))}
        iso_samples = {n: [] for n in iso_variants}
        for r in range(args.rounds):
            for name, body in iso_variants.items():
                dt = device_time(body, jnp.float32(0.0), n_lo=2, n_hi=22,
                                 reps=3)
                iso_samples[name].append(dt * 1e6)
                print(f"# round {r} iso/{name}: {dt * 1e6:.1f} us",
                      file=sys.stderr)
        for n, v in iso_samples.items():
            out[f"iso_{n}_us"] = round(float(np.median(v)), 1)

    print(out)


if __name__ == "__main__":
    main()
