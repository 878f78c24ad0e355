"""A/B the exact Pallas top-k (sat_tpu.ops.topk) inside the worst-case
51-step batched beam, against the default lax.top_k (and the opt-in
approx_max_k for context).

Primary number: decode-only device time of the worst-case beam (B=64,
K=5, stop tokens pinned away so all 51 steps run), slope-measured
(sat_tpu.utils.timing.device_time — tunnel RT cancels), variants
interleaved round-robin in ONE process. The pallas kernel is token-exact
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
    import jax.numpy as jnp

    from sat_tpu.models.beam import beam_search_batched
    from sat_tpu.models.decoder import DecoderConfig, init_decoder_params
    from sat_tpu.utils.benchmarks import init_on_host
    from sat_tpu.utils.timing import device_time

    B, L, D, V, K = args.batch, 196, 512, 2633, 5
    cfg = DecoderConfig(vocab_size=V, encoder_dim=D, use_ado=True,
                        use_attention=True)
    dec_params = init_on_host(init_decoder_params, jax.random.PRNGKey(0), cfg)
    # pin the stop logits so every beam runs the full 51-step cap
    # (bench.py _worst_case_decoder recipe)
    b = np.asarray(dec_params["ado"]["f_out"]["b"]).copy()
    b[[1, 102]] = -1e9
    dec_params["ado"]["f_out"]["b"] = jnp.asarray(b)

    feats = jnp.asarray(np.random.default_rng(0)
                        .normal(size=(B, L, D)).astype(np.float32))

    def beam_body(**kw):
        def body(x, i):
            r = beam_search_batched(dec_params, cfg, x, K, **kw)
            return x + 1e-20 * r.score.sum()
        return body

    variants = {
        "lax": beam_body(),
        "pallas": beam_body(pallas_topk=True),
        "approx": beam_body(fast_topk=True),
    }
    samples = {n: [] for n in variants}
    for r in range(args.rounds):
        for name, body in variants.items():
            dt = device_time(body, feats, n_lo=1, n_hi=4, reps=3)
            samples[name].append(dt * 1e3)
            print(f"# round {r} beam/{name}: {dt * 1e3:.2f} ms",
                  file=sys.stderr)
    med = {n: float(np.median(v)) for n, v in samples.items()}
    out = {"batch": B, "rounds": args.rounds,
           **{f"beam_{n}_ms": round(v, 3) for n, v in med.items()},
           **{f"beam_{n}_captions_per_sec": round(B / v * 1e3, 1)
              for n, v in med.items()},
           "pallas_speedup": round(med["lax"] / med["pallas"], 3)}

    if args.isolated:
        from sat_tpu.ops.topk import exact_topk
        cand = jnp.asarray(np.random.default_rng(1)
                           .normal(size=(B, K * V)).astype(np.float32))

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
