"""A/B the --remat-scan decoder grad against the default saved-residual path.

Measures DEVICE time of the full train-grad+update body (the quantity the
flag targets: the train grad is bandwidth-bound on the T x (B, L, E)
attention intermediates it saves for backward — remat recomputes them
instead). Uses `sat_tpu.utils.timing.device_time` (in-jit repetition slope,
tunnel round-trip cancels) and interleaves the variants within one process,
round-robin, so a tunnel phase change corrupts at most one round
(CLAUDE.md: never compare numbers across runs minutes apart).

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
    ap.add_argument("--ado", action="store_true", default=True)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from sat_tpu.models.decoder import DecoderConfig, init_decoder_params
    from sat_tpu.parallel.train_step import _loss_and_metrics, make_optimizer
    from sat_tpu.utils.benchmarks import init_on_host
    from sat_tpu.utils.timing import device_time

    # Flickr8k flagship shapes: VGG19 14x14 grid, 512-dim features.
    B, L, D, T, V = args.batch, 196, 512, 27, 2633
    base = DecoderConfig(vocab_size=V, encoder_dim=D, use_tf=True,
                         use_ado=args.ado, use_attention=True)
    variants = {
        "f32": base,
        "f32_remat": dataclasses.replace(base, remat_scan=True),
        "bf16": dataclasses.replace(base, bf16_attention=True),
        "bf16_remat": dataclasses.replace(base, bf16_attention=True,
                                          remat_scan=True),
    }

    rng = np.random.default_rng(0)
    params = init_on_host(init_decoder_params, jax.random.PRNGKey(0), base)
    feats = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    caps = jnp.asarray(rng.integers(4, V, size=(B, T)).astype(np.int32))
    drop = jax.random.PRNGKey(1)
    tx = make_optimizer()

    def make_body(cfg):
        def body(carry, i):
            params, opt_state = carry
            step_rng = jax.random.fold_in(drop, i)
            _, grads = jax.value_and_grad(
                lambda p: _loss_and_metrics(cfg, 1.0, p, feats, caps,
                                            step_rng, True),
                has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -1e-4 * u, updates)
            return (optax.apply_updates(params, updates), opt_state)
        return body

    carry0 = (params, tx.init(params))
    samples = {name: [] for name in variants}
    for r in range(args.rounds):
        for name, cfg in variants.items():
            dt = device_time(make_body(cfg), carry0, n_lo=2, n_hi=10, reps=3)
            samples[name].append(dt * 1e3)
            print(f"# round {r} {name}: {dt * 1e3:.2f} ms/step",
                  file=sys.stderr)

    med = {n: float(np.median(v)) for n, v in samples.items()}
    out = {"batch": B, "rounds": args.rounds,
           **{f"{n}_ms_per_step": round(v, 3) for n, v in med.items()},
           **{f"{n}_rows_per_sec": round(B / v * 1e3, 1)
              for n, v in med.items()},
           "remat_speedup_f32": round(med["f32"] / med["f32_remat"], 3),
           "remat_speedup_bf16": round(med["bf16"] / med["bf16_remat"], 3)}
    print(out)


if __name__ == "__main__":
    main()
