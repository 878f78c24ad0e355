"""A/B the --steps-per-dispatch training block against per-batch dispatch.

Measures WALL-CLOCK per optimizer step (the quantity the feature targets:
bank-mode device time is ~6 ms/step at B=64 while the tunneled dev chip's
host round trip swings 1-30 ms, so per-batch training is often RT-bound,
not compute-bound). Both modes replay the real train-loop host protocol:

- per-batch (K=1): one dispatch per step + one-behind metric sync
  (4 float() reads of the previous step's metrics, engine/loop.py finish)
- block (K>1): one dispatch per K steps + one-behind jax.device_get of
  the stacked (K,) metrics pytree (engine/loop.py finish_block)

Segments alternate A/B/A/B in ONE process (tunnel phases swing 10x over
minutes; adjacent interleaved segments are the only valid comparison —
CLAUDE.md). Reports median ms/step per mode and the speedup.

Usage: python tools/bench_spd.py [--batch 64] [--k 8] [--steps 64]
       [--reps 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64,
                    help="optimizer steps per timed segment (multiple of k)")
    ap.add_argument("--reps", type=int, default=4,
                    help="timed segments per mode, interleaved")
    ap.add_argument("--eval", action="store_true",
                    help="A/B the eval path (make_bank_eval_block vs "
                         "per-batch eval step + token readback) instead "
                         "of the train path")
    args = ap.parse_args()
    assert args.steps % args.k == 0

    import jax
    import jax.numpy as jnp

    from sat_tpu.models.decoder import DecoderConfig, init_decoder_params
    from sat_tpu.parallel import (init_train_state, make_bank_train_block,
                                  make_bank_train_step)
    from sat_tpu.utils.benchmarks import init_on_host

    B, K, S = args.batch, args.k, args.steps
    # Flickr8k flagship shapes: VGG19 14x14 grid, 512-dim features.
    U, L, D, T, V = 512, 196, 512, 27, 2633
    cfg = DecoderConfig(vocab_size=V, encoder_dim=D, use_tf=True,
                        use_ado=True, use_attention=True)
    rng = np.random.default_rng(0)
    params = init_on_host(init_decoder_params, jax.random.PRNGKey(0), cfg)
    state = init_on_host(init_train_state, params)
    feats = jnp.asarray(rng.normal(size=(U, L, D)).astype(np.float32))
    caps = jnp.asarray(
        np.concatenate([np.full((U, 1), 1, np.int32),
                        rng.integers(3, V, size=(U, T - 2), dtype=np.int32),
                        np.full((U, 1), 2, np.int32)], axis=1))
    base_rng = jax.random.PRNGKey(7)
    lr = jnp.float32(4e-4)
    mask = np.ones(B, bool)

    step = make_bank_train_step(cfg, alpha_c=1.0)
    block = make_bank_train_block(cfg, alpha_c=1.0)

    def batch_idx(i):
        return np.asarray((np.arange(B) + i * B) % U, np.int32)

    if args.eval:
        from sat_tpu.parallel import (make_bank_eval_block,
                                      make_bank_eval_step)
        ev = make_bank_eval_step(cfg, alpha_c=1.0)
        ev_block = make_bank_eval_block(cfg, alpha_c=1.0)
        params = state.params

        def run_per_batch(state, step0, n):
            """Per-batch eval protocol: 4 scalar syncs + token readback,
            one batch behind (engine/loop.py _eval_per_batch/finish)."""
            pending = None
            for i in range(n):
                idx = batch_idx(step0 + i)
                m, toks, _al = ev(params, feats, caps, idx, idx, mask)
                if pending is not None:
                    pm, pt = pending
                    _ = (float(pm["loss"]), float(pm["acc1"]),
                         float(pm["acc5"]), int(pm["caption_length"]),
                         np.asarray(pt))
                pending = (m, toks)
            pm, pt = pending
            _ = (float(pm["loss"]), np.asarray(pt))
            return state

        def run_blocked(state, step0, n):
            """Blocked eval protocol: one device_get of stacked metrics +
            one token fetch per K batches (engine/loop.py _eval_blocked)."""
            pending = None
            for b in range(n // K):
                s0 = step0 + b * K
                ii = np.stack([batch_idx(s0 + j) for j in range(K)])
                mm = np.ones((K, B), bool)
                mk, tk = ev_block(params, feats, caps, ii, ii, mm)
                if pending is not None:
                    _ = (jax.device_get(pending[0]), np.asarray(pending[1]))
                pending = (mk, tk)
            _ = (jax.device_get(pending[0]), np.asarray(pending[1]))
            return state

    def run_per_batch_train(state, step0, n):
        """n per-batch dispatches with one-behind metric float() reads."""
        pending = None
        for i in range(n):
            idx = batch_idx(step0 + i)
            r = jax.random.fold_in(base_rng, step0 + i)
            state, m = step(state, feats, caps, idx, idx, lr, r, mask)
            if pending is not None:
                _ = (float(pending["loss"]), float(pending["acc1"]),
                     float(pending["acc5"]),
                     int(pending["caption_length"]))
            pending = m
        _ = (float(pending["loss"]), float(pending["acc1"]),
             float(pending["acc5"]), int(pending["caption_length"]))
        return state

    # shared with bench.py's measure_train_blocked — one home for the
    # blocked one-behind protocol so the A/B tool and the artifact leg
    # cannot measure different things (review r3)
    from sat_tpu.utils.benchmarks import blocked_train_runner
    run_blocked_train = blocked_train_runner(block, feats, caps, lr,
                                             base_rng, K, B, U)

    if not args.eval:
        run_per_batch, run_blocked = run_per_batch_train, run_blocked_train

    # warm both programs (compile) + one spare to fill caches
    t0 = time.perf_counter()
    state = run_per_batch(state, 0, 2)
    state = run_blocked(state, 2, K)
    print(f"# compile+warm {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    walls = {"per_batch": [], "blocked": []}
    step0 = 2 + K
    for rep in range(args.reps):
        for mode, fn in (("per_batch", run_per_batch),
                         ("blocked", run_blocked)):
            t0 = time.perf_counter()
            state = fn(state, step0, S)
            walls[mode].append((time.perf_counter() - t0) / S * 1e3)
            step0 += S
            print(f"# rep {rep} {mode}: {walls[mode][-1]:.2f} ms/step",
                  file=sys.stderr)

    a = float(np.median(walls["per_batch"]))
    b = float(np.median(walls["blocked"]))
    print({"path": "eval" if args.eval else "train",
           "batch": B, "k": K, "steps_per_segment": S, "reps": args.reps,
           "per_batch_ms_per_step": round(a, 2),
           "blocked_ms_per_step": round(b, 2),
           "per_batch_rows_per_sec": round(B / a * 1e3, 1),
           "blocked_rows_per_sec": round(B / b * 1e3, 1),
           "speedup": round(a / b, 2)})


if __name__ == "__main__":
    main()
