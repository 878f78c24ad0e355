#!/usr/bin/env python
"""Per-backbone encoder roofline study on the real chip (VERDICT r2 next #1).

Measures the frozen-CNN forward (the serving path's dominant cost — ~75% of
e2e at B=64 after the round-2 beam dedup) per backbone and variant:

  vgg19        f32 / f32+s2d / f32-HIGHEST / bf16 / bf16+s2d
  resnet152    f32 / bf16
  densenet161  f32 / bf16

For each: slope-measured device time, TFLOP/s, and MFU against the v5e bf16
peak (FLOPs from XLA cost analysis of the exact compiled program). s2d =
space-to-depth first conv (models/encoder.py:_conv1_s2d_kernel) — same math,
4x MXU reduction-lane utilization on the 3-channel conv. HIGHEST = 6-pass
f32 emulation (parity headroom A/B; DEFAULT already does bf16-multiply /
f32-accumulate on the MXU).

Usage: python tools/bench_encoder.py [--batch 64] [--networks vgg19,...]
"""

import argparse
import json
import sys

import numpy as np

V5E_PEAK_FLOPS = 197e12


def _init_on_host(init_fn, *args):
    import jax
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return init_fn(*args)


def measure(network: str, batch: int, compute_dtype, s2d: bool,
            precision: str | None):
    import jax
    import jax.numpy as jnp
    from sat_tpu.models.encoder import encoder_forward, init_encoder_params
    from sat_tpu.utils.timing import device_time

    params = _init_on_host(init_encoder_params, jax.random.PRNGKey(0), network)
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 224, 224, 3)).astype(np.float32))

    def fwd(x):
        if precision:
            with jax.default_matmul_precision(precision):
                return encoder_forward(params, network, x, compute_dtype,
                                       s2d_conv1=s2d)
        return encoder_forward(params, network, x, compute_dtype,
                               s2d_conv1=s2d)

    def body(x, i):
        f = fwd(x)
        return x + 1e-20 * f.sum()

    flops = None
    try:
        ca = jax.jit(lambda x: fwd(x).sum()).lower(imgs).compile() \
                .cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    dt = device_time(body, imgs, n_lo=1, n_hi=4, reps=5)
    out = {"network": network, "batch": batch,
           "dtype": "bf16" if compute_dtype is not None else "f32",
           "s2d_conv1": s2d, "precision": precision or "default",
           "ms_per_batch": round(dt * 1e3, 3),
           "imgs_per_sec": round(batch / dt, 1)}
    if flops:
        out["tflops_per_sec"] = round(flops / dt / 1e12, 2)
        out["mfu_pct_vs_bf16_peak"] = round(flops / dt / V5E_PEAK_FLOPS * 100, 1)
    return out


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
            res = measure(net, args.batch, dt, s2d, prec)
            print(json.dumps(res), flush=True)
        except Exception as e:
            print(json.dumps({"network": net, "s2d_conv1": s2d,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
