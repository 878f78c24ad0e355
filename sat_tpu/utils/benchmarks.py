"""Shared measurement scaffolding for bench.py and tools/bench_encoder.py.

One home for the peak constant, host-side param init, XLA cost-analysis
FLOPs extraction, and the encoder-variant measurement, so the two scripts
cannot drift apart (review r3: each had its own copy of the cost_analysis
list-vs-dict quirk handling and the v5e peak).
"""

from __future__ import annotations

import numpy as np

# bf16 peak of one TPU v5e chip (MXU). f32-path MFU is reported against
# this — conservative (the f32-via-bf16 practical peak is lower).
V5E_PEAK_FLOPS = 197e12

# HBM bandwidth roofline of one v5e chip. Achieved-bytes/s against this is
# the honest utilization axis for the bandwidth-bound train/decode steps
# (VERDICT r3 weak #2 — MFU alone reads as "25x from peak" on a step that
# measures AT its HBM roofline).
V5E_HBM_BYTES_PER_SEC = 819e9


def init_on_host(init_fn, *args):
    """Run a param-init function on the host CPU backend. Random init is
    dozens of small device ops; over the tunnel in a slow phase those alone
    measured 425s (the compile itself took 12s). CPU-init + bulk transfer
    keeps the watchdogs for actual measurement."""
    import jax
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return init_fn(*args)


def compiled_flops(fn, *args):
    """FLOPs of the exact compiled program per XLA cost analysis (which
    counts 2 per MAC), or None when the backend doesn't report them."""
    import jax
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def measure_encoder_variant(network: str, batch: int, compute_dtype=None,
                            s2d: bool = False, precision: str | None = None,
                            n_lo: int = 1, n_hi: int = 4, reps: int = 5):
    """Slope-measured encoder forward: ms/batch, imgs/s, TFLOP/s, MFU.

    Returns a dict (the tools/bench_encoder.py record shape). `precision`
    is a jax.default_matmul_precision name ("highest" for the 6-pass f32
    A/B); `s2d` routes VGG19 through the space-to-depth first conv.
    """
    import jax
    import jax.numpy as jnp

    from sat_tpu.models.encoder import encoder_forward, init_encoder_params
    from sat_tpu.utils.timing import device_time

    params = init_on_host(init_encoder_params, jax.random.PRNGKey(0), network)
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 224, 224, 3)).astype(np.float32))

    def fwd(x, p):
        if precision:
            with jax.default_matmul_precision(precision):
                return encoder_forward(p, network, x, compute_dtype,
                                       s2d_conv1=s2d)
        return encoder_forward(p, network, x, compute_dtype,
                               s2d_conv1=s2d)

    # params as real arguments (not closure constants inlined into the
    # HLO upload — see sat_tpu.utils.timing._runner)
    flops = compiled_flops(lambda x, p: fwd(x, p).sum(), imgs, params)
    dt = device_time(lambda x, i, p: x + 1e-20 * fwd(x, p).sum(), imgs,
                     n_lo=n_lo, n_hi=n_hi, reps=reps, aux=params)
    if dt <= 0:
        # device_time floors a negative median slope at 0.0 — an
        # RT-dominated glitch phase, not a real measurement (review r3:
        # dividing by it crashed the caller instead of getting the
        # discard treatment other implausible samples receive).
        raise RuntimeError(
            f"implausible encoder slope ({network} B={batch}): dt={dt}")
    out = {"network": network, "batch": batch,
           "dtype": "bf16" if compute_dtype is not None else "f32",
           "s2d_conv1": s2d, "precision": precision or "default",
           "ms_per_batch": round(dt * 1e3, 3),
           "imgs_per_sec": round(batch / dt, 1)}
    if flops:
        out["tflops_per_sec"] = round(flops / dt / 1e12, 2)
        out["mfu_pct_vs_bf16_peak"] = round(
            flops / dt / V5E_PEAK_FLOPS * 100, 1)
    return out


def resnet152_stage_plan(params, batch: int):
    """(name, fn, input_shape, stage_params) stages of the ResNet152
    forward (stem, layer1..layer4 — reference encoder.py:13-17 keeps the
    body minus avgpool/fc). Each stage's input shape is the previous one's
    output shape (chaining asserted by tests/test_bench_gates.py via
    jax.eval_shape), so the sum of stage times is the full forward. Stage
    fns take (x, stage_params) so the weights are jit ARGUMENTS — closing
    over them inlines up to ~144MB (layer3) of constants into the HLO
    upload (see sat_tpu.utils.timing._runner)."""
    import jax

    from sat_tpu.models.encoder import _bottleneck, batch_norm, conv2d, \
        max_pool

    def stem(x, p):
        x = conv2d(x, p["conv1"]["w"], stride=2,
                   padding=[(3, 3), (3, 3)])
        x = jax.nn.relu(batch_norm(x, p["bn1"]))
        return max_pool(x, window=3, stride=2,
                        padding=[(0, 0), (1, 1), (1, 1), (0, 0)])

    def layer(li):
        def fwd(x, blocks):
            stride = 1 if li == 1 else 2
            for bi, block in enumerate(blocks):
                x = _bottleneck(block, x, stride if bi == 0 else 1)
            return x
        return fwd

    return [("stem", stem, (batch, 224, 224, 3),
             {"conv1": params["conv1"], "bn1": params["bn1"]}),
            ("layer1", layer(1), (batch, 56, 56, 64), params["layer1"]),
            ("layer2", layer(2), (batch, 56, 56, 256), params["layer2"]),
            ("layer3", layer(3), (batch, 28, 28, 512), params["layer3"]),
            ("layer4", layer(4), (batch, 14, 14, 1024), params["layer4"])]


def measure_resnet152_stages(batch: int, n_lo: int = 1, n_hi: int = 3,
                             reps: int = 3):
    """Parts-wise live measurement of the ResNet152 forward (VERDICT r3
    next #3): the whole ~155-layer HLO has wedged the tunnel's
    remote-compile endpoint and hit its HTTP-413 upload cap, so each stage
    is slope-measured as its own small program on its own input shape.
    Returns per-stage seconds plus summed TFLOP/s / MFU — live numbers
    replacing the CPU-cost-analysis 'derived' rows in
    docs/ARCHITECTURE.md."""
    import jax

    from sat_tpu.models.encoder import init_resnet152_params

    params = init_on_host(init_resnet152_params, jax.random.PRNGKey(0))
    plan = resnet152_stage_plan(params, batch)
    return _measure_stage_plan("resnet", plan, batch, n_lo, n_hi, reps)


def _measure_stage_plan(what: str, plan, batch: int, n_lo: int, n_hi: int,
                        reps: int):
    """Slope-measure each (name, fn, input_shape) stage as its own small
    program; the sum of stage times is the full forward when each stage's
    input shape is the previous one's output. Shared by the resnet152 and
    densenet161 parts-wise measurers."""
    import jax.numpy as jnp

    from sat_tpu.utils.timing import device_time

    stages, total_flops, total_sec, total_bytes = [], 0.0, 0.0, 0.0
    flops_complete = bytes_complete = True
    for name, fn, shape, p in plan:
        x = jnp.asarray(np.random.default_rng(0).normal(size=shape)
                        .astype(np.float32))
        flops, nbytes = compiled_cost(lambda v, a: fn(v, a).sum(), x, p)
        dt = device_time(lambda v, i, a: v + 1e-20 * fn(v, a).sum(), x,
                         n_lo=n_lo, n_hi=n_hi, reps=reps, aux=p)
        if dt <= 0:
            raise RuntimeError(f"implausible {what} stage slope "
                               f"({name} B={batch}): dt={dt}")
        stages.append({"stage": name, "sec_per_batch": dt,
                       "flops": flops, "bytes": nbytes})
        total_sec += dt
        if flops:
            total_flops += flops
        else:
            flops_complete = False
        if nbytes:
            total_bytes += nbytes
        else:
            bytes_complete = False
    out = {"stages": stages, "sec_per_batch": total_sec,
           "imgs_per_sec": round(batch / total_sec, 1)}
    # TFLOP/s and MFU only when EVERY stage reported cost-analysis flops:
    # a partial flops sum over the full summed time would emit a
    # plausible-looking but understated number into the artifact
    # (review r4) — compiled_flops returns None on any backend hiccup.
    if total_flops and flops_complete:
        out["tflops_per_sec"] = total_flops / total_sec / 1e12
        out["mfu_pct_vs_bf16_peak"] = (total_flops / total_sec
                                       / V5E_PEAK_FLOPS * 100)
    # The bandwidth axis (VERDICT r4 next #4): a concat-heavy body like
    # DenseNet is bound by HBM traffic, not MACs — its low MFU is only
    # "unexplained" until the achieved-bytes/s sits next to it.
    if total_bytes and bytes_complete:
        out["hbm_util_pct"] = (total_bytes / total_sec
                               / V5E_HBM_BYTES_PER_SEC * 100)
    return out


def densenet161_stage_plan(params, batch: int):
    """(name, fn, input_shape, stage_params) stages of the DenseNet161
    forward (stem, block1+trans1 .. block3+trans3, block4 — reference
    encoder.py:18-22 keeps features minus norm5). Stage input shapes are
    derived from the DenseNet growth arithmetic so they cannot drift from
    the model definition; chaining is asserted by tests/test_bench_gates.py.
    Stage fns take (x, stage_params) — see resnet152_stage_plan."""
    import jax

    from sat_tpu.models.encoder import (DENSENET161_BLOCKS, DENSENET_GROWTH,
                                        DENSENET_INIT, _dense_layer,
                                        avg_pool, batch_norm, conv2d,
                                        max_pool)

    def stem(x, p):
        x = conv2d(x, p["conv0"]["w"], stride=2,
                   padding=[(3, 3), (3, 3)])
        x = jax.nn.relu(batch_norm(x, p["norm0"]))
        return max_pool(x, window=3, stride=2,
                        padding=[(0, 0), (1, 1), (1, 1), (0, 0)])

    def block(bi):
        def fwd(x, p):
            for layer in p[f"block{bi}"]:
                x = _dense_layer(layer, x)
            if bi < 4:
                t = p[f"trans{bi}"]
                x = jax.nn.relu(batch_norm(x, t["norm"]))
                x = conv2d(x, t["conv"]["w"])
                x = avg_pool(x)
            return x
        return fwd

    plan = [("stem", stem, (batch, 224, 224, 3),
             {"conv0": params["conv0"], "norm0": params["norm0"]})]
    ch, hw = DENSENET_INIT, 56
    for bi, n_layers in enumerate(DENSENET161_BLOCKS, start=1):
        sp = {f"block{bi}": params[f"block{bi}"]}
        if bi < 4:
            sp[f"trans{bi}"] = params[f"trans{bi}"]
        plan.append((f"block{bi}", block(bi), (batch, hw, hw, ch), sp))
        ch += n_layers * DENSENET_GROWTH
        if bi < 4:                      # transition halves channels+spatial
            ch //= 2
            hw //= 2
    return plan


def measure_densenet161_stages(batch: int, n_lo: int = 1, n_hi: int = 3,
                               reps: int = 3):
    """Parts-wise live measurement of the DenseNet161 forward (VERDICT r3
    next #3, "densenet161 if the chip cooperates"): the dense-concat body
    compiles to an even larger HLO than ResNet152's (which already wedged
    the tunnel's remote-compile endpoint), so each stage runs as its own
    small program on its own input shape."""
    import jax

    from sat_tpu.models.encoder import init_densenet161_params

    params = init_on_host(init_densenet161_params, jax.random.PRNGKey(0))
    plan = densenet161_stage_plan(params, batch)
    return _measure_stage_plan("densenet", plan, batch, n_lo, n_hi, reps)


def measure_decoder_grad_ab(variants, batch: int = 64, rounds: int = 2,
                            n_lo: int = 2, n_hi: int = 10, reps: int = 3,
                            progress=None):
    """Interleaved A/B of the full train-grad+update body across decoder
    config variants (e.g. remat_scan on/off x bf16_attention on/off).

    DEVICE time per step via sat_tpu.utils.timing.device_time (in-jit
    repetition slope — tunnel round-trip cancels); variants run round-robin
    within ONE process so a tunnel phase change corrupts at most one round
    (CLAUDE.md: never compare numbers across runs minutes apart). Shared by
    bench.py's leg_remat and tools/bench_remat.py so the measured program
    cannot drift between the artifact and the A/B tool.

    `variants` maps name -> DecoderConfig (all must share vocab/encoder
    dims — params are initialized once from the first). Returns
    {name: [ms-per-step sample per round]}.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from sat_tpu.models.decoder import init_decoder_params
    from sat_tpu.parallel.train_step import _loss_and_metrics, make_optimizer
    from sat_tpu.utils.timing import device_time

    L, T = 196, 27                      # VGG19 grid, Flickr8k caption cap
    first = next(iter(variants.values()))
    rng = np.random.default_rng(0)
    params = init_on_host(init_decoder_params, jax.random.PRNGKey(0), first)
    feats = jnp.asarray(rng.normal(
        size=(batch, L, first.encoder_dim)).astype(np.float32))
    caps = jnp.asarray(rng.integers(
        4, first.vocab_size, size=(batch, T)).astype(np.int32))
    drop = jax.random.PRNGKey(1)
    tx = make_optimizer()

    def make_body(cfg):
        def body(carry, i, data):
            f, c = data
            params, opt_state = carry
            step_rng = jax.random.fold_in(drop, i)
            _, grads = jax.value_and_grad(
                lambda p: _loss_and_metrics(cfg, 1.0, p, f, c,
                                            step_rng, True),
                has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -1e-4 * u, updates)
            return (optax.apply_updates(params, updates), opt_state)
        return body

    carry0 = (params, tx.init(params))
    samples = {name: [] for name in variants}
    for r in range(rounds):
        for name, cfg in variants.items():
            dt = device_time(make_body(cfg), carry0,
                             n_lo=n_lo, n_hi=n_hi, reps=reps,
                             aux=(feats, caps))
            samples[name].append(dt * 1e3)
            if progress:
                progress(r, name, dt)
    return samples


def remat_variant_cfgs(base):
    """The four --remat-scan A/B arms from a base DecoderConfig: f32 and
    bf16-attention, each with and without scan-body rematerialization.
    Both states are pinned explicitly so the arms stay distinct regardless
    of the DecoderConfig.remat_scan default (flipped to True 2026-08-19)."""
    import dataclasses
    return {
        "f32": dataclasses.replace(base, remat_scan=False),
        "f32_remat": dataclasses.replace(base, remat_scan=True),
        "bf16": dataclasses.replace(base, bf16_attention=True,
                                    remat_scan=False),
        "bf16_remat": dataclasses.replace(base, bf16_attention=True,
                                          remat_scan=True),
    }


def measure_beam_ab(dec_params, cfg, variants, batch: int = 64,
                    beam: int = 5, rounds: int = 2, n_lo: int = 1,
                    n_hi: int = 4, reps: int = 3, progress=None):
    """Interleaved A/B of the worst-case batched beam (callers pin the stop
    logits, e.g. bench._worst_case_decoder, so all 51 steps run) across
    beam_search_batched keyword variants (e.g. pallas_topk / fast_topk).

    Same slope/interleaving protocol as measure_decoder_grad_ab; shared by
    bench.py's leg_topk and tools/bench_topk.py. `variants` maps name ->
    beam_search_batched extra kwargs. Returns {name: [ms sample/round]}.
    """
    import jax.numpy as jnp

    from sat_tpu.models.beam import beam_search_batched
    from sat_tpu.utils.timing import device_time

    L = 196
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, L, cfg.encoder_dim)).astype(np.float32))

    def make_body(kw):
        def body(x, i, p):
            r = beam_search_batched(p, cfg, x, beam, **kw)
            # chain on TOKENS, not score: the worst-case beam never
            # completes, so score is -inf and would poison the carry —
            # every rep after the first would decode -inf/NaN features,
            # and (worse for an A/B) the two arms can then run different
            # trip counts on the garbage inputs. Tokens are always finite
            # and data-depend on the full decode.
            return x + 1e-20 * r.tokens.sum().astype(x.dtype)
        return body

    samples = {name: [] for name in variants}
    for r in range(rounds):
        for name, kw in variants.items():
            dt = device_time(make_body(kw), feats,
                             n_lo=n_lo, n_hi=n_hi, reps=reps,
                             aux=dec_params)
            samples[name].append(dt * 1e3)
            if progress:
                progress(r, name, dt)
    return samples


def blocked_train_runner(block, feats, caps, lr, base_rng, k, batch,
                         n_bank):
    """One-behind blocked-dispatch driver — the engine/loop.py blocked-epoch
    protocol (dispatch a (k, B) index block, bulk device_get the PREVIOUS
    block's stacked metrics), shared by bench.py's
    measure_train_blocked and tools/bench_spd.py so the measured protocol
    cannot drift between the artifact and the A/B tool.

    Returns `run(state, step0, n_steps) -> state` (n_steps must be a
    multiple of k)."""
    import jax
    import jax.numpy as jnp

    mask = np.ones((k, batch), bool)

    def run(state, step0, n):
        pending = None
        for b in range(n // k):
            s0 = step0 + b * k
            ii = np.stack([(np.arange(batch) + (s0 + j) * batch) % n_bank
                           for j in range(k)]).astype(np.int32)
            state, mk = block(state, feats, caps, ii, ii, lr, base_rng,
                              jnp.int32(s0), mask)
            if pending is not None:
                jax.device_get(pending)
            pending = mk
        jax.device_get(pending)
        return state

    return run


def compiled_cost(fn, *args):
    """(flops, hbm_bytes) of the exact compiled program per XLA cost
    analysis, either None when the backend doesn't report it. Same
    list-vs-dict quirk handling as compiled_flops."""
    import jax
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)) or None,
                float(ca.get("bytes accessed", 0.0)) or None)
    except Exception:
        return None, None


def measure_train_accounting(batch: int = 64, n_lo: int = 2, n_hi: int = 10,
                             reps: int = 3, remat: bool = True,
                             progress=None, shapes=None):
    """Per-block device-time accounting of the flagship train step
    (VERDICT r4 weak #3: reconcile train_hbm_util_pct with the "at
    roofline" story — extend the decode-step accounting table to the full
    train step).

    Measured blocks (each slope-timed in the SAME process, so the shares
    are phase-robust even when the absolute ms are not):
      step      full grad + Adam update (the production program)
      grad      value_and_grad only (no optimizer)
      fwd       loss forward only (scan + head + CE/att-reg)
      head      dropout + ado output head + CE from fixed (hs, ctxs, embs)
                — the post-scan forward tail at its real (B*(T-1), E)x(E,V)
                shapes
      head_grad `head` plus its backward (d/dW AND d/dactivations)
      adam      optimizer update alone on a params-shaped grads tree

    Derived (printed by tools/bench_train_accounting.py, recorded by
    bench.py's accounting leg):
      scan_fwd   = fwd - head          (embedding + per-step attention/LSTM)
      head_bwd   = head_grad - head    (the head's backward-only cost)
      scan_bwd   = grad - fwd - head_bwd  (scan backward incl. remat
                                           recompute under the default)
      residual   = step - grad - adam  (scheduling gaps; ~0 when additive)

    Each block also gets XLA cost-analysis (flops, bytes) of a standalone
    jit so the table can state per-block rooflines: roofline_ms =
    max(flops/PEAK, bytes/HBM_BW). Returns {block: {"ms": [...samples],
    "flops": f, "bytes": b}}.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from sat_tpu.models.decoder import (DecoderConfig, _advanced_deep_output,
                                        _dropout, init_decoder_params)
    from sat_tpu.parallel.train_step import _loss_and_metrics, make_optimizer
    from sat_tpu.utils.metrics import reference_packed_cross_entropy
    from sat_tpu.utils.timing import device_time

    # flagship shapes; `shapes` overrides (L, E, T, V) for CPU smoke tests
    B, (L, E, T, V) = batch, (shapes or (196, 512, 27, 2633))
    cfg = DecoderConfig(vocab_size=V, encoder_dim=E, use_tf=True,
                        use_ado=True, use_attention=True, remat_scan=remat)
    rng = np.random.default_rng(0)
    params = init_on_host(init_decoder_params, jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(rng.normal(size=(B, L, E)).astype(np.float32))
    caps = jnp.asarray(rng.integers(4, V, size=(B, T)).astype(np.int32))
    drop = jax.random.PRNGKey(1)
    tx = make_optimizer()

    def loss_fn(p, f, c, i):
        l, _ = _loss_and_metrics(cfg, 1.0, p, f, c,
                                 jax.random.fold_in(drop, i), True)
        return l

    # Post-scan head inputs at their real shapes: the tf branch embeds
    # caps[:, :-1] (T-1 steps) and feeds (hs, ctxs, embs) to dropout+ado.
    # hs/embs carry embedding_size (fixed 512 non-BERT — a property, not
    # encoder_dim); ctxs carries encoder_dim.
    Tm = T - 1
    hs = jnp.asarray(rng.normal(
        size=(B, Tm, cfg.embedding_size)).astype(np.float32))
    ctxs = jnp.asarray(rng.normal(
        size=(B, Tm, cfg.encoder_dim)).astype(np.float32))
    embs = jnp.asarray(rng.normal(
        size=(B, Tm, cfg.embedding_size)).astype(np.float32))

    def head_fn(hp, h_in, cx, em, tgt, i):
        h_do = _dropout(h_in, cfg.dropout_rate, jax.random.fold_in(drop, i))
        preds = _advanced_deep_output(hp, h_do, cx, em)
        return reference_packed_cross_entropy(preds, tgt)

    grads_const = jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, 1e-6), params)

    # Shared aux pytree: every large array rides the jit as a REAL
    # ARGUMENT (see sat_tpu.utils.timing._runner — closed-over arrays are
    # inlined as HLO constants, bloating the remote-compile upload by
    # ~90MB here: feats + params + a params-shaped grads tree).
    aux = {"feats": feats, "caps": caps, "hs": hs, "ctxs": ctxs,
           "embs": embs, "params": params, "grads": grads_const}

    # --- bodies (each threads its carry so scan reps can't be hoisted) ---
    def body_step(carry, i, a):
        p, s = carry
        _, g = jax.value_and_grad(
            lambda q: _loss_and_metrics(cfg, 1.0, q, a["feats"], a["caps"],
                                        jax.random.fold_in(drop, i), True),
            has_aux=True)(p)
        u, s = tx.update(g, s, p)
        u = jax.tree_util.tree_map(lambda x: -1e-4 * x, u)
        return (optax.apply_updates(p, u), s)

    def body_grad(p, i, a):
        g = jax.grad(loss_fn)(p, a["feats"], a["caps"], i)
        return jax.tree_util.tree_map(lambda x, d: x - 1e-7 * d, p, g)

    def body_fwd(c, i, a):
        return loss_fn(a["params"], a["feats"] + c * 1e-20, a["caps"],
                       i) * 1e-20

    def body_head(c, i, a):
        return head_fn(a["params"], a["hs"] + c * 1e-20, a["ctxs"],
                       a["embs"], a["caps"][:, 1:], i) * 1e-20

    def body_head_grad(hp, i, a):
        l, g = jax.value_and_grad(head_fn)(hp, a["hs"], a["ctxs"],
                                           a["embs"], a["caps"][:, 1:], i)
        return jax.tree_util.tree_map(lambda x, d: x - 1e-7 * d, hp, g)

    def body_adam(carry, i, a):
        p, s = carry
        u, s = tx.update(a["grads"], s, p)
        u = jax.tree_util.tree_map(lambda x: -1e-30 * x, u)
        return (optax.apply_updates(p, u), s)

    blocks = {
        "step": (body_step, (params, tx.init(params))),
        "grad": (body_grad, params),
        "fwd": (body_fwd, jnp.float32(0.0)),
        "head": (body_head, jnp.float32(0.0)),
        "head_grad": (body_head_grad, params),
        "adam": (body_adam, (params, tx.init(params))),
    }
    costs = {
        "step": lambda: compiled_cost(
            lambda p, a: body_step((p, tx.init(p)), 0, a), params, aux),
        "grad": lambda: compiled_cost(
            lambda p, a: body_grad(p, 0, a), params, aux),
        "fwd": lambda: compiled_cost(
            lambda f, a: loss_fn(a["params"], f, a["caps"], 0), feats, aux),
        "head": lambda: compiled_cost(
            lambda h, a: head_fn(a["params"], h, a["ctxs"], a["embs"],
                                 a["caps"][:, 1:], 0), hs, aux),
        "head_grad": lambda: compiled_cost(
            lambda p, a: body_head_grad(p, 0, a), params, aux),
        "adam": lambda: compiled_cost(
            lambda p, a: body_adam((p, tx.init(p)), 0, a), params, aux),
    }

    # Sub-millisecond blocks need MORE in-jit reps for the slope to rise
    # above the tunnel's RT noise: at (2, 10) the head/adam signal is
    # ~8 x 0.2 ms = 1.6 ms against RT swings of up to 30 ms, so marginal
    # phases glitch them to zero slopes while the multi-ms step/grad
    # blocks measure fine (observed 20:33Z: step 2.90 ms plausible,
    # grad/fwd/head/adam all 0.0). 3x the reps costs ~50 ms per sample
    # and makes marginal windows usable.
    rep_plan = {"fwd": (n_lo, 3 * n_hi), "head": (n_lo, 3 * n_hi),
                "head_grad": (n_lo, 3 * n_hi), "adam": (n_lo, 3 * n_hi)}

    out = {}
    for name, (body, carry0) in blocks.items():
        flops, nbytes = costs[name]()
        out[name] = {"ms": [], "flops": flops, "bytes": nbytes}
    # interleave rounds across blocks (the same phase-robustness contract
    # as measure_decoder_grad_ab: a phase change corrupts one round, and
    # the SHARES between blocks stay honest)
    for r in range(reps):
        for name, (body, carry0) in blocks.items():
            lo, hi = rep_plan.get(name, (n_lo, n_hi))
            dt = device_time(body, carry0, n_lo=lo, n_hi=hi, reps=3,
                             aux=aux)
            out[name]["ms"].append(dt * 1e3)
            if progress:
                progress(r, name, dt)
    return out
