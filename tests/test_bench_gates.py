"""Plausibility gates on bench.py's recorded artifact line.

The driver records bench.py's single JSON line as the round's artifact of
record (BENCH_rN.json), so the gating logic IS product surface: a gate bug
either poisons the artifact with a tunnel-phase glitch or silently
understates the system (VERDICT r2 weak #1/#2). These tests drive
``bench.main()`` end-to-end with scripted measurement results and assert
the documented behavior of every gate:

- high glitches (slope artifacts above physical ceilings) are discarded;
- low samples are retried keeping the BEST plausible value (glitches bias
  low — a retry must never downgrade an honest measurement);
- still-low results are recorded WITH a phase annotation, never silently;
- a failure in one measurement leg never skips an independent leg;
- if every headline attempt glitches, the line carries an honest zero plus
  an ``error`` field (so vs_baseline cannot be poisoned).

Everything device-touching is stubbed; the real measurement paths are
covered by the driver's live bench runs.
"""

import json

import pytest

import bench
import sat_tpu.utils.compilation_cache as _cc


@pytest.fixture
def bench_stubs(monkeypatch, tmp_path):
    """Stub every heavy/device-touching leg of bench.main with healthy
    defaults; individual tests override the leg under test. Runs the legs
    in-process (monkeypatched stubs don't cross the real orchestrator's
    subprocess boundary) against throwaway partials/run files."""
    monkeypatch.setattr(_cc, "enable_persistent_cache", lambda: None)
    monkeypatch.setattr(bench, "IN_PROCESS", True)
    monkeypatch.setenv("SAT_BENCH_PARTIALS", str(tmp_path / "harvest.json"))
    monkeypatch.setenv("SAT_BENCH_RUN_OUT", str(tmp_path / "run.json"))
    monkeypatch.setattr(bench, "_tpu_responsive", lambda timeout_s=60: True)
    monkeypatch.setattr(bench, "measure_reference", lambda: 2.0)
    monkeypatch.setattr(bench, "measure_latency", lambda: 1.5)
    monkeypatch.setattr(bench, "measure_encoder",
                        lambda backbone: (20.0, 55.0, 27.9))
    monkeypatch.setattr(bench, "measure_train",
                        lambda bf16=False: (11000.0, 1.0e12, 10.0, 55.0))
    monkeypatch.setattr(bench, "measure_train_blocked",
                        lambda **kw: 6100.0)
    monkeypatch.setattr(bench, "measure_remat_ab",
                        lambda: {"f32": [6.3, 6.4], "f32_remat": [5.8, 5.9],
                                 "bf16": [4.9, 5.0],
                                 "bf16_remat": [4.6, 4.7]})
    monkeypatch.setattr(bench, "measure_topk_ab",
                        lambda: {"lax": [6.3, 6.4], "pallas": [5.6, 5.7]})
    monkeypatch.setattr(bench, "measure_resnet_e2e", lambda: 2100.0)
    monkeypatch.setattr(bench, "measure_accounting",
                        lambda: _acct(3.0, 2.6, 1.0, 0.3, 0.9, 0.35))
    monkeypatch.setattr(bench, "measure_serve_device",
                        lambda **kw: {"requests": 512, "errors": 0,
                                      "req_per_sec": 950.0, "p50_ms": 31.0})
    monkeypatch.setattr(
        bench, "measure_resnet_parts",
        lambda: pytest.fail("parts fallback must not run when the "
                            "whole-program resnet leg succeeds"))
    monkeypatch.setattr(
        bench, "measure_densenet_e2e",
        lambda: (_ for _ in ()).throw(RuntimeError("stub: use parts path")))
    monkeypatch.setattr(
        bench, "measure_densenet_parts",
        lambda: {"captions_per_sec_beam5_densenet161_e2e": 1700.0,
                 "captions_per_sec_beam5_densenet161_e2e_note":
                     "sum of per-stage encoder + decode-only slope "
                     "measurements",
                 "encoder_densenet161_tflops": 70.0,
                 "encoder_densenet161_mfu_pct": 35.5})
    monkeypatch.setattr(
        bench, "measure_densenet_stages",
        lambda: {"tflops_per_sec": 28.1, "mfu_pct_vs_bf16_peak": 14.3,
                 "hbm_util_pct": 68.0})
    return monkeypatch


def _run(monkeypatch, capsys, headline_script, fast_cps=3000.0):
    """Drive bench.main() with scripted parity-mode headline measurements;
    return (parsed JSON line, stderr text)."""
    it = iter(headline_script)

    def fake_measure_tpu(fast_mode=False):
        return fast_cps if fast_mode else next(it)

    monkeypatch.setattr(bench, "measure_tpu", fake_measure_tpu)
    bench.main()
    cap = capsys.readouterr()
    return json.loads(cap.out.strip().splitlines()[-1]), cap.err


def test_healthy_headline_first_attempt(bench_stubs, capsys):
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["value"] == 2600.0
    assert "value_note" not in line
    assert line["vs_baseline"] == pytest.approx(1300.0)
    # healthy run records every leg
    assert line["fast_mode_captions_per_sec"] == 3000.0
    assert line["train_rows_per_sec"] == 11000.0
    assert line["train_rows_per_sec_bf16"] == 11000.0
    assert line["single_image_latency_ms"] == 1.5
    assert line["encoder_vgg19_tflops"] == 55.0
    # round-4 additions: baseline provenance, sampling policy, the
    # bandwidth-roofline axis, and the resnet152 e2e leg
    assert line["baseline_source"] == "live"
    assert "best plausible" in line["sampling_policy"]
    assert line["train_hbm_util_pct"] == 55.0
    assert line["captions_per_sec_beam5_resnet152_e2e"] == 2100.0
    assert line["captions_per_sec_beam5_densenet161_e2e"] == 1700.0
    # the dedicated util leg runs after the e2e legs and owns the
    # utilization axes (supersedes the parts fallback's values)
    assert line["encoder_densenet161_tflops"] == 28.1
    assert line["encoder_densenet161_hbm_util_pct"] == 68.0
    # A/B legs record the phase-robust internal ratios (median over rounds)
    assert line["train_remat_speedup_f32"] == pytest.approx(6.35 / 5.85,
                                                            abs=1e-3)
    assert line["train_remat_speedup_bf16"] == pytest.approx(4.95 / 4.65,
                                                             abs=1e-3)
    assert line["beam_pallas_topk_speedup"] == pytest.approx(6.35 / 5.65,
                                                             abs=1e-3)
    assert line["beam_topk_pallas_ms"] == pytest.approx(5.65)


def test_partials_checkpointed_per_leg(bench_stubs, capsys, tmp_path):
    """Every completed leg must land in the run checkpoint AND the
    cumulative harvest file, so a mid-run wedge can't zero the round."""
    import os
    _run(bench_stubs, capsys, [2600.0])
    run = json.loads(open(os.environ["SAT_BENCH_RUN_OUT"]).read())
    assert run["value"] == 2600.0
    harvest = json.loads(open(os.environ["SAT_BENCH_PARTIALS"]).read())
    assert harvest["fields"]["value"] == 2600.0
    assert harvest["fields"]["train_rows_per_sec"] == 11000.0
    assert harvest["meta"]["value"]["via"] == "bench"
    assert "measured_at" in harvest["meta"]["value"]


def test_leg_primary_field_map_in_sync_with_legs():
    """LEG_PRIMARY_FIELD drives tools/measure_now.py --skip-harvested and
    tools/harvest_loop.sh's completeness check; a leg added to LEGS without
    a primary field would silently never be harvested as 'missing'."""
    assert set(bench.LEG_PRIMARY_FIELD) == {n for n, _, _ in bench.LEGS}


def test_stage_plans_chain_shapes():
    """Each parts-wise measurement stage's declared input shape must equal
    the previous stage's output shape (and the last stage must emit the
    decoder-side grid) — otherwise the summed parts time would measure a
    different program than the full encoder forward."""
    import jax
    import jax.numpy as jnp

    from sat_tpu.models.encoder import (init_densenet161_params,
                                        init_resnet152_params)
    from sat_tpu.utils.benchmarks import (densenet161_stage_plan,
                                          resnet152_stage_plan)

    for init, plan_fn, final in (
            (init_resnet152_params, resnet152_stage_plan, (2, 7, 7, 2048)),
            (init_densenet161_params, densenet161_stage_plan,
             (2, 7, 7, 2208))):
        # zeros with the init's exact tree/shapes — shape chaining doesn't
        # need real weights, and skipping the RNG init keeps this fast-tier
        abstract = jax.eval_shape(init, jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), abstract)
        plan = plan_fn(params, 2)
        for (name, fn, shape, p), (_, _, nxt, _) in zip(plan, plan[1:]):
            out = jax.eval_shape(fn, jax.ShapeDtypeStruct(shape,
                                                          jnp.float32), p)
            assert out.shape == nxt, (name, out.shape, nxt)
        out = jax.eval_shape(plan[-1][1],
                             jax.ShapeDtypeStruct(plan[-1][2], jnp.float32),
                             plan[-1][3])
        assert out.shape == final


def test_harvested_leg_clean_semantics():
    """Slow-phase, upper-bound AND parts-estimate ('sum of per-stage')
    notes mark a leg for re-measurement (the last because stage-sums are
    estimates awaiting a whole-program window, VERDICT r4 next #5); only
    noteless fields count as complete; absent fields are incomplete."""
    f = {"value": 2700.0,
         "captions_per_sec_beam5_resnet152_e2e": 2100.0,
         "captions_per_sec_beam5_densenet161_e2e": 1700.0,
         "captions_per_sec_beam5_densenet161_e2e_note":
             "sum of per-stage encoder + decode-only slope measurements",
         "train_rows_per_sec": 4000.0,
         "train_rows_per_sec_note":
             "below documented band after retry — slow tunnel phase, "
             "not the program",
         "train_blocked_rows_per_sec_wall": 25_000.0,
         "train_blocked_rows_per_sec_wall_note":
             "possible clock glitch; treat as upper bound"}
    assert bench.harvested_leg_clean(f, "headline")
    assert bench.harvested_leg_clean(f, "resnet")      # noteless = final
    assert not bench.harvested_leg_clean(f, "densenet")  # parts estimate
    assert not bench.harvested_leg_clean(f, "train_f32")
    assert not bench.harvested_leg_clean(f, "blocked")
    assert not bench.harvested_leg_clean(f, "latency")


def test_merge_partials_stamp_and_note_lifecycle(tmp_path):
    """merge_partials must (a) keep a field's ORIGINAL measurement stamp
    when the child re-merges the unchanged accumulated line after every
    later leg, and (b) clear a stale <field>_note when the field is
    re-measured without one — otherwise a healthy re-measurement keeps an
    obsolete 'slow tunnel phase' annotation forever (review r4)."""
    p = str(tmp_path / "h.json")
    bench.merge_partials(p, {"value": 1100.0,
                             "value_note": "slow phase"}, via="bench")
    t0 = json.loads(open(p).read())["meta"]["value"]["measured_at"]
    bench.merge_partials(p, {"value": 1100.0,
                             "value_note": "slow phase"}, via="bench")
    d = json.loads(open(p).read())
    assert d["meta"]["value"]["measured_at"] == t0
    assert d["fields"]["value_note"] == "slow phase"
    bench.merge_partials(p, {"value": 2700.0}, via="bench")
    d = json.loads(open(p).read())
    assert d["fields"]["value"] == 2700.0
    assert "value_note" not in d["fields"]
    assert "value_note" not in d["meta"]


def test_leg_exception_recorded_and_reprobed(bench_stubs, capsys):
    """An exception-path leg death must be recorded in the artifact (which
    legs are absent and why) and must trigger the same re-probe as a
    watchdog death before the next leg dispatches (review r4)."""
    probes = []
    bench_stubs.setattr(bench, "_tpu_responsive",
                        lambda timeout_s=60: probes.append(1) or True)

    def boom():
        raise RuntimeError("tunnel died mid-dispatch")

    bench_stubs.setattr(bench, "measure_latency", boom)
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert "RuntimeError" in line["leg_latency_error"]
    assert probes                         # re-probe ran after the death
    assert line["encoder_vgg19_tflops"] == 55.0   # later leg still ran
    assert line["legs_run"] == [n for n, _, _ in bench.LEGS]


def test_resnet_whole_program_failure_falls_back_to_parts(bench_stubs,
                                                          capsys):
    def boom():
        raise RuntimeError("HTTP 413 from the remote-compile endpoint")

    bench_stubs.setattr(bench, "measure_resnet_e2e", boom)
    bench_stubs.setattr(
        bench, "measure_resnet_parts",
        lambda: {"captions_per_sec_beam5_resnet152_e2e": 1900.0,
                 "captions_per_sec_beam5_resnet152_e2e_note": "sum of parts",
                 "encoder_resnet152_tflops": 80.0,
                 "encoder_resnet152_mfu_pct": 40.6})
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["captions_per_sec_beam5_resnet152_e2e"] == 1900.0
    assert line["encoder_resnet152_tflops"] == 80.0
    assert "falling back to parts" in err


def test_baseline_fallback_provenance_recorded(bench_stubs, capsys):
    def fallback_ref():
        # via monkeypatch so the flag is restored at teardown (the stub
        # never resets it like the real measure_reference does)
        bench_stubs.setattr(bench, "_REF_USED_FALLBACK", True)
        return bench.FALLBACK_REF_CAPTIONS_PER_SEC

    bench_stubs.setattr(bench, "measure_reference", fallback_ref)
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["baseline_source"] == "fallback_constant"
    assert line["vs_baseline"] == pytest.approx(2600.0 / 2.2, rel=1e-3)


def test_low_headline_retries_and_keeps_best(bench_stubs, capsys):
    line, err = _run(bench_stubs, capsys, [800.0, 2500.0])
    assert line["value"] == 2500.0
    assert "value_note" not in line
    assert "below documented band" in err


def test_all_low_headline_annotated_not_silent(bench_stubs, capsys):
    line, err = _run(bench_stubs, capsys, [700.0, 900.0, 650.0])
    assert line["value"] == 900.0          # best of three, not the last
    assert "slow tunnel phase" in line["value_note"]
    assert line["vs_baseline"] == pytest.approx(450.0)


def test_zero_slope_inf_headline_discarded(bench_stubs, capsys):
    """device_time floors glitched slopes at 0.0; the measurers return inf
    for that case (review r4: the bare division used to ZeroDivisionError
    and abort the leg, skipping its retries). inf must ride the normal
    high-glitch discard+retry path."""
    line, err = _run(bench_stubs, capsys, [float("inf"), 2650.0])
    assert line["value"] == 2650.0
    assert "implausible serving measurement discarded" in err


def test_high_headline_glitch_discarded(bench_stubs, capsys):
    line, err = _run(bench_stubs, capsys, [50_000.0, 2700.0])
    assert line["value"] == 2700.0
    assert "value_note" not in line
    assert "implausible serving measurement discarded" in err


def test_all_high_glitches_leave_honest_zero(bench_stubs, capsys):
    line, err = _run(bench_stubs, capsys, [50_000.0, 60_000.0, 70_000.0])
    assert line["value"] == 0
    assert "implausible" in line["error"]
    assert line["vs_baseline"] == 0        # never computed from a glitch


def test_train_leg_failure_does_not_skip_other_leg(bench_stubs, capsys):
    def failing_f32(bf16=False):
        if not bf16:
            raise RuntimeError("synthetic f32 failure")
        return (14000.0, None, None, None)

    bench_stubs.setattr(bench, "measure_train", failing_f32)
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert "train_rows_per_sec" not in line
    assert line["train_rows_per_sec_bf16"] == 14000.0
    assert "leg train_f32 failed" in err


def test_train_low_sample_retried_best_kept(bench_stubs, capsys):
    samples = iter([(3000.0, 1.0e12, 2.0, 11.0),
                    (9800.0, 1.0e12, 9.0, 36.0)])
    bench_stubs.setattr(bench, "measure_train",
                        lambda bf16=False: next(samples)
                        if not bf16 else (14000.0, None, None, None))
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["train_rows_per_sec"] == 9800.0
    assert "train_rows_per_sec_note" not in line
    assert "below documented band" in err


def test_train_implausible_mfu_discarded(bench_stubs, capsys):
    samples = iter([(706_000.0, 1.0e15, 191.0, 900.0),
                    (10_500.0, 1.0e12, 9.5, 38.0)])
    bench_stubs.setattr(bench, "measure_train",
                        lambda bf16=False: next(samples)
                        if not bf16 else (14000.0, None, None, None))
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["train_rows_per_sec"] == 10_500.0
    assert line["train_mfu_pct"] == 9.5
    assert "implausible train measurement discarded" in err


def test_ab_leg_zero_median_discarded(bench_stubs, capsys):
    """device_time floors glitched slopes at 0.0; an A/B arm landing there
    must discard the leg (a ratio against 0 would be inf), never record."""
    bench_stubs.setattr(bench, "measure_topk_ab",
                        lambda: {"lax": [6.3, 6.4], "pallas": [0.0, 0.0]})
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert "beam_pallas_topk_speedup" not in line
    assert "implausible topk A/B discarded" in err
    # independent legs unaffected
    assert line["train_remat_speedup_f32"] > 0


def test_ab_leg_absurd_ratio_discarded(bench_stubs, capsys):
    """A remat 'speedup' of 6x would be a phase glitch, not a schedule
    change (the arms differ only in residual traffic) — discard."""
    bench_stubs.setattr(bench, "measure_remat_ab",
                        lambda: {"f32": [30.0, 30.1], "f32_remat": [5.0, 5.0],
                                 "bf16": [4.9, 5.0],
                                 "bf16_remat": [4.6, 4.7]})
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert "train_remat_speedup_f32" not in line
    assert "implausible remat speedups discarded" in err
    assert line["beam_pallas_topk_speedup"] > 0


def test_latency_gate_retries_glitch(bench_stubs, capsys):
    samples = iter([0.075, 1.62])
    bench_stubs.setattr(bench, "measure_latency", lambda: next(samples))
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["single_image_latency_ms"] == 1.62
    assert "implausible latency discarded" in err


def test_blocked_train_low_sample_retried_best_kept(bench_stubs, capsys):
    samples = iter([2000.0, 6500.0])
    bench_stubs.setattr(bench, "measure_train_blocked",
                        lambda **kw: next(samples))
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["train_blocked_rows_per_sec_wall"] == 6500.0
    assert "train_blocked_rows_per_sec_wall_note" not in line
    assert "blocked train below documented band" in err


def test_blocked_train_glitch_discarded(bench_stubs, capsys):
    samples = iter([500000.0, 6100.0])
    bench_stubs.setattr(bench, "measure_train_blocked",
                        lambda **kw: next(samples))
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["train_blocked_rows_per_sec_wall"] == 6100.0
    assert "implausible blocked-train measurement discarded" in err


def test_blocked_train_still_low_annotated(bench_stubs, capsys):
    bench_stubs.setattr(bench, "measure_train_blocked", lambda **kw: 1500.0)
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["train_blocked_rows_per_sec_wall"] == 1500.0
    assert "slow tunnel phase" in \
        line["train_blocked_rows_per_sec_wall_note"]


def test_blocked_train_high_annotated_as_upper_bound(bench_stubs, capsys):
    bench_stubs.setattr(bench, "measure_train_blocked",
                        lambda **kw: 25_000.0)
    line, err = _run(bench_stubs, capsys, [2600.0])
    assert line["train_blocked_rows_per_sec_wall"] == 25_000.0
    assert "upper bound" in line["train_blocked_rows_per_sec_wall_note"]


def test_unresponsive_backend_bails_with_honest_zero(bench_stubs, capsys,
                                                     monkeypatch):
    """If every probe fails, bench must NOT dispatch into the wedged
    tunnel (a dispatch blocks in C where SIGALRM can never fire and the
    driver would record nothing); it prints the honest zero line and
    exits."""
    bench_stubs.setattr(bench, "_tpu_responsive",
                        lambda timeout_s=60: False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    called = []
    bench_stubs.setattr(bench, "measure_tpu",
                        lambda fast_mode=False: called.append(1) or 1e9)
    bench.main()
    cap = capsys.readouterr()
    line = json.loads(cap.out.strip().splitlines()[-1])
    assert line["value"] == 0 and line["vs_baseline"] == 0
    assert "unresponsive" in line["error"]
    assert not called                      # nothing dispatched


def _seed_harvest(tmp_harvest_path, fields):
    bench.merge_partials(tmp_harvest_path, fields, via="measure_now")


def test_unresponsive_backend_falls_back_to_harvest(bench_stubs, capsys,
                                                    monkeypatch):
    """When every probe fails but the round harvested partials earlier
    (tools/measure_now.py), the line is composed from those — clearly
    annotated — with vs_baseline recomputed from a fresh host-CPU
    reference run, instead of an information-free zero."""
    import os
    _seed_harvest(os.environ["SAT_BENCH_PARTIALS"],
                  {"value": 2700.0, "train_rows_per_sec": 10500.0})
    bench_stubs.setattr(bench, "_tpu_responsive",
                        lambda timeout_s=60: False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    cap = capsys.readouterr()
    line = json.loads(cap.out.strip().splitlines()[-1])
    assert line["value"] == 2700.0
    assert line["train_rows_per_sec"] == 10500.0
    assert line["source"] == "harvested_partials"
    assert line["vs_baseline"] == pytest.approx(1350.0)
    assert "harvested" in line["error"]
    # field -> ISO timestamp of the original measurement
    assert line["harvest_measured_at"]["value"].startswith("20")
    # one merge call stamps every field in the same instant -> coherent
    assert line["harvest_phase_spread_hours"] == 0.0
    assert "harvest_stale_fields" not in line


def test_composed_line_stamps_phase_spread(bench_stubs, capsys, monkeypatch):
    """VERDICT r4 weak #6: a composed line mixing tunnel phases hours apart
    must say so in machine-readable form — harvest_phase_spread_hours over
    all fields, plus the list of fields measured >1h from the headline's
    window (the r4 line mixed a 03:37Z headline with 11:04-13:36Z legs)."""
    import os
    path = os.environ["SAT_BENCH_PARTIALS"]
    with open(path, "w") as f:
        json.dump({
            "fields": {"value": 2800.0,
                       "single_image_latency_ms": 1.7,
                       "train_rows_per_sec": 9000.0,
                       "beam_pallas_topk_speedup": 1.08},
            "meta": {
                "value": {"measured_at": "2026-08-19T03:37:37+00:00"},
                "single_image_latency_ms":
                    {"measured_at": "2026-08-19T03:46:12+00:00"},
                "train_rows_per_sec":
                    {"measured_at": "2026-08-19T10:56:16+00:00"},
                "beam_pallas_topk_speedup":
                    {"measured_at": "2026-08-19T11:04:13+00:00"},
            }}, f)
    bench_stubs.setattr(bench, "_tpu_responsive", lambda timeout_s=60: False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 03:37:37 -> 11:04:13 is 7.44h
    assert line["harvest_phase_spread_hours"] == pytest.approx(7.44, abs=0.01)
    # latency is within the headline hour; the other two are stale
    assert line["harvest_stale_fields"] == ["beam_pallas_topk_speedup",
                                            "train_rows_per_sec"]


def test_phase_coherence_tolerates_bad_timestamps():
    """A stamp must never cost the line: unparseable or missing timestamps
    are skipped, an empty map yields no fields."""
    assert bench._phase_coherence({}) == {}
    assert bench._phase_coherence({"value": None, "x": "garbage"}) == {}
    out = bench._phase_coherence({"value": "2026-08-19T03:00:00+00:00",
                                  "x": "not-a-date",
                                  "y": "2026-08-19T05:00:00+00:00"})
    assert out["harvest_phase_spread_hours"] == 2.0
    assert out["harvest_stale_fields"] == ["y"]


def test_failed_live_headline_filled_from_harvest(bench_stubs, capsys):
    """A live run whose headline glitched out entirely still keeps its
    other live legs, with the headline (and only the headline family)
    coming from the harvest, annotated."""
    import os
    _seed_harvest(os.environ["SAT_BENCH_PARTIALS"], {"value": 2650.0})
    line, err = _run(bench_stubs, capsys, [50_000.0, 60_000.0, 70_000.0])
    assert line["value"] == 2650.0
    assert line["source"] == "harvested_partials"
    assert line["vs_baseline"] == pytest.approx(1325.0)
    # live legs from THIS run survive the merge
    assert line["train_rows_per_sec"] == 11000.0
    assert line["single_image_latency_ms"] == 1.5
    assert "harvested" in line["error"]


def _acct(step, grad, fwd, head, head_grad, adam, nbytes=None, flops=None):
    return {n: {"ms": [v], "flops": flops, "bytes": nbytes}
            for n, v in (("step", step), ("grad", grad), ("fwd", fwd),
                         ("head", head), ("head_grad", head_grad),
                         ("adam", adam))}


def test_leg_accounting_records_blocks_and_derived(monkeypatch):
    """The accounting leg records the measured block medians, the derived
    decomposition, and per-block roofline ms when cost analysis reported
    bytes."""
    monkeypatch.setattr(bench, "measure_accounting",
                        lambda: _acct(3.0, 2.6, 1.0, 0.3, 0.9, 0.35,
                                      nbytes=819e9 * 2e-3, flops=1e9))
    fields = bench.leg_accounting()
    assert fields["train_acct_step_ms"] == 3.0
    assert fields["train_acct_scan_fwd_ms"] == pytest.approx(0.7)
    assert fields["train_acct_head_bwd_ms"] == pytest.approx(0.6)
    assert fields["train_acct_scan_bwd_ms"] == pytest.approx(1.0)
    assert fields["train_acct_residual_ms"] == pytest.approx(0.05)
    # bytes/819GB/s = 2ms > flops/peak -> bandwidth roofline
    assert fields["train_acct_step_roofline_ms"] == pytest.approx(2.0)


def test_leg_accounting_discards_non_summing_parts(monkeypatch):
    """A phase flip mid-interleave makes grad+adam wildly disagree with the
    whole step — the table must be discarded, not recorded."""
    monkeypatch.setattr(bench, "measure_accounting",
                        lambda: _acct(10.0, 2.0, 1.0, 0.3, 0.9, 0.35))
    assert bench.leg_accounting() == {}
    monkeypatch.setattr(bench, "measure_accounting",
                        lambda: _acct(0.0, 2.0, 1.0, 0.3, 0.9, 0.35))
    assert bench.leg_accounting() == {}


def test_accounting_leg_registered():
    assert "accounting" in dict((n, f) for n, f, _ in bench.LEGS)
    assert bench.LEG_PRIMARY_FIELD["accounting"] == "train_acct_step_ms"


def test_leg_serve_device_gates(monkeypatch):
    """The serve-device leg records req/s + p50 on a clean run and discards
    error-heavy or physically implausible measurements."""
    monkeypatch.setattr(bench, "measure_serve_device",
                        lambda **kw: {"requests": 512, "errors": 0,
                                      "req_per_sec": 950.0, "p50_ms": 31.0})
    fields = bench.leg_serve_device()
    assert fields["serve_device_path_req_per_sec"] == 950.0
    assert fields["serve_device_path_p50_ms"] == 31.0
    # >10% errors -> the rate is an artifact of failures, discard
    monkeypatch.setattr(bench, "measure_serve_device",
                        lambda **kw: {"requests": 512, "errors": 100,
                                      "req_per_sec": 950.0, "p50_ms": 31.0})
    assert bench.leg_serve_device() == {}
    # above any physical ceiling -> clock glitch
    monkeypatch.setattr(bench, "measure_serve_device",
                        lambda **kw: {"requests": 512, "errors": 0,
                                      "req_per_sec": 80_000.0})
    assert bench.leg_serve_device() == {}


def test_leg_densenet_prefers_whole_program(monkeypatch):
    """When the whole-program densenet e2e succeeds, its (noteless) number
    is recorded and the parts fallback never runs — clearing the stage-sum
    estimate from the harvest (VERDICT r4 next #5)."""
    monkeypatch.setattr(bench, "measure_densenet_e2e", lambda: 1650.0)
    monkeypatch.setattr(
        bench, "measure_densenet_parts",
        lambda: pytest.fail("parts fallback must not run when the "
                            "whole-program densenet leg succeeds"))
    fields = bench.leg_densenet()
    assert fields == {"captions_per_sec_beam5_densenet161_e2e": 1650.0}


def test_e2e_legs_gate_both_sides(monkeypatch):
    """A glacial tunnel phase measures the PHASE, not the program: the
    first post-aux-fix whole-program resnet reading (22.45 cps, 2026-08-19
    17:36Z — 100x below band in a window where a bare Adam update 'took'
    15.8 ms) must be discarded by a LOW-side floor, falling back to parts;
    an implausibly-low parts sum is discarded outright."""
    monkeypatch.setattr(bench, "measure_resnet_e2e", lambda: 22.45)
    monkeypatch.setattr(bench, "measure_resnet_parts",
                        lambda: {"captions_per_sec_beam5_resnet152_e2e":
                                 2500.0})
    assert bench.leg_resnet() == {
        "captions_per_sec_beam5_resnet152_e2e": 2500.0}
    monkeypatch.setattr(bench, "measure_resnet_parts",
                        lambda: {"captions_per_sec_beam5_resnet152_e2e":
                                 20.0})
    assert bench.leg_resnet() == {}
    monkeypatch.setattr(bench, "measure_densenet_e2e", lambda: 15.0)
    monkeypatch.setattr(bench, "measure_densenet_parts",
                        lambda: {"captions_per_sec_beam5_densenet161_e2e":
                                 12.0})
    assert bench.leg_densenet() == {}


def test_densenet_util_leg_and_hbm_ceiling_note():
    """_encoder_util_fields annotates >100% hbm-util (op-level bytes count
    VMEM-fused intermediates — a fusion indicator, not broken physics) with
    wording that does NOT trip harvested_leg_clean's re-measure triggers;
    <=100% readings carry no note. leg_densenet_util is registered with
    the util field as its primary."""
    f = bench._encoder_util_fields(
        "resnet152", {"tflops_per_sec": 118.5, "mfu_pct_vs_bf16_peak": 60.2,
                      "hbm_util_pct": 164.0})
    assert f["encoder_resnet152_hbm_util_pct"] == 164.0
    note = f["encoder_resnet152_hbm_util_pct_note"]
    for trigger in ("slow tunnel phase", "upper bound", "sum of per-stage"):
        assert trigger not in note
    f2 = bench._encoder_util_fields(
        "densenet161", {"tflops_per_sec": 28.1, "mfu_pct_vs_bf16_peak": 14.3,
                        "hbm_util_pct": 68.0})
    assert "encoder_densenet161_hbm_util_pct_note" not in f2
    assert bench.LEG_PRIMARY_FIELD["densenet_util"] == \
        "encoder_densenet161_hbm_util_pct"
    # the clean check accepts a noted >100% reading as final
    assert bench.harvested_leg_clean(
        {"encoder_densenet161_hbm_util_pct": 130.0,
         "encoder_densenet161_hbm_util_pct_note": note.replace(
             "resnet152", "densenet161")}, "densenet_util")


def test_leg_densenet_util_gates(monkeypatch):
    monkeypatch.setattr(bench, "measure_densenet_stages",
                        lambda: {"tflops_per_sec": 28.1,
                                 "mfu_pct_vs_bf16_peak": 14.3,
                                 "hbm_util_pct": 68.0})
    fields = bench.leg_densenet_util()
    assert fields["encoder_densenet161_hbm_util_pct"] == 68.0
    assert fields["encoder_densenet161_mfu_pct"] == 14.3
    monkeypatch.setattr(bench, "measure_densenet_stages",
                        lambda: {"tflops_per_sec": 1e6,
                                 "mfu_pct_vs_bf16_peak": 1e5,
                                 "hbm_util_pct": 1e5})
    assert bench.leg_densenet_util() == {}


def test_arm_consistency_gate(monkeypatch):
    """Arms whose samples disagree >2.5x (or glitch to zero) mark the whole
    A/B window unstable — the leg must discard, even when the medians alone
    would pass (observed: [1.95, 5.37, 0.0] ms for one program)."""
    assert bench._arms_consistent({"a": [6.3, 6.4], "b": [5.8, 5.9]})
    assert not bench._arms_consistent({"a": [1.95, 5.37], "b": [5.8, 5.9]})
    assert not bench._arms_consistent({"a": [6.3, 0.0], "b": [5.8, 5.9]})
    monkeypatch.setattr(bench, "measure_remat_ab",
                        lambda: {"f32": [1.95, 5.37, 6.0],
                                 "f32_remat": [2.4, 2.5, 2.5],
                                 "bf16": [4.9, 5.0, 5.0],
                                 "bf16_remat": [4.6, 4.7, 4.7]})
    assert bench.leg_remat() == {}
    monkeypatch.setattr(bench, "measure_topk_ab",
                        lambda: {"lax": [6.3, 0.0], "pallas": [5.6, 5.7]})
    assert bench.leg_topk() == {}
