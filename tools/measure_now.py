#!/usr/bin/env python
"""Wedge-aware opportunistic measurement harvester (VERDICT r3 next #8).

The tunneled v5e wedges for minutes-to-hours at a time, so a round cannot
plan on one long healthy window for the full bench. This tool enforces
CLAUDE.md's "grab every measurement opportunistically the moment a probe
succeeds" rule as tooling: probe the backend in a subprocess, and on
success immediately measure the requested bench leg(s), merging every
completed leg into the cumulative harvest file (docs/bench_partials.json,
env SAT_BENCH_PARTIALS) that bench.py falls back to when the driver's
end-of-round run lands in a wedge.

Usage:
  python tools/measure_now.py all                      # every leg, in order
  python tools/measure_now.py headline train_f32 ...   # specific legs
  python tools/measure_now.py --list
  python tools/measure_now.py all --probe-timeout 90

Exit status: 0 if at least one leg recorded a field, 2 if the probe never
succeeded, 1 if probing succeeded but nothing could be measured.
"""

import argparse
import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("legs", nargs="*", default=["all"])
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--probe-timeout", type=float, default=90.0)
    ap.add_argument("--skip-harvested", action="store_true",
                    help="skip legs whose primary field is already in the "
                         "harvest without a slow-phase note, so a brief "
                         "healthy window goes straight to the missing legs")
    args = ap.parse_args()

    names = [name for name, _, _ in bench.LEGS]
    if args.list:
        print("\n".join(names))
        return 0
    wanted = args.legs            # nargs='*' default=["all"] -> non-empty
    if wanted == ["all"]:
        wanted = names
    unknown = [w for w in wanted if w not in names]
    if unknown:
        ap.error(f"unknown legs {unknown}; available: {names}")

    if args.skip_harvested:
        har = bench.load_partials(bench._partials_path())["fields"]

        def _clean(name):
            return bench.harvested_leg_clean(har, name)

        skipped = [w for w in wanted if _clean(w)]
        wanted = [w for w in wanted if not _clean(w)]
        if skipped:
            print(f"skipping already-harvested legs: {', '.join(skipped)}",
                  file=sys.stderr)
        if not wanted:
            print("harvest already complete; nothing to measure",
                  file=sys.stderr)
            return 0

    if not bench._tpu_responsive(timeout_s=args.probe_timeout):
        print("probe failed: tpu backend unresponsive", file=sys.stderr)
        return 2

    # Advertise the live measurement via a PID file so the window watcher
    # (/tmp/window_watcher.sh, CLAUDE.md round-4 note) can SIGSTOP
    # CPU-heavy host jobs for the duration without pattern-matching
    # process names. Written only after a successful probe: a failed 90 s
    # probe should not pause anything.
    pid_path = os.environ.get("SAT_MEASURE_PIDFILE", "/tmp/measure_now.pid")
    try:
        with open(pid_path, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pid_path = None

    from sat_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()

    path = bench._partials_path()
    recorded = {}

    def _raise(signum, frame):
        raise bench._LegTimeout()

    signal.signal(signal.SIGALRM, _raise)
    try:
        for name, fn, budget_s in bench.LEGS:
            if name not in wanted:
                continue
            signal.alarm(budget_s)
            try:
                fields = fn()
                signal.alarm(0)
                if name == "headline" and fields.get("value"):
                    fields.update(bench.leg_baseline(fields["value"]))
                fields.pop("error", None)  # harvest records values, not errors
                if fields:
                    bench.merge_partials(path, fields, via="measure_now")
                    recorded.update(fields)
                    print(json.dumps({"leg": name, **fields}), flush=True)
                else:
                    print(f"leg {name}: nothing plausible this phase",
                          file=sys.stderr)
            except bench._LegTimeout:
                print(f"leg {name} hit its {budget_s}s watchdog",
                      file=sys.stderr)
                # a watchdog usually means the tunnel wedged mid-leg;
                # re-probe before burning more legs into it
                if not bench._tpu_responsive(timeout_s=30):
                    print("backend wedged; stopping harvest", file=sys.stderr)
                    break
            except Exception as e:
                print(f"leg {name} failed ({e})", file=sys.stderr)
                # an exception (e.g. XlaRuntimeError from a dying tunnel) is
                # as wedge-suggestive as a watchdog — re-probe before the
                # next leg
                if not bench._tpu_responsive(timeout_s=30):
                    print("backend wedged; stopping harvest", file=sys.stderr)
                    break
            finally:
                signal.alarm(0)
    finally:
        # ADVICE r4: remove the PID file on EVERY exit path (crash or
        # KeyboardInterrupt included) so the window watcher never pauses
        # pytest for a stale/reused PID.
        if pid_path:
            try:
                os.remove(pid_path)
            except OSError:
                pass
    return 0 if recorded else 1


if __name__ == "__main__":
    sys.exit(main())
