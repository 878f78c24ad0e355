#!/bin/bash
# Pause the CPU-heavy pytest run while a measurement window is open
# (CLAUDE.md round-4 learning: contention on the 1-core pod pushes bench
# legs into their watchdogs and glitches slope measurements).
#
# PID-file based — never signals by pattern match. The pytest launcher
# writes its PID to /tmp/pytest_run.pid; measure_now runs write theirs to
# /tmp/measure_now.pid (harvest_loop's timeout-wrapped python). We poll
# every 20 s: if the measure PID is alive >100 s (a probe succeeded and a
# real measurement is running, not a failed 90 s probe), SIGSTOP the
# pytest process group; SIGCONT it when the measurement exits.
exec 9>/tmp/sat_window_watcher.lock
flock -n 9 || exit 0
paused=0
tpid=""
# ADVICE r4: never leave the pytest group permanently stopped — CONT it on
# watcher exit (any signal/EXIT), and below, always attempt CONT on the
# recorded pgid when leaving the paused state even if the leader died.
trap '[ -n "$tpid" ] && { kill -CONT -- "-$tpid" 2>/dev/null; kill -CONT "$tpid" 2>/dev/null; }' EXIT
while true; do
  active=0
  if [ -f /tmp/measure_now.pid ]; then
    mpid=$(cat /tmp/measure_now.pid 2>/dev/null)
    if [ -n "$mpid" ] && kill -0 "$mpid" 2>/dev/null; then
      et=$(ps -o etimes= -p "$mpid" 2>/dev/null | tr -d ' ')
      [ -n "$et" ] && [ "$et" -gt 100 ] && active=1
    fi
  fi
  tpid=""
  [ -f /tmp/pytest_run.pid ] && tpid=$(cat /tmp/pytest_run.pid 2>/dev/null)
  alive=0
  [ -n "$tpid" ] && kill -0 "$tpid" 2>/dev/null && alive=1
  if [ "$active" = 1 ] && [ "$alive" = 1 ]; then
    if [ "$paused" = 0 ]; then
      echo "$(date -u +%FT%TZ) window open: pausing pytest pgid $tpid" >> /tmp/window_watcher.log
      kill -STOP -- "-$tpid" 2>/dev/null || kill -STOP "$tpid" 2>/dev/null
      paused=1
    fi
  elif [ "$paused" = 1 ]; then
    # CONT unconditionally: even if the group leader died while paused,
    # surviving stopped group members must be resumed (ADVICE r4).
    echo "$(date -u +%FT%TZ) window closed: resuming pytest pgid $tpid (leader alive=$alive)" >> /tmp/window_watcher.log
    kill -CONT -- "-$tpid" 2>/dev/null
    kill -CONT "$tpid" 2>/dev/null
    paused=0
  fi
  sleep 20
done
