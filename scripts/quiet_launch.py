"""Launch a command only once the host bus is actually quiet.

The per-rep gate in ``bench.py --scaling`` waits at most
GRAFT_QUIET_ATTEMPTS x GRAFT_QUIET_WAIT_S (default ~2.7 min) before
running anyway, marked contended — the right behavior for the driver's
bounded wall-clock, but during this host's multi-hour co-tenant storms
it just records weather-poisoned reps (see BASELINE.md runs 13/17/18).
When a HUMAN-in-the-loop session decides when to spend a scaling run,
the cheap thing is to not start one mid-storm at all: this wrapper
polls the same Ray-free ``bw_probe`` on a long period and execs the
command only after ``--consecutive`` quiet probes in a row (one quiet
probe can be the eye of an oscillating storm — see the run-17
post-mortem).

Usage:
    python scripts/quiet_launch.py [--gbps 6.0] [--period 120]
        [--consecutive 2] [--max-wait 7200] -- <command...>

Exits 3 if the bus never goes quiet within --max-wait (the command is
NOT run), so callers can distinguish "ran" from "gave up".
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import bw_probe  # noqa: E402  (Ray-free memcpy probe)

#: Default persistent probe log: every gate probe (quiet or stormy) is
#: appended as one JSON line {ts, gbps, quiet, streak, event} so the
#: round's weather record survives the session — the deferral evidence
#: behind BASELINE.md's scaling-criterion protocol ("runs are launched
#: only into quiet windows; the gate probed continuously in between").
#: The round tag comes from GRAFT_ROUND (default r5, the round this
#: harness shipped in) so a later round's probes land in THEIR OWN log
#: instead of silently appending to a frozen earlier round's evidence
#: file (code-review r5).
DEFAULT_LOG = os.path.join(
    _REPO,
    f"SCALING_{os.environ.get('GRAFT_ROUND', 'r05')}_weather.jsonl")


def _log_probe(path: str, **row) -> None:
    if not path:
        return
    try:
        with open(path, "a") as fh:
            fh.write(json.dumps({"ts": round(time.time(), 1), **row}) + "\n")
    except OSError:
        pass  # evidence log must never break the launch itself


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbps", type=float, default=6.0,
                    help="aggregate bw_probe threshold (default 6.0 — "
                         "stricter than the in-run gate's 5.0)")
    ap.add_argument("--period", type=float, default=120.0,
                    help="seconds between probes while waiting")
    ap.add_argument("--consecutive", type=int, default=2,
                    help="quiet probes in a row required before launch")
    ap.add_argument("--max-wait", type=float, default=7200.0,
                    help="give up (exit 3) after this many seconds")
    ap.add_argument("--log", default=DEFAULT_LOG,
                    help="append each probe as a JSON line here "
                         "('' disables; default SCALING_r05_weather.jsonl "
                         "at the repo root)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command to run (prefix with --)")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd[:1] == ["--"] else args.cmd
    if not cmd:
        ap.error("no command given")

    t0 = time.time()
    streak = 0
    while True:
        g = bw_probe()
        quiet = g >= args.gbps
        streak = streak + 1 if quiet else 0
        print(f"[quiet-launch] bw={g:.2f} GB/s "
              f"({'quiet' if quiet else 'contended'}, streak "
              f"{streak}/{args.consecutive})", file=sys.stderr, flush=True)
        _log_probe(args.log, gbps=round(g, 2), quiet=quiet, streak=streak,
                   event="probe", gate=args.gbps)
        if streak >= args.consecutive:
            break
        if time.time() - t0 > args.max_wait:
            print("[quiet-launch] gave up: bus never went quiet",
                  file=sys.stderr)
            _log_probe(args.log, event="gave_up",
                       waited_s=round(time.time() - t0), gate=args.gbps)
            return 3
        time.sleep(args.period)
    print(f"[quiet-launch] launching after {time.time() - t0:.0f}s: "
          f"{' '.join(cmd)}", file=sys.stderr, flush=True)
    _log_probe(args.log, event="launch", waited_s=round(time.time() - t0),
               cmd=" ".join(cmd), gate=args.gbps)
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
