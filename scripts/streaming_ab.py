"""A/B the streaming-reduce exchange (SE_RAY_EXCHANGE_STREAMING) against
the barrier reduce, alternating modes rep-by-rep in fresh processes so
host-bandwidth drift hits both arms equally (the r3-verdict 'reducer
prefetch overlap' lever).

Usage:
    python scripts/streaming_ab.py <docterms_dir> <num_cpus> [reps_per_arm]

Each rep is bracketed by the bench quiet-window bw probes; output is one
JSON line per rep plus a summary line per arm (best + median of
qualifying reps).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: bw probes + quiet gate)


def main() -> None:
    docterms = sys.argv[1]
    num_cpus = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    probe_script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "exchange_probe.py")
    recs: dict[str, list[dict]] = {"barrier": [], "streaming": []}
    for rep in range(reps):
        for mode, flag in (("barrier", "0"), ("streaming", "1")):
            pre_g, pre_ok = bench._await_quiet_window()
            env = dict(os.environ, SE_RAY_EXCHANGE_STREAMING=flag)
            proc = subprocess.run(
                [sys.executable, probe_script, docterms, str(num_cpus)],
                capture_output=True, text=True, timeout=1800, env=env,
            )
            lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(json.dumps({"mode": mode, "rep": rep, "error":
                                  proc.stderr[-2000:]}), flush=True)
                continue
            post_g = bench.bw_probe()
            r = json.loads(lines[-1])
            r.update(mode=mode, rep=rep, pre_gbps=pre_g,
                     post_gbps=round(post_g, 2),
                     window_ok=bool(pre_ok and post_g >= bench.QUIET_GBPS))
            recs[mode].append(r)
            print(json.dumps(r), flush=True)

    summary = {"docterms": docterms, "num_cpus": num_cpus}
    for mode, rs in recs.items():
        if not rs:
            continue
        qual = [r for r in rs if r["window_ok"]] or rs
        secs = [r["exchange_sec"] for r in qual]
        summary[mode] = {
            "best_sec": min(secs),
            "median_sec": round(statistics.median(secs), 2),
            "qualifying": len([r for r in rs if r["window_ok"]]),
            "reps": len(rs),
        }
    if "barrier" in summary and "streaming" in summary:
        summary["speedup_best"] = round(
            summary["barrier"]["best_sec"]
            / summary["streaming"]["best_sec"], 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
