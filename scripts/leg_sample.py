"""One opportunistic scaling-leg sample: probe -> (maybe) build -> record.

The round-5 full-run grind (scaling_grind2.sh) needs a quiet window
long enough for a whole interleaved multi-rep run (~15-40 min); the
host's co-tenant storms left it zero launches in 15+ hours while the
weather log shows plenty of SHORT (1-3 min) lulls.  A single 300k-doc
build leg fits inside those lulls, and BASELINE.md's pooled
best-qualified-legs estimator — the weather-one-sided estimator of the
code's true 4->16-CPU ratio, quoted by the round-4 verdict — only needs
per-LEG samples with probe evidence, not whole runs.  This script takes
exactly one such sample:

  python scripts/leg_sample.py <num_cpus> [n_docs]
      exit 3 and record nothing if the pre-probe reads below the gate
      (GRAFT_LEG_GATE_GBPS, default 4.0);
      else run the same measured job as bench.py --scaling's reps
      (bench.py --_single-build, fresh process, fresh Ray session),
      bracket it with the same bw_probe / _DuringSampler evidence, and
      append one JSON line to SCALING_r05_legs.jsonl.

The measured job, probe functions, and qualification thresholds are
bench.py's own — this wrapper only changes the SCHEDULING (one leg per
lull instead of eight legs per window).  A summary lives in
scripts/r5_scaling_summary.py (--legs).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (repo-root bench.py; import has no side effects)

LEG_GATE_GBPS = float(os.environ.get("GRAFT_LEG_GATE_GBPS", "4.0"))
LEGS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALING_r05_legs.jsonl",
)


def main() -> int:
    num_cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300000

    pre = bench.bw_probe()
    if pre < LEG_GATE_GBPS:
        # keep the storm history in the same weather log the full-run
        # grind wrote, so the round-5 evidence trail stays one file
        weather = os.path.join(os.path.dirname(LEGS_PATH),
                               "SCALING_r05_weather.jsonl")
        with open(weather, "a") as f:
            f.write(json.dumps({"ts": round(time.time(), 1), "gbps": pre,
                                "event": "leg_probe",
                                "gate": LEG_GATE_GBPS}) + "\n")
        print(f"defer: pre-probe {pre} GB/s < {LEG_GATE_GBPS}")
        return 3

    with bench._DuringSampler() as sampler:
        proc = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(LEGS_PATH), "bench.py"),
             "--_single-build", str(num_cpus), str(n_docs)],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(LEGS_PATH),
        )
    post = bench._post_probe()
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(f"leg produced no JSON:\n{proc.stdout}\n{proc.stderr}",
              file=sys.stderr)
        return 1
    rec = json.loads(lines[-1])
    rec.update(
        ts=round(time.time(), 1),
        n_docs_target=n_docs,
        pre_gbps=pre,
        post_gbps=post,
        during_gbps=sampler.samples,
        during_min_gbps=sampler.min_gbps,
        # same qualification rule as run_scaling's reps: bracketing
        # probes >= QUIET_GBPS and no two consecutive low in-leg samples
        window_ok=bool(pre >= bench.QUIET_GBPS
                       and post >= bench.QUIET_GBPS and sampler.ok),
        gate_gbps=LEG_GATE_GBPS,
        code=bench._code_versions(),
    )
    with open(LEGS_PATH, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
