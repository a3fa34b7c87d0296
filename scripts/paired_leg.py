"""One same-window scaling PAIR: probe -> 4-CPU leg -> probe -> 16-CPU leg -> probe.

The strictly-alternating single-leg sampler (leg_sample.py) gives each
leg its own weather, so the pooled ratio mixes windows hours apart; a
same-window pair (~70 s total at 300k docs) is the closest storm-era
analogue of a full interleaved run: both legs inside ONE quiet stretch,
bracketed and separated by probes.  Emits one JSON line per pair to
SCALING_r05_pairs.jsonl with the pair efficiency and all three probes.

    python scripts/paired_leg.py [n_docs]
        exit 3 (nothing recorded) if the opening probe is below
        GRAFT_PAIR_GATE_GBPS (default 6.0 — pairs are only worth taking
        in genuinely quiet windows; the single-leg grind keeps covering
        the moderate tier).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

PAIR_GATE_GBPS = float(os.environ.get("GRAFT_PAIR_GATE_GBPS", "6.0"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIRS_PATH = os.path.join(REPO, "SCALING_r05_pairs.jsonl")


def _leg(num_cpus: int, n_docs: int) -> dict:
    with bench._DuringSampler() as sampler:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--_single-build", str(num_cpus), str(n_docs)],
            capture_output=True, text=True, timeout=3600, cwd=REPO,
        )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"leg produced no JSON:\n{proc.stdout}\n{proc.stderr}")
    rec = json.loads(lines[-1])
    rec["during_gbps"] = sampler.samples
    rec["during_min_gbps"] = sampler.min_gbps
    return rec


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 300000
    # Leg order alternates across the cohort (--order=hi-first): the
    # first 8 pairs all ran lo-first, and their mid-probes show the
    # ~48 s 4-CPU leg outliving the opening quiet window, so the
    # returning storm systematically landed on the 16-CPU leg —
    # a one-sided bias the alternation symmetrizes (same rationale as
    # the full runs' lo/hi rep interleave).
    hi_first = "--order=hi-first" in sys.argv
    pre = bench.bw_probe()
    if pre < PAIR_GATE_GBPS:
        with open(os.path.join(REPO, "SCALING_r05_weather.jsonl"), "a") as f:
            f.write(json.dumps({"ts": round(time.time(), 1), "gbps": pre,
                                "event": "pair_probe",
                                "gate": PAIR_GATE_GBPS}) + "\n")
        print(f"defer: opening probe {pre} GB/s < {PAIR_GATE_GBPS}")
        return 3
    if hi_first:
        hi = _leg(16, n_docs)
        mid = bench.bw_probe()
        lo = _leg(4, n_docs)
    else:
        lo = _leg(4, n_docs)
        mid = bench.bw_probe()
        hi = _leg(16, n_docs)
    post = bench._post_probe()
    eff = (hi["files_per_sec"] / lo["files_per_sec"]) / 4.0
    rec = {
        "ts": round(time.time(), 1), "n_docs": n_docs,
        "pre_gbps": pre, "mid_gbps": mid, "post_gbps": post,
        "lo": lo, "hi": hi,
        "pair_efficiency": round(eff, 3),
        # a pair qualifies when every bracketing probe stayed quiet and
        # neither leg's in-run sampler tripped (same rule as run reps)
        "window_ok": bool(pre >= bench.QUIET_GBPS
                          and mid >= bench.QUIET_GBPS
                          and post >= bench.QUIET_GBPS),
        "order": "hi-first" if hi_first else "lo-first",
        "gate_gbps": PAIR_GATE_GBPS,
        "code": bench._code_versions(),
    }
    with open(PAIRS_PATH, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in
                      ("pair_efficiency", "pre_gbps", "mid_gbps",
                       "post_gbps", "window_ok")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
