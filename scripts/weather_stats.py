"""Summarize SCALING_r05_weather.jsonl — the launch gate's probe record.

Prints probe count, span, bandwidth distribution, quiet fractions at
the two gate tiers, and the longest continuous sub-4 GB/s storm — the
numbers behind BASELINE.md's round-5 weather/deferral statement.  Pure
file reading; no Ray.
"""
import json
import os
import statistics
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "SCALING_r05_weather.jsonl")
    probes, launches, gaveups = [], [], 0
    with open(path) as fh:
        for line in fh:
            d = json.loads(line)
            if d.get("event") == "probe":
                probes.append((d["ts"], d["gbps"]))
            elif d.get("event") == "launch":
                launches.append(d)
            elif d.get("event") == "gave_up":
                gaveups += 1
    if not probes:
        print("no probes logged", file=sys.stderr)
        raise SystemExit(1)
    probes.sort()
    ts = [p[0] for p in probes]
    bw = [p[1] for p in probes]
    span_h = (ts[-1] - ts[0]) / 3600

    def frac(pred):
        return sum(1 for g in bw if pred(g)) / len(bw)

    # longest continuous stretch where every probe reads < 4 GB/s
    longest, start = 0.0, None
    for (t, g) in probes:
        if g < 4.0:
            start = t if start is None else start
            longest = max(longest, t - start)
        else:
            start = None

    def fmt_t(t):
        return time.strftime("%H:%M", time.gmtime(t))

    print(f"probes: {len(probes)} spanning {span_h:.1f} h "
          f"({fmt_t(ts[0])}-{fmt_t(ts[-1])} UTC)")
    print(f"bandwidth GB/s: min {min(bw):.2f}  median "
          f"{statistics.median(bw):.2f}  max {max(bw):.2f}")
    print(f"quiet fraction  >=6 GB/s (tier 1): {frac(lambda g: g >= 6):.1%}")
    print(f"moderate fraction >=4 GB/s (tier 2): "
          f"{frac(lambda g: g >= 4):.1%}")
    print(f"deep storm fraction <1 GB/s: {frac(lambda g: g < 1):.1%}")
    print(f"longest continuous <4 GB/s storm: {longest / 3600:.1f} h")
    print(f"launches: {len(launches)}  gave-ups: {gaveups}")


if __name__ == "__main__":
    main()
