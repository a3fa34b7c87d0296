#!/bin/bash
# Round-5 scaling-evidence accumulator, tier-3 revision: LEG SAMPLING.
#
# The full-run grinds (scaling_grind.sh, scaling_grind2.sh) needed a
# quiet window long enough for a whole interleaved multi-rep run; the
# host's round-5 co-tenant storm gave them ZERO launches in 15+ hours
# (SCALING_r05_weather.jsonl) while showing plenty of 1-3-minute lulls.
# A single 300k-doc build leg (17-60 s) fits those lulls, and the
# pooled best-qualified-legs estimator (BASELINE.md, quoted by the r4
# verdict) needs per-LEG samples, not whole runs.  So: probe every ~45 s
# (leg_sample.py defers below its >=4 GB/s gate and logs the probe to
# the weather log); on a lull, take ONE leg sample — legs strictly
# alternate 16/4 CPU so neither leg can harvest systematically better
# weather than the other.  Full runs remain available manually when a
# sustained-quiet stretch appears in SCALING_r05_legs.jsonl.
#
# Stop by touching /tmp/stop_scaling_grind; self-limits by sample count
# and wall-clock so it can never outlive the session budget.
set -u
cd /root/repo
MAX_LEGS=${1:-120}
MAX_SECS=${2:-18000}
t0=$(date +%s)
sampled=0
leg=16
while :; do
    [ -e /tmp/stop_scaling_grind ] && break
    now=$(date +%s)
    [ $((now - t0)) -ge "$MAX_SECS" ] && break
    [ "$sampled" -ge "$MAX_LEGS" ] && break
    # interactive-session handshake: the operator touches the pause
    # file before running any Ray workload of their own (two Ray
    # workloads sharing the bus poison whichever one is being timed)
    if [ -e /tmp/pause_leg_grind ]; then
        sleep 20
        continue
    fi
    python scripts/leg_sample.py "$leg" >> /tmp/leg_grind.log 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
        sampled=$((sampled + 1))
        if [ "$leg" -eq 16 ]; then leg=4; else leg=16; fi
    else
        # deferred (rc 3) or failed (logged): re-probe soon — the storm's
        # quiet spikes can be shorter than a 40 s nap (a gated bench rep
        # caught a 10.9 GB/s pre-probe inside one); the probe itself
        # costs ~3 s, so a 15 s cadence stays light on the bus
        sleep 15
    fi
done
echo "leg grind exit after $sampled samples"
