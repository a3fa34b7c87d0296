#!/bin/bash
# Round-5 scaling-evidence accumulator, tier-4 revision: SAME-WINDOW
# PAIRS first, single legs as fallback.
#
# The single-leg grind (scaling_grind3.sh) samples each leg in its own
# weather, so the pooled ratio mixes windows hours apart; a same-window
# pair (paired_leg.py: 4-CPU leg, probe, 16-CPU leg inside ONE >=6 GB/s
# stretch) is the storm-era analogue of a full interleaved run.  Each
# cycle: try a pair in a quiet window; if the opening probe defers, take
# ONE alternating single leg in a >=4 GB/s moderate window (the tier-2
# evidence grind3 collected); else nap 15 s and re-probe.
set -u
cd /root/repo
MAX_EVENTS=${1:-100}
MAX_SECS=${2:-14400}
t0=$(date +%s)
events=0
leg=16
order="--order=hi-first"
while :; do
    [ -e /tmp/stop_scaling_grind ] && break
    now=$(date +%s)
    [ $((now - t0)) -ge "$MAX_SECS" ] && break
    [ "$events" -ge "$MAX_EVENTS" ] && break
    if [ -e /tmp/pause_leg_grind ]; then
        sleep 20
        continue
    fi
    python scripts/paired_leg.py "$order" >> /tmp/leg_grind.log 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
        events=$((events + 1))
        if [ "$order" = "--order=hi-first" ]; then
            order="--order=lo-first"
        else
            order="--order=hi-first"
        fi
        continue
    fi
    python scripts/leg_sample.py "$leg" >> /tmp/leg_grind.log 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
        events=$((events + 1))
        if [ "$leg" -eq 16 ]; then leg=4; else leg=16; fi
    else
        sleep 15
    fi
done
echo "grind4 exit after $events events"
