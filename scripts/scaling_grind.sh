#!/bin/bash
# Round-5 scaling-evidence accumulator (VERDICT r4 'Next round' #1a):
# run `bench.py --scaling` back to back, committing each result as
# SCALING_r05_runN.json.  All round-5 runs are docterms-v3 code (plus the
# r5 run-detector fix), so the per-round median is a same-code median —
# the r4 all-weather median was anchored by 19 pre-v3 runs and could not
# converge to the current code's value.
#
# Stop by touching /tmp/stop_scaling_grind; also self-limits by count
# and wall-clock so it can never outlive the session budget.
set -u
cd /root/repo
MAX_RUNS=${1:-40}
MAX_SECS=${2:-21000}
t0=$(date +%s)
done=0
while [ $done -lt "$MAX_RUNS" ]; do
    [ -e /tmp/stop_scaling_grind ] && break
    now=$(date +%s)
    [ $((now - t0)) -ge "$MAX_SECS" ] && break
    i=1
    while [ -e "SCALING_r05_run$i.json" ]; do i=$((i + 1)); done
    # Launch-gate each run on a genuinely quiet window (VERDICT r4
    # 'Next round' #1a prescribes accumulating runs IN QUIET WINDOWS:
    # a run started mid-storm just records a weather-poisoned median
    # entry).  quiet_launch exits 3 without running if the bus never
    # goes quiet within --max-wait; we then re-check the stop/limit
    # conditions and wait again.
    python scripts/quiet_launch.py --gbps 6.0 --period 60 \
        --consecutive 2 --max-wait 1800 -- \
        python bench.py --scaling 2>>/tmp/scaling_grind.err | tail -1 \
        > /tmp/scaling_grind_tmp.json
    if [ "${PIPESTATUS[0]}" -eq 3 ]; then
        echo "run $i deferred: bus stormy for 30 min, re-gating"
        continue
    fi
    if [ -s /tmp/scaling_grind_tmp.json ] \
        && python -c "import json;json.load(open('/tmp/scaling_grind_tmp.json'))" \
            2>/dev/null; then
        cp /tmp/scaling_grind_tmp.json "SCALING_r05_run$i.json"
        echo "run $i done: $(python -c "
import json
d = json.load(open('SCALING_r05_run$i.json'))
print('subsat', d['efficiency_subsat'], 'sat', d['efficiency_saturated'])")"
    else
        echo "run $i FAILED (see /tmp/scaling_grind.err)"
        sleep 30
    fi
    done=$((done + 1))
done
echo "grind exit after $done runs"
