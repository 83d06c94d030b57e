#!/bin/bash
# Round-4 perf session continuation (after r4a/r4e): the shift-gather
# warp bandwidth probe (VERDICT item 9) and the ladder-head A/Bs incl.
# the bucketed flat Adam (VERDICT item 1 levers). Serial — same-window
# comparisons need an otherwise idle chip. Logs in /tmp/q4c_*.log.
cd /root/repo || exit 1

echo "$(date -u) === r4c: shift-gather warp bandwidth probe ==="
timeout 2400 python scripts/perf_probe_r4c.py > /tmp/q4c_r4c.log 2>&1
echo "$(date -u) r4c rc=$?"
tail -6 /tmp/q4c_r4c.log

echo "$(date -u) === r4d: scan-chain + b64 + bucketed-adam ladder A/B ==="
timeout 18000 python scripts/perf_probe_r4d.py > /tmp/q4c_r4d.log 2>&1
echo "$(date -u) r4d rc=$?"
tail -8 /tmp/q4c_r4d.log
echo "$(date -u) queue r4c done"
