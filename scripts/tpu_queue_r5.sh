#!/bin/bash
# Round-5 TPU probe queue. Logs in /tmp/q5_*.log.
cd /root/repo || exit 1
echo "$(date -u) === r5a: hybrid fused block (taps fwd + kstack bwd) in-step A/B ==="
timeout 7200 python scripts/perf_probe_r5a.py > /tmp/q5_r5a.log 2>&1
echo "$(date -u) r5a rc=$?"
echo "$(date -u) === r5b: shift-gather warp VJP A/B (config #1 shape) ==="
timeout 3600 python scripts/perf_probe_r5b.py > /tmp/q5_r5b.log 2>&1
echo "$(date -u) r5b rc=$?"
echo "$(date -u) queue r5 stage1 done"
