#!/bin/bash
# Round-4 perf session (run AFTER the science queue; TPU must be otherwise
# idle — same-window A/Bs). Logs in /tmp/q4b_*.log.
cd /root/repo || exit 1

echo "$(date -u) === r4a: skinny-matmul M-ladder (head-kernel feasibility) ==="
timeout 2400 python scripts/perf_probe_r4a.py > /tmp/q4b_r4a.log 2>&1
echo "$(date -u) r4a rc=$?"

echo "$(date -u) === r4b: decoder conv im2col-dot A/B ==="
timeout 2400 python scripts/perf_probe_r4b.py > /tmp/q4b_r4b.log 2>&1
echo "$(date -u) r4b rc=$?"

echo "$(date -u) === r4c: shift-gather warp A/B ==="
timeout 2400 python scripts/perf_probe_r4c.py > /tmp/q4b_r4c.log 2>&1
echo "$(date -u) r4c rc=$?"

echo "$(date -u) === r4d: scan-chain + b64 ladder A/B ==="
timeout 3600 python scripts/perf_probe_r4d.py > /tmp/q4b_r4d.log 2>&1
echo "$(date -u) r4d rc=$?"

echo "$(date -u) === torch STN denominator (CPU) ==="
timeout 1200 python scripts/torch_baseline.py stn > /tmp/q4b_torch_stn.json 2> /tmp/q4b_torch_stn.log
echo "$(date -u) torch stn rc=$?"
echo "$(date -u) queue r4b done"
