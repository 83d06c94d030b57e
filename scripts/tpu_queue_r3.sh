#!/bin/bash
# Round-3 session-3 TPU work queue: waits for the axon relay to come back
# (outage since ~19:15 UTC), then runs the queued probes + science batch.
# Logs land in /tmp/q_*.log; JSON results in /tmp/q_*.json.
cd /root/repo
echo "$(date -u) waiting for TPU..."
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; assert jax.default_backend()=='tpu'" 2>/dev/null; then
    echo "$(date -u) TPU back (attempt $i)"; break
  fi
  sleep 60
done

echo "$(date -u) === r3q (b48 ladder decision) ==="
timeout 4000 python scripts/perf_probe_r3q.py > /tmp/q_r3q.json 2> /tmp/q_r3q.log
echo "$(date -u) r3q rc=$?"

echo "$(date -u) === r3p (UNet dissection) ==="
timeout 3600 python scripts/perf_probe_r3p.py > /tmp/q_r3p.json 2> /tmp/q_r3p.log
echo "$(date -u) r3p rc=$?"

echo "$(date -u) === science_256_direct ==="
SCIENCE_TPU=1 timeout 5400 python scripts/science_256_direct.py 1200 \
  > /tmp/q_256direct.log 2>&1
echo "$(date -u) 256direct rc=$?"

echo "$(date -u) === science_final 256 affine ==="
SCIENCE_TPU=1 timeout 7200 python scripts/science_final.py 40 10 15 0 256 affine \
  > /tmp/q_final256aff.log 2>&1
echo "$(date -u) final256aff rc=$?"

echo "$(date -u) === science_final 256 unet fresh ==="
SCIENCE_TPU=1 timeout 10800 python scripts/science_final.py 60 15 20 0 256 unet fresh \
  > /tmp/q_final256fresh.log 2>&1
echo "$(date -u) final256fresh rc=$?"
echo "$(date -u) queue done"
