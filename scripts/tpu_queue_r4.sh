#!/bin/bash
# Round-4 TPU work queue (in priority order). Each job is independent;
# logs in /tmp/q4_*.log. Run from the repo root when the relay is up.
cd /root/repo || exit 1

echo "$(date -u) === 256-squared unet (continue/full: 60+15 joint, 20 refine) ==="
SCIENCE_TPU=1 timeout 10800 python scripts/science_final.py 60 15 20 0 256 unet fresh \
  > /tmp/q4_final256.log 2>&1
echo "$(date -u) final256 rc=$?"
cp /tmp/science_final_r256_fresh.jsonl docs/science/ 2>/dev/null

echo "$(date -u) === 128-squared long-budget rerun (crossing identity/2) ==="
# v12 (60+15) reached 4.05 vs identity 5.57, still falling; epochs are
# ~8 s on TPU — budget, not recipe, was the limit. Two seeds.
for s in 0 1; do
  SCIENCE_TPU=1 timeout 7200 python scripts/science_final.py 120 20 20 $s 128 unet fresh \
    > /tmp/q4_final128_s$s.log 2>&1
  echo "$(date -u) final128 s$s rc=$?"
done
cp /tmp/science_final_r128_fresh.jsonl docs/science/ 2>/dev/null
cp /tmp/science_final_s1_r128_fresh.jsonl docs/science/ 2>/dev/null

echo "$(date -u) === 256-squared affine arm ==="
SCIENCE_TPU=1 timeout 7200 python scripts/science_final.py 40 10 15 0 256 affine \
  > /tmp/q4_final256aff.log 2>&1
echo "$(date -u) final256aff rc=$?"
cp /tmp/science_final_affine_r256.jsonl docs/science/ 2>/dev/null
echo "$(date -u) queue done"
