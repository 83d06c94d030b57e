#!/bin/bash
# Round-5 TPU science queue (launch AFTER the perf probes/bench are done —
# these runs hold the chip for hours). Logs in /tmp/q5_*.log.
# Priorities per VERDICT r4: #5 realdata >=128², #6 256² seed spread,
# #10 EPE floor (pyramid 6 arm).
cd /root/repo || exit 1

echo "$(date -u) === realdata 128² (256 pairs, res-scaled recipe) ==="
SCIENCE_TPU=1 timeout 7200 python scripts/science_realdata.py 70 128 256 \
  > /tmp/q5_realdata128.log 2>&1
echo "$(date -u) realdata128 rc=$?"

echo "$(date -u) === 256² flagship seed 1 (VERDICT #6) ==="
SCIENCE_TPU=1 timeout 14400 python scripts/science_final.py 120 20 20 1 256 unet fresh \
  > /tmp/q5_final256_s1.log 2>&1
echo "$(date -u) final256 s1 rc=$?"
cp /tmp/science_final_s1_r256_fresh_p5.jsonl docs/science/ 2>/dev/null

echo "$(date -u) === 256² flagship seed 2 ==="
SCIENCE_TPU=1 timeout 14400 python scripts/science_final.py 120 20 20 2 256 unet fresh \
  > /tmp/q5_final256_s2.log 2>&1
echo "$(date -u) final256 s2 rc=$?"
cp /tmp/science_final_s2_r256_fresh_p5.jsonl docs/science/ 2>/dev/null

echo "$(date -u) === 256² pyramid-6 EPE-floor arm (VERDICT #10, seed 0) ==="
SCIENCE_TPU=1 timeout 14400 python scripts/science_final.py 120 20 20 0 256 unet fresh pyr=6 \
  > /tmp/q5_final256_p6.log 2>&1
echo "$(date -u) final256 p6 rc=$?"
cp /tmp/science_final_r256_fresh_p6.jsonl docs/science/ 2>/dev/null

echo "$(date -u) === realdata 256² (if time remains) ==="
SCIENCE_TPU=1 timeout 10800 python scripts/science_realdata.py 70 256 256 \
  > /tmp/q5_realdata256.log 2>&1
echo "$(date -u) realdata256 rc=$?"
echo "$(date -u) queue r5b done"
