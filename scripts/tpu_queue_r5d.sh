#!/bin/bash
# Round-5 session-2 TPU science queue (re-prioritized after seed1 landed
# budget-limited at 7.87 px): realdata arms first (VERDICT item 5, the #1
# missing item; ~10-25 min each), then the seed-1 extended-budget rerun
# (item 6 variance root-cause), then the p6 EPE-floor arm (item 10), then
# realdata 256². Gated on the already-running seed-2 flagship (/tmp/s2.pid).
cd /root/repo || exit 1
while kill -0 "$(cat /tmp/s2.pid)" 2>/dev/null; do sleep 30; done
cp /tmp/science_final_s2_r256_fresh_p5.jsonl docs/science/ 2>/dev/null
echo "$(date -u) seed2 done"

echo "$(date -u) === realdata 128^2 arm B: 150-epoch budget ==="
SCIENCE_TPU=1 timeout 5400 python scripts/science_realdata.py 150 128 256 \
  > /tmp/q5_realdata128_b.log 2>&1
echo "$(date -u) armB rc=$?"

echo "$(date -u) === realdata 128^2 arm C: n_train 1024 ==="
SCIENCE_TPU=1 timeout 5400 python scripts/science_realdata.py 100 128 1024 \
  > /tmp/q5_realdata128_c.log 2>&1
echo "$(date -u) armC rc=$?"

echo "$(date -u) === seed-1 extended budget (240+40+30) ==="
mv /tmp/science_final_s1_r256_fresh_p5.jsonl /tmp/science_final_s1_r256_fresh_p5_e160.jsonl 2>/dev/null
SCIENCE_TPU=1 timeout 10800 python scripts/science_final.py 240 40 30 1 256 unet fresh \
  > /tmp/q5_final256_s1x.log 2>&1
echo "$(date -u) s1 extended rc=$?"
cp /tmp/science_final_s1_r256_fresh_p5.jsonl docs/science/science_final_s1_r256_fresh_p5_e310.jsonl 2>/dev/null

echo "$(date -u) === 256^2 pyramid-6 EPE-floor arm (seed 0) ==="
SCIENCE_TPU=1 timeout 7200 python scripts/science_final.py 120 20 20 0 256 unet fresh pyr=6 \
  > /tmp/q5_final256_p6.log 2>&1
echo "$(date -u) p6 rc=$?"
cp /tmp/science_final_r256_fresh_p6.jsonl docs/science/ 2>/dev/null

echo "$(date -u) === realdata 256^2 ==="
SCIENCE_TPU=1 timeout 7200 python scripts/science_realdata.py 70 256 256 \
  > /tmp/q5_realdata256.log 2>&1
echo "$(date -u) realdata256 rc=$?"

# optional extra steps decided mid-queue (e.g. seed-2 extension)
[ -f /tmp/q5_extra.sh ] && bash /tmp/q5_extra.sh
echo "$(date -u) queue r5d done"
