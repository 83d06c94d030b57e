#!/bin/bash
# Round-5 session-3 queue: the r5d remainder, restarted after the 09:13 UTC
# relay outage killed arm C mid-run. Waits for the relay to answer a trivial
# device probe before each arm (the round-3 outage lasted 2h+; arms must not
# burn their timeouts against a dead relay).
cd /root/repo || exit 1

wait_relay() {
  # block_until_ready does NOT wait under the relay (CLAUDE.md) — a probe
  # must READ BACK a scalar to exercise the D2H path, which is exactly the
  # piece that hangs in an outage (09:13 UTC: training steps kept running
  # while every readback futex-waited).
  while true; do
    timeout 180 python -c "import jax.numpy as jnp; \
x = jnp.ones((8,8)); print(float((x@x).sum()))" >/dev/null 2>&1 && return 0
    echo "$(date -u) relay still down (readback probe)"
    sleep 120
  done
}

echo "$(date -u) waiting for relay"
wait_relay
echo "$(date -u) relay is back"

echo "$(date -u) === realdata 128^2 arm C: n_train 1024 ==="
SCIENCE_TPU=1 timeout 5400 python scripts/science_realdata.py 100 128 1024 \
  > /tmp/q5_realdata128_c.log 2>&1
echo "$(date -u) armC rc=$?"

wait_relay
echo "$(date -u) === seed-1 extended budget (240+40+30) ==="
mv /tmp/science_final_s1_r256_fresh_p5.jsonl /tmp/science_final_s1_r256_fresh_p5_e160.jsonl 2>/dev/null
SCIENCE_TPU=1 timeout 10800 python scripts/science_final.py 240 40 30 1 256 unet fresh \
  > /tmp/q5_final256_s1x.log 2>&1
echo "$(date -u) s1 extended rc=$?"
cp /tmp/science_final_s1_r256_fresh_p5.jsonl docs/science/science_final_s1_r256_fresh_p5_e310.jsonl 2>/dev/null

wait_relay
echo "$(date -u) === 256^2 pyramid-6 EPE-floor arm (seed 0) ==="
SCIENCE_TPU=1 timeout 7200 python scripts/science_final.py 120 20 20 0 256 unet fresh pyr=6 \
  > /tmp/q5_final256_p6.log 2>&1
echo "$(date -u) p6 rc=$?"
cp /tmp/science_final_r256_fresh_p6.jsonl docs/science/ 2>/dev/null

wait_relay
echo "$(date -u) === realdata 256^2 ==="
SCIENCE_TPU=1 timeout 7200 python scripts/science_realdata.py 70 256 256 \
  > /tmp/q5_realdata256.log 2>&1
echo "$(date -u) realdata256 rc=$?"

wait_relay
echo "$(date -u) === seed-2 extended budget (240+40+30) ==="
mv /tmp/science_final_s2_r256_fresh_p5.jsonl /tmp/science_final_s2_r256_fresh_p5_e160.jsonl 2>/dev/null
SCIENCE_TPU=1 timeout 10800 python scripts/science_final.py 240 40 30 2 256 unet fresh \
  > /tmp/q5_final256_s2x.log 2>&1
echo "$(date -u) s2 extended rc=$?"
cp /tmp/science_final_s2_r256_fresh_p5.jsonl docs/science/science_final_s2_r256_fresh_p5_e310.jsonl 2>/dev/null

echo "$(date -u) queue r5e done"
