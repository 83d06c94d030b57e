#!/bin/bash
# Round-5 session-4 queue: the trajectory-selection GATE demonstrations.
# 256² convergence is bimodal across trajectory draws (seed 0 / realdata
# attempt 3 converge; seeds 1/2 + their extensions, p6, and the first 512²
# draw stall with direction locked but pcos_ho ~0.2-0.55). The committed
# trajectories separate at epoch 25 by pcos_ho (0.42 converged vs
# 0.27/0.20 stalled) -> gate=25:0.35 restarts until a locking draw is
# found, then trains the full budget. Same retry-supervisor as r5f.
cd /root/repo || exit 1

DEADLINE=${DEADLINE:-"17:40"}
STALE_S=360

past_deadline() {
  [ "$(date -u +%H%M)" \> "$(echo "$DEADLINE" | tr -d :)" ]
}

run_arm() {
  local tag="$1" tmo="$2"; shift 2
  local log="/tmp/q5f_${tag}.log" attempt=0
  while ! past_deadline; do
    attempt=$((attempt + 1))
    echo "$(date -u) [$tag] attempt $attempt"
    SCIENCE_TPU=1 timeout "$tmo" "$@" > "$log" 2>&1 &
    local pid=$!
    echo "$pid" > "/tmp/q5f_${tag}.pid"
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
      if [ "$age" -gt "$STALE_S" ]; then
        echo "$(date -u) [$tag] log stale ${age}s — killing attempt"
        kill "$pid" 2>/dev/null; sleep 3
        for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do kill -9 "$c" 2>/dev/null; done
        kill -9 "$pid" 2>/dev/null
        break
      fi
      if past_deadline; then
        echo "$(date -u) [$tag] deadline hit mid-attempt — killing"
        kill "$pid" 2>/dev/null; sleep 3; kill -9 "$pid" 2>/dev/null
        return 1
      fi
    done
    wait "$pid" 2>/dev/null
    local rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "$(date -u) [$tag] DONE (attempt $attempt)"
      return 0
    fi
    echo "$(date -u) [$tag] attempt $attempt rc=$rc — retrying"
    sleep 30
  done
  echo "$(date -u) [$tag] deadline passed"
  return 1
}

run_arm s1gate 10800 python scripts/science_final.py 120 20 20 1 256 unet fresh gate=25:0.35 \
  && cp /tmp/science_final_s1_r256_fresh_p5_gate.jsonl docs/science/ 2>/dev/null

run_arm s2gate 10800 python scripts/science_final.py 120 20 20 2 256 unet fresh gate=25:0.35 \
  && cp /tmp/science_final_s2_r256_fresh_p5_gate.jsonl docs/science/ 2>/dev/null

run_arm r512gate 10800 python scripts/science_final.py 120 20 20 0 512 unet fresh gate=25:0.3 \
  && cp /tmp/science_final_r512_fresh_p6_gate.jsonl docs/science/ 2>/dev/null

echo "$(date -u) queue r5h done"
