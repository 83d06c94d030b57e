#!/bin/bash
# Round-5 stretch arm: 512² synthetic registration (beyond the reference's
# 256² operating point — the "long-context analog" is resolution, SURVEY
# §6). Capture-range arithmetic: identity EPE ~22 px at 512², pyramid
# auto-scales to 6 (coarsest cell 64 px, ratio 0.35 — inside the proven
# range). Gated on the r5f queue finishing; same retry-supervisor.
cd /root/repo || exit 1

while kill -0 "$(cat /tmp/q5.pid)" 2>/dev/null; do sleep 60; done

DEADLINE=${DEADLINE:-"18:00"}
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

run_arm r512 10800 python scripts/science_final.py 120 20 20 0 512 unet fresh \
  && cp /tmp/science_final_r512_fresh_p6.jsonl docs/science/ 2>/dev/null

echo "$(date -u) queue r5g done"
