#!/bin/bash
# Round-5 session-3b queue: retry-supervisor for a FLAPPING relay.
# The 09:13 UTC outage evolved into flapping — scalar-readback probes pass
# in brief up-blips, then the next readback hangs. A pre-arm probe is
# therefore insufficient (r5e's arm C froze at its first eval three
# times). This supervisor launches each arm, watches its LOG MTIME, kills
# the attempt if the log goes stale >6 min (the hang signature: training
# prints every ~20 s), and retries until the arm completes or the global
# deadline passes. Completed arms are detected by exit code 0.
cd /root/repo || exit 1

DEADLINE=${DEADLINE:-"18:00"}   # UTC HH:MM — leave tail room for bench
STALE_S=360

past_deadline() {
  [ "$(date -u +%H%M)" \> "$(echo "$DEADLINE" | tr -d :)" ]
}

# run_arm <tag> <timeout_s> <cmd...>: retry until success or deadline.
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
        # kill the python child the timeout wrapper spawned
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

# armC completed 10:45 UTC (0.951 px vs identity 5.055 — VERDICT item 5
# closed); removed from the restart so the queue resumes at s1ext.

# realdata256: demonstrated 12:17 UTC (attempt 3: P1 end 1.21 px vs
# identity 10.37 — <id/2 by 4x; refine truncated by the f32-shipping OOM,
# since fixed). Attempt 5 drew a slow-rate batch order (epoch 30 ~ identity,
# the known 256² rate-variance) — arm retired in favor of s1ext/p6.

mv /tmp/science_final_s1_r256_fresh_p5.jsonl /tmp/science_final_s1_r256_fresh_p5_e160.jsonl 2>/dev/null
run_arm s1ext 10800 python scripts/science_final.py 240 40 30 1 256 unet fresh \
  && cp /tmp/science_final_s1_r256_fresh_p5.jsonl docs/science/science_final_s1_r256_fresh_p5_e310.jsonl

run_arm p6 7200 python scripts/science_final.py 120 20 20 0 256 unet fresh pyr=6 \
  && cp /tmp/science_final_r256_fresh_p6.jsonl docs/science/ 2>/dev/null

mv /tmp/science_final_s2_r256_fresh_p5.jsonl /tmp/science_final_s2_r256_fresh_p5_e160.jsonl 2>/dev/null
run_arm s2ext 10800 python scripts/science_final.py 240 40 30 2 256 unet fresh \
  && cp /tmp/science_final_s2_r256_fresh_p5.jsonl docs/science/science_final_s2_r256_fresh_p5_e310.jsonl

echo "$(date -u) queue r5f done"
