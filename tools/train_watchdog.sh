#!/bin/bash
# Supervise the reference-defaults TPU training run: the axon TPU tunnel
# occasionally drops the session server-side (observed twice in one run:
# the process blocks forever inside a device transfer, log goes silent).
# This watchdog restarts training from the newest checkpoint whenever the
# log stops advancing for STALL_S seconds.
#
# Usage: bash tools/train_watchdog.sh <target_iterations>
set -u
cd "$(dirname "$0")/.."
TARGET=${1:-1000}
MODELDIR=/tmp/urban_tpu/hlg/111/models
LOG=/tmp/refdefaults_watchdog.log
RUNLOG=/tmp/refdefaults_current.log
# The first iteration after a (re)start spends ~600 s compiling the rollout
# and update programs on the TPU side before any iteration line is printed
# (log_train_tpu.txt iteration 0: T_sample 77 s + T_update 522 s), so a
# fresh process must get a long grace period; a run that has already
# printed an iteration line advances every ~13 s, so 240 s of silence
# there means the tunnel really dropped.
STARTUP_S=1200
# Steady-state silence threshold. Must exceed the worst host-side stall a
# CONCURRENT CPU job can impose on the trainer's between-iteration work on
# this 1-CPU box (a divergence replay starved the loop >260 s); a restart
# costs ~600 s of recompile, so killing earlier than that is never a win.
STALL_S=600

echo "[watchdog] target=$TARGET iterations" >> "$LOG"
while true; do
  latest=$(ls -t "$MODELDIR"/tpu_iteration_*.p 2>/dev/null | head -1)
  it=$(basename "${latest:-tpu_iteration_0000.p}" | grep -oE '[0-9]+')
  it=$((10#$it))
  if [ "$it" -ge "$((TARGET - 10))" ]; then
    echo "[watchdog] reached iteration $it >= $((TARGET-10)); done" >> "$LOG"
    break
  fi
  echo "[watchdog] $(date -u +%T) starting from iteration $it ($latest)" >> "$LOG"
  python -m urban_tpu.rl.train_tpu --cfg hlg --global_seed 111 \
    --num_envs 512 --rollout_len 50 --iterations "$TARGET" --eval_envs 64 \
    ${latest:+--resume "$latest"} >> "$RUNLOG" 2>&1 &
  pid=$!
  echo "$pid" > /tmp/refdefaults.pid
  # monitor: kill + restart if the run log stops growing. Until this
  # process has printed its first iteration line ("T_sample"), allow the
  # long compile (STARTUP_S); afterwards use the steady-state STALL_S.
  start_ts=$(date +%s)
  runlog_lines=$(wc -l < "$RUNLOG" 2>/dev/null || echo 0)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    if tail -n +$((runlog_lines + 1)) "$RUNLOG" 2>/dev/null | grep -q "T_sample"; then
      limit=$STALL_S
    else
      limit=$STARTUP_S
    fi
    age=$(( $(date +%s) - $(stat -c %Y "$RUNLOG") ))
    since_start=$(( $(date +%s) - start_ts ))
    [ "$since_start" -lt "$age" ] && age=$since_start
    if [ "$age" -gt "$limit" ]; then
      echo "[watchdog] $(date -u +%T) log silent ${age}s; restarting" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 3; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      break
    fi
  done
  # normal exit with target reached ends the loop on the next check
  sleep 5
done
