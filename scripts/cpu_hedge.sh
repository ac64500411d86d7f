#!/bin/bash
# Tunnel-outage hedge: run the quality-critical round-4 demos on CPU.
# Validation metrics are hardware-independent; outputs carry a
# platform stamp and _CPU suffix so TPU-queue artifacts are never
# clobbered. Each step is skipped if the TPU queue already produced
# the real artifact.
cd /root/repo

run_unless() {  # run_unless TPU_ARTIFACT TIMEOUT LOG CMD...
  local artifact=$1 tmo=$2 log=$3; shift 3
  if [ -f "$artifact" ]; then
    echo "[$(date -u +%H:%M:%S)] SKIP (TPU artifact $artifact exists)"
    return 0
  fi
  echo "[$(date -u +%H:%M:%S)] START $log"
  timeout "$tmo" "$@" > "$log" 2>&1
  echo "[$(date -u +%H:%M:%S)] DONE $log rc=$?"
}

# Step 1 cannot key off DEMO_AR_RAW.json — a stale pre-fix round-3
# artifact already exists under that name — so it keys off its own
# output, making re-runs of the hedge idempotent.
run_unless /root/repo/DEMO_AR_RAW_CPU.json 21600 /tmp/demo_ar_raw_cpu.log \
  env OSDM_FORCE_CPU=1 DEMO_N=400 DEMO_EPOCHS=600 DEMO_AR=1 DEMO_CALIBRATE=false \
      DEMO_OUT=/root/repo/DEMO_AR_RAW_CPU.json \
  python scripts/demo_full_scale.py

run_unless /root/repo/DEMO_AR_JOINT.json 21600 /tmp/demo_ar_joint_cpu.log \
  env OSDM_FORCE_CPU=1 DEMO_N=400 DEMO_EPOCHS=600 DEMO_AR=1 \
      DEMO_OUT=/root/repo/DEMO_AR_JOINT_CPU.json \
  python scripts/demo_full_scale.py

run_unless /root/repo/DEMO_HELD_OUT_N400.json 28800 /tmp/demo_heldout_n400_cpu.log \
  env OSDM_FORCE_CPU=1 DEMO_N=400 DEMO_EPOCHS=400 \
      DEMO_OUT=/root/repo/DEMO_HELD_OUT_N400_CPU.json \
  python scripts/demo_held_out.py

echo "[$(date -u +%H:%M:%S)] HEDGE DONE"
touch /tmp/cpu_hedge_done
