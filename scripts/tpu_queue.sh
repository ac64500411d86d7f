#!/bin/bash
# Round-4 TPU work queue: waits for the axon tunnel, then runs every
# hardware-blocked VERDICT item in priority order. Re-probes between
# steps so a mid-queue outage just pauses rather than cascades.
cd /root/repo

wait_tunnel() {
  while true; do
    if timeout 600 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
      echo "[$(date -u +%H:%M:%S)] tunnel up"
      return 0
    fi
    echo "[$(date -u +%H:%M:%S)] probe failed; retry in 120s"
    sleep 120
  done
}

run() {  # run NAME TIMEOUT LOG CMD...
  local name=$1 tmo=$2 log=$3; shift 3
  wait_tunnel
  echo "[$(date -u +%H:%M:%S)] START $name"
  timeout "$tmo" "$@" > "$log" 2>&1
  echo "[$(date -u +%H:%M:%S)] DONE $name rc=$?"
}

# 1. Short kernel-variant sweep (warms cache; answers the GN-overlap stretch)
run kernel_variants 2400 /tmp/bench_variants.log \
  python scripts/bench_kernel_variants.py

# 2/3. The AR evidence chain (VERDICT #1, highest leverage)
run ar_raw 5400 /tmp/demo_ar_raw.log \
  env DEMO_N=400 DEMO_EPOCHS=600 DEMO_AR=1 DEMO_CALIBRATE=false \
      DEMO_OUT=/root/repo/DEMO_AR_RAW.json \
  python scripts/demo_full_scale.py

run ar_joint 5400 /tmp/demo_ar_joint.log \
  env DEMO_N=400 DEMO_EPOCHS=600 DEMO_AR=1 \
      DEMO_OUT=/root/repo/DEMO_AR_JOINT.json \
  python scripts/demo_full_scale.py --assert

# 4. AR perf anatomy (VERDICT #2)
run profile_ar 5400 /tmp/profile_ar.log \
  env PROFILE_EPOCHS=75 python scripts/profile_ar.py

# 5. Held-out protocol at n=400 (VERDICT #4)
run held_out_n400 7200 /tmp/demo_heldout_n400.log \
  env DEMO_N=400 DEMO_EPOCHS=400 DEMO_OUT=/root/repo/DEMO_HELD_OUT_N400.json \
  python scripts/demo_held_out.py

# 6. TPU-gated tests at the round-3/4 defaults (VERDICT #6)
run tpu_gated_tests 3600 /tmp/tpu_gated.log \
  env OSDM_TPU_TESTS=1 python -m pytest -q \
    tests/test_posterior_kernel.py \
    "tests/test_fused_sampler.py::test_fused_prng_statistics_match_scan_sampler" \
    "tests/test_fused_sampler.py::test_fused_discrete_prng_statistics_match_scan" \
    "tests/test_fused_sampler.py::test_fused_discrete_ddim_statistics_match_scan"

# 7. AR serving SLA (VERDICT #7)
run serving_sla_ar 5400 /tmp/serving_sla_ar.log \
  env SLA_AR=1 python scripts/bench_serving.py --assert

# 8. Driver-bench self-check
run bench 2400 /tmp/bench_r4.log python bench.py

echo "[$(date -u +%H:%M:%S)] ALL DONE"
touch /tmp/tpu_queue_done
