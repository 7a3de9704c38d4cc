#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run the pending full-TPU
# proofs in sequence. Each probe is a fresh bounded subprocess (a failed
# in-process TPU init is unrecoverable — see .claude/skills/verify/SKILL.md).
# Logs: /tmp/tunnel_wait.log, /tmp/e2e_ycb_r2.log, /tmp/e2e_lmo_r2.log,
#        /tmp/bench_warm_r2.log
set -u
cd /root/repo
MAX_WAIT_S=${MAX_WAIT_S:-36000}   # give up after 10 h
PROBE_EVERY_S=${PROBE_EVERY_S:-600}
start=$(date +%s)
echo "[$(date -u +%FT%TZ)] waiting for TPU tunnel..." >> /tmp/tunnel_wait.log
while true; do
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[$(date -u +%FT%TZ)] tunnel is UP" >> /tmp/tunnel_wait.log
    break
  fi
  now=$(date +%s)
  if (( now - start > MAX_WAIT_S )); then
    echo "[$(date -u +%FT%TZ)] gave up after ${MAX_WAIT_S}s" >> /tmp/tunnel_wait.log
    exit 2
  fi
  echo "[$(date -u +%FT%TZ)] still down; sleeping ${PROBE_EVERY_S}s" >> /tmp/tunnel_wait.log
  sleep "$PROBE_EVERY_S"
done

rc_total=0
echo "[$(date -u +%FT%TZ)] starting YCB e2e" >> /tmp/tunnel_wait.log
timeout 10800 python scripts/e2e_ycb_tpu.py --out logs/e2e_ycb_r2 \
  > /tmp/e2e_ycb_r2.log 2>&1
rc=$?; rc_total=$((rc_total + rc))
echo "[$(date -u +%FT%TZ)] YCB e2e rc=$rc" >> /tmp/tunnel_wait.log

echo "[$(date -u +%FT%TZ)] starting LMO e2e" >> /tmp/tunnel_wait.log
timeout 10800 python scripts/e2e_lmo_tpu.py --out logs/e2e_lmo_r2 \
  > /tmp/e2e_lmo_r2.log 2>&1
rc=$?; rc_total=$((rc_total + rc))
echo "[$(date -u +%FT%TZ)] LMO e2e rc=$rc" >> /tmp/tunnel_wait.log

echo "[$(date -u +%FT%TZ)] serving latency (3-net)" >> /tmp/tunnel_wait.log
timeout 3600 python scripts/bench_serving_latency.py --n 200 \
  > /tmp/latency_3net_r2.log 2>&1
rc=$?; rc_total=$((rc_total + rc))
echo "[$(date -u +%FT%TZ)] latency 3-net rc=$rc" >> /tmp/tunnel_wait.log

echo "[$(date -u +%FT%TZ)] serving latency (fused)" >> /tmp/tunnel_wait.log
timeout 3600 python scripts/bench_serving_latency.py --fused --n 200 \
  > /tmp/latency_fused_r2.log 2>&1
rc=$?; rc_total=$((rc_total + rc))
echo "[$(date -u +%FT%TZ)] latency fused rc=$rc" >> /tmp/tunnel_wait.log

echo "[$(date -u +%FT%TZ)] warming serving bench" >> /tmp/tunnel_wait.log
timeout 3600 python bench.py > /tmp/bench_warm_r2.log 2>&1
rc=$?; rc_total=$((rc_total + rc))
echo "[$(date -u +%FT%TZ)] bench rc=$rc; DONE (rc_total=$rc_total)" >> /tmp/tunnel_wait.log
exit "$rc_total"
