#!/bin/bash
# Watch for the axon TPU tunnel to come back; when a probe succeeds, run
# the queued int8 measurement session exactly once. Launch with:
#   nohup bash tools/tpu_watch.sh > /tmp/tpu_watch.log 2>&1 &
cd /root/repo
i=0
while true; do
  i=$((i+1))
  if timeout 120 python -c "import jax; d=jax.devices(); assert d; print(d)" \
      >> /tmp/tpu_watch.log 2>&1; then
    echo "probe $i OK $(date) — launching int8 session"
    bash tools/tpu_int8_session.sh > /tmp/int8_session.log 2>&1
    echo "int8 session finished $(date)"
    exit 0
  fi
  echo "probe $i failed $(date)"
  sleep 240
done
