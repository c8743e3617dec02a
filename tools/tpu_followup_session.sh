#!/bin/bash
# Follow-up TPU batch after the r3 int8 session: the crashed capability
# probe (step 1, sys.path fix) and the NEW T2T block-engine measurements
# (fake-head padding). Run with:
#   nohup bash tools/tpu_followup_session.sh > /tmp/followup.log 2>&1 &
set -x
cd /root/repo

echo "=== 1. capability probe (s8 matmul/conv/pallas rates)"
timeout 1500 python tools/probe_int8.py > /tmp/int8_probe.json

echo "=== 2. T2T trunk on the fused block kernels (+int8 +diagnostics)"
timeout 1800 python bench.py --t2t --int8 --diagnostics > /tmp/int8_t2t.json

echo "=== done"
cat /tmp/int8_probe.json /tmp/int8_t2t.json
