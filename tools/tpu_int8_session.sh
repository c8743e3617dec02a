#!/bin/bash
# One-shot TPU measurement batch for the int8 r3 additions. Run with:
#   nohup bash tools/tpu_int8_session.sh > /tmp/int8_session.log 2>&1 &
# First pallas execution pays the one-time ~2-5 min Mosaic warm-up; every
# python step gets its own generous timeout so one hang cannot eat the
# session. Results land in /tmp/int8_*.json, one JSON line each.
set -x
cd /root/repo

echo "=== 1. capability probe (s8 matmul/conv/pallas rates)"
timeout 1500 python tools/probe_int8.py > /tmp/int8_probe.json

echo "=== 2. ViT int8 block engine (DeiT-S dense + snapped select + agreement)"
timeout 1800 python bench.py --int8 > /tmp/int8_vit.json

echo "=== 3. T2T int8 (attention-fused graph + QuantDense)"
timeout 1800 python bench.py --t2t --int8 > /tmp/int8_t2t.json

echo "=== 4. CNN int8 static export"
timeout 1800 python bench.py --r101-static --int8 > /tmp/int8_r101.json

echo "=== 4b. DeiT-B int8 (width-scaling point)"
timeout 1800 python bench.py --deit-b --int8 > /tmp/int8_deitb.json

echo "=== 4c. CNN int8 dense-masked (dynamic masks, W8A8 convs)"
timeout 1800 python bench.py --resnet-masked --int8 > /tmp/int8_masked.json

echo "=== 5. headline sanity (bf16, should match BENCH_r02-era numbers)"
timeout 1800 python bench.py > /tmp/int8_headline.json

echo "=== done"
cat /tmp/int8_probe.json /tmp/int8_vit.json /tmp/int8_t2t.json \
    /tmp/int8_r101.json /tmp/int8_deitb.json /tmp/int8_masked.json /tmp/int8_headline.json
