#!/bin/bash
# End-of-round benchmark artifact capture — run serially on the real chip.
# Produces: fresh BENCH_sweep.jsonl (zero ttft_error rows expected),
# BENCH_serving.jsonl occupancy rows, 13B rows.  ~30-60 min warm.
set -x
cd "$(dirname "$0")/.."

mv BENCH_sweep.jsonl "BENCH_sweep_r2_archive.jsonl" 2>/dev/null || true

# 7B batch sweep (same shapes as round 2: b1/b8 @ S2048 fill512,
# b16 @ S1024, b32 @ fill128/S512, b64 paged @ fill128/S512)
timeout 2400 python bench.py --sweep 1,8 | tail -2
timeout 1800 python bench.py --sweep 16 --seq-len 1024 | tail -1
timeout 1800 python bench.py --sweep 32 --seq-fill 128 --seq-len 512 | tail -1
timeout 1800 python bench.py --sweep 64 --kv-layout paged --seq-fill 128 \
    --seq-len 512 | tail -1

# serving occupancy (7B, 32 slots — VERDICT r2 #7 gate: >=70% of raw b32)
timeout 2400 python tools/serving_bench.py --config 7b --quant w8a8 \
    --kv int8 --slots 32 --requests 96 --steps 128 --chunk 64 \
    --seq-len 512 --occupancy-sweep | tail -3

# 13B depth (VERDICT r2 #8): sweep + serving rows
timeout 2400 python bench.py --config 13b --sweep 2,4 --seq-len 1024 | tail -2
# dense + small: 13B int8 weights are ~13.7 GB; the slots-8 S1024 paged
# pool OOM'd the 16 GB chip (r3)
timeout 2400 python tools/serving_bench.py --config 13b --quant w8a8 \
    --kv int8 --slots 4 --requests 12 --steps 96 \
    --chunk 32 --seq-len 512 --occupancy-sweep | tail -3
