#!/bin/bash
# Round-4 TPU-gated checklist (VERDICT r3 "Next round" items). Steps are
# ordered so each decision gate has its data before the integration that
# depends on it:
#   1. fwd_ab sweeps (VERDICT #1) -> pick causal-fwd winner, make it the
#      default, DELETE losing env paths, then re-run the matrix.
#   2. decode h_fuse A/B (VERDICT #7): HFUSE=1 (old behavior) vs auto.
#   3. serve device-time record (VERDICT #4, third ask).
#   4. train MFU with the fwd winner integrated (VERDICT #8).
#   5. matrix re-runs incl. short-S rows under measure_auto (VERDICT #6)
#      and the jax_flash competitor cells (VERDICT #9).
# EVERY step that writes a results JSONL must end with summarize.py (the
# committed RESULTS.md is regeneration-checked by tests/test_results_fresh).
set -x
cd "$(dirname "$0")/.."
R=benchmarks/results
mkdir -p "$R"

# 1. Causal-forward A/B ladder (subprocess-isolated; env knobs are
#    trace-time). Winners feed tuned_autotune.json + kernel defaults.
python benchmarks/fwd_ab.py --d 128 --s 16384 --causal --out "$R/v5e_fwd_ab.jsonl"
python benchmarks/fwd_ab.py --d 128 --s 16384 --causal --out "$R/v5e_fwd_ab.jsonl" \
  --arms u2_1024x4096,u4_1024x4096,u8_1024x4096,u4_2048x4096,u2_2048x4096,u4_512x4096,u8_2048x8192
python benchmarks/fwd_ab.py --d 64 --s 16384 --causal --out "$R/v5e_fwd_ab_d64.jsonl" \
  --arms u1_1024x1024,u2_1024x2048,u4_1024x4096,u2_512x2048,u4_1024x2048,u2_1024x1024,u1_1024x2048

# 2. Decode short-stream h_fuse A/B (trace-time env -> separate processes).
FLASHATTN_DECODE_HFUSE=1 python benchmarks/decode_bench.py \
  > "$R/v5e_decode_hfuse1.jsonl.tmp" 2> "$R/decode_hfuse1.log" \
  && mv "$R/v5e_decode_hfuse1.jsonl.tmp" "$R/v5e_decode_hfuse1.jsonl"
python benchmarks/decode_bench.py \
  > "$R/v5e_decode_hfuse_auto.jsonl.tmp" 2> "$R/decode_hfuse_auto.log" \
  && mv "$R/v5e_decode_hfuse_auto.jsonl.tmp" "$R/v5e_decode_hfuse_auto.jsonl"

# 3. Device-time serving row (VERDICT r2 #7 / r3 #4).
python benchmarks/serve_bench.py --model 1b --paged \
  > "$R/v5e_serve_1b.jsonl.tmp" 2> "$R/serve_1b.log" \
  && mv "$R/v5e_serve_1b.jsonl.tmp" "$R/v5e_serve_1b.jsonl"

# 4. Training-step MFU with the integrated fwd winner.
python benchmarks/train_bench.py --model 1b \
  > "$R/v5e_train_1b_r4.jsonl.tmp" 2> "$R/train_1b_r4.log" \
  && mv "$R/v5e_train_1b_r4.jsonl.tmp" "$R/v5e_train_1b_r4.jsonl"

# 5. Matrix re-runs (after winner integration): causal cells + short-S
#    rows re-measured under measure_auto; competitor rows included.
bash benchmarks/run_matrix.sh

# 6. Regenerate the human-facing layer from the records.
python benchmarks/summarize.py
python benchmarks/plot.py || true
