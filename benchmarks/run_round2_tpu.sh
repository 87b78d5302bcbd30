#!/bin/bash
# Round-2 TPU-gated checklist, in dependency order — run when the tunnel is
# live. Everything lands in benchmarks/results/ + the repo-shipped autotune
# winners; follow-ups after the run:
#   * if the fp8 PAIR A/B wins, flip the default in ops/common.py
#     fp8_decode_convert and delete the env switch;
#   * refresh docs/PERFORMANCE.md headline table + gap analysis;
#   * git add benchmarks/results flashattn_tpu/ops/tuned_autotune.json
set -x
cd "$(dirname "$0")/.."
R=benchmarks/results
mkdir -p "$R"

# 1. Full reference matrix (D x causal x {fwd,bwd,fwd_bwd}) with autotune,
#    decode block_kv tuning, headline bench.py, plots, shipped winners.
bash benchmarks/run_matrix.sh

# 2. fp8 decode converter A/B (VERDICT r1 Weak #4): pair-unpack vs per-byte.
FLASHATTN_FP8_PAIR=1 python benchmarks/decode_bench.py \
  > "$R/v5e_decode_kernel_fp8pair.jsonl.tmp" 2> "$R/decode_fp8pair.log" \
  && mv "$R/v5e_decode_kernel_fp8pair.jsonl.tmp" \
        "$R/v5e_decode_kernel_fp8pair.jsonl"

# 3. Device-time serving row (VERDICT r1 Weak #10).
python benchmarks/serve_bench.py --model 1b --paged \
  > "$R/v5e_serve_1b.jsonl.tmp" 2> "$R/serve_1b.log" \
  && mv "$R/v5e_serve_1b.jsonl.tmp" "$R/v5e_serve_1b.jsonl"

# 4. Training-step MFU record (fused backward + init-fusion in effect).
python benchmarks/train_bench.py --model 1b \
  > "$R/v5e_train_1b.jsonl.tmp" 2> "$R/train_1b.log" \
  && mv "$R/v5e_train_1b.jsonl.tmp" "$R/v5e_train_1b.jsonl"

python bench.py | tail -1
