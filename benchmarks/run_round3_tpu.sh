#!/bin/bash
# Round-3 TPU-gated checklist — run AFTER benchmarks/run_matrix.sh so the
# autotune winners are fresh. Each step lands a record the round-2 VERDICT
# asked for; follow-ups after the run:
#   * if the fp8 PAIR A/B wins, flip the default in ops/common.py
#     fp8_decode_convert and delete the env switch;
#   * set the fused/split dispatch constants from v5e_bwd_crossover.jsonl;
#   * refresh docs/PERFORMANCE.md + RESULTS.md + README + plots.
set -x
cd "$(dirname "$0")/.."
R=benchmarks/results
mkdir -p "$R"

# 1. Fused/split backward crossover (VERDICT r2 item #6).
python benchmarks/bwd_crossover_bench.py \
  > "$R/v5e_bwd_crossover.jsonl.tmp" 2> "$R/bwd_crossover.log" \
  && mv "$R/v5e_bwd_crossover.jsonl.tmp" "$R/v5e_bwd_crossover.jsonl"

# 2. (retired) fp8 pair-unpack A/B — concluded in round 3: Mosaic cannot
#    lower the pair path; the shipped converter is the 4-op sign-extension
#    chain in ops/common.py fp8_decode_convert (721 GB/s, 0.88 SoL @S=32k).
#    The FLASHATTN_FP8_PAIR switch no longer exists.

# 3. Device-time serving row (VERDICT r2 item #7).
python benchmarks/serve_bench.py --model 1b --paged \
  > "$R/v5e_serve_1b.jsonl.tmp" 2> "$R/serve_1b.log" \
  && mv "$R/v5e_serve_1b.jsonl.tmp" "$R/v5e_serve_1b.jsonl"

# 4. Training-step MFU sweep: remat x backward impl (VERDICT r2 item #5).
python benchmarks/train_bench.py --model 1b --sweep \
  > "$R/v5e_train_1b.jsonl.tmp" 2> "$R/train_1b.log" \
  && mv "$R/v5e_train_1b.jsonl.tmp" "$R/v5e_train_1b.jsonl"

# 5. Causal-fwd boundary bisection + pred-mask A/B (VERDICT r2 item #3).
python benchmarks/fwd_boundary_bisect.py --s 8192 \
  > "$R/v5e_fwd_boundary_bisect.jsonl.tmp" 2> "$R/fwd_bisect.log" \
  && mv "$R/v5e_fwd_boundary_bisect.jsonl.tmp" \
        "$R/v5e_fwd_boundary_bisect.jsonl"

python bench.py | tail -1
