#!/bin/bash
# Round-4 chip queue, part C (finale) — replaces part B's full non-causal
# re-runs, which do not fit the remaining round wall clock. Priorities:
#   1. d128 non-causal FULL re-run (all providers): records the unroll=2
#      winner (retune measured 164.66 TF fwd @16k vs 156.73) and replaces
#      the round-3 short-S artifact rows for every provider.
#   2. d128 causal short-S splice: S=512/1024 flash rows re-measured on
#      the single-step kernel (the committed file's short rows predate it),
#      keyed-spliced by merge_rows.
#   3. d64 non-causal: short-S + plateau flash rows spliced the same way
#      (competitor rows at 2048-16384 from round 3 remain valid; its
#      short-S competitor rows are re-measured alongside).
#   4. plots + summarize. bench.py is the driver's job at round end.
set -x
cd "$(dirname "$0")/.."
R=benchmarks/results

timeout 3600 python benchmarks/attention_bench.py --d 128 --causal 0 \
  --modes fwd,bwd,fwd_bwd --providers flash,xla,jax_flash \
  > "$R/v5e_d128_noncausal.jsonl.tmp" 2> "$R/v5e_d128_noncausal.log" \
  && mv "$R/v5e_d128_noncausal.jsonl.tmp" "$R/v5e_d128_noncausal.jsonl" \
  && python benchmarks/summarize.py

timeout 1200 python benchmarks/attention_bench.py --d 128 --causal 1 \
  --seqs 512,1024 --modes fwd,fwd_bwd,bwd --providers flash \
  > "$R/d128c_short_refresh.jsonl.tmp" 2> "$R/d128c_short_refresh.log" \
  && python benchmarks/merge_rows.py "$R/v5e_d128_causal.jsonl" \
       "$R/d128c_short_refresh.jsonl.tmp" flash \
  && rm "$R/d128c_short_refresh.jsonl.tmp" \
  && python benchmarks/summarize.py

timeout 2400 python benchmarks/attention_bench.py --d 64 --causal 0 \
  --seqs 512,1024,2048,8192,16384 --modes fwd,fwd_bwd,bwd \
  --providers flash \
  > "$R/d64nc_refresh.jsonl.tmp" 2> "$R/d64nc_refresh.log" \
  && python benchmarks/merge_rows.py "$R/v5e_d64_noncausal.jsonl" \
       "$R/d64nc_refresh.jsonl.tmp" flash \
  && rm "$R/d64nc_refresh.jsonl.tmp" \
  && python benchmarks/summarize.py

python benchmarks/plot.py benchmarks/results/v5e_d*.jsonl || true
python benchmarks/summarize.py
echo ROUND4C_DONE
