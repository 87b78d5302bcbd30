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

# 0. Short-S causal keys re-tuned with bkv=S candidates: the single-step
#    kernel path makes whole-row fetches the likely winners, and the
#    shipped short winners predate it (d64 causal S=2048 loses to
#    jax_flash 30.7 vs 39.6 on the old (1024,1024) winner).
timeout 2700 python benchmarks/retune_unroll.py --only-causal --max-s 2048 \
  >> "$R/v5e_retune_unroll.jsonl" 2>> "$R/retune_unroll.log"

timeout 3600 python benchmarks/attention_bench.py --d 128 --causal 0 \
  --modes fwd,bwd,fwd_bwd --providers flash,xla,jax_flash \
  > "$R/v5e_d128_noncausal.jsonl.tmp" 2> "$R/v5e_d128_noncausal.log" \
  && mv "$R/v5e_d128_noncausal.jsonl.tmp" "$R/v5e_d128_noncausal.jsonl" \
  && python benchmarks/summarize.py

for D in 128 64; do
  timeout 1500 python benchmarks/attention_bench.py --d "$D" --causal 1 \
    --seqs 512,1024,2048 --modes fwd,fwd_bwd,bwd --providers flash \
    > "$R/d${D}c_short_refresh.jsonl.tmp" 2> "$R/d${D}c_short_refresh.log" \
    && python benchmarks/merge_rows.py "$R/v5e_d${D}_causal.jsonl" \
         "$R/d${D}c_short_refresh.jsonl.tmp" flash \
    && rm "$R/d${D}c_short_refresh.jsonl.tmp" \
    && python benchmarks/summarize.py
done

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
