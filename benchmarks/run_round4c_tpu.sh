#!/bin/bash
# Round-4 chip queue, part C (finale) — runs after part B is killed at the
# d64-non-causal step (which does not fit the remaining round wall clock;
# part B's d128 non-causal full re-run IS kept and runs before this).
#   0. short-S causal key re-tune under the single-step kernel
#   1. causal short-S splices for both head dims (merge_rows keyed splice)
#   2. d64 non-causal flash splice, last on purpose (cuttable tail)
#   3. plots + summarize. bench.py is the driver's job at round end.
set -x
cd "$(dirname "$0")/.."
R=benchmarks/results

# 0. Short-S causal keys re-tuned with bkv=S candidates: the single-step
#    kernel path makes whole-row fetches the likely winners, and the
#    shipped short winners predate it (d64 causal S=2048 loses to
#    jax_flash 30.7 vs 39.6 on the old (1024,1024) winner).
timeout 2700 python benchmarks/retune_unroll.py --only-causal --max-s 2048 \
  >> "$R/v5e_retune_unroll.jsonl" 2>> "$R/retune_unroll.log"

for D in 128 64; do
  timeout 1500 python benchmarks/attention_bench.py --d "$D" --causal 1 \
    --seqs 512,1024,2048 --modes fwd,fwd_bwd,bwd --providers flash \
    > "$R/d${D}c_short_refresh.jsonl.tmp" 2> "$R/d${D}c_short_refresh.log" \
    && python benchmarks/merge_rows.py "$R/v5e_d${D}_causal.jsonl" \
         "$R/d${D}c_short_refresh.jsonl.tmp" flash \
    && rm "$R/d${D}c_short_refresh.jsonl.tmp" \
    && python benchmarks/summarize.py
done

# Train at B=8: B=4 sits at 0.595 MFU (three rounds ~flat) because the
# model's attention keys are not in the tuned table and per-step overheads
# don't amortize at 8k tokens/step; doubling the batch is the designed
# lever (remat=dots headroom measured ~6 GB at B=4).
timeout 2400 python benchmarks/train_bench.py --model 1b --batch 8 \
  --remat dots --bwd-impl auto \
  >> "$R/v5e_train_1b_r4.jsonl" 2> "$R/train_1b_r4_b8.log" \
  && python benchmarks/summarize.py

# d64 non-causal re-runs are CUT for wall clock: the retuned u2 winners'
# flash rows are on record in v5e_retune_unroll.jsonl (8k 82.00 / 16k
# 85.54 TF vs the committed file's 79.6 / 83.5), noted in
# docs/PERFORMANCE.md.

# d64 non-causal splice if the wall allows (runs last on purpose).
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
