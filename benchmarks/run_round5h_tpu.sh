#!/bin/bash
set -x
cd /root/repo
R=benchmarks/results
rm -f $R/d128c_deep_refresh.jsonl $R/d128nc_mid_refresh.jsonl $R/d64c_2048_refresh.jsonl
timeout 10800 python benchmarks/retune_deep.py >> $R/retune_deep2.log 2>&1
timeout 3600 python benchmarks/attention_bench.py --d 128 --causal 1 \
  --seqs 8192,16384 --modes fwd,bwd,fwd_bwd --providers flash \
  > $R/d128c_deep_refresh.jsonl 2>> $R/retune_deep2.log
python benchmarks/merge_rows.py $R/v5e_d128_causal.jsonl $R/d128c_deep_refresh.jsonl 2>> $R/retune_deep2.log || true
timeout 3600 python benchmarks/attention_bench.py --d 128 --causal 0 \
  --seqs 2048,4096 --modes fwd,bwd,fwd_bwd --providers flash \
  > $R/d128nc_mid_refresh.jsonl 2>> $R/retune_deep2.log
python benchmarks/merge_rows.py $R/v5e_d128_noncausal.jsonl $R/d128nc_mid_refresh.jsonl 2>> $R/retune_deep2.log || true
timeout 3600 python benchmarks/attention_bench.py --d 64 --causal 1 \
  --seqs 2048 --modes fwd,bwd,fwd_bwd --providers flash \
  > $R/d64c_2048_refresh.jsonl 2>> $R/retune_deep2.log
python benchmarks/merge_rows.py $R/v5e_d64_causal.jsonl $R/d64c_2048_refresh.jsonl 2>> $R/retune_deep2.log || true
timeout 3600 python benchmarks/train_bench.py --model 1b --batch 4 --remat dots \
  >> $R/train_1b_r5.log 2>&1
timeout 1800 python bench.py >> $R/bench_headline_r5c.log 2>&1
echo DONE_ROUND5H >> $R/round5h.log
