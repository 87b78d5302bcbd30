#!/bin/bash
set -x
cd /root/repo
R=benchmarks/results
rm -f $R/d128c_deep_refresh.jsonl $R/d128nc_mid_refresh.jsonl $R/d64c_2048_refresh.jsonl
# 1) honest retune of the deep/mid keys (fixed all-leaf chain deps)
timeout 9000 python benchmarks/retune_deep.py >> $R/retune_deep3.log 2>&1
# 2) flagship file: full re-run, all providers, fixed timing
timeout 7200 python benchmarks/attention_bench.py --d 128 --causal 1 \
  --modes fwd,bwd,fwd_bwd --providers flash,xla,jax_flash \
  > $R/v5e_d128_causal.jsonl.tmp 2>> $R/retune_deep3.log \
  && mv $R/v5e_d128_causal.jsonl.tmp $R/v5e_d128_causal.jsonl
# 3) train + headline with the final table
timeout 3600 python benchmarks/train_bench.py --model 1b --batch 4 --remat dots \
  >> $R/train_1b_r5.log 2>&1
timeout 1800 python bench.py >> $R/bench_headline_r5c.log 2>&1
echo DONE_CORE >> $R/round5i.log
# 4) competitor + flash re-measures for the other three files (chain-DCE
#    polluted: jax_flash's two-kernel backward, xla's fused grad, our
#    split-impl 512 cells)
for SPEC in "128 0 v5e_d128_noncausal" "64 1 v5e_d64_causal" "64 0 v5e_d64_noncausal"; do
  set -- $SPEC
  D=$1; C=$2; NAME=$3
  timeout 5400 python benchmarks/attention_bench.py --d $D --causal $C \
    --modes fwd,bwd,fwd_bwd --providers flash,jax_flash \
    > $R/${NAME}_refresh.jsonl 2>> $R/retune_deep3.log
  python benchmarks/merge_rows.py $R/$NAME.jsonl $R/${NAME}_refresh.jsonl flash 2>> $R/retune_deep3.log || true
  python benchmarks/merge_rows.py $R/$NAME.jsonl $R/${NAME}_refresh.jsonl jax_flash 2>> $R/retune_deep3.log || true
done
echo DONE_ROUND5I >> $R/round5i.log
