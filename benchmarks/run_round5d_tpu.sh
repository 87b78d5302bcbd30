#!/bin/bash
# Round-5 batch D: honest-timing matrix refresh (slope-of-min-chains) +
# model-shape tuning + train/speculate/serve/decode records.
set -x
cd /root/repo
R=benchmarks/results

for D in 128 64; do
  for C in 1 0; do
    NAME=v5e_d${D}_$( [ "$C" = 1 ] && echo causal || echo noncausal )
    PROV=flash,jax_flash; [ "$D" = 128 ] && PROV=flash,xla,jax_flash
    timeout 7200 python benchmarks/attention_bench.py --d "$D" --causal "$C" \
      --modes fwd,bwd,fwd_bwd --providers $PROV \
      > "$R/${NAME}.jsonl.tmp" 2> "$R/${NAME}.log" \
      && mv "$R/${NAME}.jsonl.tmp" "$R/${NAME}.jsonl"
  done
done

timeout 5400 python benchmarks/tune_model_shapes.py >> $R/tune_model_shapes.log 2>&1
timeout 3600 python benchmarks/train_bench.py --model 1b --batch 4 --remat dots \
  >> $R/train_1b_r5.log 2>&1
timeout 5400 python benchmarks/speculate_bench.py --model 1b \
  --out $R/v5e_speculate.jsonl >> $R/speculate_1b.log 2>&1
timeout 5400 python benchmarks/serve_bench.py --model 1b --paged --max-len 4096 \
  --prefix-len 2048 --calib-iters 100 >> $R/serve_1b_r5.log 2>&1
timeout 7200 python benchmarks/decode_chunk_ab.py \
  --out $R/v5e_decode_chunk_ab.jsonl >> $R/decode_chunk_ab.log 2>&1
timeout 1800 python bench.py >> $R/bench_headline_r5.log 2>&1
echo DONE_ROUND5D >> $R/round5d.log
