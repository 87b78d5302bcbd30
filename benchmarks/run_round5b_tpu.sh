#!/bin/bash
# Round-5 batch B: model-shape autotune -> train MFU re-run -> speculate
# record -> serve device-prefix rows. Waits for batch A's marker.
cd /root/repo
R=benchmarks/results
for i in $(seq 1 200); do
  grep -q DONE_ROUND5A $R/wf_shorttiles.log 2>/dev/null && break
  sleep 30
done
timeout 5400 python benchmarks/tune_model_shapes.py >> $R/tune_model_shapes.log 2>&1
timeout 3600 python benchmarks/train_bench.py --model 1b --batch 4 --remat dots \
  >> $R/train_1b_r5.log 2>&1
timeout 5400 python benchmarks/speculate_bench.py --model 1b \
  --out $R/v5e_speculate.jsonl >> $R/speculate_1b.log 2>&1
timeout 5400 python benchmarks/serve_bench.py --model 1b --paged --max-len 4096 \
  --prefix-len 2048 --calib-iters 100 >> $R/serve_1b_r5.log 2>&1
echo DONE_ROUND5B >> $R/round5b.log
