#!/bin/bash
cd /root/repo
R=benchmarks/results
for i in $(seq 1 400); do
  grep -q DONE_ROUND5I $R/round5i.log 2>/dev/null && break
  sleep 30
done
timeout 3600 python benchmarks/train_bench.py --model 1b --batch 4 --remat dots \
  >> $R/train_1b_r5.log 2>&1
echo DONE_ROUND5J >> $R/round5j.log
