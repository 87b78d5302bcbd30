#!/bin/bash
set -x
cd /root/repo
R=benchmarks/results
# 1) stats_lanes A/B on the deep wavefront cells
timeout 3600 python benchmarks/qmajor_sweep.py --d 128 --causal --lanes-ab \
  --s 4096,8192,16384 --out $R/v5e_lanes_ab.jsonl >> $R/lanes_ab.log 2>&1
timeout 3600 python benchmarks/qmajor_sweep.py --d 128 --lanes-ab \
  --s 8192,16384 --out $R/v5e_lanes_ab.jsonl >> $R/lanes_ab.log 2>&1
# 2) d64 causal: grid4 single-fetch check before the matrix ships the auto rule
timeout 3600 python benchmarks/qmajor_sweep.py --d 64 --causal --impl grid4 \
  --tiles 1024x1024,2048x2048 --unrolls 1,2 --s 1024,2048 \
  --out $R/v5e_grid4_d64.jsonl >> $R/grid4_d64.log 2>&1
echo DONE_ROUND5E >> $R/round5e.log
