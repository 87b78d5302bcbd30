#!/bin/bash
# Round-5 batch A: sik A/B on tuned geometry + shallow-S wavefront tile sweep.
cd /root/repo
R=benchmarks/results
timeout 3600 python benchmarks/qmajor_sweep.py --d 128 --causal --sik-ab \
  --s 4096,8192,16384 --out $R/v5e_sik_ab_tuned.jsonl >> $R/sik_ab_tuned.log 2>&1
timeout 5400 python benchmarks/qmajor_sweep.py --d 128 --causal --wf-tiles \
  --tiles 256x256,256x512,512x512,256x1024,512x1024,1024x1024,512x2048 \
  --unrolls 1,2 \
  --s 512,1024,2048,4096 --out $R/v5e_wf_shorttiles.jsonl >> $R/wf_shorttiles.log 2>&1
echo DONE_ROUND5A >> $R/wf_shorttiles.log
