#!/bin/bash
cd /root/repo
R=benchmarks/results
for i in $(seq 1 240); do
  grep -q DONE_ROUND5E $R/round5e.log 2>/dev/null && break
  sleep 30
done
bash benchmarks/run_round5d_tpu.sh
