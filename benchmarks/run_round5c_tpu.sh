#!/bin/bash
# Round-5 batch C: quantized short-context decode A/B (after batch B).
cd /root/repo
R=benchmarks/results
for i in $(seq 1 400); do
  grep -q DONE_ROUND5B $R/round5b.log 2>/dev/null && break
  sleep 30
done
timeout 7200 python benchmarks/decode_chunk_ab.py \
  --out $R/v5e_decode_chunk_ab.jsonl >> $R/decode_chunk_ab.log 2>&1
echo DONE_ROUND5C >> $R/round5c.log
