#!/bin/bash
# Full reference-parity benchmark matrix (VERDICT r1 Missing #1/#2, Weak #5)
# — run on the real TPU chip. One long-lived python per sweep keeps the
# compile cache warm; the autotune cache persists winners across processes.
#
# Matrix (reference Performance_Comparison.py:146-166, Phase_5.md:701-729):
#   D in {64, 128} x causal in {0, 1} x mode in {fwd, bwd, fwd_bwd}
# plus decode block_kv tuning and the headline bench.py line.
set -x
cd "$(dirname "$0")/.."
R=benchmarks/results
mkdir -p "$R"

# Winners measured under older kernel revisions are stale — resweep.
rm -f ~/.cache/flashattn_tpu/autotune.json

for D in 128 64; do
  for C in 1 0; do
    NAME=v5e_d${D}_$( [ "$C" = 1 ] && echo causal || echo noncausal )
    python benchmarks/attention_bench.py --d "$D" --causal "$C" \
      --modes fwd,bwd,fwd_bwd --autotune --providers flash,xla,jax_flash \
      > "$R/${NAME}.jsonl.tmp" 2> "$R/${NAME}.log" \
      && mv "$R/${NAME}.jsonl.tmp" "$R/${NAME}.jsonl"
  done
done

python benchmarks/decode_bench.py --tune-block-kv \
  > "$R/v5e_decode_kernel.jsonl.tmp" 2> "$R/decode_tune.log" \
  && mv "$R/v5e_decode_kernel.jsonl.tmp" "$R/v5e_decode_kernel.jsonl"

# Ship the measured winners with the package: default (block_sizes=None)
# calls resolve through this table on any machine (ops/autotune.py).
cp ~/.cache/flashattn_tpu/autotune.json flashattn_tpu/ops/tuned_autotune.json

python bench.py | tail -1
python benchmarks/plot.py benchmarks/results/v5e_d*.jsonl
python benchmarks/summarize.py
