"""Fused-vs-split backward crossover sweep (VERDICT r2 item #6).

Times `flash_attention_backward` DIRECTLY (no fwd_bwd-minus-fwd subtraction
— the backward is dispatched standalone, so noise can't flip a sign) with
``impl`` forced to "fused" and "split" across long contexts, and records
which implementation wins at each (S, D). The dispatch constants in
flash_bwd.py's impl="auto" path (the 100 MB VMEM bound consulted via
``fused_backward_vmem_bytes``) are justified by this record.

Reference anchor: the reference tunes its backward kernels separately from
the forward because of their different pressure profiles
(``Phase_5.md:160-162``); the fused/split dispatch is the TPU analogue —
VMEM residency instead of register pressure.

Emits one JSON row per (S, D, impl) plus a winner row per (S, D):
    python benchmarks/bwd_crossover_bench.py > results/v5e_bwd_crossover.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from flashattn_tpu.ops.flash_bwd import flash_attention_backward  # noqa: E402
from flashattn_tpu.ops.flash_bwd_fused import fused_backward_vmem_bytes  # noqa: E402
from flashattn_tpu.ops.flash_fwd import flash_attention_forward  # noqa: E402
from flashattn_tpu.utils.roofline import attention_bwd_roofline, detect_chip  # noqa: E402
from flashattn_tpu.utils.timing import attention_flops, measure, tflops  # noqa: E402


def bench_one(b, h, s, d, impl, is_causal=True):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.bfloat16)
    do = jax.random.normal(keys[3], (b, h, s, d), jnp.bfloat16)
    o, lse = jax.jit(
        lambda q, k, v: flash_attention_forward(q, k, v, is_causal=is_causal)
    )(q, k, v)

    bwd = jax.jit(
        lambda q, k, v, o, do, lse: flash_attention_backward(
            q, k, v, o, do, lse, is_causal=is_causal, impl=impl
        )
    )
    sec = measure(bwd, q, k, v, o, do, lse, warmup=3, n1=3, n2=10)
    fl = attention_flops(b, h, s, s, d, mode="bwd", is_causal=is_causal)
    return sec * 1e3, tflops(fl, sec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="16384,32768,49152,65536")
    ap.add_argument("--ds", default="128,64")
    ap.add_argument("--h", type=int, default=8)
    args = ap.parse_args()

    chip = detect_chip()
    print(f"# chip: {chip.name}", file=sys.stderr)
    seqs = [int(x) for x in args.seqs.split(",")]
    for d in (int(x) for x in args.ds.split(",")):
        for s in seqs:
            # Constant total work (B·S² ≈ 4·16384²) bounds HBM footprint and
            # wall time as S grows; the fused/split question is per-core VMEM
            # residency, which B doesn't touch.
            b = max(1, (4 * 16384 * 16384) // (s * s))
            rows = {}
            for impl in ("fused", "split"):
                try:
                    ms, tf = bench_one(b, args.h, s, d, impl)
                    err = None
                except Exception as e:  # VMEM OOM on forced fused
                    ms, tf, err = None, None, f"{type(e).__name__}: {e}"[:200]
                roof = attention_bwd_roofline(
                    b, args.h, args.h, s, s, d, True, 512, 512, chip=chip)
                rec = {
                    "kind": "bwd_crossover", "impl": impl, "S": s, "D": d,
                    "B": b, "H": args.h, "causal": True,
                    "ms": None if ms is None else round(ms, 3),
                    "tflops": None if tf is None else round(tf, 2),
                    "sol_frac": (round(roof.sol_seconds / (ms / 1e3), 3)
                                 if ms else None),
                    "fused_vmem_mb": round(
                        fused_backward_vmem_bytes(s, s, d, 1024, 1024)
                        / 2**20, 1),
                }
                if err:
                    rec["note"] = err
                rows[impl] = rec
                print(json.dumps(rec), flush=True)
            f, sp = rows["fused"]["tflops"], rows["split"]["tflops"]
            winner = ("split" if f is None else
                      "fused" if sp is None else
                      ("fused" if f >= sp else "split"))
            print(json.dumps({
                "kind": "bwd_crossover_winner", "S": s, "D": d, "B": b,
                "winner": winner,
                "fused_tflops": f, "split_tflops": sp,
                "ratio": (round(f / sp, 3) if f and sp else None),
            }), flush=True)


if __name__ == "__main__":
    main()
