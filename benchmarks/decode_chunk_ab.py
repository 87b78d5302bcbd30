"""Short-context quantized decode A/B: the last 0.77 -> 0.80 SoL ideas.

VERDICT r4 item 4: at S=2048 the int8/fp8 stream is ~42 us speed-of-light
and the measured 54.8/55.1 us carry ~13 us of per-call fixed cost that
8-way h_fuse cannot hide. Candidates, in priority order:

1. Two-block double-buffered fetches WITH h_fuse: the shipped winner is
   block_kv=2048 (single fetch) because pick_h_fuse gates fusion OFF for
   multi-block streams (the round-4 A/B showed multi-block fusing loses at
   8k/32k) — but with ONE block there is no fetch/compute overlap at all:
   time = DMA + dequant+dots serially. Two 1024 blocks + forced h_fuse
   (FLASHATTN_DECODE_HFUSE, subprocess arms — trace-time env) pipelines
   the second block's fetch under the first's compute. Never measured in
   round 4 (the gate made the combination unreachable).
2. Multi-token chunked steps (decode_attention_chunk, T in {2,4}): same
   cache stream scores T tokens — the per-stream fixed cost amortizes by
   T. Applies to speculative verification / multi-token drafting, not
   plain one-token serving; reported as per-stream + per-token rows.

  python benchmarks/decode_chunk_ab.py --out benchmarks/results/v5e_decode_chunk_ab.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(args) -> None:
    import jax
    import jax.numpy as jnp

    from flashattn_tpu.ops.decode import (
        decode_attention,
        decode_attention_chunk,
    )
    from flashattn_tpu.ops.kvcache import init_cache, update_cache
    from flashattn_tpu.utils.roofline import detect_chip
    from flashattn_tpu.utils.timing import measure_looped_slope

    b, hq, hkv, s, d = args.b, args.hq, args.hkv, args.s, args.d
    quant = args.quant if args.quant != "bf16" else None
    cache = init_cache(b, hkv, s, d, quant=quant)
    kv = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, s, d),
                           jnp.bfloat16)
    cache = update_cache(cache, kv, kv)
    bkv = args.bkv or None
    if args.t == 1:
        q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, d),
                              jnp.bfloat16)
        sec = measure_looped_slope(
            lambda q, c: decode_attention(q, c, block_kv=bkv), q, cache)
    else:
        q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, args.t, d),
                              jnp.bfloat16)
        sec = measure_looped_slope(
            lambda q, c: decode_attention_chunk(q, c, block_kv=bkv),
            q, cache)
    elem = 1 if quant else 2
    bytes_ = 2 * b * hkv * s * d * elem + (2 * b * hkv * s * 4 if quant else 0)
    gbs = bytes_ / sec / 1e9
    print(json.dumps({
        "us": round(sec * 1e6, 1),
        "us_per_token": round(sec * 1e6 / args.t, 1),
        "hbm_gbps": round(gbs, 1),
        "hbm_frac": round(gbs / detect_chip().hbm_gbps, 3),
    }))


ARMS = [
    # label, env(h_fuse or None=auto), block_kv(0=default), T
    ("shipped_t1", None, 0, 1),
    ("hf8_bkv1024", "8", 1024, 1),
    ("hf4_bkv1024", "4", 1024, 1),
    ("hf8_bkv512", "8", 512, 1),
    ("chunk_t2", None, 0, 2),
    ("chunk_t4", None, 0, 4),
]


def parent(args) -> None:
    for label, hf, bkv, t in ARMS:
        for quant in args.quants.split(","):
            cmd = [sys.executable, os.path.abspath(__file__), "--child",
                   "--quant", quant, "--bkv", str(bkv), "--t", str(t),
                   "--s", str(args.s), "--b", str(args.b),
                   "--hq", str(args.hq), "--hkv", str(args.hkv),
                   "--d", str(args.d), "--iters", str(args.iters)]
            e = dict(os.environ)
            e.pop("FLASHATTN_DECODE_HFUSE", None)
            if hf is not None:
                e["FLASHATTN_DECODE_HFUSE"] = hf
            try:
                r = subprocess.run(cmd, env=e, capture_output=True,
                                   text=True, timeout=1800)
                line = (r.stdout.strip().splitlines()[-1]
                        if r.stdout.strip() else "")
                try:
                    rec = json.loads(line)
                except Exception:
                    rec = {"error": (r.stderr or "no output").strip()[-300:]}
            except subprocess.TimeoutExpired:
                rec = {"error": "timeout: no compile+measure within 1800s"}
            rec.update(kind="decode_chunk_ab", label=label, quant=quant,
                       h_fuse=hf, block_kv=bkv or "auto", t=t, s=args.s,
                       b=args.b, hq=args.hq, hkv=args.hkv, d=args.d)
            print(json.dumps(rec), flush=True)
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--quants", default="int8,fp8")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--hq", type=int, default=32)
    ap.add_argument("--hkv", type=int, default=8)
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--t", type=int, default=1)
    ap.add_argument("--bkv", type=int, default=0)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()
    (child if args.child else parent)(args)


if __name__ == "__main__":
    main()
