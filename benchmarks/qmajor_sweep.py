"""Grid-shape / config sweep for the forward kernels (wavefront vs
grid4; the deleted q-major variant's arms remain on record in
v5e_qmajor_sweep.jsonl).

Targets the one competitive region the round-4 matrix still lost — causal
pure-fwd at S in [512, 4096], where jax_flash's q-major grid led ours
(``v5e_d128_causal.jsonl``; VERDICT r4 item 1) — plus the >=140 TF @16k
plateau bar.

Unlike the env-knob A/Bs (fwd_ab.py), the grid shape is a jit-STATIC
``BlockSizes.fwd_impl`` field, so every arm retraces correctly in ONE
process (warm compile cache); timing is measure_auto, so short-S rows are
device-time, not dispatch-rate (the round-3 pathology).

Usage (on the chip):
  python benchmarks/qmajor_sweep.py --d 128 --causal \
      --s 512,1024,2048,4096,8192,16384 \
      --out benchmarks/results/v5e_qmajor_sweep.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(args) -> None:
    import jax
    import jax.numpy as jnp

    from flashattn_tpu.ops.attention import flash_attention
    from flashattn_tpu.ops.common import BlockSizes
    from flashattn_tpu.utils.roofline import detect_chip, mxu_depth_frac
    from flashattn_tpu.utils.timing import (
        attention_flops,
        measure_auto,
        tflops,
    )

    tiles = [tuple(int(x) for x in t.split("x"))
             for t in args.tiles.split(",")]
    unrolls = [int(u) for u in args.unrolls.split(",")]

    for s in (int(x) for x in args.s.split(",")):
        b, h, d = args.b, args.h, args.d
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(keys[0], (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(keys[1], (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(keys[2], (b, h, s, d), jnp.bfloat16)
        fl = attention_flops(b, h, s, s, d, mode="fwd", is_causal=args.causal)

        arms = [("wf_shipped", None)]
        if args.sik_ab:
            # scale_in_kernel A/B on the shipped wavefront geometry: the
            # host prescale's extra HBM pass over Q vs the in-kernel
            # per-step tile multiply (BlockSizes.scale_in_kernel).
            from dataclasses import replace

            from flashattn_tpu.ops.autotune import lookup_block_sizes

            base = lookup_block_sizes(b, h, h, s, s, d, args.causal,
                                      q.dtype)
            arms = [
                ("wf_sik0", replace(base, scale_in_kernel=False)),
                ("wf_sik1", replace(base, scale_in_kernel=True)),
            ]
        if args.lanes_ab:
            # stats_lanes A/B on the shipped wavefront geometry.
            from dataclasses import replace

            from flashattn_tpu.ops.autotune import lookup_block_sizes

            base = lookup_block_sizes(b, h, h, s, s, d, args.causal,
                                      q.dtype)
            base = replace(base, fwd_impl="wavefront")
            arms = [
                ("wf_lanes0", replace(base, stats_lanes=False)),
                ("wf_lanes1", replace(base, stats_lanes=True)),
            ]
        impl = args.impl if not args.wf_tiles else "wavefront"
        tag = {"wavefront": "wf", "grid4": "g4"}[impl]
        for bq, bkv in (() if args.sik_ab or args.lanes_ab else tiles):
            if bq > s or bkv > s:
                continue
            for u in unrolls:
                if bkv % u or (bkv // u) % 128:
                    continue
                arms.append((
                    f"{tag}_u{u}_{bq}x{bkv}",
                    BlockSizes(block_q=bq, block_kv=bkv, unroll_kv=u,
                               fwd_impl=impl),
                ))
        for label, bs in arms:
            try:
                # floor_s=50ms forces the on-device scan loop for every
                # arm: the relay's slope timing showed multi-ms stall
                # pollution on 0.5-2 ms kernels in the first round-5 sweep
                # (3-12 ms readings, non-monotone across arms).
                # Public primal: pure-forward path (need_lse=False),
                # matching the matrix's flash rows and jax_flash's
                # save_residuals=False forward.
                sec = measure_auto(
                    lambda q, k, v: flash_attention(
                        q, k, v, is_causal=args.causal, block_sizes=bs),
                    q, k, v, warmup=3, repeat=10, floor_s=0.05)
                rec = {"ms": round(sec * 1e3, 4),
                       "tflops": round(tflops(fl, sec), 2)}
                try:
                    ceil = detect_chip().bf16_tflops * mxu_depth_frac(d)
                    rec["sol_frac"] = round(rec["tflops"] / ceil, 3)
                except Exception:
                    pass
            except Exception as e:  # noqa: BLE001 — record and continue
                rec = {"error": f"{type(e).__name__}: {e}"[:300]}
            rec.update(kind="qmajor_sweep", label=label, d=d, s=s, b=b, h=h,
                       causal=args.causal)
            print(json.dumps(rec), flush=True)
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--s", type=str, default="512,2048,16384")
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--impl", default="grid4",
                    choices=["wavefront", "grid4"],
                    help="grid shape for the tile arms")
    ap.add_argument("--wf-tiles", action="store_true",
                    help="sweep the tile list on the WAVEFRONT grid (the "
                         "shipped autotune candidates never went below "
                         "512x1024 — shallow causal S wants finer tiles: "
                         "less diagonal-tile masked waste)")
    ap.add_argument("--lanes-ab", action="store_true",
                    help="stats_lanes A/B on the shipped wavefront geometry")
    ap.add_argument("--sik-ab", action="store_true",
                    help="scale_in_kernel A/B on the shipped wavefront "
                         "geometry instead of the q-major tile arms")
    ap.add_argument("--tiles", type=str,
                    default="512x512,1024x1024,2048x2048,1024x2048")
    ap.add_argument("--unrolls", type=str, default="1,2")
    ap.add_argument("--out", type=str, default="")
    run(ap.parse_args())


if __name__ == "__main__":
    main()
