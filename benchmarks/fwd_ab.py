"""Subprocess-isolated A/B driver for integrated forward-kernel variants.

The kernel's trace-time env knobs (FLASHATTN_FWD_UNROLL, ...) are read when
flash_attention_forward first traces a shape; the pjit cache is keyed on
avals/statics only, so flipping the env between same-shape calls in one
process silently reuses the first trace (round-3 bisect bug — its pred_mask
row re-measured the default kernel twice). Every arm here therefore runs in
its OWN subprocess, like the reference autotuner's per-config trial launches
(``code/_flash_attention_kernel_optimized.py:18-32``).

Parent: python benchmarks/fwd_ab.py --out benchmarks/results/v5e_fwd_ab.jsonl
Child (internal): python benchmarks/fwd_ab.py --child --d 128 --s 16384 ...
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

    from flashattn_tpu.ops.common import BlockSizes
    from flashattn_tpu.ops.flash_fwd import flash_attention_forward
    from flashattn_tpu.utils.timing import attention_flops, measure, tflops

    b, h, s, d = args.b, args.h, args.s, args.d
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.bfloat16)
    bs = BlockSizes(block_q=args.bq, block_kv=args.bkv)
    sec = measure(
        lambda q, k, v: flash_attention_forward(
            q, k, v, is_causal=args.causal, block_sizes=bs),
        q, k, v, warmup=5, n1=3, n2=10)
    fl = attention_flops(b, h, s, s, d, mode="fwd", is_causal=args.causal)
    print(json.dumps({
        "ms": round(sec * 1e3, 4), "tflops": round(tflops(fl, sec), 2)}))


# (label, env, bq, bkv) arms; None env entries unset the var.
def arms(d: int, spec: str = ""):
    if spec:
        # "u2_1024x4096,u4_1024x2048": uN -> FLASHATTN_FWD_UNROLL=N.
        out = []
        for item in spec.split(","):
            head, geo = item.rsplit("_", 1)
            bq, bkv = (int(x) for x in geo.split("x"))
            out.append((item, {"FLASHATTN_FWD_UNROLL": head[1:]}, bq, bkv))
        return out
    out = []
    for bq, bkv in ((1024, 1024), (512, 2048), (1024, 2048), (2048, 1024),
                    (512, 1024)):
        for unroll in (1, 2, 4):
            if (bkv // unroll) % 128:
                continue
            out.append((f"u{unroll}_{bq}x{bkv}",
                        {"FLASHATTN_FWD_UNROLL": str(unroll)}, bq, bkv))
    return out


def parent(args) -> None:
    for label, env, bq, bkv in arms(args.d, args.arms):
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               "--d", str(args.d), "--s", str(args.s), "--b", str(args.b),
               "--h", str(args.h), "--bq", str(bq), "--bkv", str(bkv)]
        if args.causal:
            cmd.append("--causal")
        e = dict(os.environ)
        e.update(env)
        try:
            # Remote-compile spikes past 5 min under contention; ride them
            # out. An arm that can't even COMPILE inside 30 min records a
            # timeout row (that verdict matters: the round-4 pred_mask arm
            # died exactly here) and must not kill the sweep.
            r = subprocess.run(cmd, env=e, capture_output=True, text=True,
                               timeout=1800)
            line = (r.stdout.strip().splitlines()[-1]
                    if r.stdout.strip() else "")
            try:
                rec = json.loads(line)
            except Exception:
                rec = {"error": (r.stderr or "no output").strip()[-300:]}
        except subprocess.TimeoutExpired:
            rec = {"error": "timeout: no compile+measure within 1800s"}
        rec.update(kind="fwd_ab", label=label, env=env, d=args.d, s=args.s,
                   b=args.b, h=args.h, bq=bq, bkv=bkv, causal=args.causal)
        print(json.dumps(rec), flush=True)
        if args.out:
            # Append per-row: a crashed/killed sweep keeps its finished arms.
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--s", type=int, default=16384)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--bq", type=int, default=1024)
    ap.add_argument("--bkv", type=int, default=1024)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--arms", type=str, default="",
                    help="comma list like u2_1024x4096,pm_1024x1024")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()
    (child if args.child else parent)(args)


if __name__ == "__main__":
    main()
