"""Surgical per-key unroll re-tune (round 4).

A full `run_matrix.sh` re-sweep with the unroll dimension added would cost
~9 h of trial compiles on this rig; the only NEW knob since the round-3
sweep is `BlockSizes.unroll_kv`, so this script A/Bs just that delta: for
every shipped forward winner it measures the winner as-is, the winner's
1024/2048-column band splits, and the global v5e challenger geometries
from `v5e_fwd_ab.jsonl` — in ONE process (unroll_kv is a jit-static
BlockSizes field, not an env knob, so no subprocess isolation is needed),
then rewrites the entry and ships the merged table.

Usage: python benchmarks/retune_unroll.py [--out flashattn_tpu/ops/tuned_autotune.json]
Rows (JSONL, kind=retune_unroll) go to stdout; redirect to keep a record.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from flashattn_tpu.ops.common import BlockSizes  # noqa: E402
from flashattn_tpu.ops.flash_fwd import flash_attention_forward  # noqa: E402
from flashattn_tpu.utils.timing import attention_flops, measure_auto, tflops  # noqa: E402

SHIPPED = pathlib.Path("flashattn_tpu/ops/tuned_autotune.json")
KEY_RE = re.compile(
    r"^(?P<kind>[^|]+)\|b(?P<b>\d+)h(?P<hq>\d+)/(?P<hkv>\d+)\|"
    r"sq(?P<sq>\d+)sk(?P<sk>\d+)d(?P<d>\d+)\|c(?P<c>[01])\|(?P<dt>.+)$")


def candidates(entry: dict, s: int, causal: bool, d: int,
               challengers: list[tuple[int, int, int]]):
    """(bq, bkv, unroll) candidates: winner, its band splits, challengers."""
    bq_w, bkv_w = entry["block_q"], entry["block_kv"]
    cands = [(bq_w, bkv_w, 1)]
    for band in (1024, 2048):
        if bkv_w > band and bkv_w % band == 0:
            cands.append((bq_w, bkv_w, bkv_w // band))
    if s <= 2048:
        # Short-S: bkv = S makes every q-row a single wavefront step, which
        # the round-4 single-step kernel path turns into a no-scratch
        # straight-line row (flash_fwd.py::_fwd_kernel single_step). The
        # pre-single-step sweeps never favored these; re-offer them.
        challengers = challengers + [(512, s, 1), (1024, s, 1),
                                     (1024, s, 2), (2048, s, 2)]
    for bq, bkv, u in challengers:
        if bkv <= s and bq <= s:
            cands.append((bq, bkv, u))
    seen, out = set(), []
    for c in cands:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(SHIPPED))
    ap.add_argument("--only-causal", action="store_true")
    ap.add_argument("--d", type=int, default=None,
                    help="restrict to one head dim")
    ap.add_argument("--max-s", type=int, default=None,
                    help="retune only keys with sq <= this (short-S pass)")
    args = ap.parse_args()

    table = json.loads(SHIPPED.read_text())
    updated = dict(table)
    for key, entry in table.items():
        m = KEY_RE.match(key)
        if not m or "block_q" not in entry:
            continue
        b, hq, hkv = int(m["b"]), int(m["hq"]), int(m["hkv"])
        s_q, s_k, d = int(m["sq"]), int(m["sk"]), int(m["d"])
        causal = m["c"] == "1"
        if args.only_causal and not causal:
            continue
        if args.d is not None and d != args.d:
            continue
        if args.max_s is not None and s_q > args.max_s:
            continue
        # Global challengers from the subprocess A/B sweeps
        # (benchmarks/results/v5e_fwd_ab*.jsonl): 1024-column bands on
        # 2048/4096-deep fetches are the only shapes that ever won.
        challengers = ([(1024, 2048, 2), (1024, 4096, 4), (2048, 2048, 2)]
                       if causal else [])
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(keys[0], (b, hq, s_q, d), jnp.bfloat16)
        k = jax.random.normal(keys[1], (b, hkv, s_k, d), jnp.bfloat16)
        v = jax.random.normal(keys[2], (b, hkv, s_k, d), jnp.bfloat16)
        fl = attention_flops(b, hq, s_q, s_k, d, mode="fwd", is_causal=causal)
        best, best_t = None, float("inf")
        for bq, bkv, u in candidates(entry, min(s_q, s_k), causal, d,
                                     challengers):
            bs = BlockSizes(block_q=bq, block_kv=bkv, unroll_kv=u)
            try:
                t = measure_auto(
                    lambda q, k, v: flash_attention_forward(
                        q, k, v, is_causal=causal, block_sizes=bs),
                    q, k, v, warmup=3)
            except Exception as e:  # config OOM / compile failure
                print(json.dumps({"kind": "retune_unroll", "key": key,
                                  "bq": bq, "bkv": bkv, "unroll": u,
                                  "error": str(e)[-200:]}), flush=True)
                continue
            print(json.dumps({
                "kind": "retune_unroll", "key": key, "bq": bq, "bkv": bkv,
                "unroll": u, "ms": round(t * 1e3, 4),
                "tflops": round(tflops(fl, t), 2)}), flush=True)
            if t < best_t:
                best, best_t = (bq, bkv, u), t
        if best is not None:
            updated[key] = {**entry, "block_q": best[0], "block_kv": best[1],
                            "unroll_kv": best[2]}
    pathlib.Path(args.out).write_text(json.dumps(updated, indent=1))
    print(json.dumps({"kind": "retune_unroll_done", "out": args.out}),
          flush=True)


if __name__ == "__main__":
    main()
