"""Continuous-batching serving demo: submit a handful of requests with
different prompt/generation lengths against a (optionally quantized) model.

  python examples/serve_demo.py
  python examples/serve_demo.py --quant int8 --weight-bits 8
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default=None, choices=[None, "int8", "fp8"])
    ap.add_argument("--weight-bits", type=int, default=None)
    ap.add_argument("--slots", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401

    from flashattn_tpu.models import llama
    from flashattn_tpu.models.config import TINY
    from flashattn_tpu.models.serve import InferenceServer, Request

    params = llama.init_params(TINY, jax.random.PRNGKey(0))
    if args.weight_bits:
        params = llama.quantize_params(params, bits=args.weight_bits)
    srv = InferenceServer(params, TINY, max_slots=args.slots, max_len=512,
                          quant=args.quant)
    reqs = [
        Request(uid=1, prompt=[3, 1, 4, 1, 5], max_new_tokens=12),
        Request(uid=2, prompt=[2, 7], max_new_tokens=20),
        Request(uid=3, prompt=list(range(40)), max_new_tokens=8),
        Request(uid=4, prompt=[99], max_new_tokens=16),
        Request(uid=5, prompt=[10, 20, 30], max_new_tokens=10),
    ]
    for r in reqs:
        srv.submit(r)
    t0 = time.perf_counter()
    out = srv.run()
    dt = time.perf_counter() - t0
    total = sum(len(v) for v in out.values())
    for uid in sorted(out):
        print(f"request {uid}: {out[uid]}")
    print(f"{total} tokens in {dt:.2f}s "
          f"({total / dt:.1f} tok/s incl. compiles)")


if __name__ == "__main__":
    main()
