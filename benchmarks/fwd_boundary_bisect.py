"""Causal-forward per-q-row boundary cost bisection (VERDICT r2 item #3).

Algebra from the tuned sweeps (v5e, D=128, 1024^2 tiles, B=4 H=8):
interior step ~= 3.31 us, per-q-row boundary ~= 4.3 us (~1.3 steps), so at
S=16k causal (136 steps + 16 rows per bh) boundaries cost ~13 % of the
kernel. This script measures WHICH piece of the boundary carries the cost
by timing hacked kernel variants that strip one piece each (results are
numerically WRONG where stripped — these are perf probes, never used for
real output):

  full       — the shipped kernel
  no_div     — finalize writes acc without the 1/l normalize
  no_init    — per-row m/l/acc init stripped (first-step writethrough only)
  no_final   — finalize pass stripped entirely (o written from raw acc)

Usage: python benchmarks/fwd_boundary_bisect.py [--s 8192]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from flashattn_tpu.ops import flash_fwd as F  # noqa: E402
from flashattn_tpu.ops.common import LOG2E, MASK_VALUE, BlockSizes  # noqa: E402
from flashattn_tpu.utils.timing import attention_flops, measure, tflops  # noqa: E402


def _probe_kernel(meta_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                  m_scratch, l_scratch, acc_scratch, *,
                  block_q, block_kv, do_mask, do_init, do_div, do_final):
    step = pl.program_id(2)
    first = meta_ref[F.META_FIRST, step] == 1

    if do_init:
        @pl.when(first)
        def _init():
            m_scratch[:, :1] = jnp.full((block_q, 1), MASK_VALUE, jnp.float32)
            l_scratch[:, :1] = jnp.zeros((block_q, 1), jnp.float32)
            acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if do_mask:
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        limit = jnp.minimum(rows1 + meta_ref[F.META_RTHRESH, step],
                            meta_ref[F.META_CTHRESH, step])
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1)
        s = jnp.where(cols1 <= limit, s, MASK_VALUE)

    m_prev = m_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_scratch[:, :1] = alpha * l_scratch[:, :1] + jnp.sum(p, axis=1,
                                                          keepdims=True)
    m_scratch[:, :1] = m_new
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scratch[...] = acc_scratch[...] * alpha + pv

    if do_final:
        @pl.when(meta_ref[F.META_LAST, step] == 1)
        def _finalize():
            l = l_scratch[:, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            acc = acc_scratch[...]
            o_ref[0, 0] = ((acc / l_safe) if do_div else acc).astype(
                o_ref.dtype)
            lse_ref[0, 0] = m_scratch[:, :1] + jnp.log2(l_safe)
    else:
        o_ref[0, 0] = acc_scratch[...].astype(o_ref.dtype)
        lse_ref[0, 0] = m_scratch[:, :1]


def probe_forward(q, k, v, variant: str, bq=1024, bkv=1024):
    b, hq, s_q, d = q.shape
    s_k = k.shape[2]
    scale = (1.0 / d**0.5) * LOG2E
    q_p = (q * scale).astype(q.dtype)
    meta = F.build_wavefront(s_q // bq, s_k // bkv, bq, bkv, s_k, s_k - s_q)
    num_steps = meta.shape[0]
    flags = dict(do_mask=True, do_init=True, do_div=True, do_final=True)
    flags.update({
        "full": {},
        "no_div": dict(do_div=False),
        "no_init": dict(do_init=False),
        "no_final": dict(do_final=False),
        "no_mask": dict(do_mask=False),
    }[variant])
    kernel = functools.partial(_probe_kernel, block_q=bq, block_kv=bkv,
                               **flags)

    def q_index(b_i, h_i, s_i, meta_ref):
        return (b_i, h_i, meta_ref[F.META_QI, s_i], 0)

    def kv_index(b_i, h_i, s_i, meta_ref):
        return (b_i, h_i, meta_ref[F.META_KJ, s_i], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hq, num_steps),
        in_specs=[pl.BlockSpec((1, 1, bq, d), q_index),
                  pl.BlockSpec((1, 1, bkv, d), kv_index),
                  pl.BlockSpec((1, 1, bkv, d), kv_index)],
        out_specs=[pl.BlockSpec((1, 1, bq, d), q_index),
                   pl.BlockSpec((1, 1, bq, 1), q_index)],
        scratch_shapes=[pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, d), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, hq, s_q, d), q.dtype),
                   jax.ShapeDtypeStruct((b, hq, s_q, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(np.ascontiguousarray(meta.T)), q_p, k, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=8192)
    args = ap.parse_args()
    b, h, d, s = 4, 8, 128, args.s
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.bfloat16)
    fl = attention_flops(b, h, s, s, d, mode="fwd", is_causal=True)

    # The shipped kernel baseline. (The round-3 pred_mask arm here was
    # invalid — flipping a trace-time env between same-shape jitted calls
    # re-measures the FIRST trace (ADVICE r3 #2); trace-time env A/Bs live
    # in benchmarks/fwd_ab.py as subprocesses now, and the pred_mask path
    # itself was deleted in round 4 after failing to compile.)
    from flashattn_tpu.ops.flash_fwd import flash_attention_forward
    fn = jax.jit(functools.partial(
        flash_attention_forward, is_causal=True,
        block_sizes=BlockSizes(block_q=1024, block_kv=1024)))
    sec = measure(fn, q, k, v, warmup=5, n1=3, n2=10)
    print(json.dumps({"variant": "shipped", "S": s, "ms": round(sec * 1e3, 3),
                      "tflops": round(tflops(fl, sec), 2)}), flush=True)

    for variant in ("full", "no_mask", "no_div", "no_init", "no_final"):
        fn = jax.jit(functools.partial(probe_forward, variant=variant))
        sec = measure(fn, q, k, v, warmup=5, n1=3, n2=10)
        print(json.dumps({"variant": variant, "S": s,
                          "ms": round(sec * 1e3, 3),
                          "tflops": round(tflops(fl, sec), 2)}), flush=True)


if __name__ == "__main__":
    main()
