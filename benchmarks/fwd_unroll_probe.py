"""KV-unroll overlap probe: can Mosaic overlap sub-tile B's QK dot (MXU)
with sub-tile A's softmax passes (VPU) when the kernel processes two KV
sub-tiles per grid step?

Motivation (measured): the forward step serializes ~1.1-1.4 us of VPU
softmax work against ~2.7 us of MXU dots per 1024^2 tile at D=64 (SoL 0.64
vs the backward's 0.83 — the backward has no online-softmax chain). One
dot per step gives the scheduler nothing to overlap; an explicit 2-way
unroll creates independent MXU/VPU chains linked only through the (bq,1)
running stats.

Numerically exact (same online-softmax algebra, just two updates per grid
step). Non-causal only — this is a perf probe; the wavefront threshold
arithmetic for sub-tiles comes after the probe wins.

Usage: python benchmarks/fwd_unroll_probe.py [--d 64] [--s 8192]
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
from flashattn_tpu.ops.common import LN2, LOG2E, MASK_VALUE  # noqa: E402
from flashattn_tpu.utils.timing import attention_flops, measure, tflops  # noqa: E402


def _kernel(meta_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
            m_scratch, l_scratch, acc_scratch, *,
            block_q, block_kv, unroll):
    step = pl.program_id(2)
    first = meta_ref[F.META_FIRST, step] == 1

    @pl.when(first)
    def _init():
        m_scratch[:, :1] = jnp.full((block_q, 1), MASK_VALUE, jnp.float32)
        l_scratch[:, :1] = jnp.zeros((block_q, 1), jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q = q_ref[0, 0]
    # Issue ALL sub-tile QK dots first: independent MXU work the scheduler
    # can overlap with the (serial) softmax stat chain below.
    ss = [
        jax.lax.dot_general(
            q, k_ref[0, 0, u * block_kv:(u + 1) * block_kv, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for u in range(unroll)
    ]
    for u in range(unroll):
        s = ss[u]
        m_prev = m_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_scratch[:, :1] = alpha * l_scratch[:, :1] + jnp.sum(
            p, axis=1, keepdims=True)
        m_scratch[:, :1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0, 0, u * block_kv:(u + 1) * block_kv, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(meta_ref[F.META_LAST, step] == 1)
    def _finalize():
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scratch[:, :1] + jnp.log2(l_safe)) * LN2


def unrolled_forward(q, k, v, bq=1024, bkv=1024, unroll=2):
    b, hq, s_q, d = q.shape
    s_k = k.shape[2]
    scale = (1.0 / d**0.5) * LOG2E
    q_p = (q * scale).astype(q.dtype)
    fetch_kv = bkv * unroll
    meta = F.build_wavefront(s_q // bq, s_k // fetch_kv, bq, fetch_kv, s_k,
                             None)
    kernel = functools.partial(_kernel, block_q=bq, block_kv=bkv,
                               unroll=unroll)

    def q_index(b_i, h_i, s_i, meta_ref):
        return (b_i, h_i, meta_ref[F.META_QI, s_i], 0)

    def kv_index(b_i, h_i, s_i, meta_ref):
        return (b_i, h_i, meta_ref[F.META_KJ, s_i], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hq, meta.shape[0]),
        in_specs=[pl.BlockSpec((1, 1, bq, d), q_index),
                  pl.BlockSpec((1, 1, fetch_kv, d), kv_index),
                  pl.BlockSpec((1, 1, fetch_kv, d), kv_index)],
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
    ap.add_argument("--d", type=int, default=64)
    args = ap.parse_args()
    b, h, s, d = 4, 8, args.s, args.d
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.bfloat16)
    fl = attention_flops(b, h, s, s, d, mode="fwd", is_causal=False)

    from flashattn_tpu.ops.flash_fwd import flash_attention_forward
    from flashattn_tpu.ops.common import BlockSizes
    shipped = jax.jit(functools.partial(
        flash_attention_forward, is_causal=False,
        block_sizes=BlockSizes(block_q=1024, block_kv=1024)))
    sec = measure(shipped, q, k, v, warmup=5, n1=3, n2=10)
    print(json.dumps({"variant": "shipped_1024x1024", "S": s, "D": d,
                      "ms": round(sec * 1e3, 3),
                      "tflops": round(tflops(fl, sec), 2)}), flush=True)

    for unroll, bkv in ((1, 1024), (2, 512), (2, 1024), (4, 512), (2, 2048)):
        fn = jax.jit(functools.partial(unrolled_forward, bkv=bkv,
                                       unroll=unroll))
        try:
            sec = measure(fn, q, k, v, warmup=5, n1=3, n2=10)
        except Exception as e:
            print(json.dumps({"variant": f"unroll{unroll}x{bkv}",
                              "note": f"{type(e).__name__}"}), flush=True)
            continue
        print(json.dumps({"variant": f"unroll{unroll}x{bkv}", "S": s, "D": d,
                          "ms": round(sec * 1e3, 3),
                          "tflops": round(tflops(fl, sec), 2)}), flush=True)


if __name__ == "__main__":
    main()
