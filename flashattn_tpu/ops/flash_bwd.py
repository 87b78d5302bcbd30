"""Pallas TPU flash-attention backward: two-kernel recompute with delta reuse.

TPU-native re-design of the reference backward
(``code/_flash_attention_kernel_optimized.py:164-386``):

  - **dQ kernel** (reference ``:164-258``): one grid step per [block_q, D]
    query tile; precomputes delta = row_sum(dO ⊙ O) ONCE before the K/V loop
    (``:209-211``), recomputes S and rebuilds P = exp2((S·scale − LSE)·log2e)
    from the stored LSE (``:230-244``), forms dP = dO·Vᵀ and
    dS = P ⊙ (dP − delta) (``:247-250``), accumulates dQ in fp32 (``:253``),
    and PERSISTS delta to HBM for the dKV kernel (``:258``) — the
    delta-reuse optimization (``Phase_5.md:529-624``).
  - **dKV kernel** (reference ``:291-386``): one grid step per [block_kv, D]
    K/V tile, streaming Q tiles; accumulates dV += Pᵀ·dO and dK += dSᵀ·Q
    (``:370,382``) and LOADS the delta written by the dQ kernel instead of
    recomputing it (``:375-376``).

The ordering dependency (dKV reads dQ's delta, reference
``My_FlashAttention_optimized.py:111-126``) is expressed as a plain data
dependency between the two pallas_calls.

TPU idiom notes (not a port):
  - Transposed contractions (Pᵀ·dO, dSᵀ·Q) are dot_general dimension choices,
    never materialized transposes — the reference's "pre-transposing K loses"
    lesson (``Phase_5.md:639-651``) applied the MXU way.
  - GQA: the dKV grid iterates (B, Hkv, KV_blocks, group, Q_blocks) with the
    q-head group as a sequential inner dimension, so dK/dV accumulate across
    the query heads sharing a KV head entirely in VMEM scratch.
  - Causal pruning clamps block index maps (see flash_fwd.py) so pruned
    steps cost neither DMA nor compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.ops.common import (
    LOG2E,
    MASK_VALUE,
    BlockSizes,
    interpret_default,
    pad_to_block,
)


def _dq_kernel(
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, bkv, D)
    v_ref,  # (1, 1, bkv, D)
    o_ref,  # (1, 1, bq, D)
    do_ref,  # (1, 1, bq, D)
    lse_ref,  # (1, 1, bq, 1)
    dq_ref,  # out (1, 1, bq, D)
    delta_ref,  # out (1, 1, bq, 1) f32
    dq_acc,  # scratch (bq, D) f32
    delta_scratch,  # scratch (bq, 128) f32
    *,
    scale: float,
    is_causal: bool,
    s_q: int,
    s_k: int,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
):
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    causal_offset = s_k - s_q

    @pl.when(kj == 0)
    def _init():
        # delta = row_sum(dO ⊙ O), computed once per q tile and persisted to
        # HBM for the dKV kernel (reference :209-211, :258).
        do = do_ref[0, 0].astype(jnp.float32)
        o = o_ref[0, 0].astype(jnp.float32)
        delta = jnp.sum(do * o, axis=1, keepdims=True)  # (bq, 1)
        delta_scratch[...] = jnp.broadcast_to(delta, delta_scratch.shape)
        delta_ref[0, 0] = delta
        dq_acc[...] = jnp.zeros_like(dq_acc)

    if is_causal:
        max_key = (qi + 1) * block_q - 1 + causal_offset
        should_run = kj * block_kv <= max_key
        last_kj = jnp.minimum(
            num_kv_blocks - 1, jnp.maximum(max_key, 0) // block_kv
        )
    else:
        should_run = True
        last_kj = num_kv_blocks - 1

    @pl.when(should_run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]  # (bq, 1), natural-log units

        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)

        mask = None
        if is_causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            causal_mask = cols + kj * block_kv <= rows + qi * block_q + causal_offset
            need = (kj + 1) * block_kv - 1 > qi * block_q + causal_offset
            mask = causal_mask | jnp.logical_not(need)
        if s_k % block_kv != 0:
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            pad_mask = cols + kj * block_kv < s_k
            mask = pad_mask if mask is None else (mask & pad_mask)
        if mask is not None:
            s = jnp.where(mask, s, MASK_VALUE)

        # Rebuild P from stored LSE (reference :243-244; math Phase_4.md:143-158).
        p = jnp.exp2(s - lse * LOG2E)  # (bq, bkv) f32
        if is_causal and causal_offset < 0:
            # Zero-key rows (LSE = -inf) must contribute nothing.
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
            valid = rows + (qi * block_q + causal_offset) >= 0
            p = jnp.where(valid, p, 0.0)

        dp = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_scratch[:, :1]
        ds = p * (dp - delta)  # (bq, bkv) f32
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kj == last_kj)
    def _finalize():
        dq_ref[0, 0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref,  # (1, 1, bq, D)
    do_ref,  # (1, 1, bq, D)
    lse_ref,  # (1, 1, bq, 1)
    delta_ref,  # (1, 1, bq, 1) f32 — written by the dQ kernel
    k_ref,  # (1, 1, bkv, D)
    v_ref,  # (1, 1, bkv, D)
    dk_ref,  # out (1, 1, bkv, D)
    dv_ref,  # out (1, 1, bkv, D)
    dk_acc,  # scratch (bkv, D) f32
    dv_acc,  # scratch (bkv, D) f32
    *,
    scale: float,
    is_causal: bool,
    s_q: int,
    s_k: int,
    block_q: int,
    block_kv: int,
    num_q_blocks: int,
    q_per_kv: int,
):
    kj = pl.program_id(2)
    g = pl.program_id(3)
    qi = pl.program_id(4)
    causal_offset = s_k - s_q

    @pl.when((g == 0) & (qi == 0))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    if is_causal:
        # Query block visible from this K/V block iff its last row can see
        # the block's first key (reference causal start at :341-342).
        should_run = (qi + 1) * block_q - 1 + causal_offset >= kj * block_kv
    else:
        should_run = True

    @pl.when(should_run)
    def _step():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]  # (bq, 1)
        delta = delta_ref[0, 0]  # (bq, 1)
        k = k_ref[0, 0]
        v = v_ref[0, 0]

        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)

        mask = None
        if is_causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            causal_mask = cols + kj * block_kv <= rows + qi * block_q + causal_offset
            need = (kj + 1) * block_kv - 1 > qi * block_q + causal_offset
            mask = causal_mask | jnp.logical_not(need)
        if s_q % block_q != 0:
            # Padded query rows carry zero LSE — they MUST contribute nothing
            # to dK/dV (padding-row masking, reference :355-356).
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            row_mask = rows + qi * block_q < s_q
            mask = row_mask if mask is None else (mask & row_mask)
        if mask is not None:
            s = jnp.where(mask, s, MASK_VALUE)

        p = jnp.exp2(s - lse * LOG2E)  # (bq, bkv) f32
        if is_causal and causal_offset < 0:
            # Zero-key rows (LSE = -inf) must contribute nothing to dK/dV.
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
            valid = rows + (qi * block_q + causal_offset) >= 0
            p = jnp.where(valid, p, 0.0)

        # dV += Pᵀ · dO  — contraction over q rows, no transpose materialized.
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        dp = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)  # delta loaded, not recomputed (reference :375-376)
        # dK += dSᵀ · Q
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when((g == q_per_kv - 1) & (qi == num_q_blocks - 1))
    def _finalize():
        dk_ref[0, 0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("is_causal", "scale", "block_sizes", "interpret", "debug"),
)
def flash_attention_backward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,
    do: jnp.ndarray,
    lse: jnp.ndarray,
    is_causal: bool = False,
    scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
    debug: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-kernel flash-attention backward (launcher layer).

    TPU analogue of the reference's ``flash_attention_backward``
    (``My_FlashAttention_optimized.py:62-128``): launches the dQ kernel, then
    the dK/dV kernel which consumes the delta array the first kernel wrote.

    Returns (dQ [B,Hq,S_q,D], dK [B,Hkv,S_k,D], dV [B,Hkv,S_k,D]).
    """
    b, hq, s_q, d = q.shape
    _, hkv, s_k, _ = k.shape
    assert hq % hkv == 0
    q_per_kv = hq // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = interpret_default()
    if block_sizes is None:
        block_sizes = BlockSizes()
    block_sizes = block_sizes.clamp(s_q, s_k)

    # ---- Kernel 1: dQ (+ delta persisted for kernel 2) ----
    bq, bkv = block_sizes.block_q_dq, block_sizes.block_kv_dq
    lse4 = lse[..., None]  # [B,Hq,Sq,1] — sublane-aligned row stats
    q_p = pad_to_block(q, 2, bq)
    o_p = pad_to_block(o, 2, bq)
    do_p = pad_to_block(do, 2, bq)
    lse_p = pad_to_block(lse4, 2, bq)
    k_p = pad_to_block(k, 2, bkv)
    v_p = pad_to_block(v, 2, bkv)
    s_q_p, s_k_p = q_p.shape[2], k_p.shape[2]
    num_q_blocks = s_q_p // bq
    num_kv_blocks = s_k_p // bkv
    causal_offset = s_k - s_q

    def kv_index(b_i, h_i, q_i, kv_i):
        if is_causal:
            max_key = (q_i + 1) * bq - 1 + causal_offset
            last = jnp.minimum(num_kv_blocks - 1, jnp.maximum(max_key, 0) // bkv)
            kv_i = jnp.minimum(kv_i, last)
        return (b_i, h_i // q_per_kv, kv_i, 0)

    def q_index(b_i, h_i, q_i, kv_i):
        return (b_i, h_i, q_i, 0)

    def qrow_index(b_i, h_i, q_i, kv_i):
        return (b_i, h_i, q_i, 0)

    dq_kernel = functools.partial(
        _dq_kernel,
        scale=scale,
        is_causal=is_causal,
        s_q=s_q,
        s_k=s_k,
        block_q=bq,
        block_kv=bkv,
        num_kv_blocks=num_kv_blocks,
    )
    dq, delta = pl.pallas_call(
        dq_kernel,
        grid=(b, hq, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_index),
            pl.BlockSpec((1, 1, bkv, d), kv_index),
            pl.BlockSpec((1, 1, bkv, d), kv_index),
            pl.BlockSpec((1, 1, bq, d), q_index),
            pl.BlockSpec((1, 1, bq, d), q_index),
            pl.BlockSpec((1, 1, bq, 1), qrow_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), q_index),
            pl.BlockSpec((1, 1, bq, 1), qrow_index),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, s_q_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, s_q_p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        debug=debug,
    )(q_p, k_p, v_p, o_p, do_p, lse_p)
    dq = dq[:, :, :s_q, :] if s_q_p != s_q else dq

    # ---- Kernel 2: dK/dV, reusing kernel 1's delta ----
    bq2, bkv2 = block_sizes.block_q_dkv, block_sizes.block_kv_dkv
    if bq2 != bq:
        q_p = pad_to_block(q, 2, bq2)
        do_p = pad_to_block(do, 2, bq2)
        lse_p = pad_to_block(lse4, 2, bq2)
        delta_p = pad_to_block(delta[:, :, :s_q], 2, bq2)
    else:
        delta_p = delta
    if bkv2 != bkv:
        k_p = pad_to_block(k, 2, bkv2)
        v_p = pad_to_block(v, 2, bkv2)
    s_q_p2, s_k_p2 = q_p.shape[2], k_p.shape[2]
    num_q_blocks2 = s_q_p2 // bq2
    num_kv_blocks2 = s_k_p2 // bkv2

    def q_index2(b_i, h_i, kv_i, g_i, q_i):
        h = h_i * q_per_kv + g_i
        if is_causal:
            first = jnp.maximum(kv_i * bkv2 - causal_offset, 0) // bq2
            q_i = jnp.maximum(q_i, first)
        return (b_i, h, q_i, 0)

    def qrow_index2(b_i, h_i, kv_i, g_i, q_i):
        bb, hh, qq, _ = q_index2(b_i, h_i, kv_i, g_i, q_i)
        return (bb, hh, qq, 0)

    def kv_index2(b_i, h_i, kv_i, g_i, q_i):
        return (b_i, h_i, kv_i, 0)

    dkv_kernel = functools.partial(
        _dkv_kernel,
        scale=scale,
        is_causal=is_causal,
        s_q=s_q,
        s_k=s_k,
        block_q=bq2,
        block_kv=bkv2,
        num_q_blocks=num_q_blocks2,
        q_per_kv=q_per_kv,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, hkv, num_kv_blocks2, q_per_kv, num_q_blocks2),
        in_specs=[
            pl.BlockSpec((1, 1, bq2, d), q_index2),
            pl.BlockSpec((1, 1, bq2, d), q_index2),
            pl.BlockSpec((1, 1, bq2, 1), qrow_index2),
            pl.BlockSpec((1, 1, bq2, 1), qrow_index2),
            pl.BlockSpec((1, 1, bkv2, d), kv_index2),
            pl.BlockSpec((1, 1, bkv2, d), kv_index2),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bkv2, d), kv_index2),
            pl.BlockSpec((1, 1, bkv2, d), kv_index2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, s_k_p2, d), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, s_k_p2, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv2, d), jnp.float32),
            pltpu.VMEM((bkv2, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary", "arbitrary",
            ),
        ),
        interpret=interpret,
        debug=debug,
    )(q_p, do_p, lse_p, delta_p, k_p, v_p)
    if s_k_p2 != s_k:
        dk = dk[:, :, :s_k, :]
        dv = dv[:, :, :s_k, :]
    return dq, dk, dv
