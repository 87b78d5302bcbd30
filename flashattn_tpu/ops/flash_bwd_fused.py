"""Pallas TPU fused ONE-kernel flash-attention backward.

The reference implements the backward as two kernels — dQ (recompute S/P,
``code/_flash_attention_kernel_optimized.py:164-258``) and dK/dV (recompute
S/P again, ``:291-386``) — because a GPU SM's ~hundred-KB SRAM cannot hold
K/V-length gradient accumulators, so dK/dV must be parallelized over KV
tiles in a second pass. That costs 7 matmul passes over the score square
(S and dP recomputed in both kernels) plus a delta HBM roundtrip.

A TPU core is different hardware: 128 MB of software-managed VMEM and ONE
sequential grid. The fused design keeps full-length dK/dV accumulators
[num_kv_blocks, block_kv, D] f32 RESIDENT in VMEM across the whole
(batch, kv-head) slice, walks the forward's q-row-major wavefront, and
computes S, P, dP, dS ONCE per live tile:

    per tile:  S = Q̃·Kᵀ          (contract D)
               dP = dO·Vᵀ         (contract D)
               dQ[qi]  += dS·K    (contract bkv, natural)
               dV[kj]  += Pᵀ·dO   (contract bq, sublane axis)
               dK[kj]  += dSᵀ·Q̃   (contract bq, sublane axis)

5 matmul passes instead of 7 (-29 % MXU work), ONE exp2 per score element
instead of two, no delta persist/reload (the dQ-kernel init computes it in
VMEM and it never leaves), and K/V/Q/dO each stream once instead of twice.
The delta-reuse optimization the reference builds across kernels
(``Phase_5.md:529-624``) becomes free — delta simply stays in scratch.

VMEM bound: the resident accumulators cost 2·S_k·D·4 bytes, so the fused
path serves S_k up to ~32k at D=128 (~64k at D=64); beyond that the
launcher falls back to the two-kernel path (flash_bwd.py), which remains
the long-context implementation.

Feature-parity with the two-kernel path: causal, GQA/MQA, S_q != S_k,
ragged lengths, sliding window, logit softcap, ALiBi, dropout, and
packed-segment varlen — verified against the same jnp oracles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.ops.common import (
    LOG2E,
    MASK_VALUE,
    dropout_keep_mask,
    pad_to_block,
)
from flashattn_tpu.ops.flash_fwd import (
    META_COLS,
    META_CTHRESH,
    META_FIRST,
    META_KJ,
    META_LAST,
    META_LTHRESH,
    META_QI,
    META_RTHRESH,
    _BIG,
    build_wavefront,
)

# Fused meta layout: the forward wavefront's 7 columns plus the GQA group
# index (q-head within the KV group, column 7) and a first-touch flag for
# the kv tile (column 8: 1 on the step that first accumulates into
# dk_acc[kj]/dv_acc[kj], so the kernel writes through instead of zeroing
# the full resident accumulators — up to 16 MB of VMEM writes — at step 0).
FUSED_G = META_COLS
FUSED_KJ_FIRST = META_COLS + 1
FUSED_COLS = META_COLS + 2


def build_fused_wavefront(
    num_q_blocks: int,
    num_kv_blocks: int,
    block_q: int,
    block_kv: int,
    s_k: int,
    q_per_kv: int,
    causal_offset: int | None,
    window: int | None = None,
) -> np.ndarray:
    """(g, qi, kj) triples: the forward wavefront repeated per GQA group
    member, so dK/dV accumulate across the q heads sharing a KV head
    without leaving VMEM."""
    base = build_wavefront(
        num_q_blocks, num_kv_blocks, block_q, block_kv, s_k,
        causal_offset, window=window,
    )
    tiles = []
    for g in range(q_per_kv):
        gcol = np.full((base.shape[0], 1), g, dtype=np.int32)
        tiles.append(np.concatenate([base, gcol], axis=1))
    meta = np.concatenate(tiles, axis=0)
    # First-touch flag per kv tile (over the WHOLE g-repeated sequence):
    # lets the kernel write dk_acc/dv_acc through instead of zero-initing.
    kj_first = np.zeros((meta.shape[0], 1), dtype=np.int32)
    seen: set[int] = set()
    for i, kj in enumerate(meta[:, META_KJ]):
        if int(kj) not in seen:
            seen.add(int(kj))
            kj_first[i, 0] = 1
    return np.concatenate([meta, kj_first], axis=1)


def _fused_bwd_kernel(
    meta_ref,  # SMEM (FUSED_COLS, L) int32 — step axis last
    *refs,  # [seed,] [slopes,] q, o, do, lse, k, v, [seg_q, seg_k,]
    #         dq, dk, dv, dq_acc, delta_scratch, dk_acc, dv_acc
    needs_mask: bool,
    guard_zero_rows: bool,
    segmented: bool,
    windowed: bool,
    softcap: float,
    alibi: bool,
    dropout_rate: float,
    hq: int,
    q_per_kv: int,
    num_steps: int,
    block_q: int,
    block_kv: int,
    causal_offset: int,
    scale: float,
    dynamic_offset: bool = False,
    window_size: int = 0,
    zero_init_kv: bool = False,
):
    # q (1,1,bq,D) pre-scaled by scale[·log2e]; o/do (1,1,bq,D);
    # lse (1,1,bq,1); k/v (1,1,bkv,D) RAW; seg_q (1,bq,1) / seg_k (1,1,bkv);
    # outs dq (1,1,bq,D), dk/dv (1,1,nkv,bkv,D); scratch dq_acc (bq,D) f32,
    # delta_scratch (bq,128) f32, dk_acc/dv_acc (nkv,bkv,D) f32.
    if dynamic_offset:
        dynoff_ref, *refs = refs  # (1,) SMEM int32 traced q/k alignment
    if dropout_rate > 0.0:
        seed_ref, *refs = refs
    if alibi:
        slopes_ref, *refs = refs  # SMEM (Hq,) f32
    if segmented:
        (q_ref, o_ref, do_ref, lse_ref, k_ref, v_ref, segq_ref, segk_ref,
         dq_ref, dk_ref, dv_ref,
         dq_acc, delta_scratch, dk_acc, dv_acc) = refs
    else:
        (q_ref, o_ref, do_ref, lse_ref, k_ref, v_ref,
         dq_ref, dk_ref, dv_ref,
         dq_acc, delta_scratch, dk_acc, dv_acc) = refs
    step = pl.program_id(2)
    kj = meta_ref[META_KJ, step]
    row_first = meta_ref[META_FIRST, step] == 1

    if zero_init_kv:
        # Some kv tile is never enumerated (windowed / offset geometries):
        # it still must output zeros, so keep the step-0 full init.
        @pl.when(step == 0)
        def _init_kv_accumulators():
            dk_acc[...] = jnp.zeros_like(dk_acc)
            dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(row_first)
    def _init_row():
        # delta = row_sum(dO ⊙ O) — computed once per q tile; unlike the
        # two-kernel path (reference :258 → :376) it never round-trips HBM.
        # Only the live (bq, 1) column is written (a full-scratch broadcast
        # is ~0.5 MB of boundary overhead per q row); dq_acc needs no init —
        # the first step of the row writes it through (predicated below).
        do = do_ref[0, 0].astype(jnp.float32)
        o = o_ref[0, 0].astype(jnp.float32)
        delta_scratch[:, :1] = jnp.sum(do * o, axis=1, keepdims=True)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse2 = lse_ref[0, 0] * LOG2E  # (bq, 1) -> log2 units

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bkv); log2 domain (q pre-scaled); true logits under softcap
    if softcap > 0.0:
        t_cap = jnp.tanh(s * (1.0 / softcap))
        s = t_cap * (softcap * LOG2E)
    if alibi:
        h_q = pl.program_id(1) * q_per_kv + meta_ref[FUSED_G, step]
        slope = slopes_ref[h_q]
        aoff = dynoff_ref[0] if dynamic_offset else causal_offset
        r1a = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        c1a = jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1)
        dist = ((c1a + kj * block_kv)
                - (r1a + meta_ref[META_QI, step] * block_q)
                - aoff).astype(jnp.float32)
        s = s + (slope * LOG2E) * dist

    mask = None
    if needs_mask:
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        limit = jnp.minimum(rows1 + meta_ref[META_RTHRESH, step],
                            meta_ref[META_CTHRESH, step])  # (bq, 1)
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1)
        mask = cols1 <= limit  # (bq, bkv)
        if windowed and dynamic_offset:
            lth = (dynoff_ref[0] - (window_size - 1)
                   + meta_ref[META_QI, step] * block_q
                   - kj * block_kv)
            mask = mask & (cols1 >= rows1 + lth)
        elif windowed:
            mask = mask & (cols1 >= rows1 + meta_ref[META_LTHRESH, step])
    if segmented:
        seg_mask = segq_ref[0] == segk_ref[0]  # (bq,1)==(1,bkv) -> (bq,bkv)
        mask = seg_mask if mask is None else (mask & seg_mask)
    if mask is not None:
        s = jnp.where(mask, s, MASK_VALUE)

    # Rebuild P from the stored LSE — the ONLY P materialization in the
    # whole backward (the two-kernel design rebuilds it twice).
    p = jnp.exp2(s - lse2)  # (bq, bkv) f32
    if segmented or windowed:
        # Empty rows carry LSE = -inf (segments, or a sharded/pos_offset
        # windowed call whose window misses this shard); exp2(MASK - (-inf))
        # = inf — select through the mask so the contribution is exactly 0.
        p = jnp.where(mask, p, 0.0)
    if guard_zero_rows:
        riota = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        valid = riota + (meta_ref[META_QI, step] * block_q + causal_offset) >= 0
        p = jnp.where(valid, p, 0.0)

    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bkv)
    if dropout_rate > 0.0:
        rows_g = meta_ref[META_QI, step] * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)
        cols_g = kj * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_kv), 1)
        h_q = pl.program_id(1) * q_per_kv + meta_ref[FUSED_G, step]
        bh = pl.program_id(0) * hq + h_q
        keep = dropout_keep_mask(seed_ref[0], bh, rows_g, cols_g,
                                 dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        p_v = jnp.where(keep, p * inv, 0.0)  # dV sees the dropped P
        dp = jnp.where(keep, dp * inv, 0.0)
    else:
        p_v = p
    ds = p * (dp - delta_scratch[:, :1])  # (bq, bkv) f32
    if softcap > 0.0:
        ds = ds * (1.0 - t_cap * t_cap)  # d(cap·tanh(x/cap))/dx
    ds_b = ds.astype(q.dtype)

    # dQ[qi] += dS · K — K raw, so the finalize factor is just `scale`.
    dq_contrib = jax.lax.dot_general(
        ds_b, k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(row_first)
    def _dq_write_through():
        dq_acc[...] = dq_contrib

    @pl.when(jnp.logical_not(row_first))
    def _dq_rmw():
        dq_acc[...] += dq_contrib

    # dV[kj] += Pᵀ · dO and dK[kj] += dSᵀ · Q̃: sublane-axis contractions
    # into the RESIDENT accumulators (dynamic leading-dim index). On the
    # tile's first touch (meta flag) write through instead of RMW, so the
    # accumulators never need a zeros pass.
    dv_contrib = jax.lax.dot_general(
        p_v.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_contrib = jax.lax.dot_general(
        ds_b, q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if zero_init_kv:
        dv_acc[kj] += dv_contrib
        dk_acc[kj] += dk_contrib
    else:
        kj_first = meta_ref[FUSED_KJ_FIRST, step] == 1

        @pl.when(kj_first)
        def _dkv_write_through():
            dv_acc[kj] = dv_contrib
            dk_acc[kj] = dk_contrib

        @pl.when(jnp.logical_not(kj_first))
        def _dkv_rmw():
            dv_acc[kj] += dv_contrib
            dk_acc[kj] += dk_contrib

    @pl.when(meta_ref[META_LAST, step] == 1)
    def _finalize_row():
        dq_ref[0, 0] = (dq_acc[...] * scale).astype(dq_ref.dtype)

    @pl.when(step == num_steps - 1)
    def _finalize_kv():
        # Q̃ carries scale[·log2e]; undo the extra factor on dK here.
        ik = 1.0 if softcap > 0.0 else 1.0 / LOG2E
        dk_ref[0, 0] = (dk_acc[...] * ik).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def fused_backward_vmem_bytes(s_q: int, s_k: int, d: int, bq: int,
                              bkv: int, dtype_bytes: int = 2) -> int:
    """Rough VMEM footprint of the fused kernel (dispatch heuristic):
    resident f32 accumulators + bf16 output blocks (possibly double
    buffered) + streamed tiles + score-tile temporaries.

    D pads to the 128-lane vreg width: Mosaic allocates (…, 64) windows at
    (…, 128) — omitting this under-estimated D=64 by 2x and the old 100 MB
    bound dispatched D=64 S=64k to the fused path, which does NOT compile
    (132.06 M > 128 M, v5e_bwd_crossover.jsonl + compile probes at
    S∈{56k: ok, 60k: OOM}). With the padding, this formula + the 128 MB
    bound reproduces every measured compile/fail outcome of the crossover
    sweep at both head dims."""
    from flashattn_tpu.ops.common import round_up

    d = round_up(d, 128)
    s_k_p = round_up(s_k, bkv)
    acc = 2 * s_k_p * d * 4  # dk_acc + dv_acc f32
    outs = 2 * 2 * s_k_p * d * dtype_bytes  # dk/dv blocks, x2 buffering
    tiles = 2 * (5 * bq * d + 2 * bkv * d) * dtype_bytes
    stiles = 4 * bq * bkv * 4  # s/p/dp/ds f32 temporaries
    return acc + outs + tiles + stiles


def flash_attention_backward_fused(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,
    do: jnp.ndarray,
    lse: jnp.ndarray,
    is_causal: bool,
    scale: float,
    block_q: int,
    block_kv: int,
    interpret: bool,
    debug: bool = False,
    segment_ids: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jnp.ndarray | int | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    alibi: bool = False,
    alibi_slopes: jnp.ndarray | None = None,
    pos_offset: int | None = None,
    dyn_pos_offset: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Launcher for the fused one-kernel backward (see module docstring).

    Called by flash_attention_backward's dispatch; same contract
    (dQ, dK, dV, pos_offset semantics) as the two-kernel path.
    """
    b, hq, s_q, d = q.shape
    _, hkv, s_k, _ = k.shape
    assert hq % hkv == 0
    q_per_kv = hq // hkv
    dynamic_offset = dyn_pos_offset is not None
    assert not (dynamic_offset and (pos_offset is not None or is_causal))
    causal_offset = (s_k - s_q) if pos_offset is None else int(pos_offset)
    guard_zero_rows = is_causal and causal_offset < 0
    lse4 = lse[..., None]

    pre = scale if logit_softcap else scale * LOG2E
    bq, bkv = block_q, block_kv
    q_p = pad_to_block((q * pre).astype(q.dtype), 2, bq)
    o_p = pad_to_block(o, 2, bq)
    do_p = pad_to_block(do, 2, bq)
    lse_p = pad_to_block(lse4, 2, bq)
    k_p = pad_to_block(k, 2, bkv)
    v_p = pad_to_block(v, 2, bkv)
    s_q_p, s_k_p = q_p.shape[2], k_p.shape[2]
    num_q_blocks = s_q_p // bq
    num_kv_blocks = s_k_p // bkv

    meta = build_fused_wavefront(
        num_q_blocks, num_kv_blocks, bq, bkv, s_k, q_per_kv,
        causal_offset if is_causal else None,
        window=None if dynamic_offset else window,
    )
    num_steps = meta.shape[0]
    windowed = window is not None
    needs_mask = windowed or bool((meta[:, META_RTHRESH] != _BIG).any()
                                  or (meta[:, META_CTHRESH] != _BIG).any())
    # If some kv tile is never enumerated (windowed / negative-offset
    # geometries) it still must emit zero grads, so fall back to the step-0
    # full accumulator init instead of first-touch write-through.
    zero_init_kv = len(set(meta[:, META_KJ].tolist())) != num_kv_blocks
    segmented = segment_ids is not None
    assert 0.0 <= dropout_rate < 1.0, dropout_rate

    seed_prefetch = []
    if dynamic_offset:
        seed_prefetch.append(jnp.asarray(dyn_pos_offset, jnp.int32).reshape(1))
    if dropout_rate > 0.0:
        assert dropout_seed is not None, "dropout needs dropout_seed"
        seed_prefetch.append(jnp.asarray(dropout_seed, jnp.int32).reshape(1))
    if alibi:
        from flashattn_tpu.ops.flash_fwd import default_alibi_slopes

        if alibi_slopes is None:
            alibi_slopes = default_alibi_slopes(hq)
        assert alibi_slopes.shape == (hq,), (alibi_slopes.shape, hq)
        seed_prefetch = seed_prefetch + [alibi_slopes.astype(jnp.float32)]

    def q_index(b_i, h_i, s_i, m, *_):
        return (b_i, h_i * q_per_kv + m[FUSED_G, s_i], m[META_QI, s_i], 0)

    def kv_index(b_i, h_i, s_i, m, *_):
        return (b_i, h_i, m[META_KJ, s_i], 0)

    def kvout_index(b_i, h_i, s_i, m, *_):
        return (b_i, h_i, 0, 0, 0)

    kernel = functools.partial(
        _fused_bwd_kernel,
        needs_mask=needs_mask,
        guard_zero_rows=guard_zero_rows,
        segmented=segmented,
        windowed=windowed,
        softcap=float(logit_softcap or 0.0),
        alibi=alibi,
        dropout_rate=dropout_rate,
        hq=hq,
        q_per_kv=q_per_kv,
        num_steps=num_steps,
        block_q=bq,
        block_kv=bkv,
        causal_offset=causal_offset,
        scale=scale,
        dynamic_offset=dynamic_offset,
        window_size=int(window or 0),
        zero_init_kv=zero_init_kv,
    )
    in_specs = [
        pl.BlockSpec((1, 1, bq, d), q_index),
        pl.BlockSpec((1, 1, bq, d), q_index),
        pl.BlockSpec((1, 1, bq, d), q_index),
        pl.BlockSpec((1, 1, bq, 1), q_index),
        pl.BlockSpec((1, 1, bkv, d), kv_index),
        pl.BlockSpec((1, 1, bkv, d), kv_index),
    ]
    inputs = [q_p, o_p, do_p, lse_p, k_p, v_p]
    if segmented:
        seg_q, seg_k = segment_ids
        assert seg_q.shape == (b, s_q) and seg_k.shape == (b, s_k), (
            seg_q.shape, seg_k.shape, (b, s_q, s_k))
        segq_p = jnp.pad(seg_q.astype(jnp.int32),
                         ((0, 0), (0, s_q_p - s_q)),
                         constant_values=-1)[..., None]  # [B, S_q_p, 1]
        segk_p = jnp.pad(seg_k.astype(jnp.int32),
                         ((0, 0), (0, s_k_p - s_k)),
                         constant_values=-2)[:, None, :]  # [B, 1, S_k_p]
        in_specs += [
            pl.BlockSpec((1, bq, 1),
                         lambda b_i, h_i, s_i, m, *_: (b_i, m[META_QI, s_i], 0)),
            pl.BlockSpec((1, 1, bkv),
                         lambda b_i, h_i, s_i, m, *_: (b_i, 0, m[META_KJ, s_i])),
        ]
        inputs += [segq_p, segk_p]

    dq, dk5, dv5 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1 + len(seed_prefetch),
            grid=(b, hkv, num_steps),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, bq, d), q_index),
                pl.BlockSpec((1, 1, num_kv_blocks, bkv, d), kvout_index),
                pl.BlockSpec((1, 1, num_kv_blocks, bkv, d), kvout_index),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((num_kv_blocks, bkv, d), jnp.float32),
                pltpu.VMEM((num_kv_blocks, bkv, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, s_q_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, num_kv_blocks, bkv, d), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, num_kv_blocks, bkv, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
        debug=debug,
    )(jnp.asarray(np.ascontiguousarray(meta.T)), *seed_prefetch, *inputs)

    dq = dq[:, :, :s_q, :] if s_q_p != s_q else dq
    dk = dk5.reshape(b, hkv, s_k_p, d)
    dv = dv5.reshape(b, hkv, s_k_p, d)
    if s_k_p != s_k:
        dk = dk[:, :, :s_k, :]
        dv = dv[:, :, :s_k, :]
    return dq, dk, dv
