"""Q-major Pallas TPU flash-attention forward kernel.

Second forward grid shape, complementing the wavefront kernel in
``flash_fwd.py``. One program per **q tile**; the whole K/V sequence is
VMEM-resident and the kv stream is an in-kernel ``lax.fori_loop`` with
per-q-block dynamic bounds. This is (ironically) the reference's own grid
shape — one CTA per q block with the kv loop inside
(``code/_flash_attention_kernel_optimized.py:34-129``, launcher grid
``My_FlashAttention_optimized.py:53``) — which the round-4 benchmarks
showed amortizes *shallow causal rows* better than the flat wavefront:
jax_flash (q-major) led causal pure-fwd at S∈[512, 4096] while the
wavefront won at depth (``benchmarks/results/v5e_d128_causal.jsonl``).

Why q-major closes the per-row boundary cost (the measured causal gap,
docs/PERFORMANCE.md "remaining gaps"):
  - The online-softmax running stats (m, l, acc) are **loop-carried
    values**, not VMEM scratch: no per-step scratch read-modify-write, no
    ``@pl.when(first)/when(last)`` predication, no SMEM meta lookups. This
    generalizes the round-4 ``single_step`` fast path (+53 % at S≤1024) to
    rows of any depth.
  - K/V are fetched **once per (batch, kv-head)** — the BlockSpec index is
    constant along the q grid dimension, so Mosaic's pipeline elides the
    re-fetch for every subsequent q tile. The wavefront re-streams the K
    prefix for every q row; at shallow S that re-fetch dominates.
  - Causal pruning is loop-bound truncation (the reference's ``:82``
    trick): tiles are split per q block into a mask-free prefix
    [0, n_full) and a masked diagonal/tail suffix [n_full, n_tot), each a
    ``fori_loop`` with *dynamic* bounds — zero masking work on interior
    tiles, zero grid steps for pruned tiles.

Residency bound: K + V must fit VMEM (< ~56 MB leaves room for Q/O tiles,
the f32 accumulator and double buffering), i.e. S_k ≤ ~64k at D=128 bf16.
The dispatcher (``flash_fwd.flash_attention_forward``) falls back to the
wavefront kernel beyond that, and for features this kernel does not carry
(windows, ALiBi, soft-cap, dropout, segments, traced offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.ops.common import (
    LN2,
    LOG2E,
    MASK_VALUE,
    BlockSizes,
    interpret_default,
    pad_to_block,
    round_up,
)

_BIG = 2**30

# K + V resident bytes ceiling; above this the dispatcher keeps the
# wavefront kernel (whose per-tile streaming has no residency requirement).
RESIDENT_BYTES_MAX = 56 * 1024 * 1024


def qmajor_supported(
    s_k: int,
    d: int,
    kv_itemsize: int,
    *,
    segmented: bool,
    windowed: bool,
    softcap: bool,
    alibi: bool,
    dropout: bool,
    dynamic_offset: bool,
    mxu_l: bool,
) -> bool:
    """Feature/residency gate for the q-major kernel."""
    if segmented or windowed or softcap or alibi or dropout or dynamic_offset:
        return False
    d_ext = round_up(d + 1, 128) if mxu_l else d
    resident = round_up(s_k, 128) * (d + d_ext) * kv_itemsize
    return resident <= RESIDENT_BYTES_MAX


def qmajor_auto(s_q: int, s_k: int, d: int, is_causal: bool) -> str:
    """Measured-defaults grid-shape choice for untuned keys (the autotuner
    sweeps both grids per key and its cached winner overrides this).

    Placeholder pending the round-5 on-chip A/B: keep the wavefront
    (round-4 shipped behavior) until the q-major wins are on record.
    """
    return "wavefront"


def build_qmajor_bounds(
    num_q_blocks: int,
    num_kv_blocks: int,
    block_q: int,
    block_kv: int,
    s_k: int,
    causal_offset: int | None,
) -> np.ndarray:
    """Per-q-block loop bounds -> int32 [2, num_q_blocks]: row 0 = n_full
    (count of tiles needing no mask), row 1 = n_tot (count of live tiles).

    A tile j is *live* for q block i iff any (row, col) in it is causally
    visible (col <= row + offset); it is *mask-free* iff every pair is
    visible AND it lies fully inside the un-padded s_k. The masked suffix
    [n_full, n_tot) therefore covers both the diagonal band and the ragged
    tail — the reference's full/partial/skip block taxonomy
    (``Phase_3.md:273-322``) expressed as two loop bounds instead of
    per-step meta.
    """
    n_ragged = num_kv_blocks if s_k % block_kv == 0 else num_kv_blocks - 1
    out = np.zeros((2, num_q_blocks), dtype=np.int32)
    for qi in range(num_q_blocks):
        if causal_offset is None:
            n_tot = num_kv_blocks
            n_full = n_ragged
        else:
            # Deepest visible col for the block = its LAST row's limit;
            # a tile is mask-free iff its last col <= the FIRST row's limit.
            max_key = (qi + 1) * block_q - 1 + causal_offset
            if max_key < 0:
                n_tot = n_full = 0
            else:
                n_tot = min(num_kv_blocks, max_key // block_kv + 1)
                min_row_limit = qi * block_q + causal_offset
                n_full = min(max(0, (min_row_limit + 1) // block_kv),
                             n_tot, n_ragged)
        out[0, qi] = n_full
        out[1, qi] = n_tot
    return out


def _qmajor_kernel(
    bounds_ref,  # SMEM (2, num_q_blocks) int32: [n_full; n_tot] per q block
    q_ref,  # (1, 1, bq, D) raw (scaled in-kernel by q_scale)
    k_ref,  # (1, 1, S_k_pad, D) whole sequence, VMEM-resident
    v_ref,  # (1, 1, S_k_pad, D_ext) whole sequence (+ ones col if mxu_l)
    *out_refs,  # o (1, 1, bq, D) [+ lse (1, 1, bq, 1) f32 if need_lse]
    block_q: int,
    block_kv: int,
    causal_offset: int,
    is_causal: bool,
    s_k: int,
    guard_zero_rows: bool,
    mxu_l: bool,
    unroll: int,
    q_scale: float,
    need_lse: bool,
):
    i = pl.program_id(2)
    n_full = bounds_ref[0, i]
    n_tot = bounds_ref[1, i]
    if q_scale:
        q = q_ref[0, 0] * jnp.asarray(q_scale, q_ref.dtype)  # (bq, D)
    else:
        q = q_ref[0, 0]  # (bq, D), pre-scaled host-side
    d_ext = v_ref.shape[-1]
    bsub = block_kv // unroll

    def tile_update(j, carry, masked: bool):
        # One fetched-tile's worth of online softmax, split into `unroll`
        # column bands with ALL QK dots issued up front (band u+1's MXU dot
        # runs under band u's VPU softmax — same overlap trick as the
        # wavefront kernel's unroll_kv).
        base = j * block_kv
        ss = [
            jax.lax.dot_general(
                q, k_ref[0, 0, pl.ds(base + u * bsub, bsub), :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for u in range(unroll)
        ]
        m_run, l_run, acc_run = carry
        for u in range(unroll):
            s = ss[u]
            if masked:
                # One per-row column limit folds the causal threshold and
                # the ragged tail: cols <= min(rows + rthresh, cthresh).
                base_u = base + u * bsub
                rth = (causal_offset + i * block_q - base_u
                       if is_causal else _BIG)
                rows1 = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                limit = jnp.minimum(rows1 + rth, s_k - 1 - base_u)
                cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, bsub), 1)
                mask = cols1 <= limit
                s = jnp.where(mask, s, MASK_VALUE)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_run, m_cur)
            alpha = jnp.exp2(m_run - m_new)
            p = jnp.exp2(s - m_new)
            if masked and guard_zero_rows:
                # Rows with NO visible key (causal cross-attn, S_q > S_k)
                # only ever appear in masked tiles; exp2(MASK - MASK) = 1
                # would pollute l, so zero by the mask directly.
                p = jnp.where(mask, p, 0.0)
            if not mxu_l:
                l_run = alpha * l_run + jnp.sum(p, axis=1, keepdims=True)
            m_run = m_new
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype),
                v_ref[0, 0, pl.ds(base + u * bsub, bsub), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_run = acc_run * alpha + pv
        return m_run, l_run, acc_run

    carry = (
        jnp.full((block_q, 1), MASK_VALUE, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
        jnp.zeros((block_q, d_ext), jnp.float32),
    )
    # Mask-free prefix, then the masked diagonal/tail suffix — dynamic
    # bounds are this kernel's causal pruning (loop-bound truncation, the
    # reference's ``:82``; pruned tiles cost nothing at all).
    carry = jax.lax.fori_loop(
        0, n_full, functools.partial(tile_update, masked=False), carry)
    m, l, acc = jax.lax.fori_loop(
        n_full, n_tot, functools.partial(tile_update, masked=True), carry)

    o_ref = out_refs[0]
    d_out = o_ref.shape[-1]
    if mxu_l:
        l = acc[:, d_out:d_out + 1]
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc[:, :d_out] / l_safe).astype(o_ref.dtype)
    if need_lse:
        lse = (m + jnp.log2(l_safe)) * LN2
        # n_tot == 0 blocks and guarded zero-key rows both surface as
        # l == 0: convention O = 0 (acc never accumulated), LSE = -inf.
        out_refs[1][0, 0] = jnp.where(l == 0.0, -jnp.inf, lse)


def flash_attention_forward_qmajor(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    is_causal: bool,
    scale: float,
    block_sizes: BlockSizes,
    interpret: bool | None,
    debug: bool,
    causal_offset: int,
    need_lse: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Q-major launcher. Internal: called from
    ``flash_fwd.flash_attention_forward``'s impl dispatch (which owns the
    autotune lookup, Q pre-scaling policy and feature gating); semantics
    are identical to the wavefront path for the supported feature set.
    """
    b, hq, s_q, d = q.shape
    _, hkv, s_k, _ = k.shape
    q_per_kv = hq // hkv
    if interpret is None:
        interpret = interpret_default()
    block_sizes = block_sizes.clamp(s_q, s_k)
    bq, bkv = block_sizes.block_q, block_sizes.block_kv

    # Host prescale by default — the measured winner on the wavefront grid
    # too (the in-kernel tile multiply cost more than the saved HBM pass
    # at every point, v5e_sik_ab.jsonl); scale_in_kernel=True opts in.
    sik = bool(block_sizes.scale_in_kernel)
    if sik:
        q_p = pad_to_block(q, 2, bq)
    else:
        q_p = pad_to_block((q * (scale * LOG2E)).astype(q.dtype), 2, bq)
    k_p = pad_to_block(k, 2, bkv)
    v_p = pad_to_block(v, 2, bkv)
    s_q_p, s_k_p = q_p.shape[2], k_p.shape[2]

    # Spare-lane row-sum (see flash_fwd.py): sub-128 D wastes PV output
    # lanes — spend one on l via a ones-column in V.
    mxu_l = d % 128 != 0
    d_ext = d
    if mxu_l:
        d_ext = round_up(d + 1, 128)
        ones = jnp.ones(v_p.shape[:3] + (1,), v_p.dtype)
        zeros = jnp.zeros(v_p.shape[:3] + (d_ext - d - 1,), v_p.dtype)
        v_p = jnp.concatenate([v_p, ones, zeros], axis=-1)

    num_q_blocks = s_q_p // bq
    num_kv_blocks = s_k_p // bkv
    bounds = build_qmajor_bounds(
        num_q_blocks, num_kv_blocks, bq, bkv, s_k,
        causal_offset if is_causal else None)
    guard_zero_rows = is_causal and causal_offset < 0

    unroll = block_sizes.unroll_kv
    if bkv % unroll != 0 or (bkv // unroll) % 128 != 0:
        unroll = 1

    kernel = functools.partial(
        _qmajor_kernel,
        block_q=bq,
        block_kv=bkv,
        causal_offset=causal_offset,
        is_causal=is_causal,
        s_k=s_k,
        guard_zero_rows=guard_zero_rows,
        mxu_l=mxu_l,
        unroll=unroll,
        q_scale=(scale * LOG2E if sik else 0.0),
        need_lse=need_lse,
    )

    def q_index(b_i, h_i, i, *_):
        return (b_i, h_i, i, 0)

    def kv_index(b_i, h_i, i, *_):
        # Constant in i: Mosaic fetches K/V once per (batch, kv head) and
        # elides the copy for every later q tile.
        return (b_i, h_i // q_per_kv, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hq, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_index),
            pl.BlockSpec((1, 1, s_k_p, d), kv_index),
            pl.BlockSpec((1, 1, s_k_p, d_ext), kv_index),
        ],
        out_specs=(
            [pl.BlockSpec((1, 1, bq, d), q_index)]
            + ([pl.BlockSpec((1, 1, bq, 1), q_index)] if need_lse else [])
        ),
        scratch_shapes=[],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((b, hq, s_q_p, d), q.dtype)]
            + ([jax.ShapeDtypeStruct((b, hq, s_q_p, 1), jnp.float32)]
               if need_lse else [])
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        debug=debug,
    )(jnp.asarray(bounds), q_p, k_p, v_p)

    o = outs[0]
    lse = outs[1][..., 0] if need_lse else None
    if s_q_p != s_q:
        o = o[:, :, :s_q, :]
        if need_lse:
            lse = lse[:, :, :s_q]
    return o, lse
