"""Rectangular-grid Pallas TPU flash-attention forward ("grid4").

Second forward grid shape (besides the wavefront in ``flash_fwd.py``; an
in-kernel-loop "q-major" variant was built and deleted in round 5 after
losing every A/B — records in ``v5e_qmajor_sweep.jsonl``): a plain
rectangular
``(B, H, num_q_blocks, num_kv_blocks)`` grid with **pure-arithmetic index
maps** — the reference's own launch geometry
(``My_FlashAttention_optimized.py:53`` — CTA grid over q tiles with the kv
loop as the minor axis) and jax_flash's.

Why a third grid: the round-5 honest-timing matrix showed jax_flash
leading causal pure-fwd at nearly every S (e.g. 89.8 vs 73.4 TF at
S=2048), and the per-step cost decomposition put our wavefront at
~1.7 us/live-step of overhead vs their ~0.7. The wavefront's strength —
zero grid steps for pruned tiles — is bought with a scalar-prefetched
meta array that every BlockSpec index map and the kernel body must read
(~10+ SMEM scalar loads per grid step on the sequential core). Here
causal pruning is instead:

  - dead programs (tiles past the diagonal) are ``pl.when``-skipped whole:
    no compute, and their K/V "fetch" is index-map-clamped to the row's
    last live tile, which Mosaic's revolving buffers elide as a no-op;
  - index arithmetic (first/last/diagonal tests, mask thresholds) is plain
    integer math on ``program_id`` — no meta array anywhere.

The kernel BODY keeps this repo's measured wins: KV sub-tile unroll bands
(band u+1's MXU dot under band u's VPU softmax), predicated first-touch
accumulator write-through for shallow rows, the spare-lane row-sum
(``mxu_l``) at D<128, host Q prescale, and the optional no-LSE output
(``need_lse=False``) for pure-forward calls.

Feature gate (dispatcher falls back to the wavefront otherwise): causal /
non-causal, GQA/MQA, static pos_offset, ragged tails, zero-visible-row
guard. Windows/ALiBi/soft-cap/dropout/segments stay on the wavefront,
whose meta machinery exists precisely to prune those patterns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
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


def grid4_supported(
    *,
    segmented: bool,
    windowed: bool,
    softcap: bool,
    alibi: bool,
    dropout: bool,
    dynamic_offset: bool,
) -> bool:
    return not (segmented or windowed or softcap or alibi or dropout
                or dynamic_offset)


def grid4_auto(s_q: int, s_k: int, d: int, is_causal: bool,
               block_q: int, block_kv: int) -> str:
    """Measured-defaults grid-shape choice for untuned keys (autotuned
    winners override via BlockSizes.fwd_impl).

    v5e round-5 A/B (v5e_grid4_sweep.jsonl, slope timing via the public
    primal): grid4 wins the SINGLE-KV-FETCH regime decisively — causal
    D=128 S=1024 79.5 vs 72.0 TF, S=2048 83.3 vs 74.7 — because the
    whole q-row runs as one meta-free program; with multiple kv steps its
    rectangular dead programs cost ~1 us each and the wavefront's pruned
    grid wins (S=4096 99.2 vs 81.0, S=16384 133.7 vs 114.6). Whole-row-K
    tiles at deeper S lose to masked waste (64 TF @4096). So: grid4 iff
    causal and the resolved kv tile covers the whole key sequence.
    """
    if is_causal and round_up(s_k, 128) <= block_kv:
        return "grid4"
    return "wavefront"


def _grid4_kernel(
    q_ref,  # (1, hf, bq, D), pre-scaled by scale*log2(e) host-side
    k_ref,  # (1, kv_h, bkv, D)
    v_ref,  # (1, kv_h, bkv, D_ext)
    *out_refs,  # o (1, hf, bq, D) [+ lse (1, hf, bq, 1) f32 if need_lse]
    scratch,  # [m, (l,), acc] VMEM — trailing scratch refs
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    causal_offset: int,
    is_causal: bool,
    s_k: int,
    guard_zero_rows: bool,
    mxu_l: bool,
    acc_writethrough: bool,
    unroll: int,
    need_lse: bool,
    h_fuse: int = 1,
    q_per_kv: int = 1,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    o_ref = out_refs[0]
    if mxu_l:
        m_scratch, acc_scratch = scratch
        l_scratch = None
    else:
        m_scratch, l_scratch, acc_scratch = scratch
    # Head fusion (h_fuse > 1): scratches grow a leading head axis and the
    # body/finalize run a python-unrolled head loop — per-program pipeline
    # cost (the measured residual vs jax_flash at mid-S; see the pair-grid
    # negative result in flash_fwd.py) amortizes over h_fuse heads, and
    # under GQA all q heads of one kv group ride a single K/V fetch.
    # h_fuse == 1 keeps the exact pre-fusion code shape (2-D scratches).
    heads = range(h_fuse)

    def hix(hh):
        return ... if h_fuse == 1 else hh

    if is_causal:
        # Row block i's deepest visible column (global): i*bq + off + bq-1.
        last_j = jnp.maximum(
            (i * block_q + causal_offset + block_q - 1) // block_kv, -1)
        last_j = jnp.minimum(last_j, num_kv_blocks - 1)
        live = j <= last_j
        # Tile fully visible iff its last column <= the FIRST row's limit.
        full = (j + 1) * block_kv - 1 <= i * block_q + causal_offset
    else:
        last_j = num_kv_blocks - 1
        live = True
        full = True
    ragged = s_k % block_kv != 0
    if ragged:
        full = full & (j < num_kv_blocks - 1)

    @pl.when(j == 0)
    def _init():
        # FULL-LANE stats (the jax_flash trick this kernel adopts): m and l
        # live lane-replicated as (bq, 128) and every read/store is a
        # full-register op. Sub-lane [:, :1] slice updates — the wavefront
        # kernel's layout — lower to masked VPU stores that cost real time
        # per step (grid-shape A/Bs could not close the gap until the stat
        # layout changed).
        m_scratch[...] = jnp.full(m_scratch.shape, MASK_VALUE, jnp.float32)
        if not mxu_l:
            l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        if not acc_writethrough:
            acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    assert block_kv % unroll == 0, (block_kv, unroll)
    bsub = block_kv // unroll

    def update_head(hh: int, masked: bool):
        hi = hix(hh)
        khh = hh // q_per_kv  # kv head within the fused fetch
        q = q_ref[0, hh]  # (bq, D)
        ss = [
            jax.lax.dot_general(
                q, k_ref[0, khh, u * bsub:(u + 1) * bsub, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for u in range(unroll)
        ]
        for u in range(unroll):
            s = ss[u]
            mask = None
            if masked:
                # One per-row column limit folds causal + ragged tail.
                base_u = j * block_kv + u * bsub
                rth = (causal_offset + i * block_q - base_u
                       if is_causal else jnp.int32(2**30))
                rows1 = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                limit = jnp.minimum(rows1 + rth, s_k - 1 - base_u)
                cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, bsub), 1)
                mask = cols1 <= limit
                s = jnp.where(mask, s, MASK_VALUE)
            m_prev = m_scratch[hi]  # (bq, 128) lane-replicated
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_new)  # (bq, 128)
            p = jnp.exp2(s - jnp.tile(m_new, (1, bsub // 128))
                         if bsub != 128 else s - m_new)
            if masked and guard_zero_rows:
                # Rows with no visible key at all: exp2(MASK-MASK)=1 would
                # pollute l; zero by the mask (such rows are all-masked in
                # every tile they appear in).
                p = jnp.where(mask, p, 0.0)
            if not mxu_l:
                l_scratch[hi] = (alpha * l_scratch[hi]
                                 + jnp.sum(p, axis=1, keepdims=True))
            m_scratch[hi] = m_new
            v = v_ref[0, khh, u * bsub:(u + 1) * bsub, :]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d_acc = acc_scratch.shape[-1]
            alpha_d = (alpha[:, :d_acc] if d_acc <= 128
                       else jnp.tile(alpha, (1, d_acc // 128)))
            if acc_writethrough and u == 0:
                @pl.when(j == 0)
                def _wt():
                    acc_scratch[hi] = pv

                @pl.when(j > 0)
                def _rmw():
                    acc_scratch[hi] = acc_scratch[hi] * alpha_d + pv
            else:
                acc_scratch[hi] = acc_scratch[hi] * alpha_d + pv

    def update(masked: bool):
        for hh in heads:
            update_head(hh, masked)

    # ONE predicated body (jax_flash's shape): causal programs mask every
    # live tile instead of branching full/partial — the dual pl.when pair
    # doubled the body and measurably inhibited Mosaic's cross-step
    # pipelining, costing more than the ~2 VPU ops/element the mask adds.
    if is_causal or ragged:
        @pl.when(live)
        def _update_live():
            update(masked=True)
    else:
        update(masked=False)  # non-causal, aligned: nothing to mask

    @pl.when(j == jnp.maximum(last_j, 0))
    def _finalize():
        d_out = o_ref.shape[-1]
        for hh in heads:
            if h_fuse == 1:
                m = m_scratch[:, :1]
                acc = acc_scratch
                l = (acc_scratch[:, d_out:d_out + 1] if mxu_l
                     else l_scratch[:, :1])  # once per row: slice is fine
            else:
                m = m_scratch[hh, :, :1]
                acc = acc_scratch[hh]
                l = (acc_scratch[hh, :, d_out:d_out + 1] if mxu_l
                     else l_scratch[hh, :, :1])
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, hh] = (acc[..., :d_out] / l_safe).astype(o_ref.dtype)
            if need_lse:
                lse = (m + jnp.log2(l_safe)) * LN2
                if guard_zero_rows:
                    lse = jnp.where(l == 0.0, -jnp.inf, lse)
                out_refs[1][0, hh] = lse
    # guard_zero_rows note: a row block with NO visible keys has
    # last_j == -1; its only executed predicate is max(last_j, 0) == 0 at
    # j == 0, where init has set m = MASK, l = 0 (and write-through never
    # fired, so acc is stale) — the l == 0 selects write O via l_safe = 1
    # on acc… acc must be zero then: write-through mode skips the zeroing
    # init, so force it for such shapes at the launcher (guard_zero_rows
    # disables acc_writethrough).


def flash_attention_forward_grid4(
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
    """grid4 launcher — called from flash_fwd.flash_attention_forward's
    impl dispatch; semantics identical to the wavefront for the supported
    feature set."""
    b, hq, s_q, d = q.shape
    _, hkv, s_k, _ = k.shape
    q_per_kv = hq // hkv
    if interpret is None:
        interpret = interpret_default()
    block_sizes = block_sizes.clamp(s_q, s_k)
    bq, bkv = block_sizes.block_q, block_sizes.block_kv

    pre = scale * LOG2E
    q_p = pad_to_block((q * pre).astype(q.dtype), 2, bq)
    k_p = pad_to_block(k, 2, bkv)
    v_p = pad_to_block(v, 2, bkv)
    s_q_p, s_k_p = q_p.shape[2], k_p.shape[2]

    mxu_l = d % 128 != 0
    d_ext = d
    if mxu_l:
        d_ext = round_up(d + 1, 128)
        ones = jnp.ones(v_p.shape[:3] + (1,), v_p.dtype)
        zeros = jnp.zeros(v_p.shape[:3] + (d_ext - d - 1,), v_p.dtype)
        v_p = jnp.concatenate([v_p, ones, zeros], axis=-1)

    nq = s_q_p // bq
    nkv = s_k_p // bkv
    guard_zero_rows = is_causal and causal_offset < 0

    unroll = block_sizes.unroll_kv
    if bkv % unroll != 0 or (bkv // unroll) % 128 != 0:
        unroll = 1

    # Head fusion (BlockSizes.fwd_h_fuse): silently off when the head
    # counts don't divide — a tuned h_fuse winner must not break other
    # head layouts at the same seq/depth key.
    hf = max(1, block_sizes.fwd_h_fuse)
    if hq % hf != 0 or not (q_per_kv % hf == 0 or hf % q_per_kv == 0):
        hf = 1
    kv_h = hf // q_per_kv if hf > q_per_kv else 1

    # Same measured accumulator policy as the wavefront: write-through for
    # shallow rows, zero-once + unconditional RMW for deep ones. Zero-key
    # rows need acc zeroed at init (their finalize reads it unwritten).
    if is_causal:
        live_steps = sum(
            max(0, min((qi * bq + causal_offset + bq - 1) // bkv, nkv - 1)
                + 1)
            for qi in range(nq))
    else:
        live_steps = nq * nkv
    acc_writethrough = live_steps <= 2 * nq and not guard_zero_rows

    kernel = functools.partial(
        _grid4_kernel,
        block_q=bq,
        block_kv=bkv,
        num_kv_blocks=nkv,
        causal_offset=causal_offset,
        is_causal=is_causal,
        s_k=s_k,
        guard_zero_rows=guard_zero_rows,
        mxu_l=mxu_l,
        acc_writethrough=acc_writethrough,
        unroll=unroll,
        need_lse=need_lse,
        h_fuse=hf,
        q_per_kv=q_per_kv,
    )

    def q_index(b_i, h_i, i, j):
        return (b_i, h_i, i, 0)

    def kv_index(b_i, h_i, i, j):
        if is_causal:
            # Clamp dead programs' fetch to the row's last live tile: the
            # index repeats, so Mosaic elides the copy entirely.
            last_j = jnp.clip(
                (i * bq + causal_offset + bq - 1) // bkv, 0, nkv - 1)
            j = jnp.minimum(j, last_j)
        # h_i counts q-head BLOCKS of hf heads; the matching kv block of
        # kv_h heads is (h_i·hf) // q_per_kv in units of kv_h.
        return (b_i, (h_i * hf) // (q_per_kv * kv_h), j, 0)

    out_specs = [pl.BlockSpec((1, hf, bq, d), q_index)]
    out_shape = [jax.ShapeDtypeStruct((b, hq, s_q_p, d), q.dtype)]
    if need_lse:
        out_specs.append(pl.BlockSpec((1, hf, bq, 1), q_index))
        out_shape.append(
            jax.ShapeDtypeStruct((b, hq, s_q_p, 1), jnp.float32))

    def _sh(*dims):
        return dims if hf == 1 else (hf,) + dims

    scratch_shapes = (
        [pltpu.VMEM(_sh(bq, 128), jnp.float32),
         pltpu.VMEM(_sh(bq, d_ext), jnp.float32)]
        if mxu_l else
        [pltpu.VMEM(_sh(bq, 128), jnp.float32),
         pltpu.VMEM(_sh(bq, 128), jnp.float32),
         pltpu.VMEM(_sh(bq, d), jnp.float32)]
    )

    def kernel_entry(q_ref, k_ref, v_ref, *rest):
        n_out = 2 if need_lse else 1
        return kernel(q_ref, k_ref, v_ref, *rest[:n_out],
                      scratch=rest[n_out:])

    outs = pl.pallas_call(
        kernel_entry,
        grid=(b, hq // hf, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, hf, bq, d), q_index),
            pl.BlockSpec((1, kv_h, bkv, d), kv_index),
            pl.BlockSpec((1, kv_h, bkv, d_ext), kv_index),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        debug=debug,
    )(q_p, k_p, v_p)

    o = outs[0]
    lse = outs[1][..., 0] if need_lse else None
    if s_q_p != s_q:
        o = o[:, :, :s_q, :]
        if need_lse:
            lse = lse[:, :, :s_q]
    return o, lse
