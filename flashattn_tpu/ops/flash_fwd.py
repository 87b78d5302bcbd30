"""Pallas TPU flash-attention forward kernel.

TPU-native re-design of the reference forward kernel
(``code/_flash_attention_kernel_optimized.py:34-129``): one grid step per
[block_q, D] query tile per (batch, head), streaming K/V in [block_kv, D]
tiles with online-softmax running stats (m, l, acc) kept in VMEM scratch —
the running-stat update rules are the reference's ``:106-117`` — with the
exp2 rescaling trick (``:79,108-109``), fp32 accumulation with a bf16 cast
feeding the MXU (``:112-115``), causal loop pruning + conditional in-tile
masking (``:82,98-103``), and LSE = (m + log2 l)·ln2 write-back (``:126-129``).

Idiom differences from the Triton original (this is NOT a port):
  - The K/V streaming loop is the innermost ("arbitrary") grid dimension;
    Pallas/Mosaic double-buffers the HBM->VMEM tile fetches automatically via
    BlockSpec index maps — the TPU analogue of the reference's
    TensorDescriptor/TMA path (``My_FlashAttention_optimized.py:29-51``).
  - Causal pruning does not shorten the grid (TPU grids are rectangular);
    instead the K/V index map CLAMPS skipped steps onto the last needed
    block — Pallas skips re-fetch when consecutive block indices are equal,
    so pruned steps cost neither DMA nor MXU work (compute is @pl.when-gated).
  - Ragged tails are handled with statically-elided iota masks instead of
    ``padding="zero"`` descriptors.
  - GQA/MQA: the K/V index maps fold the q-head -> kv-head mapping, which the
    reference (H_q == H_kv only) does not support.
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
    cdiv,
    interpret_default,
    pad_to_block,
    round_up,
)


def _fwd_kernel(
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_kv, D)
    v_ref,  # (1, 1, block_kv, D)
    o_ref,  # (1, 1, block_q, D)
    lse_ref,  # (1, 1, block_q, 1)
    m_scratch,  # (block_q, 128) f32
    l_scratch,  # (block_q, 128) f32
    acc_scratch,  # (block_q, D) f32
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

    causal_offset = s_k - s_q  # query i may attend keys j <= i + offset

    @pl.when(kj == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, MASK_VALUE)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    if is_causal:
        # Last key index visible to ANY query row in this q tile.
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
        q = q_ref[0, 0]  # (block_q, D)
        k = k_ref[0, 0]  # (block_kv, D)
        # S tile in log2 domain: (q·kᵀ)·scale·log2(e), fp32 on the MXU.
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)

        # In-tile masking, statically elided when provably unnecessary
        # (full-visible blocks skip the mask — reference Phase_3.md:273-322).
        mask = None
        if is_causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            row_g = rows + qi * block_q
            col_g = cols + kj * block_kv
            causal_mask = col_g <= row_g + causal_offset
            # Only the diagonal band actually needs it; gate on traced kj.
            need = (kj + 1) * block_kv - 1 > qi * block_q + causal_offset
            mask = causal_mask | jnp.logical_not(need)
        if s_k % block_kv != 0:
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            pad_mask = cols + kj * block_kv < s_k
            mask = pad_mask if mask is None else (mask & pad_mask)
        if mask is not None:
            s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scratch[:, :1]  # (block_q, 1)
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)  # (block_q, block_kv) f32
        if is_causal and causal_offset < 0:
            # Zero-key rows (causal cross-attn, S_q > S_k): all-masked rows
            # would get p = exp2(0) = 1; force 0 (convention: O=0, LSE=-inf).
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
            valid = rows + (qi * block_q + causal_offset) >= 0
            p = jnp.where(valid, p, 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

        v = v_ref[0, 0]  # (block_kv, D)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),  # bf16 into the MXU (reference :112-115)
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(kj == last_kj)
    def _finalize():
        m = m_scratch[:, :1]
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o = acc_scratch[...] / l_safe
        o_ref[0, 0] = o.astype(o_ref.dtype)
        # LSE in natural-log units: ln Σ exp(s·scale) = (m + log2 l)·ln2.
        # Stored [.., S, 1] so row stats stay sublane-aligned in VMEM.
        lse = (m + jnp.log2(l_safe)) * LN2
        if is_causal and causal_offset < 0:
            lse = jnp.where(l == 0.0, -jnp.inf, lse)
        lse_ref[0, 0] = lse


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_causal",
        "scale",
        "block_sizes",
        "interpret",
        "debug",
    ),
)
def flash_attention_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    is_causal: bool = False,
    scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
    debug: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused flash-attention forward.

    TPU analogue of the reference launcher
    (``My_FlashAttention_optimized.py:14-60``): allocates O in the input
    dtype and LSE in fp32, grid = (B, H, ceil(S_q/block_q), ceil(S_k/block_kv)).

    Args:
      q: [B, Hq, S_q, D]; k, v: [B, Hkv, S_k, D] with Hkv | Hq (GQA).

    Returns:
      (O [B, Hq, S_q, D] in q.dtype, LSE [B, Hq, S_q] fp32, natural log).
    """
    b, hq, s_q, d = q.shape
    _, hkv, s_k, dk = k.shape
    assert v.shape == k.shape, (v.shape, k.shape)
    assert dk == d, "q/k head_dim mismatch"
    assert hq % hkv == 0, f"Hq={hq} must be a multiple of Hkv={hkv}"
    q_per_kv = hq // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = interpret_default()
    if block_sizes is None:
        block_sizes = BlockSizes()
    block_sizes = block_sizes.clamp(s_q, s_k)
    bq, bkv = block_sizes.block_q, block_sizes.block_kv

    q_p = pad_to_block(q, 2, bq)
    k_p = pad_to_block(k, 2, bkv)
    v_p = pad_to_block(v, 2, bkv)
    s_q_p, s_k_p = q_p.shape[2], k_p.shape[2]
    num_q_blocks = s_q_p // bq
    num_kv_blocks = s_k_p // bkv

    causal_offset = s_k - s_q

    def kv_index(b_i, h_i, q_i, kv_i):
        if is_causal:
            # Clamp pruned steps onto the last needed block: equal consecutive
            # block indices => Pallas skips the HBM->VMEM re-fetch.
            max_key = (q_i + 1) * bq - 1 + causal_offset
            last = jnp.minimum(
                num_kv_blocks - 1, jnp.maximum(max_key, 0) // bkv
            )
            kv_i = jnp.minimum(kv_i, last)
        return (b_i, h_i // q_per_kv, kv_i, 0)

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        is_causal=is_causal,
        s_q=s_q,
        s_k=s_k,
        block_q=bq,
        block_kv=bkv,
        num_kv_blocks=num_kv_blocks,
    )

    grid = (b, hq, num_q_blocks, num_kv_blocks)
    out_shape = [
        jax.ShapeDtypeStruct((b, hq, s_q_p, d), q.dtype),
        jax.ShapeDtypeStruct((b, hq, s_q_p, 1), jnp.float32),
    ]
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq, d), lambda b_i, h_i, q_i, kv_i: (b_i, h_i, q_i, 0)
            ),
            pl.BlockSpec((1, 1, bkv, d), kv_index),
            pl.BlockSpec((1, 1, bkv, d), kv_index),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, bq, d), lambda b_i, h_i, q_i, kv_i: (b_i, h_i, q_i, 0)
            ),
            pl.BlockSpec(
                (1, 1, bq, 1), lambda b_i, h_i, q_i, kv_i: (b_i, h_i, q_i, 0)
            ),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        debug=debug,
    )(q_p, k_p, v_p)

    lse = lse[..., 0]
    if s_q_p != s_q:
        o = o[:, :, :s_q, :]
        lse = lse[:, :, :s_q]
    return o, lse
