"""Shared helpers for the Pallas attention kernels."""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp

# Large-negative logit used for masking instead of -inf so that
# (masked - m) subtraction never produces NaN. Same trick as production TPU
# flash kernels; the reference uses float('-inf') on GPU
# (_flash_attention_kernel_optimized.py:101) which Mosaic handles less well.
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def interpret_default() -> bool:
    """Run Pallas kernels in interpreter mode when not on TPU.

    Lets the full test suite run on the CPU backend (8 virtual devices)
    while the same code compiles via Mosaic on real TPU chips.
    FLASHATTN_TPU_INTERPRET=1/0 overrides (e.g. CPU-mesh dryruns in a
    process whose default backend is the TPU plugin).
    """
    env = os.environ.get("FLASHATTN_TPU_INTERPRET")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "tpu"


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile sizes for the attention kernels — the TPU analogue of the
    reference's autotune config space (BLOCK_M/BLOCK_N at
    _flash_attention_kernel_optimized.py:18-32). TPU tiles are MXU-shaped:
    multiples of 128 lanes / 8 sublanes, so defaults are 128-512 rather than
    the GPU's 32/64."""

    block_q: int = 1024
    block_kv: int = 1024
    # Backward tiles (bwd has higher VMEM pressure, like the reference's
    # separately-tuned bwd configs, Phase_5.md:160-162).
    block_q_dq: int = 1024
    block_kv_dq: int = 1024
    block_q_dkv: int = 1024
    block_kv_dkv: int = 1024
    # Fused one-kernel backward tiles (flash_bwd_fused.py): the resident
    # dK/dV accumulators dominate VMEM, so its score tiles tune separately.
    block_q_fused: int = 1024
    block_kv_fused: int = 1024

    def clamp(self, s_q: int, s_k: int) -> "BlockSizes":
        """Shrink tiles to the (padded) problem size."""

        def fit(b: int, s: int) -> int:
            return max(8, min(b, round_up(s, 128)))

        return BlockSizes(
            block_q=fit(self.block_q, s_q),
            block_kv=fit(self.block_kv, s_k),
            block_q_dq=fit(self.block_q_dq, s_q),
            block_kv_dq=fit(self.block_kv_dq, s_k),
            block_q_dkv=fit(self.block_q_dkv, s_q),
            block_kv_dkv=fit(self.block_kv_dkv, s_k),
            block_q_fused=fit(self.block_q_fused, s_q),
            block_kv_fused=fit(self.block_kv_fused, s_k),
        )


def fp8e4m3_to_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """fp8 (e4m3fn) -> bf16 via integer ops, for use INSIDE kernels.

    Mosaic lowers the native fp8->bf16 convert through a slow element-wise
    path that makes fp8 KV decode ~10x slower than int8 (measured v5e); the
    e4m3fn layout maps onto bf16 with two shifts + an exponent re-bias
    (7 -> 127), which the VPU does at full rate. Exact for normals, sign,
    zero; subnormals flush to zero (max abs err 2^-6 ≈ 0.002 % of the e4m3
    range — far below KV quantization noise); NaN (0x7f) maps to a large
    finite value, which the quantizer never emits.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    sign = (u & 0x80) << 8
    mag = u & 0x7F
    bits = sign | ((mag << 4) + (120 << 7))  # exp re-bias into bf16 position
    bits = jnp.where(mag < 8, sign, bits)  # exp field 0: zero/subnormal
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16
    )


def fp8e4m3_to_bf16_fast(x: jnp.ndarray) -> jnp.ndarray:
    """fp8 (e4m3fn) -> bf16 WITHOUT the subnormal/zero select: the decode
    kernels' hot path.

    Same shift+re-bias as `fp8e4m3_to_bf16` minus the `where` (compare +
    select are 2 of the ~8 VPU ops and measurably gate decode: v5e fp8 KV
    streaming at S=32k improves 507 -> 604 GB/s). Codes with exp field 0
    (zero + subnormals, |x| <= 7/512) decode to 2^-7·(1 + m/8) instead of
    m·2^-9 — an absolute error < 2^-7, i.e. < 1.8e-5 of the e4m3 range,
    ~400x below int8-KV's accepted per-token quantization step (1/127).
    The exact variant remains the host-side dequant oracle; the ppl gate
    (fp8 within 0.1 of bf16) covers this path end-to-end.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    sign = (u & 0x80) << 8
    mag = u & 0x7F
    bits = sign | ((mag << 4) + (120 << 7))
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16
    )


def fp8e4m3_to_bf16_pair(x: jnp.ndarray) -> jnp.ndarray:
    """fp8 (e4m3fn) -> bf16 converting TWO bytes per i32 lane.

    Same numerics as `fp8e4m3_to_bf16_fast` (subnormal-select-free), but the
    byte pair [b1 b0] rides one i32 lane and both halves convert with shared
    masked ops — ~11 VPU ops per TWO elements instead of ~7 per one:

        m   = (v & 0x7F) | ((v & 0x7F00) << 8)        # both mantissa+exp
        me  = (m << 4) + 0x3C003C00                    # re-bias; no carry
        s   = ((v << 8) | (v << 16)) & 0x80008000      # both signs
        out = me | s                                   # i32 = two bf16

    The +0x3C00 per half cannot carry into the upper half (max half value
    0x43F0 < 0x10000). The final bitcast i32 -> (2, bf16) is little-endian,
    matching the little-endian u16 load, so element order is preserved.
    Candidate for the fp8 decode hot path (VPU-bound at 74 % HBM SoL);
    selected via the `pair_fp8` kernel flag after TPU A/B.
    """
    assert x.shape[-1] % 2 == 0, x.shape
    pair_shape = x.shape[:-1] + (x.shape[-1] // 2, 2)
    v = jax.lax.bitcast_convert_type(
        x.reshape(pair_shape), jnp.uint16).astype(jnp.int32)
    m = (v & 0x7F) | ((v & 0x7F00) << 8)
    me = (m << 4) + 0x3C003C00
    s = ((v << 8) | (v << 16)) & jnp.int32(-2147450880)  # 0x80008000
    out = me | s
    return jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(x.shape)


def fp8_decode_convert(x: jnp.ndarray) -> jnp.ndarray:
    """The fp8->bf16 converter used on the decode hot path.

    `fp8e4m3_to_bf16_pair` is bit-identical to `fp8e4m3_to_bf16_fast` (see
    tests/test_quant_ppl.py) — this switch exists only to A/B the Mosaic
    lowering on real hardware: FLASHATTN_FP8_PAIR=1 selects the pair path
    (default stays the proven per-byte path until the TPU A/B lands).
    """
    import os

    if os.environ.get("FLASHATTN_FP8_PAIR", "0") == "1":
        return fp8e4m3_to_bf16_pair(x)
    return fp8e4m3_to_bf16_fast(x)


def dropout_keep_mask(seed, bh, row_ids, col_ids, rate: float):
    """Counter-based dropout keep-mask, shared by fwd and both bwd kernels.

    TPU-native realization of the reference's deferred Philox design
    (``Phase_6.md:54-114``): the mask is a pure function of
    (seed, batch·head, GLOBAL row, GLOBAL col), so forward and backward
    regenerate bit-identical masks without storing them — and because the
    hash keys on global coordinates (not block indices), the backward may
    even use different tile sizes than the forward.

    Args:
      seed: int32 scalar (traced).
      bh: int32 scalar — flattened batch*H + q-head index.
      row_ids: (bq, 1) int32 global query positions.
      col_ids: (1, bkv) int32 global key positions.
      rate: static drop probability in [0, 1).

    Returns:
      (bq, bkv) bool — True = keep.
    """
    import numpy as np  # local: keep module import surface minimal

    u32 = jnp.uint32
    x = row_ids.astype(u32) * np.uint32(0x9E3779B1)
    y = col_ids.astype(u32) * np.uint32(0x85EBCA77)
    h = x ^ y
    h = h ^ (seed.astype(u32) + bh.astype(u32) * np.uint32(0x27D4EB2F))
    # xxhash-style avalanche: two multiply-xorshift rounds.
    h = h ^ (h >> 15)
    h = h * np.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    h = h * np.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    threshold = np.uint32(int(rate * 4294967296.0))
    return h >= threshold


def pad_to_block(x: jnp.ndarray, axis: int, block: int) -> jnp.ndarray:
    """Zero-pad `axis` of x up to a multiple of `block`."""
    size = x.shape[axis]
    pad = round_up(size, block) - size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)
