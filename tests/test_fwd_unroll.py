"""KV sub-tile unroll (FLASHATTN_FWD_UNROLL) correctness battery.

The unroll knob is read at TRACE time in the launcher and the jit cache is
keyed on avals/statics only, so each parametrization clears the jit caches
after setting the env (the round-3 bisect measured nothing because it
flipped the env between same-shape calls — ADVICE r3 #2). Covers the three
unroll-specific code paths called out in ADVICE r3 #3: coff-shifted causal/
ragged mask thresholds, segmented sub-tile slicing, and dropout global
column offsets.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu.ops.common import BlockSizes
from flashattn_tpu.ops.flash_fwd import flash_attention_forward
from flashattn_tpu.ops.reference import (
    reference_attention,
    reference_attention_with_lse,
)
from flashattn_tpu.utils.verify import verify_results

from tests.test_flash_fwd import make_qkv


@pytest.fixture(params=[2, 4])
def unroll(request, monkeypatch):
    monkeypatch.setenv("FLASHATTN_FWD_UNROLL", str(request.param))
    jax.clear_caches()
    yield request.param
    monkeypatch.delenv("FLASHATTN_FWD_UNROLL", raising=False)
    jax.clear_caches()


def _bs(unroll):
    # Bands must stay >= 128 columns (MXU lane width).
    return BlockSizes(block_q=128, block_kv=128 * unroll)


@pytest.mark.parametrize("s_q,s_k", [(256, 256), (384, 200), (200, 520)])
def test_unroll_causal_ragged(unroll, s_q, s_k):
    """coff-shifted causal + ragged-tail thresholds vs the jnp oracle."""
    q, k, v = make_qkv(2, 2, 2, s_q, s_k, 64)
    o, lse = flash_attention_forward(q, k, v, is_causal=True,
                                     block_sizes=_bs(unroll))
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=True)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed


def test_unroll_segments(unroll):
    """Segmented sub-tile slicing: seg_k is sliced per band inside the
    kernel; packed ids must mask across band boundaries exactly."""
    s = 512
    q, k, v = make_qkv(1, 2, 2, s, s, 64)
    seg = (jnp.arange(s) // 96).astype(jnp.int32)[None, :]  # ragged vs 128
    o, lse = flash_attention_forward(q, k, v, is_causal=True,
                                     segment_ids=(seg, seg),
                                     block_sizes=_bs(unroll))
    o_ref, lse_ref = reference_attention_with_lse(
        q, k, v, is_causal=True, segment_ids=(seg, seg))
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed


def test_unroll_window(unroll):
    """Sliding-window left edge shifts by the band offset (coff)."""
    s = 512
    q, k, v = make_qkv(1, 2, 2, s, s, 64)
    o, _ = flash_attention_forward(q, k, v, is_causal=True, window=160,
                                   block_sizes=_bs(unroll))
    o_ref = reference_attention(q, k, v, is_causal=True, window=160)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed


def test_unroll_alibi(unroll):
    """ALiBi distance uses the global column = kj*block_kv + coff + iota."""
    s = 384
    q, k, v = make_qkv(1, 4, 4, s, s, 64)
    o, _ = flash_attention_forward(q, k, v, is_causal=True, alibi=True,
                                   block_sizes=_bs(unroll))
    o_ref = reference_attention(q, k, v, is_causal=True, alibi=True)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed


def test_unroll_dropout_matches_unrolled_1(unroll):
    """Dropout keep mask is keyed on GLOBAL (row, col): the unrolled kernel
    must reproduce the unroll=1 pattern bit-for-bit (only the band split's
    summation order may differ)."""
    s = 512
    q, k, v = make_qkv(1, 2, 2, s, s, 64)
    bs = _bs(unroll)
    o_u, lse_u = flash_attention_forward(
        q, k, v, is_causal=True, dropout_rate=0.3, dropout_seed=7,
        block_sizes=bs)
    os.environ["FLASHATTN_FWD_UNROLL"] = "1"
    jax.clear_caches()
    try:
        o_1, lse_1 = flash_attention_forward(
            q, k, v, is_causal=True, dropout_rate=0.3, dropout_seed=7,
            block_sizes=bs)
    finally:
        os.environ["FLASHATTN_FWD_UNROLL"] = str(unroll)
        jax.clear_caches()
    assert verify_results(o_1, o_u, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_1, lse_u, atol=1e-5, rtol=1e-5).passed


def test_unroll_via_block_sizes():
    """unroll_kv as a first-class BlockSizes field (no env): the autotuned /
    shipped winner path."""
    q, k, v = make_qkv(2, 2, 2, 384, 520, 64)
    bs = BlockSizes(block_q=128, block_kv=256, unroll_kv=2)
    o, lse = flash_attention_forward(q, k, v, is_causal=True, block_sizes=bs)
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=True)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed
