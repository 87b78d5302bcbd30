"""Oracle + cross-grid tests for the q-major forward kernel
(flash_fwd_qmajor.py): same config sampling as the wavefront suite
(causal x non-causal, S_q != S_k, ragged non-multiples, GQA — reference
Phase_3.md:259-263), plus exact wavefront/q-major agreement and the
dispatch gating rules."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.ops.common import BlockSizes
from flashattn_tpu.ops.flash_fwd import flash_attention_forward
from flashattn_tpu.ops.flash_fwd_qmajor import (
    build_qmajor_bounds,
    qmajor_supported,
)
from flashattn_tpu.ops.reference import reference_attention_with_lse
from flashattn_tpu.utils.verify import verify_results

QM = BlockSizes(block_q=128, block_kv=128, fwd_impl="qmajor")
WF = BlockSizes(block_q=128, block_kv=128, fwd_impl="wavefront")


def make_qkv(b, hq, hkv, s_q, s_k, d, dtype=jnp.float32, seed=7):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(kq, (b, hq, s_q, d), dtype)
    k = jax.random.normal(kk, (b, hkv, s_k, d), dtype)
    v = jax.random.normal(kv, (b, hkv, s_k, d), dtype)
    return q, k, v


@pytest.mark.parametrize("is_causal", [False, True])
@pytest.mark.parametrize(
    "s_q,s_k",
    [
        (256, 256),
        (128, 384),  # cross-attention, S_q < S_k
        (384, 128),  # S_q > S_k: zero-visible-key rows under causal
        (200, 200),  # ragged tails
        (256, 200),
    ],
)
def test_qmajor_matches_oracle(is_causal, s_q, s_k):
    q, k, v = make_qkv(2, 2, 2, s_q, s_k, 64)
    o, lse = flash_attention_forward(q, k, v, is_causal=is_causal,
                                     block_sizes=QM)
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=is_causal)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed


@pytest.mark.parametrize("d", [64, 128])  # d=64 exercises the mxu_l lane
def test_qmajor_head_dims(d):
    q, k, v = make_qkv(1, 2, 2, 256, 256, d)
    o, lse = flash_attention_forward(q, k, v, is_causal=True, block_sizes=QM)
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=True)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed


@pytest.mark.parametrize("hq,hkv", [(4, 2), (4, 1)])
def test_qmajor_gqa_mqa(hq, hkv):
    q, k, v = make_qkv(1, hq, hkv, 256, 256, 64)
    o, lse = flash_attention_forward(q, k, v, is_causal=True, block_sizes=QM)
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=True)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed


@pytest.mark.parametrize("unroll", [1, 2])
@pytest.mark.parametrize("pos_offset", [-64, 0, 64])
def test_qmajor_pos_offset_and_unroll(pos_offset, unroll):
    """Ring/context-parallel alignment override: q-major must agree with
    the wavefront (whose pos_offset algebra the ring suites validate
    end-to-end) at shard-style offsets, including unroll bands."""
    bs = dataclasses.replace(QM, block_kv=256, unroll_kv=unroll)
    wf = dataclasses.replace(bs, fwd_impl="wavefront")
    q, k, v = make_qkv(1, 2, 2, 256, 512, 64)
    o, lse = flash_attention_forward(q, k, v, is_causal=True, block_sizes=bs,
                                     pos_offset=pos_offset)
    o_ref, lse_ref = flash_attention_forward(
        q, k, v, is_causal=True, block_sizes=wf, pos_offset=pos_offset)
    assert verify_results(o_ref, o, atol=1e-6, rtol=1e-6).passed
    assert verify_results(lse_ref, lse, atol=1e-6, rtol=1e-6).passed


@pytest.mark.parametrize("is_causal", [False, True])
def test_qmajor_wavefront_bitwise_agreement(is_causal):
    """Both grids run the same online-softmax algebra tile-by-tile in the
    same order -> identical fp32 results (not merely close)."""
    q, k, v = make_qkv(1, 2, 2, 384, 384, 64)
    o_qm, lse_qm = flash_attention_forward(q, k, v, is_causal=is_causal,
                                           block_sizes=QM)
    o_wf, lse_wf = flash_attention_forward(q, k, v, is_causal=is_causal,
                                           block_sizes=WF)
    np.testing.assert_allclose(np.asarray(o_qm), np.asarray(o_wf),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_qm), np.asarray(lse_wf),
                               rtol=1e-6, atol=1e-6)


def test_qmajor_falls_back_on_unsupported_features():
    """A tuned fwd_impl='qmajor' must not break feature calls the kernel
    does not carry: the dispatcher silently keeps the wavefront."""
    q, k, v = make_qkv(1, 2, 2, 256, 256, 64)
    o, lse = flash_attention_forward(q, k, v, is_causal=True, block_sizes=QM,
                                     window=64)
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=True,
                                                  window=64)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed


def test_qmajor_supported_gate():
    ok = dict(segmented=False, windowed=False, softcap=False, alibi=False,
              dropout=False, dynamic_offset=False, mxu_l=False)
    assert qmajor_supported(16384, 128, 2, **ok)
    # residency ceiling: 128k x 128 bf16 K+V = 64 MB > budget
    assert not qmajor_supported(131072, 128, 2, **ok)
    for feat in ("segmented", "windowed", "softcap", "alibi", "dropout",
                 "dynamic_offset"):
        assert not qmajor_supported(16384, 128, 2, **{**ok, feat: True})


def test_qmajor_bounds_table():
    # 4 q blocks x 4 kv blocks of 128, aligned causal (offset 0):
    # block i sees tiles [0, i] with tile i masked (diagonal).
    b = build_qmajor_bounds(4, 4, 128, 128, 512, 0)
    np.testing.assert_array_equal(b[0], [0, 1, 2, 3])  # n_full
    np.testing.assert_array_equal(b[1], [1, 2, 3, 4])  # n_tot
    # non-causal with ragged tail: last tile masked for everyone
    b = build_qmajor_bounds(2, 4, 128, 128, 500, None)
    np.testing.assert_array_equal(b[0], [3, 3])
    np.testing.assert_array_equal(b[1], [4, 4])
    # S_q > S_k, offset -256: q blocks 0-1 see nothing
    b = build_qmajor_bounds(3, 1, 128, 128, 128, -256)
    np.testing.assert_array_equal(b[1], [0, 0, 1])
