"""Oracle + cross-grid tests for the rectangular-grid forward kernel
(flash_fwd_grid4.py): same config sampling as the wavefront suite, plus
exact wavefront/grid4 agreement and dispatch gating."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.ops.common import BlockSizes
from flashattn_tpu.ops.flash_fwd import flash_attention_forward
from flashattn_tpu.ops.reference import reference_attention_with_lse
from flashattn_tpu.utils.verify import verify_results

G4 = BlockSizes(block_q=128, block_kv=128, fwd_impl="grid4")
WF = BlockSizes(block_q=128, block_kv=128, fwd_impl="wavefront")


def make_qkv(b, hq, hkv, s_q, s_k, d, dtype=jnp.float32, seed=3):
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
def test_grid4_matches_oracle(is_causal, s_q, s_k):
    q, k, v = make_qkv(2, 2, 2, s_q, s_k, 64)
    o, lse = flash_attention_forward(q, k, v, is_causal=is_causal,
                                     block_sizes=G4)
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=is_causal)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed


@pytest.mark.parametrize("d", [64, 128])  # d=64 exercises the mxu_l lane
@pytest.mark.parametrize("hq,hkv", [(2, 2), (4, 1)])
def test_grid4_dims_and_gqa(d, hq, hkv):
    q, k, v = make_qkv(1, hq, hkv, 256, 256, d)
    o, lse = flash_attention_forward(q, k, v, is_causal=True, block_sizes=G4)
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=True)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed


@pytest.mark.parametrize("unroll", [1, 2])
@pytest.mark.parametrize("pos_offset", [-64, 0, 64])
def test_grid4_pos_offset_and_unroll(pos_offset, unroll):
    bs = dataclasses.replace(G4, block_kv=256, unroll_kv=unroll)
    wf = dataclasses.replace(bs, fwd_impl="wavefront")
    q, k, v = make_qkv(1, 2, 2, 256, 512, 64)
    o, lse = flash_attention_forward(q, k, v, is_causal=True, block_sizes=bs,
                                     pos_offset=pos_offset)
    o_ref, lse_ref = flash_attention_forward(
        q, k, v, is_causal=True, block_sizes=wf, pos_offset=pos_offset)
    assert verify_results(o_ref, o, atol=1e-6, rtol=1e-6).passed
    assert verify_results(lse_ref, lse, atol=1e-6, rtol=1e-6).passed


@pytest.mark.parametrize("is_causal", [False, True])
def test_grid4_wavefront_agreement(is_causal):
    q, k, v = make_qkv(1, 2, 2, 384, 384, 64)
    o_g, lse_g = flash_attention_forward(q, k, v, is_causal=is_causal,
                                         block_sizes=G4)
    o_w, lse_w = flash_attention_forward(q, k, v, is_causal=is_causal,
                                         block_sizes=WF)
    np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_w),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_g), np.asarray(lse_w),
                               rtol=1e-6, atol=1e-6)


def test_grid4_need_lse_false():
    q, k, v = make_qkv(1, 2, 2, 256, 256, 64)
    o_full, _ = flash_attention_forward(q, k, v, is_causal=True,
                                        block_sizes=G4)
    o_min, lse = flash_attention_forward(q, k, v, is_causal=True,
                                         block_sizes=G4, need_lse=False)
    assert lse is None
    np.testing.assert_array_equal(np.asarray(o_full), np.asarray(o_min))


def test_grid4_falls_back_on_unsupported_features():
    q, k, v = make_qkv(1, 2, 2, 256, 256, 64)
    o, lse = flash_attention_forward(q, k, v, is_causal=True, block_sizes=G4,
                                     window=64)
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=True,
                                                  window=64)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed


def test_auto_dispatch_single_fetch_uses_grid4():
    """The measured-defaults rule: causal calls whose resolved kv tile
    covers the whole key sequence dispatch to grid4 (v5e single-fetch
    wins); deeper calls keep the wavefront. Both must stay oracle-exact
    through the PUBLIC default path (block_sizes=None)."""
    from flashattn_tpu.ops.flash_fwd_grid4 import grid4_auto

    assert grid4_auto(1024, 1024, 128, True, 1024, 1024) == "grid4"
    assert grid4_auto(4096, 4096, 128, True, 1024, 1024) == "wavefront"
    assert grid4_auto(1024, 1024, 128, False, 1024, 1024) == "wavefront"

    q, k, v = make_qkv(1, 2, 2, 256, 256, 64)
    o, lse = flash_attention_forward(q, k, v, is_causal=True)  # auto
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=True)
    assert verify_results(o_ref, o, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse, atol=1e-5, rtol=1e-5).passed
