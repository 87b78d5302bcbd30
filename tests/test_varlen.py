"""Varlen / packed-sequence (segment-ids + cu_seqlens) tests — SURVEY.md T7.

Oracle = the segment-masked jnp reference; a second, stronger oracle runs
each packed sequence UNPACKED through plain reference attention and checks
the packed kernel reproduces every per-sequence result (the reference's
planned varlen semantics, Phase_6.md:118-178)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.ops.common import BlockSizes
from flashattn_tpu.ops.reference import reference_attention
from flashattn_tpu.ops.varlen import (
    flash_attention_varlen,
    segment_ids_from_cu_seqlens,
)
from flashattn_tpu.utils.verify import verify_results

BS = BlockSizes(
    block_q=128, block_kv=128,
    block_q_dq=128, block_kv_dq=128,
    block_q_dkv=128, block_kv_dkv=128,
)

# Deliberately non-multiples of the block size (reference test discipline,
# SURVEY.md §4: "S=500 to exercise padding masks").
LENS = [200, 37, 300, 119]


def pack_inputs(lens, h, d, total=None, seed=0):
    total = total if total is not None else sum(lens)
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(keys[0], (1, h, total, d))
    k = jax.random.normal(keys[1], (1, h, total, d))
    v = jax.random.normal(keys[2], (1, h, total, d))
    do = jax.random.normal(keys[3], (1, h, total, d))
    ids = np.full((total,), -1, np.int32)
    off = 0
    for i, ln in enumerate(lens):
        ids[off:off + ln] = i
        off += ln
    return q, k, v, do, jnp.asarray(ids)[None]


def unpacked_oracle(q, k, v, lens, is_causal):
    """Run each packed segment separately through the plain oracle."""
    outs, off = [], 0
    for ln in lens:
        sl = slice(off, off + ln)
        outs.append(reference_attention(
            q[:, :, sl], k[:, :, sl], v[:, :, sl], is_causal=is_causal))
        off += ln
    pad = q.shape[2] - off
    if pad:
        outs.append(jnp.zeros((1, q.shape[1], pad, q.shape[3]), q.dtype))
    return jnp.concatenate(outs, axis=2)


@pytest.mark.parametrize("is_causal", [False, True])
def test_varlen_forward_vs_unpacked(is_causal):
    q, k, v, _, seg = pack_inputs(LENS, 2, 64)
    o = flash_attention_varlen(q, k, v, segment_ids=seg,
                               is_causal=is_causal, block_sizes=BS)
    o_ref = unpacked_oracle(q, k, v, LENS, is_causal)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r


@pytest.mark.parametrize("is_causal", [False, True])
def test_varlen_grads(is_causal):
    q, k, v, do, seg = pack_inputs(LENS, 2, 64, seed=5)
    ours = lambda q, k, v: flash_attention_varlen(
        q, k, v, segment_ids=seg, is_causal=is_causal, block_sizes=BS)
    ref = lambda q, k, v: reference_attention(
        q, k, v, is_causal=is_causal,
        segment_ids=(jnp.where(seg < 0, -1, seg), jnp.where(seg < 0, -2, seg)),
    )
    grads = lambda fn: jax.grad(
        lambda q, k, v: jnp.sum(fn(q, k, v) * do), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip(("dQ", "dK", "dV"), grads(ref), grads(ours)):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


def test_varlen_with_trailing_padding():
    """Packed length > sum(lens): pad rows must give O = 0 and zero grads."""
    total = sum(LENS) + 73
    q, k, v, do, seg = pack_inputs(LENS, 2, 64, total=total, seed=2)
    o = flash_attention_varlen(q, k, v, segment_ids=seg, is_causal=True,
                               block_sizes=BS)
    o_ref = unpacked_oracle(q, k, v, LENS, True)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r
    assert jnp.all(o[:, :, sum(LENS):] == 0.0)
    dq, dk, dv = jax.grad(
        lambda q, k, v: jnp.sum(flash_attention_varlen(
            q, k, v, segment_ids=seg, is_causal=True, block_sizes=BS) * do),
        argnums=(0, 1, 2),
    )(q, k, v)
    assert jnp.all(dq[:, :, sum(LENS):] == 0.0)
    assert jnp.all(dk[:, :, sum(LENS):] == 0.0)
    assert jnp.all(dv[:, :, sum(LENS):] == 0.0)


def test_cu_seqlens_api():
    cu = jnp.asarray(np.cumsum([0] + LENS), jnp.int32)
    total = int(cu[-1]) + 40
    q, k, v, _, _ = pack_inputs(LENS, 2, 64, total=total, seed=7)
    o = flash_attention_varlen(q, k, v, cu_seqlens=cu, is_causal=True,
                               block_sizes=BS)
    o_ref = unpacked_oracle(q, k, v, LENS, True)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r


def test_segment_ids_from_cu_seqlens():
    cu = jnp.asarray([0, 3, 3, 7], jnp.int32)  # includes an empty sequence
    ids = segment_ids_from_cu_seqlens(cu, 9)
    assert ids.tolist() == [0, 0, 0, 2, 2, 2, 2, -1, -1]


def test_varlen_bf16():
    q, k, v, _, seg = pack_inputs(LENS, 4, 64, seed=9)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    o = flash_attention_varlen(qb, kb, vb, segment_ids=seg, is_causal=True,
                               block_sizes=BS)
    o_ref = unpacked_oracle(q, k, v, LENS, True)
    r = verify_results(o_ref, o.astype(jnp.float32), atol=2e-2, rtol=2e-2)
    assert r.passed, r


def test_varlen_alibi_composition():
    """Packed segments + ALiBi: the bias depends only on (k_pos - q_pos),
    which is translation-invariant, so packed documents with GLOBAL
    positions match per-document attention exactly (cross-document pairs
    are segment-masked)."""
    from flashattn_tpu.ops.flash_fwd import flash_attention_forward

    bs = BlockSizes(block_q=128, block_kv=128)
    b, h, d = 1, 4, 64
    lens = [200, 150, 162]
    s = sum(lens)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in keys)
    seg = jnp.asarray([sum(([i] * n for i, n in enumerate(lens)), [])],
                      jnp.int32)
    o_packed, _ = flash_attention_forward(
        q, k, v, is_causal=True, segment_ids=(seg, seg), alibi=True,
        block_sizes=bs)
    outs, off = [], 0
    for n in lens:
        oi, _ = flash_attention_forward(
            q[:, :, off:off + n], k[:, :, off:off + n], v[:, :, off:off + n],
            is_causal=True, alibi=True, block_sizes=bs)
        outs.append(oi)
        off += n
    o_ref = jnp.concatenate(outs, axis=2)
    np.testing.assert_allclose(np.asarray(o_packed), np.asarray(o_ref),
                               atol=1e-5, rtol=1e-5)
