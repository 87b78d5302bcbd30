"""Attention-dropout tests (reference deferred design, Phase_6.md:54-114).

The keep-mask is a pure function of (seed, b*H+h, global row, global col),
so the oracle REBUILDS the exact mask host-side with the same hash and runs
an unfused attention with it — bit-aligned semantics, not just statistics.
fwd/bwd mask consistency is proven by gradient alignment, including with
DIFFERENT tile sizes in forward vs backward."""

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.common import BlockSizes, dropout_keep_mask
from flashattn_tpu.utils.verify import verify_results

BS = BlockSizes(
    block_q=128, block_kv=128,
    block_q_dq=128, block_kv_dq=128,
    block_q_dkv=128, block_kv_dkv=128,
)
# Deliberately mismatched bwd tiles: the mask keys on global coordinates,
# so fwd(128) + bwd(256) must still agree.
BS_MIXED = BlockSizes(
    block_q=128, block_kv=128,
    block_q_dq=256, block_kv_dq=256,
    block_q_dkv=256, block_kv_dkv=256,
)


def oracle_dropout_attention(q, k, v, seed, rate, is_causal):
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    scale = 1.0 / (d**0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if is_causal:
        cm = jnp.arange(s_k)[None, :] <= jnp.arange(s_q)[:, None] + (s_k - s_q)
        s = jnp.where(cm, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    rows = jnp.arange(s_q, dtype=jnp.int32)[:, None]
    cols = jnp.arange(s_k, dtype=jnp.int32)[None, :]
    keeps = jnp.stack([
        jnp.stack([
            dropout_keep_mask(jnp.int32(seed), jnp.int32(bi * h + hi),
                              rows, cols, rate)
            for hi in range(h)
        ])
        for bi in range(b)
    ])
    p = jnp.where(keeps, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("is_causal", [False, True])
def test_dropout_forward_matches_oracle(is_causal):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (2, 2, 256, 64)) for kk in keys)
    rate, seed = 0.15, 1234
    o = flash_attention(q, k, v, is_causal=is_causal, block_sizes=BS,
                        dropout_rate=rate, dropout_seed=seed)
    o_ref = oracle_dropout_attention(q, k, v, seed, rate, is_causal)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r


def test_dropout_zero_rate_is_identity():
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 256, 64)) for kk in keys)
    o0 = flash_attention(q, k, v, is_causal=True, block_sizes=BS)
    o1 = flash_attention(q, k, v, is_causal=True, block_sizes=BS,
                         dropout_rate=0.0, dropout_seed=7)
    assert jnp.array_equal(o0, o1)


def test_dropout_seed_changes_mask():
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 256, 64)) for kk in keys)
    o1 = flash_attention(q, k, v, block_sizes=BS, dropout_rate=0.3,
                         dropout_seed=1)
    o2 = flash_attention(q, k, v, block_sizes=BS, dropout_rate=0.3,
                         dropout_seed=2)
    assert not jnp.allclose(o1, o2)


def test_dropout_keep_fraction():
    rows = jnp.arange(4096, dtype=jnp.int32)[:, None]
    cols = jnp.arange(4096, dtype=jnp.int32)[None, :]
    for rate in (0.1, 0.5):
        keep = dropout_keep_mask(jnp.int32(42), jnp.int32(3), rows, cols,
                                 rate)
        frac = float(jnp.mean(keep.astype(jnp.float32)))
        assert abs(frac - (1.0 - rate)) < 5e-3, (rate, frac)


@pytest.mark.parametrize("bs", [BS, BS_MIXED], ids=["same-tiles", "mixed-tiles"])
def test_dropout_grads_match_oracle(bs):
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    q, k, v, do = (jax.random.normal(kk, (1, 2, 256, 64)) for kk in keys)
    rate, seed = 0.2, 99
    ours = lambda q, k, v: flash_attention(
        q, k, v, is_causal=True, block_sizes=bs, dropout_rate=rate,
        dropout_seed=seed)
    ref = lambda q, k, v: oracle_dropout_attention(q, k, v, seed, rate, True)
    grads = lambda fn: jax.grad(
        lambda q, k, v: jnp.sum(fn(q, k, v) * do), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip(("dQ", "dK", "dV"), grads(ref), grads(ours)):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


def test_dropout_with_gqa():
    keys = jax.random.split(jax.random.PRNGKey(4), 4)
    q = jax.random.normal(keys[0], (1, 4, 256, 64))
    k = jax.random.normal(keys[1], (1, 2, 256, 64))
    v = jax.random.normal(keys[2], (1, 2, 256, 64))
    do = jax.random.normal(keys[3], (1, 4, 256, 64))
    rate, seed = 0.25, 5
    kr = jnp.repeat(k, 2, axis=1)
    vr = jnp.repeat(v, 2, axis=1)
    ours = lambda q, k, v: flash_attention(
        q, k, v, is_causal=True, block_sizes=BS, dropout_rate=rate,
        dropout_seed=seed)
    o = ours(q, k, v)
    o_ref = oracle_dropout_attention(q, kr, vr, seed, rate, True)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r
    dq, dk, dv = jax.grad(
        lambda q, k, v: jnp.sum(ours(q, k, v) * do), argnums=(0, 1, 2)
    )(q, k, v)
    ref = lambda q, k, v: oracle_dropout_attention(
        q, jnp.repeat(k, 2, axis=1), jnp.repeat(v, 2, axis=1), seed, rate,
        True)
    rq, rk, rv = jax.grad(
        lambda q, k, v: jnp.sum(ref(q, k, v) * do), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip(("dQ", "dK", "dV"), (rq, rk, rv), (dq, dk, dv)):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"
