"""Gradient-alignment tests: flash_attention custom_vjp vs jax.grad of the
pure-jnp oracle, on O/dQ/dK/dV simultaneously — the reference's SDPA
alignment discipline (My_FlashAttention_optimized.py:172-212)."""

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.common import BlockSizes
from flashattn_tpu.ops.reference import reference_attention
from flashattn_tpu.utils.verify import verify_results

BS = BlockSizes(
    block_q=128, block_kv=128,
    block_q_dq=128, block_kv_dq=128,
    block_q_dkv=128, block_kv_dkv=128,
)


def grads(fn, q, k, v, do):
    loss = lambda q, k, v: jnp.sum(fn(q, k, v) * do)
    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def check(b, hq, hkv, s_q, s_k, d, is_causal, seed=7, atol=1e-5, rtol=1e-5):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(keys[0], (b, hq, s_q, d))
    k = jax.random.normal(keys[1], (b, hkv, s_k, d))
    v = jax.random.normal(keys[2], (b, hkv, s_k, d))
    do = jax.random.normal(keys[3], (b, hq, s_q, d))

    ours = lambda q, k, v: flash_attention(
        q, k, v, is_causal=is_causal, block_sizes=BS
    )
    ref = lambda q, k, v: reference_attention(q, k, v, is_causal=is_causal)

    o = ours(q, k, v)
    o_ref = ref(q, k, v)
    assert verify_results(o_ref, o, atol=atol, rtol=rtol).passed, "O"

    for name, a, b_ in zip(
        ("dQ", "dK", "dV"), grads(ref, q, k, v, do), grads(ours, q, k, v, do)
    ):
        r = verify_results(a, b_, atol=atol, rtol=rtol)
        assert r.passed, f"{name}: {r}"


@pytest.mark.parametrize("is_causal", [False, True])
def test_bwd_square(is_causal):
    check(2, 2, 2, 256, 256, 64, is_causal)


@pytest.mark.parametrize("s_q,s_k", [(128, 384), (384, 128), (200, 264)])
def test_bwd_cross_and_ragged(s_q, s_k):
    check(1, 2, 2, s_q, s_k, 64, True)


def test_bwd_gqa():
    check(1, 4, 2, 256, 256, 64, True)


def test_bwd_mqa():
    check(1, 4, 1, 256, 256, 64, True)


def test_bwd_d128():
    check(1, 2, 2, 256, 256, 128, True)


def test_bwd_bf16_reference_gate():
    """bf16 fwd+bwd against the fp32 oracle — reference gate with bf16 atol."""
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    shape = (1, 2, 256, 64)
    q, k, v, do = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in keys)
    ours = lambda q, k, v: flash_attention(q, k, v, is_causal=True, block_sizes=BS)
    ref = lambda q, k, v: reference_attention(q, k, v, is_causal=True)
    for name, a, b_ in zip(
        ("dQ", "dK", "dV"), grads(ref, q, k, v, do), grads(ours, q, k, v, do)
    ):
        r = verify_results(a, b_, rtol=2e-2, atol=5e-2)
        assert r.passed, f"{name}: {r}"
