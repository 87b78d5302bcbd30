"""ALiBi position-bias tests: fwd + grads vs the biased oracle; slopes are
per-head (GQA exercised) and computed in-kernel from grid indices."""

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


def make_inputs(hq=4, hkv=4, s=384, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(keys[0], (1, hq, s, 64))
    k = jax.random.normal(keys[1], (1, hkv, s, 64))
    v = jax.random.normal(keys[2], (1, hkv, s, 64))
    do = jax.random.normal(keys[3], (1, hq, s, 64))
    return q, k, v, do


@pytest.mark.parametrize("is_causal", [False, True])
def test_alibi_forward(is_causal):
    q, k, v, _ = make_inputs()
    o = flash_attention(q, k, v, is_causal=is_causal, alibi=True,
                        block_sizes=BS)
    o_ref = reference_attention(q, k, v, is_causal=is_causal, alibi=True)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r


def test_alibi_grads():
    q, k, v, do = make_inputs(seed=3)
    ours = lambda q, k, v: flash_attention(
        q, k, v, is_causal=True, alibi=True, block_sizes=BS)
    ref = lambda q, k, v: reference_attention(
        q, k, v, is_causal=True, alibi=True)
    g = lambda fn: jax.grad(
        lambda q, k, v: jnp.sum(fn(q, k, v) * do), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip(("dQ", "dK", "dV"), g(ref), g(ours)):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


def test_alibi_gqa():
    """Per-head slopes must track the QUERY head index under GQA."""
    q, k, v, _ = make_inputs(hq=4, hkv=2, s=256, seed=5)
    o = flash_attention(q, k, v, is_causal=True, alibi=True, block_sizes=BS)
    o_ref = reference_attention(q, k, v, is_causal=True, alibi=True)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r


def test_alibi_changes_output():
    q, k, v, _ = make_inputs(seed=7)
    o_a = flash_attention(q, k, v, is_causal=True, alibi=True, block_sizes=BS)
    o_n = flash_attention(q, k, v, is_causal=True, block_sizes=BS)
    assert not jnp.allclose(o_a, o_n, atol=1e-3)
