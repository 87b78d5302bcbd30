"""Determinism checks (SURVEY.md §5 race-detection row): identical inputs
must produce bitwise-identical outputs across runs — the wavefront grids are
sequential per (batch, head), so there is no accumulation-order race."""

import jax
import jax.numpy as jnp

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.common import BlockSizes

BS = BlockSizes(
    block_q=128, block_kv=128,
    block_q_dq=128, block_kv_dq=128,
    block_q_dkv=128, block_kv_dkv=128,
)


def test_fwd_bwd_bitwise_deterministic():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, do = (jax.random.normal(kk, (1, 2, 384, 64), jnp.bfloat16)
                   for kk in keys)

    def run():
        o = flash_attention(q, k, v, is_causal=True, block_sizes=BS)
        g = jax.grad(lambda q, k, v: jnp.sum(
            (flash_attention(q, k, v, is_causal=True, block_sizes=BS)
             * do).astype(jnp.float32)), argnums=(0, 1, 2))(q, k, v)
        return o, g

    (o1, g1), (o2, g2) = run(), run()
    assert jnp.array_equal(o1, o2)
    for a, b in zip(g1, g2):
        assert jnp.array_equal(a, b)


def test_dropout_deterministic_given_seed():
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 256, 64)) for kk in keys)
    o1 = flash_attention(q, k, v, block_sizes=BS, dropout_rate=0.3,
                         dropout_seed=7)
    o2 = flash_attention(q, k, v, block_sizes=BS, dropout_rate=0.3,
                         dropout_seed=7)
    assert jnp.array_equal(o1, o2)
