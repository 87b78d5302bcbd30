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


@pytest.mark.parametrize("t_chunk", [1, 8])
def test_alibi_decode(t_chunk):
    """Decode (single + chunked) with ALiBi matches the biased oracle over
    the live cache, GQA slopes mapped per query head."""
    import dataclasses

    from flashattn_tpu.ops.decode import (
        decode_attention, decode_attention_chunk)
    from flashattn_tpu.ops.kvcache import init_cache, update_cache

    b, hq, hkv, d, s_max = 2, 4, 2, 64, 256
    length = 200
    cache = init_cache(b, hkv, s_max, d, dtype=jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, length, d))
    vn = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, length, d))
    cache = update_cache(cache, kn, vn)
    q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, t_chunk, d))

    if t_chunk == 1:
        o = decode_attention(q[:, :, 0], cache, alibi=True)[:, :, None]
    else:
        o = decode_attention_chunk(q, cache, alibi=True)
    # Oracle: causal cross-attn of the chunk rows (positions length-T..):
    o_ref = reference_attention(q, kn[:, :, :length], vn[:, :, :length],
                                is_causal=True, alibi=True)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r


def test_alibi_model_train_decode_agree():
    """cfg.use_alibi (RoPE off, ALiBi on) threads through training forward
    AND the decode path: teacher-forced logits must agree."""
    import numpy as np
    from flashattn_tpu.models import generate, llama
    from flashattn_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=32, max_seq_len=256,
        dtype=jnp.float32, use_alibi=True,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 48), 0,
                                cfg.vocab_size, jnp.int32)
    train_logits = llama.forward(params, tokens, cfg)
    caches = generate.init_caches(cfg, 1, 128)
    logits, caches = generate.prefill(params, tokens[:, :1], caches, cfg)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(train_logits[:, 0]),
                               rtol=2e-4, atol=2e-4)
    for t in range(1, 48):
        logits, caches = generate.decode_step(
            params, tokens[:, t], jnp.full((1,), t, jnp.int32), caches, cfg)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(train_logits[:, t]),
            rtol=2e-4, atol=2e-4, err_msg=f"position {t}")


def test_alibi_head_sharded_matches_unsharded():
    """ALiBi slopes must follow GLOBAL head indices under head (tensor)
    sharding: the per-head slope table is built globally and sharded with
    the heads, so a 4-way 'model' mesh reproduces the unsharded forward."""
    from flashattn_tpu.models import llama
    from flashattn_tpu.models.config import ModelConfig
    from flashattn_tpu.parallel import make_mesh

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=8, num_kv_heads=4, head_dim=32, max_seq_len=256,
        dtype=jnp.float32, use_alibi=True,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                                cfg.vocab_size, jnp.int32)
    ref = llama.forward(params, tokens, cfg)
    mesh = make_mesh({"model": 4})
    got = llama.forward(params, tokens, cfg, mesh=mesh)
    r = verify_results(ref, got, atol=1e-5, rtol=1e-5)
    assert r.passed, r


def test_custom_alibi_slopes():
    """flash_attention(alibi_slopes=...) overrides the standard table;
    passing the standard table explicitly matches the default path."""
    from flashattn_tpu.ops.flash_fwd import default_alibi_slopes

    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (1, 4, 256, 64)) for kk in keys)
    o_default = flash_attention(q, k, v, is_causal=True, alibi=True,
                                block_sizes=BS)
    o_explicit = flash_attention(q, k, v, is_causal=True, alibi=True,
                                 alibi_slopes=default_alibi_slopes(4),
                                 block_sizes=BS)
    assert jnp.array_equal(o_default, o_explicit)
    o_other = flash_attention(q, k, v, is_causal=True, alibi=True,
                              alibi_slopes=jnp.full((4,), 0.25, jnp.float32),
                              block_sizes=BS)
    assert not jnp.allclose(o_default, o_other, atol=1e-3)
