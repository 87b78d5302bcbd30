"""Logit soft-capping (Gemma-style cap*tanh(S/cap)) fwd + bwd alignment.

Tolerances are 1e-4 (vs 1e-5 elsewhere): the kernel folds `scale` into Q
before the dot while the oracle scales after, and the tanh's slope amplifies
that f32 rounding at the deliberately large test magnitudes."""

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


def make_inputs(s=384, scale_up=4.0, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    # Larger magnitudes so the tanh actually bends the logits.
    return tuple(jax.random.normal(kk, (1, 2, s, 64)) * scale_up
                 for kk in keys)


@pytest.mark.parametrize("is_causal", [False, True])
@pytest.mark.parametrize("cap", [5.0, 30.0])
def test_softcap_forward(is_causal, cap):
    q, k, v, _ = make_inputs()
    o = flash_attention(q, k, v, is_causal=is_causal, logit_softcap=cap,
                        block_sizes=BS)
    o_ref = reference_attention(q, k, v, is_causal=is_causal,
                                logit_softcap=cap)
    r = verify_results(o_ref, o, atol=1e-4, rtol=1e-4)
    assert r.passed, r


@pytest.mark.parametrize("is_causal", [False, True])
def test_softcap_grads(is_causal):
    q, k, v, do = make_inputs(seed=3)
    cap = 10.0
    ours = lambda q, k, v: flash_attention(
        q, k, v, is_causal=is_causal, logit_softcap=cap, block_sizes=BS)
    ref = lambda q, k, v: reference_attention(
        q, k, v, is_causal=is_causal, logit_softcap=cap)
    g = lambda fn: jax.grad(
        lambda q, k, v: jnp.sum(fn(q, k, v) * do), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip(("dQ", "dK", "dV"), g(ref), g(ours)):
        r = verify_results(a, b, atol=1e-4, rtol=1e-4)
        assert r.passed, f"{name}: {r}"


def test_softcap_actually_caps():
    q, k, v, _ = make_inputs(scale_up=8.0, seed=5)
    o_cap = flash_attention(q, k, v, is_causal=True, logit_softcap=5.0,
                            block_sizes=BS)
    o_free = flash_attention(q, k, v, is_causal=True, block_sizes=BS)
    assert not jnp.allclose(o_cap, o_free, atol=1e-3)


def test_softcap_with_window():
    q, k, v, do = make_inputs(seed=7)
    ours = lambda q, k, v: flash_attention(
        q, k, v, is_causal=True, window=100, logit_softcap=8.0,
        block_sizes=BS)
    ref = lambda q, k, v: reference_attention(
        q, k, v, is_causal=True, window=100, logit_softcap=8.0)
    r = verify_results(ref(q, k, v), ours(q, k, v), atol=1e-4, rtol=1e-4)
    assert r.passed, r
    g = lambda fn: jax.grad(
        lambda q, k, v: jnp.sum(fn(q, k, v) * do), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip(("dQ", "dK", "dV"), g(ref), g(ours)):
        r = verify_results(a, b, atol=1e-4, rtol=1e-4)
        assert r.passed, f"{name}: {r}"


def test_softcapped_model_train_decode_agree():
    """cfg.logit_softcap threads through training forward AND the decode
    path (Gemma-family): teacher-forced logits must agree."""
    import numpy as np
    from flashattn_tpu.models import generate, llama
    from flashattn_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=32, max_seq_len=256,
        dtype=jnp.float32, logit_softcap=12.0,
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
