"""Self-consistency tests for the jnp oracle (LSE vs logsumexp, causal mask,
GQA broadcast) — the reference's secondary-oracle idea (Phase_3.md:699-755)."""

import jax
import jax.numpy as jnp
import numpy as np

from flashattn_tpu.ops.reference import reference_attention_with_lse


def test_lse_matches_logsumexp():
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    b, h, s, d = 1, 2, 128, 64
    q = jax.random.normal(kq, (b, h, s, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv, (b, h, s, d))
    _, lse = reference_attention_with_lse(q, k, v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d * 1.0)
    lse_ref = jax.scipy.special.logsumexp(scores, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=1e-4)


def test_causal_ignores_future_keys():
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    b, h, s, d = 1, 1, 64, 32
    q = jax.random.normal(kq, (b, h, s, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv, (b, h, s, d))
    o1, _ = reference_attention_with_lse(q, k, v, is_causal=True)
    # Perturbing strictly-future keys/values must not change causal output.
    k2 = k.at[:, :, -1, :].set(100.0)
    v2 = v.at[:, :, -1, :].set(100.0)
    o2, _ = reference_attention_with_lse(
        q[:, :, :-1], k2, v2, is_causal=False, scale=None
    )
    o1_trunc, _ = reference_attention_with_lse(q, k, v, is_causal=True)
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(o1_trunc), atol=1e-6
    )
    # Row 0 attends only key 0 under causal.
    expected_row0 = v[:, :, 0, :]
    np.testing.assert_allclose(
        np.asarray(o1[:, :, 0, :]), np.asarray(expected_row0), atol=1e-5
    )


def test_gqa_equals_repeated_heads():
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    b, hq, hkv, s, d = 1, 4, 2, 64, 32
    q = jax.random.normal(keys[0], (b, hq, s, d))
    k = jax.random.normal(keys[1], (b, hkv, s, d))
    v = jax.random.normal(keys[2], (b, hkv, s, d))
    o_gqa, lse_gqa = reference_attention_with_lse(q, k, v, is_causal=True)
    k_rep = jnp.repeat(k, hq // hkv, axis=1)
    v_rep = jnp.repeat(v, hq // hkv, axis=1)
    o_full, lse_full = reference_attention_with_lse(q, k_rep, v_rep, is_causal=True)
    np.testing.assert_allclose(np.asarray(o_gqa), np.asarray(o_full), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_gqa), np.asarray(lse_full), atol=1e-6)
