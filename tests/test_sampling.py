"""Sampling tests: greedy equivalence at T=0, top-k/top-p support masking,
determinism under a fixed key."""

import jax
import jax.numpy as jnp
import numpy as np

from flashattn_tpu.models.sampling import SamplingParams, sample


def logits_fixture():
    return jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.04, 0.01]]))


def test_temperature_zero_is_greedy():
    t = sample(logits_fixture(), jax.random.PRNGKey(0),
               SamplingParams(temperature=0.0))
    assert int(t[0]) == 0


def test_top_k_masks_support():
    counts = np.zeros(5)
    for i in range(200):
        t = sample(logits_fixture(), jax.random.PRNGKey(i),
                   SamplingParams(temperature=1.0, top_k=2))
        counts[int(t[0])] += 1
    assert counts[2:].sum() == 0 and counts[:2].all()


def test_top_p_masks_tail():
    counts = np.zeros(5)
    for i in range(300):
        t = sample(logits_fixture(), jax.random.PRNGKey(i),
                   SamplingParams(temperature=1.0, top_p=0.6))
        counts[int(t[0])] += 1
    # Convention: keep the minimal prefix whose mass >= p (the crossing
    # token is included). p=0.6 -> {0.5, 0.3}; token 2+ excluded.
    assert counts[2:].sum() == 0 and counts[0] > 0 and counts[1] > 0
    # and the kept distribution is renormalized roughly 5:3
    assert 0.4 < counts[0] / max(counts[1], 1) / (0.5 / 0.3) < 2.5


def test_sampled_generation_deterministic_and_diverse():
    from flashattn_tpu.models import generate, llama
    from flashattn_tpu.models.config import ModelConfig

    cfg = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_layers=1, num_heads=2, num_kv_heads=2, head_dim=32,
                      max_seq_len=128, dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    sp = SamplingParams(temperature=1.0, top_p=0.95)
    a = generate.generate(params, prompt, cfg, max_new_tokens=8,
                          sampling=sp, rng=jax.random.PRNGKey(5))
    b = generate.generate(params, prompt, cfg, max_new_tokens=8,
                          sampling=sp, rng=jax.random.PRNGKey(5))
    c = generate.generate(params, prompt, cfg, max_new_tokens=8,
                          sampling=sp, rng=jax.random.PRNGKey(6))
    assert jnp.array_equal(a, b)
    assert not jnp.array_equal(a, c)  # different key, diff samples (w.h.p.)
