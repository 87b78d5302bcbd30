"""Speculative decoding: greedy acceptance MUST reproduce the target model's
plain greedy generation token-for-token — with a perfect draft (the target
itself: acceptance 1.0) and with a disagreeing draft (random weights)."""

import dataclasses

import jax
import jax.numpy as jnp

from flashattn_tpu.models import generate, llama
from flashattn_tpu.models.config import ModelConfig
from flashattn_tpu.models.speculate import speculative_generate

CFG = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=2, num_kv_heads=2, head_dim=32, max_seq_len=256,
    dtype=jnp.float32,
)
DRAFT_CFG = dataclasses.replace(CFG, num_layers=1)


def greedy_oracle(params, prompt, n):
    return [int(t) for t in generate.generate(
        params, prompt, CFG, max_new_tokens=n, max_len=256)[0]]


def test_speculate_with_perfect_draft():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    prompt = jnp.asarray([[5, 9, 42, 7]], jnp.int32)
    want = greedy_oracle(params, prompt, 12)
    got, rate = speculative_generate(
        params, CFG, params, CFG, prompt, max_new_tokens=12, k=4)
    assert [int(t) for t in got[0]] == want
    assert rate == 1.0  # the draft IS the target


def test_speculate_with_disagreeing_draft():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    draft = llama.init_params(DRAFT_CFG, jax.random.PRNGKey(99))
    prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    want = greedy_oracle(params, prompt, 16)
    got, rate = speculative_generate(
        params, CFG, draft, DRAFT_CFG, prompt, max_new_tokens=16, k=4)
    assert [int(t) for t in got[0]] == want, (rate, got)
    assert 0.0 <= rate < 1.0


def test_speculate_paged_backend():
    """paged=True (block-table caches for target AND draft, rollback via
    length reset) must still reproduce plain greedy exactly."""
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    draft = llama.init_params(DRAFT_CFG, jax.random.PRNGKey(99))
    prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    want = greedy_oracle(params, prompt, 16)
    got, rate = speculative_generate(
        params, CFG, draft, DRAFT_CFG, prompt, max_new_tokens=16, k=4,
        paged=True, page_size=128)
    assert [int(t) for t in got[0]] == want, (rate, got)


def test_spec_accept_preserves_target_distribution():
    """The accept/reject core must emit tokens distributed as the TARGET
    distribution p regardless of the draft distribution q (the whole point
    of speculative sampling). Monte-Carlo over the pure core with k=1."""
    import numpy as np
    from flashattn_tpu.models.speculate import spec_accept

    v = 6
    p = np.asarray([0.30, 0.25, 0.20, 0.15, 0.07, 0.03])
    q = np.asarray([0.05, 0.10, 0.40, 0.05, 0.25, 0.15])  # very wrong draft
    p_probs = jnp.asarray(np.stack([p, p]))  # [k+1, V] (bonus row unused-ish)
    q_probs = jnp.asarray(q[None])  # [1, V]

    n = 20000
    counts = np.zeros(v)
    base = jax.random.PRNGKey(123)
    draft_keys = jax.random.split(jax.random.PRNGKey(7), n)
    drafts = np.asarray(
        jax.vmap(lambda kk: jax.random.choice(kk, v, p=jnp.asarray(q)))(
            draft_keys))
    for i in range(n):
        n_acc, nxt = spec_accept(p_probs, q_probs, [int(drafts[i])],
                                 jax.random.fold_in(base, i))
        tok = int(drafts[i]) if n_acc == 1 else nxt
        counts[tok] += 1
    emp = counts / n
    tv = 0.5 * np.abs(emp - p).sum()
    assert tv < 0.02, (tv, emp, p)


def test_speculate_sampled_runs_and_is_deterministic():
    """Sampled speculation: valid tokens, reproducible for a fixed rng, and
    different from greedy at high temperature."""
    from flashattn_tpu.models.sampling import SamplingParams

    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    draft = llama.init_params(DRAFT_CFG, jax.random.PRNGKey(99))
    prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    sp = SamplingParams(temperature=1.2, top_k=24)
    a, _ = speculative_generate(params, CFG, draft, DRAFT_CFG, prompt,
                                max_new_tokens=10, k=3, sampling=sp,
                                rng=jax.random.PRNGKey(5))
    b, _ = speculative_generate(params, CFG, draft, DRAFT_CFG, prompt,
                                max_new_tokens=10, k=3, sampling=sp,
                                rng=jax.random.PRNGKey(5))
    assert jnp.array_equal(a, b)
    assert all(0 <= int(t) < CFG.vocab_size for t in a[0])
    greedy = greedy_oracle(params, prompt, 10)
    assert [int(t) for t in a[0]] != greedy
