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
