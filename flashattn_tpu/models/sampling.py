"""Token sampling for generation: temperature / top-k / top-p (nucleus).

Pure functions over logits — jit-safe (static k, fixed-shape sort for
top-p) so a sampling decode step stays one compiled executable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0  # 0 = greedy
    top_k: int = 0  # 0 = off
    top_p: float = 1.0  # 1 = off


def sample(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    params: SamplingParams = SamplingParams(),
) -> jnp.ndarray:
    """Sample token ids [B] from logits under the given params."""
    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / params.temperature
    if params.top_k:
        kth = jax.lax.top_k(logits, params.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with mass >= top_p (the first token is
        # always kept); cutoff = logit of the last kept sorted position.
        keep = cum - probs < params.top_p
        cutoff = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def transformed_probs(
    logits: jnp.ndarray,  # [..., V] f32
    params: SamplingParams = SamplingParams(),
) -> jnp.ndarray:
    """The exact distribution `sample` draws from: softmax after the
    temperature / top-k / top-p transforms (masked entries are 0).
    Speculative sampling needs these probabilities for both models."""
    assert params.temperature > 0.0, "greedy has no sampling distribution"
    logits = logits / params.temperature
    if params.top_k:
        kth = jax.lax.top_k(logits, params.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < params.top_p
        cutoff = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.nn.softmax(logits, axis=-1)
