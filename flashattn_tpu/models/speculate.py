"""Speculative decoding: draft-model proposals verified in ONE chunked
target pass. Greedy acceptance reproduces the target's greedy generation
exactly; with `sampling=`, the Leviathan accept/reject scheme emits tokens
distributed EXACTLY as sampling from the target.

Built on the chunked-decode kernel (ops/decode.py): the target scores the
draft's k tokens + the anchor token in a single decode_attention_chunk call
instead of k+1 sequential steps; rejected suffixes roll back by resetting
the caches' per-sequence ``length`` (writes beyond length are dead by
construction, so rollback is one int per layer — no buffer copies).

B=1 per call (acceptance lengths are data-dependent; batching speculation
is a scheduler concern, not a kernel one).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flashattn_tpu.models import generate
from flashattn_tpu.models.config import ModelConfig

Params = dict[str, Any]


def _rollback(caches, length: int):
    arr = jnp.asarray([length], jnp.int32)
    return [dataclasses.replace(c, length=arr) for c in caches]


def spec_accept(p_probs, q_probs, drafts, key):
    """Leviathan et al. speculative-sampling accept/reject (pure, host math).

    p_probs [k+1, V]: target distribution at each verified position;
    q_probs [k, V]: draft distribution each proposal was drawn from;
    drafts [k]: the proposed tokens. Returns (n_accepted, next_token):
    draft i is accepted with prob min(1, p_i(x_i)/q_i(x_i)); on the first
    rejection the replacement is drawn from the residual
    norm(max(0, p_i - q_i)); on full acceptance the bonus token comes from
    p_k. The emitted sequence is distributed EXACTLY as sampling from the
    target (tested distributionally in tests/test_speculate.py).
    """
    import numpy as np

    p = np.asarray(p_probs, np.float64)
    q = np.asarray(q_probs, np.float64)
    k = len(drafts)
    keys = jax.random.split(key, k + 1)
    for i in range(k):
        x = drafts[i]
        u = float(jax.random.uniform(keys[i]))
        if q[i, x] > 0 and u < min(1.0, p[i, x] / q[i, x]):
            continue
        resid = np.clip(p[i] - q[i], 0.0, None)
        z = resid.sum()
        dist = resid / z if z > 0 else p[i] / p[i].sum()
        nxt = int(jax.random.choice(keys[k], dist.shape[0],
                                    p=jnp.asarray(dist)))
        return i, nxt
    dist = p[k] / p[k].sum()
    nxt = int(jax.random.choice(keys[k], dist.shape[0], p=jnp.asarray(dist)))
    return k, nxt


def speculative_generate(
    target_params: Params,
    target_cfg: ModelConfig,
    draft_params: Params,
    draft_cfg: ModelConfig,
    prompt: jnp.ndarray,  # [1, S] int32
    max_new_tokens: int = 32,
    k: int = 4,
    max_len: int | None = None,
    paged: bool = False,
    page_size: int = 128,
    sampling=None,  # SamplingParams; None / temperature 0 = greedy-exact
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, float]:
    """Speculative decoding.

    Greedy (sampling=None): output is identical to the target model's
    greedy generation. With SamplingParams (temperature > 0): drafts are
    SAMPLED from the draft distribution and accepted with probability
    min(1, p/q) (rejections resample the residual) — the emitted sequence
    is distributed exactly as sampling from the target (spec_accept).
    Returns ([1, max_new_tokens] tokens, draft acceptance rate).
    paged=True runs both models' caches on the paged backend — the
    rollback (length reset) makes rejected drafts' pages-resident tokens
    dead without any page churn."""
    from flashattn_tpu.models.sampling import sample, transformed_probs

    sampled = sampling is not None and sampling.temperature > 0.0
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, s = prompt.shape
    assert b == 1, "speculation is per-sequence; batch via the scheduler"
    if max_len is None:
        max_len = -(-(s + max_new_tokens + k + 1) // 128) * 128

    if paged:
        from flashattn_tpu.ops.paged import init_paged_cache, set_block_table

        max_len = -(-max_len // page_size) * page_size
        maxp = max_len // page_size

        def paged_caches(cfg):
            return [
                set_block_table(
                    init_paged_cache(1, cfg.num_kv_heads, maxp, page_size,
                                     cfg.head_dim, maxp, dtype=cfg.dtype),
                    0, jnp.arange(maxp, dtype=jnp.int32), 0)
                for _ in range(cfg.num_layers)
            ]

        t_caches = paged_caches(target_cfg)
        d_caches = paged_caches(draft_cfg)
    else:
        t_caches = generate.init_caches(target_cfg, 1, max_len)
        d_caches = generate.init_caches(draft_cfg, 1, max_len)
    t_logits, t_caches = generate.prefill(target_params, prompt, t_caches,
                                          target_cfg)
    _, d_caches = generate.prefill(draft_params, prompt, d_caches, draft_cfg)

    out: list[int] = []
    if sampled:
        rng, sub = jax.random.split(rng)
        token = int(sample(t_logits, sub, sampling)[0])
    else:
        token = int(jnp.argmax(t_logits[0]))  # anchor: target's next token
    out.append(token)
    pos = s  # position of `token`
    proposed = accepted = 0

    while len(out) < max_new_tokens:
        budget = max_new_tokens - len(out)
        k_now = min(k, budget)
        # --- draft proposes k_now tokens after `token` ---
        drafts: list[int] = []
        q_rows = []
        d_tok = token
        for i in range(k_now):
            d_logits, d_caches = generate.decode_step(
                draft_params, jnp.asarray([d_tok], jnp.int32),
                jnp.asarray([pos + i], jnp.int32), d_caches, draft_cfg)
            if sampled:
                rng, sub = jax.random.split(rng)
                d_tok = int(sample(d_logits, sub, sampling)[0])
                q_rows.append(transformed_probs(d_logits[0], sampling))
            else:
                d_tok = int(jnp.argmax(d_logits[0]))
            drafts.append(d_tok)
        # --- target verifies anchor + drafts in ONE chunked pass ---
        piece = jnp.asarray([[token] + drafts], jnp.int32)  # [1, k_now+1]
        positions = jnp.arange(pos, pos + k_now + 1)
        v_logits, t_caches = generate.chunk_step(
            target_params, piece, positions, t_caches, target_cfg)
        if sampled:
            rng, sub = jax.random.split(rng)
            p_probs = transformed_probs(v_logits[0], sampling)  # [k+1, V]
            n_acc, nxt = spec_accept(p_probs, jnp.stack(q_rows), drafts, sub)
        else:
            greedy = [int(t) for t in jnp.argmax(v_logits[0], axis=-1)]
            # greedy[i] = target's next token after piece[..i]; accept
            # drafts while they match.
            n_acc = 0
            while n_acc < k_now and drafts[n_acc] == greedy[n_acc]:
                n_acc += 1
            nxt = greedy[n_acc]
        proposed += k_now
        accepted += n_acc
        new_tokens = drafts[:n_acc] + [nxt]
        out.extend(new_tokens)
        # --- roll back to the accepted frontier ---
        # Target appended k_now+1 entries (positions pos..pos+k_now); keep
        # the anchor + accepted drafts.
        t_caches = _rollback(t_caches, pos + n_acc + 1)
        # Draft appended [anchor, drafts[:k_now-1]] — on full acceptance the
        # last draft's kv is missing, so re-ingest the accepted piece in one
        # chunk pass (cheap: it's the draft model).
        d_caches = _rollback(d_caches, pos)
        _, d_caches = generate.chunk_step(
            draft_params, piece[:, :n_acc + 1], positions[:n_acc + 1],
            d_caches, draft_cfg)
        token = new_tokens[-1]
        pos += n_acc + 1

    rate = accepted / proposed if proposed else 0.0
    return jnp.asarray([out[:max_new_tokens]], jnp.int32), rate
