"""Ulysses-style sequence parallelism: all-to-all head redistribution.

Alternative SP mode (SURVEY.md §2.3 T10): instead of rotating K/V shards
around a ring, re-shard sequence -> heads with ``lax.all_to_all`` so each
device runs FULL-sequence attention over a head slice (causal masking then
needs no cross-device logic at all), and re-shard back. Exact — no partial
merges — at the cost of two all-to-alls per tensor instead of n-1 ppermutes.

Differentiability is free: ``all_to_all`` has a transpose rule (its own
inverse all-to-all) and the local attention is the custom_vjp kernel, so
``jax.grad`` through a shard_map of this function is correct without a
hand-written VJP.
"""

from __future__ import annotations

from jax import lax
import jax.numpy as jnp

from flashattn_tpu.ops.attention import flash_attention
from flashattn_tpu.ops.common import BlockSizes


def ulysses_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    is_causal: bool = False,
    scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    alibi: bool = False,
    alibi_slopes: jnp.ndarray | None = None,  # GLOBAL (Hq,) table
    dropout_rate: float = 0.0,
    dropout_seed=None,
    segment_ids=None,  # (seg_q [B,S/n], seg_k [B,S/n]) local shards
) -> jnp.ndarray:
    """Sequence-parallel attention via head all-to-all; call INSIDE shard_map.

    Because each device runs FULL-sequence attention over a head slice, the
    attention variants compose with no cross-device logic: window/softcap
    apply locally, ALiBi takes the GLOBAL slope table (replicated) and
    slices the local heads' entries after the all-to-all, packed-segment
    ids all-gather to the full sequence (tiny int32 arrays), and dropout
    folds the device index into the counter seed so head shards draw
    decorrelated masks (the in-kernel head index is shard-local).

    Args:
      q: [B, Hq, S/n, D] local shard (sequence partitioned over `axis_name`);
         k, v: [B, Hkv, S/n, D]. Requires n | Hq and n | Hkv.

    Returns:
      O [B, Hq, S/n, D] local output shard.
    """
    n = lax.axis_size(axis_name)
    hq, hkv = q.shape[1], k.shape[1]
    assert hq % n == 0, (
        f"Ulysses needs the axis size ({n}) to divide Hq={hq}; "
        "use ring_flash_attention otherwise"
    )
    # [B, H, S/n, D] -> [B, H/n, S, D]: split heads across the axis, gather
    # the sequence. tiled=True keeps the axis implicit (shard_map style).
    q_h = lax.all_to_all(q, axis_name, split_axis=1, concat_axis=2, tiled=True)
    if hkv % n == 0:
        k_h = lax.all_to_all(k, axis_name, split_axis=1, concat_axis=2,
                             tiled=True)
        v_h = lax.all_to_all(v, axis_name, split_axis=1, concat_axis=2,
                             tiled=True)
    else:
        # GQA with Hkv < axis: KV heads can't split — all-gather the full
        # K/V sequence instead and slice the group each local q-head slice
        # needs. Costs replicated KV memory (the GQA cache is small) but
        # keeps causal semantics trivial.
        k_f = lax.all_gather(k, axis_name, axis=2, tiled=True)
        v_f = lax.all_gather(v, axis_name, axis=2, tiled=True)
        hq_local = hq // n
        assert hq_local % hkv == 0 or hkv % hq_local == 0, (hq, hkv, n)
        idx = lax.axis_index(axis_name)
        q_per_kv = hq // hkv
        # local q heads are [idx*hq_local, (idx+1)*hq_local); their kv heads:
        start = (idx * hq_local) // q_per_kv
        span = max(hq_local // q_per_kv, 1)
        k_h = lax.dynamic_slice_in_dim(k_f, start, span, axis=1)
        v_h = lax.dynamic_slice_in_dim(v_f, start, span, axis=1)

    local_slopes = None
    if alibi:
        from flashattn_tpu.ops.flash_fwd import default_alibi_slopes

        table = (default_alibi_slopes(hq) if alibi_slopes is None
                 else alibi_slopes.astype(jnp.float32))
        # After the all-to-all, this device holds the CONTIGUOUS head slice
        # [idx·Hq/n, (idx+1)·Hq/n) — take its slope entries.
        local_slopes = lax.dynamic_slice_in_dim(
            table, lax.axis_index(axis_name) * (hq // n), hq // n)

    seed = None
    if dropout_rate > 0.0:
        assert dropout_seed is not None, "dropout needs dropout_seed"
        from flashattn_tpu.parallel.ring import _fold_seed

        seed = _fold_seed(jnp.asarray(dropout_seed, jnp.int32),
                          lax.axis_index(axis_name), 0)
    if segment_ids is not None:
        seg_q, seg_k = segment_ids
        seg_qf = lax.all_gather(seg_q, axis_name, axis=1, tiled=True)
        seg_kf = lax.all_gather(seg_k, axis_name, axis=1, tiled=True)
        from flashattn_tpu.ops.varlen import flash_attention_varlen

        assert dropout_rate == 0.0, "segments + dropout: not wired"
        o_h = flash_attention_varlen(
            q_h, k_h, v_h, segment_ids=(seg_qf, seg_kf),
            is_causal=is_causal, scale=scale, block_sizes=block_sizes,
            interpret=interpret, window=window,
            logit_softcap=logit_softcap, alibi=alibi,
            alibi_slopes=local_slopes,
        )
    else:
        o_h = flash_attention(
            q_h, k_h, v_h, is_causal=is_causal, scale=scale,
            block_sizes=block_sizes, interpret=interpret,
            window=window, logit_softcap=logit_softcap,
            alibi=alibi, alibi_slopes=local_slopes,
            dropout_rate=dropout_rate, dropout_seed=seed,
        )

    # [B, H/n, S, D] -> [B, H, S/n, D]
    return lax.all_to_all(o_h, axis_name, split_axis=2, concat_axis=1,
                          tiled=True)
