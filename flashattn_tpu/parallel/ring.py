"""Ring flash attention — context parallelism over a mesh axis.

TPU-native sequence parallelism (SURVEY.md §2.3 T10, §5 "long-context").
The reference has no distributed code; what it DOES provide is the math
that makes this possible: the online-softmax (m, l, acc) update rule is
associative (reference ``Phase_0.md:123-188``, kernel
``_flash_attention_kernel_optimized.py:106-117``), so partial attention
results computed against disjoint key shards merge exactly with the same
correction algebra the kernel applies per tile. Ring attention is that
merge applied across chips instead of across VMEM tiles.

Design (inside ``shard_map``; every array is the per-device shard):

  forward:  each device holds Q_i, K_i, V_i  ([B, H, S/n, D], contiguous
            partition). For n ring steps, the device attends its Q shard to
            the K/V shard it currently holds, merges (o, lse) partials into
            running (m, l, acc) stats, and rotates K/V one hop along the
            axis with ``lax.ppermute`` — the permute for step t+1 is issued
            BEFORE step t's compute so XLA can overlap the ICI transfer with
            the kernel.
  causal:   at step t the device holds the shard originating from
            ``src = (idx - t) mod n``. step 0 is the diagonal (local causal
            kernel — statically known); step t>0 is either fully visible
            (src < idx, i.e. t <= idx) or fully masked (skip). The
            visible/skip choice is a runtime ``lax.cond`` on the device
            index — the cross-chip analogue of the reference's
            full-visible / partial / skip block taxonomy
            (``Phase_3.md:273-322``).
  backward: custom_vjp. dQ accumulates locally (every step contributes to
            the resident Q shard); dK/dV accumulators TRAVEL with the K/V
            shards so each contribution is computed where the (Q_i, K_src)
            pair is resident; after the loop one final hop returns them to
            their owners (n hops = identity). The per-step primitive is the
            two-kernel recompute backward called with the GLOBAL O/dO/LSE:
            P rebuilt as exp(S - LSE_global) is exactly the global softmax
            restricted to this shard's columns, and delta = rowsum(dO ⊙ O)
            is the global delta, so per-shard dQ/dK/dV partials are exact
            partial sums of the true gradients (math: ``Phase_4.md:97-158``).

Known trade-off: contiguous partitioning under causal masking is
load-imbalanced (device 0 skips n-1 of n steps). The striped/zig-zag layout
fixes this at the cost of index gymnastics; measured single-host it is not
the bottleneck, so v1 ships contiguous (documented, not silently capped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from flashattn_tpu.ops.common import BlockSizes
from flashattn_tpu.ops.flash_bwd import flash_attention_backward
from flashattn_tpu.ops.flash_fwd import flash_attention_forward

NEG_INF = float("-inf")


def _merge_partial(m, l, acc, o_p, lse_p):
    """Fold a normalized partial (o_p, lse_p) into running (m, l, acc).

    Same correction algebra as the kernel's inner loop (reference
    ``:106-117``), in natural-log units, -inf-safe (fully-masked partials
    carry lse_p = -inf and must be no-ops).
    """
    m_new = jnp.maximum(m, lse_p)
    m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
    gamma = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_safe))
    w_p = jnp.where(jnp.isneginf(lse_p), 0.0, jnp.exp(lse_p - m_safe))
    acc_new = acc * gamma[..., None] + o_p.astype(jnp.float32) * w_p[..., None]
    l_new = l * gamma + w_p
    return m_new, l_new, acc_new


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def _rotate(xs, axis_name: str, n: int):
    perm = _ring_perm(n)
    return [lax.ppermute(x, axis_name, perm) for x in xs]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def ring_flash_attention(
    q,
    k,
    v,
    axis_name: str,
    is_causal: bool = False,
    scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
):
    """Context-parallel flash attention; call INSIDE shard_map.

    Args:
      q: [B, Hq, S/n, D] local query shard (sequence contiguously
         partitioned over `axis_name`); k, v: [B, Hkv, S/n, D] local shards.
      axis_name: mesh axis carrying the sequence shards.
      is_causal: global causal mask (chunk-aligned across the ring).

    Returns:
      O [B, Hq, S/n, D] local output shard in q.dtype.
    """
    o, _ = _ring_forward(q, k, v, axis_name, is_causal, scale, block_sizes,
                         interpret)
    return o


def _ring_forward(q, k, v, axis_name, is_causal, scale, block_sizes,
                  interpret):
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    b, hq, s_local, d = q.shape

    if scale is None:
        scale = 1.0 / (d**0.5)

    def local_attn(k_in, v_in, causal):
        return flash_attention_forward(
            q, k_in, v_in, is_causal=causal, scale=scale,
            block_sizes=block_sizes, interpret=interpret,
        )

    m = jnp.full((b, hq, s_local), NEG_INF, jnp.float32)
    l = jnp.zeros((b, hq, s_local), jnp.float32)
    acc = jnp.zeros((b, hq, s_local, d), jnp.float32)

    k_cur, v_cur = k, v
    for step in range(n):
        if step < n - 1:
            k_nxt, v_nxt = _rotate([k_cur, v_cur], axis_name, n)
        if not is_causal:
            o_p, lse_p = local_attn(k_cur, v_cur, False)
        elif step == 0:
            o_p, lse_p = local_attn(k_cur, v_cur, True)  # diagonal shard
        else:
            # Visible iff the shard we hold originated upstream of us
            # (src = idx - step  =>  visible iff step <= idx).
            def _visible(kv):
                return local_attn(kv[0], kv[1], False)

            def _skip(kv):
                return (
                    jnp.zeros((b, hq, s_local, d), q.dtype),
                    jnp.full((b, hq, s_local), NEG_INF, jnp.float32),
                )

            o_p, lse_p = lax.cond(step <= idx, _visible, _skip,
                                  (k_cur, v_cur))
        m, l, acc = _merge_partial(m, l, acc, o_p, lse_p)
        if step < n - 1:
            k_cur, v_cur = k_nxt, v_nxt

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = (acc / l_safe[..., None]).astype(q.dtype)
    lse = jnp.where(l == 0.0, NEG_INF, m + jnp.log(l_safe))
    return o, lse


def _ring_fwd(q, k, v, axis_name, is_causal, scale, block_sizes, interpret):
    o, lse = _ring_forward(q, k, v, axis_name, is_causal, scale, block_sizes,
                           interpret)
    return o, (q, k, v, o, lse)


def _ring_bwd(axis_name, is_causal, scale, block_sizes, interpret,
              residuals, do):
    q, k, v, o, lse = residuals
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    b, hq, s_local, d = q.shape
    hkv = k.shape[1]
    if scale is None:
        scale = 1.0 / (d**0.5)

    def local_bwd(k_in, v_in, causal):
        return flash_attention_backward(
            q, k_in, v_in, o, do, lse, is_causal=causal, scale=scale,
            block_sizes=block_sizes, interpret=interpret,
        )

    dq_acc = jnp.zeros((b, hq, s_local, d), jnp.float32)
    dk_cur = jnp.zeros((b, hkv, s_local, d), jnp.float32)
    dv_cur = jnp.zeros((b, hkv, s_local, d), jnp.float32)
    k_cur, v_cur = k, v

    for step in range(n):
        if step < n - 1:
            k_nxt, v_nxt = _rotate([k_cur, v_cur], axis_name, n)
        if not is_causal:
            dq_p, dk_p, dv_p = local_bwd(k_cur, v_cur, False)
        elif step == 0:
            dq_p, dk_p, dv_p = local_bwd(k_cur, v_cur, True)
        else:
            def _visible(kv):
                return local_bwd(kv[0], kv[1], False)

            def _skip(kv):
                return (
                    jnp.zeros((b, hq, s_local, d), q.dtype),
                    jnp.zeros((b, hkv, s_local, d), k.dtype),
                    jnp.zeros((b, hkv, s_local, d), v.dtype),
                )

            dq_p, dk_p, dv_p = lax.cond(step <= idx, _visible, _skip,
                                        (k_cur, v_cur))
        dq_acc = dq_acc + dq_p.astype(jnp.float32)
        dk_cur = dk_cur + dk_p.astype(jnp.float32)
        dv_cur = dv_cur + dv_p.astype(jnp.float32)
        # dK/dV accumulators travel WITH their K/V shard; the K/V rotation
        # below and the final hop after the loop complete the full cycle
        # that brings each accumulator home to the shard's owner.
        if step < n - 1:
            k_cur, v_cur = k_nxt, v_nxt
            dk_cur, dv_cur = _rotate([dk_cur, dv_cur], axis_name, n)

    dk_cur, dv_cur = _rotate([dk_cur, dv_cur], axis_name, n)
    return (
        dq_acc.astype(q.dtype),
        dk_cur.astype(k.dtype),
        dv_cur.astype(v.dtype),
    )


ring_flash_attention.defvjp(_ring_fwd, _ring_bwd)
