"""Expert parallelism: a Mixture-of-Experts FFN with experts sharded over an
'ep' mesh axis (SURVEY.md T10's EP entry).

v1 dispatch is **masked-dense**: every device runs ONLY its local experts,
but over all tokens, masking by the router's assignment, and a single psum
combines expert outputs. This is exact (no capacity factor, no token
dropping) and genuinely expert-parallel — per-device compute is
(E / n_ep) · tokens · mlp, so it scales with the axis — at the cost of an
E/top_k compute overhead vs. a sort-based all_to_all dispatch (the
documented optimization path; Gshard-style capacity dispatch trades
exactness for it).

Router: top-k softmax gates, renormalized over the selected experts
(Switch/Mixtral convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def init_moe_params(key, hidden: int, intermediate: int, num_experts: int,
                    dtype=jnp.float32):
    """Router + per-expert SwiGLU weights, experts stacked on axis 0
    (shard leaves with PartitionSpec('ep', ...))."""
    ks = jax.random.split(key, 4)

    def dense(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    e, h, f = num_experts, hidden, intermediate
    return {
        "router": dense(ks[0], (h, e), h**-0.5),
        "w_gate": dense(ks[1], (e, h, f), h**-0.5),
        "w_up": dense(ks[2], (e, h, f), h**-0.5),
        "w_down": dense(ks[3], (e, f, h), f**-0.5),
    }


def router_gates(x: jnp.ndarray, router_w: jnp.ndarray, top_k: int):
    """x [T, H] -> (expert ids [T, k] int32, gates [T, k] f32, renormalized
    softmax over the selected experts)."""
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))
    top_vals, top_idx = lax.top_k(logits, top_k)  # [T, k]
    gates = jax.nn.softmax(top_vals, axis=-1)
    return top_idx.astype(jnp.int32), gates


def _swiglu(x, wg, wu, wd):
    g = jnp.dot(x, wg)
    u = jnp.dot(x, wu)
    return jnp.dot(jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u, wd)


def moe_ffn(
    x: jnp.ndarray,  # [T, H] tokens (replicated across the ep axis)
    params,  # router replicated; expert leaves are the LOCAL [E/n, ...] shard
    axis_name: str,
    top_k: int = 2,
) -> jnp.ndarray:
    """Expert-parallel MoE FFN; call INSIDE shard_map with expert weights
    sharded over `axis_name` (router replicated). Returns [T, H]."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    e_local = params["w_gate"].shape[0]
    base = idx * e_local

    expert_ids, gates = router_gates(x, params["router"], top_k)  # [T, k]

    acc = jnp.zeros(x.shape, jnp.float32)
    for j in range(e_local):
        weight = jnp.sum(
            jnp.where(expert_ids == base + j, gates, 0.0), axis=-1
        )  # [T] — this local expert's gate (0 for unrouted tokens)
        y = _swiglu(x, params["w_gate"][j], params["w_up"][j],
                    params["w_down"][j])
        acc = acc + y.astype(jnp.float32) * weight[:, None]
    return lax.psum(acc, axis_name).astype(x.dtype)


def moe_ffn_dense_reference(x, params, top_k: int = 2):
    """Unsharded oracle: all experts on one device."""
    expert_ids, gates = router_gates(x, params["router"], top_k)
    acc = jnp.zeros(x.shape, jnp.float32)
    for j in range(params["w_gate"].shape[0]):
        weight = jnp.sum(jnp.where(expert_ids == j, gates, 0.0), axis=-1)
        y = _swiglu(x, params["w_gate"][j], params["w_up"][j],
                    params["w_down"][j])
        acc = acc + y.astype(jnp.float32) * weight[:, None]
    return acc.astype(x.dtype)
