"""Expert parallelism: a Mixture-of-Experts FFN with experts sharded over an
'ep' mesh axis (SURVEY.md T10's EP entry).

Two dispatch implementations:

- ``moe_ffn`` — **masked-dense**: every device runs ONLY its local experts,
  but over all tokens, masking by the router's assignment, and a single psum
  combines expert outputs. Exact (no capacity factor, no token dropping),
  at an E/top_k compute overhead. Kept as the exactness oracle and the
  small-scale fallback.
- ``moe_ffn_a2a`` — **GShard-style all_to_all capacity dispatch**: tokens
  are SHARDED over the ep axis; each device packs its tokens into fixed
  [E, C, H] per-expert queues (C = capacity, static — XLA needs static
  shapes, so over-capacity tokens are DROPPED, prioritized by router choice
  rank), all_to_all ships every expert its global queue [e_local, n·C, H],
  the expert MLPs run batched, and a second all_to_all + combine-weighted
  sum returns outputs. Per-device FLOPs = cf·k·T_local·mlp — the full
  E/(k·cf) factor below masked-dense. With capacity high enough for zero
  drops the result is EXACT (pinned against masked-dense in tests).

Router: top-k softmax gates, renormalized over the selected experts
(Switch/Mixtral convention). ``router_aux_loss`` is the Switch
load-balancing loss for training the router toward uniform dispatch.
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


def router_gates(x: jnp.ndarray, router_w: jnp.ndarray, top_k: int,
                 norm_topk: bool = True):
    """x [T, H] -> (expert ids [T, k] int32, gates [T, k] f32).

    norm_topk=True (Mixtral convention): softmax renormalized over the
    selected experts — identical to HF's softmax -> topk -> renormalize.
    norm_topk=False (Qwen3-MoE `norm_topk_prob=False`): the selected
    experts keep their FULL-softmax probabilities (gates sum to < 1)."""
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))
    top_vals, top_idx = lax.top_k(logits, top_k)  # [T, k]
    if norm_topk:
        gates = jax.nn.softmax(top_vals, axis=-1)
    else:
        logz = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        gates = jnp.exp(top_vals - logz)
    return top_idx.astype(jnp.int32), gates


def _act(g, activation: str):
    gf = g.astype(jnp.float32)
    return (jax.nn.gelu(gf, approximate=True) if activation == "gelu_tanh"
            else jax.nn.silu(gf))


def _swiglu(x, wg, wu, wd, activation: str = "silu"):
    g = jnp.dot(x, wg)
    u = jnp.dot(x, wu)
    return jnp.dot(_act(g, activation).astype(x.dtype) * u, wd)


def moe_ffn(
    x: jnp.ndarray,  # [T, H] tokens (replicated across the ep axis)
    params,  # router replicated; expert leaves are the LOCAL [E/n, ...] shard
    axis_name: str,
    top_k: int = 2,
    activation: str = "silu",
    norm_topk: bool = True,
) -> jnp.ndarray:
    """Expert-parallel MoE FFN; call INSIDE shard_map with expert weights
    sharded over `axis_name` (router replicated). Returns [T, H]."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    e_local = params["w_gate"].shape[0]
    base = idx * e_local

    expert_ids, gates = router_gates(x, params["router"], top_k, norm_topk)

    acc = jnp.zeros(x.shape, jnp.float32)
    for j in range(e_local):
        weight = jnp.sum(
            jnp.where(expert_ids == base + j, gates, 0.0), axis=-1
        )  # [T] — this local expert's gate (0 for unrouted tokens)
        y = _swiglu(x, params["w_gate"][j], params["w_up"][j],
                    params["w_down"][j], activation)
        acc = acc + y.astype(jnp.float32) * weight[:, None]
    return lax.psum(acc, axis_name).astype(x.dtype)


def moe_ffn_a2a(
    x: jnp.ndarray,  # [T_local, H] tokens SHARDED over the ep axis
    params,  # router replicated; expert leaves are the LOCAL [E/n, ...] shard
    axis_name: str,
    top_k: int = 2,
    capacity_factor: float = 2.0,
    capacity: int | None = None,
    activation: str = "silu",
    norm_topk: bool = True,
) -> jnp.ndarray:
    """GShard-style all_to_all expert dispatch; call INSIDE shard_map with
    tokens sharded over `axis_name` (see module docstring).

    capacity: per-(expert, source-device) queue length; default
    ceil(cf · k · T_local / E) rounded up to a sublane multiple. Tokens
    routed past an expert's capacity are dropped (their gate weight simply
    contributes nothing), prioritized by router choice rank — the classic
    capacity/exactness trade the masked-dense path avoids.

    Dispatch and combine are scatter/gather on a flat [E·C, H] queue (VJPs:
    gather/scatter) — O(kT·H + E·C·H) memory. The dense one-hot dispatch
    tensors of the textbook einsum formulation ([kT, E, C] — hundreds of MB
    per layer at training shapes, all saved for backward) never exist.
    """
    n = lax.axis_size(axis_name)
    e = params["router"].shape[1]
    e_local = params["w_gate"].shape[0]
    assert e_local * n == e, (e_local, n, e)
    t_l, h = x.shape
    if capacity is None:
        from flashattn_tpu.ops.common import round_up

        capacity = round_up(
            max(1, int(-(-capacity_factor * top_k * t_l // e))), 8)

    expert_ids, gates = router_gates(x, params["router"], top_k, norm_topk)

    # Queue slot assignment, choice-major priority (all rank-0 choices claim
    # slots before any rank-1 choice, GShard-style). Choice-major row
    # ordering: row c*T + t is token t's c-th choice.
    ids_cm = expert_ids.T.reshape(top_k * t_l)  # [kT]
    m_cm = jax.nn.one_hot(ids_cm, e, dtype=jnp.int32)  # [kT, E]
    pos_all = jnp.cumsum(m_cm, axis=0) - m_cm  # [kT, E]
    pos = jnp.take_along_axis(pos_all, ids_cm[:, None], axis=1)[:, 0]
    keep = pos < capacity
    # Flat queue index; dropped entries point past the end and fall out of
    # the scatter (mode="drop") / gather (mode="fill").
    dest = jnp.where(keep, ids_cm * capacity + pos, e * capacity)

    x_cm = jnp.tile(x, (top_k, 1))  # [kT, H] row c*T+t = x[t]
    expert_in = jnp.zeros((e * capacity, h), x.dtype).at[dest].add(
        x_cm, mode="drop").reshape(e, capacity, h)
    ein = lax.all_to_all(expert_in, axis_name, split_axis=0, concat_axis=1,
                         tiled=True)  # [e_local, n*C, H]

    g = jnp.einsum("ech,ehf->ecf", ein, params["w_gate"])
    u = jnp.einsum("ech,ehf->ecf", ein, params["w_up"])
    act = _act(g, activation).astype(x.dtype) * u
    y = jnp.einsum("ecf,efh->ech", act, params["w_down"])

    yout = lax.all_to_all(y, axis_name, split_axis=1, concat_axis=0,
                          tiled=True)  # [E, C, H] back at the token owner
    y_tok = jnp.take(yout.reshape(e * capacity, h), dest, axis=0,
                     mode="fill", fill_value=0)  # [kT, H]
    w = gates.T.reshape(top_k * t_l) * keep.astype(jnp.float32)
    out = (y_tok.astype(jnp.float32) * w[:, None]).reshape(
        top_k, t_l, h).sum(0)
    return out.astype(x.dtype)


def router_aux_loss(x: jnp.ndarray, router_w: jnp.ndarray,
                    top_k: int = 2) -> jnp.ndarray:
    """Switch-Transformer load-balancing loss: E · Σ_e f_e · p_e, where f_e
    is the fraction of tokens whose TOP choice is e and p_e the mean router
    probability of e. Minimized (=1) at uniform dispatch; add
    coef·aux (coef ~0.01) to the training loss when using capacity dispatch
    so drops stay rare."""
    e = router_w.shape[1]
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # [T, E]
    top1 = jnp.argmax(logits, axis=-1)
    f = jnp.mean(jax.nn.one_hot(top1, e, dtype=jnp.float32), axis=0)
    p = jnp.mean(probs, axis=0)
    return e * jnp.sum(f * p)


def moe_ffn_dense_reference(x, params, top_k: int = 2,
                            activation: str = "silu",
                            norm_topk: bool = True):
    """Unsharded oracle: all experts on one device."""
    expert_ids, gates = router_gates(x, params["router"], top_k, norm_topk)
    acc = jnp.zeros(x.shape, jnp.float32)
    for j in range(params["w_gate"].shape[0]):
        weight = jnp.sum(jnp.where(expert_ids == j, gates, 0.0), axis=-1)
        y = _swiglu(x, params["w_gate"][j], params["w_up"][j],
                    params["w_down"][j], activation)
        acc = acc + y.astype(jnp.float32) * weight[:, None]
    return acc.astype(x.dtype)
