"""Expert-parallel MoE tests (SURVEY.md T10 EP): the sharded FFN must equal
the dense single-device oracle exactly (masked-dense dispatch drops no
tokens), and grads must flow to every expert's weights."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from flashattn_tpu.parallel import make_mesh
from flashattn_tpu.parallel.moe import (
    init_moe_params,
    moe_ffn,
    moe_ffn_dense_reference,
)


def sharded_moe(mesh, params, x, top_k):
    specs = {
        "router": P(),
        "w_gate": P("ep"), "w_up": P("ep"), "w_down": P("ep"),
    }
    return jax.shard_map(
        functools.partial(moe_ffn, axis_name="ep", top_k=top_k),
        mesh=mesh, in_specs=(P(), specs), out_specs=P(),
        check_vma=False,
    )(x, params)


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("n_ep", [2, 4])
def test_moe_matches_dense(top_k, n_ep):
    mesh = make_mesh({"ep": n_ep})
    params = init_moe_params(jax.random.PRNGKey(0), hidden=64,
                             intermediate=128, num_experts=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (96, 64))
    y = sharded_moe(mesh, params, x, top_k)
    y_ref = moe_ffn_dense_reference(x, params, top_k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_grads_match_dense():
    mesh = make_mesh({"ep": 4})
    params = init_moe_params(jax.random.PRNGKey(0), hidden=64,
                             intermediate=128, num_experts=8)
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 64))

    g_sharded = jax.grad(
        lambda p: jnp.sum(sharded_moe(mesh, p, x, 2) ** 2))(params)
    g_dense = jax.grad(
        lambda p: jnp.sum(moe_ffn_dense_reference(x, p, 2) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_dense),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)
    # Every expert receives tokens at this size — grads must be nonzero.
    assert all(float(jnp.abs(g).max()) > 0
               for g in jax.tree_util.tree_leaves(g_sharded))


def test_moe_gates_renormalized():
    from flashattn_tpu.parallel.moe import router_gates

    params = init_moe_params(jax.random.PRNGKey(0), hidden=32,
                             intermediate=64, num_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 32))
    _, gates = router_gates(x, params["router"], 2)
    np.testing.assert_allclose(np.asarray(gates.sum(-1)), 1.0, rtol=1e-6)


# ---------------- all_to_all capacity dispatch (GShard-style) ----------


def sharded_moe_a2a(mesh, params, x, top_k, cf=8.0, capacity=None):
    from flashattn_tpu.parallel.moe import moe_ffn_a2a

    specs = {
        "router": P(),
        "w_gate": P("ep"), "w_up": P("ep"), "w_down": P("ep"),
    }
    return jax.shard_map(
        functools.partial(moe_ffn_a2a, axis_name="ep", top_k=top_k,
                          capacity_factor=cf, capacity=capacity),
        mesh=mesh, in_specs=(P("ep"), specs), out_specs=P("ep"),
        check_vma=False,
    )(x, params)


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("n_ep", [2, 4])
def test_moe_a2a_matches_dense(top_k, n_ep):
    # Capacity high enough for zero drops -> the a2a dispatch is EXACT
    # against the masked-dense/dense oracle (the VERDICT #8 gate).
    mesh = make_mesh({"ep": n_ep})
    params = init_moe_params(jax.random.PRNGKey(0), hidden=64,
                             intermediate=128, num_experts=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (96, 64))
    y = sharded_moe_a2a(mesh, params, x, top_k)
    y_ref = moe_ffn_dense_reference(x, params, top_k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_activation_threading():
    """mlp_activation must reach the MoE paths: gelu_tanh differs from silu,
    and the a2a dispatch matches the dense oracle under gelu_tanh too."""
    from flashattn_tpu.parallel.moe import moe_ffn_a2a

    mesh = make_mesh({"ep": 2})
    params = init_moe_params(jax.random.PRNGKey(0), hidden=64,
                             intermediate=128, num_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    silu = moe_ffn_dense_reference(x, params, 2)
    gelu = moe_ffn_dense_reference(x, params, 2, activation="gelu_tanh")
    assert not np.allclose(np.asarray(silu), np.asarray(gelu))

    specs = {"router": P(), "w_gate": P("ep"), "w_up": P("ep"),
             "w_down": P("ep")}
    y = jax.shard_map(
        functools.partial(moe_ffn_a2a, axis_name="ep", top_k=2,
                          capacity_factor=8.0, activation="gelu_tanh"),
        mesh=mesh, in_specs=(P("ep"), specs), out_specs=P("ep"),
        check_vma=False,
    )(x, params)
    np.testing.assert_allclose(np.asarray(y), np.asarray(gelu),
                               rtol=1e-5, atol=1e-5)


def test_moe_a2a_grads_match_dense():
    mesh = make_mesh({"ep": 4})
    params = init_moe_params(jax.random.PRNGKey(0), hidden=64,
                             intermediate=128, num_experts=8)
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 64))
    g_a2a = jax.grad(
        lambda p: jnp.sum(sharded_moe_a2a(mesh, p, x, 2) ** 2))(params)
    g_dense = jax.grad(
        lambda p: jnp.sum(moe_ffn_dense_reference(x, p, 2) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_dense),
                    jax.tree_util.tree_leaves(g_a2a)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-4)


def test_moe_a2a_capacity_drops_are_bounded():
    # Capacity 8 per (expert, device) with 24 local tokens x k=2: drops are
    # expected; output must stay finite and equal the dense oracle on every
    # token whose choices all fit (drop = that choice contributes 0).
    mesh = make_mesh({"ep": 2})
    params = init_moe_params(jax.random.PRNGKey(0), hidden=32,
                             intermediate=64, num_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (48, 32))
    y = sharded_moe_a2a(mesh, params, x, 2, capacity=8)
    assert bool(jnp.all(jnp.isfinite(y)))
    y_full = sharded_moe_a2a(mesh, params, x, 2, capacity=64)
    y_ref = moe_ffn_dense_reference(x, params, 2)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    # Dropping must change SOMETHING at this pressure (otherwise the test
    # isn't exercising the capacity path).
    assert not np.allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)


def test_router_aux_loss_uniform_is_one():
    from flashattn_tpu.parallel.moe import router_aux_loss

    # A zero router gives uniform probabilities and (tie-broken) top-1
    # concentration; with E experts, aux = E * sum_e f_e * (1/E) = 1 for any
    # f. Perturbed routers move away from 1 only via concentration.
    x = jax.random.normal(jax.random.PRNGKey(0), (256, 16))
    w0 = jnp.zeros((16, 8))
    assert abs(float(router_aux_loss(x, w0, 2)) - 1.0) < 1e-5
    w = jax.random.normal(jax.random.PRNGKey(1), (16, 8)) * 5.0
    assert float(router_aux_loss(x, w, 2)) > 1.0
