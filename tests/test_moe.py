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
