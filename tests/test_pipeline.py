"""Pipeline-parallelism tests (SURVEY.md T10): the GPipe shard_map pipeline
must reproduce the plain forward exactly, and jax.grad through it must match
the unpipelined gradients (ppermute transpose = reverse schedule)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.models import llama
from flashattn_tpu.models.config import ModelConfig
from flashattn_tpu.parallel import make_mesh
from flashattn_tpu.parallel.pipeline import pipeline_apply

# Small on purpose: pipelined autodiff compiles a (M + n - 1)-tick unrolled
# graph; keep the per-tick graph tiny so the suite stays fast.
CFG = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=4,
    num_heads=2, num_kv_heads=2, head_dim=32, max_seq_len=64,
    dtype=jnp.float32,
)


def test_pipeline_apply_identity_math():
    """Toy stage (affine per stage) — y = x + n_stages * bias chain."""
    mesh = make_mesh({"pp": 4})
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 16))  # [M, mb, F]
    biases = jnp.arange(4, dtype=jnp.float32).reshape(4, 1)  # per stage

    def body(bias, x_mbs):
        return pipeline_apply(lambda b, t: t + b[0], bias, x_mbs, "pp")

    from jax.sharding import PartitionSpec as P

    y = jax.shard_map(
        body, mesh=mesh, in_specs=(P("pp"), P()), out_specs=P(),
        check_vma=False,
    )(biases, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) + 6.0, rtol=1e-6)


@pytest.mark.parametrize("n_pp,n_mb", [(2, 4), (4, 4)])
def test_pipeline_forward_matches_plain(n_pp, n_mb):
    mesh = make_mesh({"pp": n_pp})
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 32), 0,
                                CFG.vocab_size, jnp.int32)
    plain = llama.forward(params, tokens, CFG)
    stacked = llama.stack_pipeline_params(params, n_pp)
    piped = llama.pipeline_forward(stacked, tokens, CFG, mesh, n_mb)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(plain),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_grads_match_plain():
    n_pp, n_mb = 2, 2
    mesh = make_mesh({"pp": n_pp})
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (4, 17), 0,
                                CFG.vocab_size, jnp.int32)

    plain_loss = lambda p: llama.loss_fn(p, tokens, CFG)
    g_plain = jax.grad(plain_loss)(params)

    piped_loss = lambda p: llama.pipeline_loss_fn(
        llama.stack_pipeline_params(p, n_pp), tokens, CFG, mesh, n_mb)
    g_piped = jax.grad(piped_loss)(params)

    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_piped)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_pipeline_with_data_axis():
    """pp x data 2D mesh: batch sharded over data, stages over pp."""
    mesh = make_mesh({"data": 2, "pp": 2})
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(3), (8, 32), 0,
                                CFG.vocab_size, jnp.int32)
    plain = llama.forward(params, tokens, CFG)
    stacked = llama.stack_pipeline_params(params, 2)
    piped = llama.pipeline_forward(stacked, tokens, CFG, mesh, 4)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(plain),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_remat_grads_identical():
    # remat=True must change memory behavior only: bitwise-equal grads to
    # the non-remat pipeline (jax.checkpoint recomputes the same ops).
    n_pp, n_mb = 2, 2
    mesh = make_mesh({"pp": n_pp})
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(5), (4, 17), 0,
                                CFG.vocab_size, jnp.int32)
    loss = lambda p, r: llama.pipeline_loss_fn(
        llama.stack_pipeline_params(p, n_pp), tokens, CFG, mesh, n_mb,
        remat=r)
    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)
