"""Model-layer tests: single-device forward, training-step sanity, and
TP/DP-sharded forward parity against the unsharded model (SURVEY.md §4:
multi-device tests via the virtual CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from flashattn_tpu.models import llama
from flashattn_tpu.models.config import TINY


@pytest.fixture(scope="module")
def setup():
    cfg = TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (2, 128), 0, cfg.vocab_size, jnp.int32
    )
    return cfg, params, tokens


def test_forward_shapes(setup):
    cfg, params, tokens = setup
    logits = llama.forward(params, tokens, cfg)
    assert logits.shape == (2, 128, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())


def test_loss_decreases(setup):
    cfg, params, tokens = setup
    loss0 = float(llama.loss_fn(params, tokens, cfg))
    p = params
    for _ in range(3):
        loss, p = llama.sgd_train_step(p, tokens, cfg, lr=5e-2)
    loss1 = float(llama.loss_fn(p, tokens, cfg))
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0, (loss0, loss1)


def test_sharded_forward_matches_unsharded(setup):
    cfg, params, tokens = setup
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "model"))
    shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), llama.param_shardings(cfg),
        is_leaf=lambda x: isinstance(x, P),
    )
    params_sharded = jax.device_put(params, shardings)
    tokens_sharded = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))

    logits_ref = llama.forward(params, tokens, cfg)
    logits_tp = jax.jit(
        lambda p, t: llama.forward(p, t, cfg, mesh=mesh)
    )(params_sharded, tokens_sharded)
    # bf16 matmuls + sharded psum reorder reductions; gate like the bf16
    # kernel tests (allclose with loose atol AND cosine > 0.999).
    from flashattn_tpu.utils.verify import verify_results

    r = verify_results(logits_ref, logits_tp, rtol=5e-2, atol=1e-1)
    assert r.passed, r


def test_multichip_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
