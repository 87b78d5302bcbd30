"""MoE model variant (Mixtral-style, SURVEY T10/T12): trains, generates, and
the 'ep'-sharded forward equals the dense forward exactly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from flashattn_tpu.models import generate, llama, train
from flashattn_tpu.models.config import TINY_MOE
from flashattn_tpu.parallel import make_mesh

CFG = dataclasses.replace(TINY_MOE, dtype=jnp.float32)


def test_moe_model_trains():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tc = train.TrainConfig(learning_rate=1e-3, warmup_steps=2,
                           total_steps=40)
    state = train.init_train_state(params, tc)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 65), 0,
                                CFG.vocab_size, jnp.int32)
    first = None
    for _ in range(15):
        state, m = train.train_step(state, tokens, CFG, tc)
        first = first if first is not None else float(m["loss"])
    assert float(m["loss"]) < first * 0.8, (first, float(m["loss"]))


def test_moe_model_generates():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    out = generate.generate(params, jnp.asarray([[1, 2, 3]], jnp.int32),
                            CFG, max_new_tokens=6, max_len=128)
    assert out.shape == (1, 6)


def test_moe_model_ep_mesh_matches_dense():
    mesh = make_mesh({"ep": 4})
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 64), 0,
                                CFG.vocab_size, jnp.int32)
    dense = llama.forward(params, tokens, CFG, mesh=None)
    sharded = llama.forward(params, tokens, CFG, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)
