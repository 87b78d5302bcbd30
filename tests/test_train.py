"""Training-loop + Orbax checkpoint/resume tests (SURVEY.md §5 — absent in
the reference, first-class here). Memorization smoke: loss must fall on a
repeated batch; resume must be bit-deterministic with an uninterrupted run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.models import llama, train
from flashattn_tpu.models.config import ModelConfig

TINY2 = ModelConfig(
    vocab_size=128, hidden_size=128, intermediate_size=256, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=32, max_seq_len=128,
    dtype=jnp.float32,
)
TC = train.TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=50)


def batch_iter(key, steps, b=2, s=64):
    tokens = jax.random.randint(key, (b, s + 1), 0, TINY2.vocab_size,
                                jnp.int32)
    for _ in range(steps):
        yield tokens  # same batch -> memorization


def test_loss_decreases():
    params = llama.init_params(TINY2, jax.random.PRNGKey(0))
    state = train.init_train_state(params, TC)
    it = batch_iter(jax.random.PRNGKey(1), 30)
    first = None
    for batch in it:
        state, metrics = train.train_step(state, batch, TINY2, TC)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.7, (first, last)
    assert np.isfinite(last)
    assert int(state["step"]) == 30


def test_checkpoint_roundtrip(tmp_path):
    params = llama.init_params(TINY2, jax.random.PRNGKey(0))
    state = train.init_train_state(params, TC)
    batch = next(batch_iter(jax.random.PRNGKey(1), 1))
    for _ in range(3):
        state, _ = train.train_step(state, batch, TINY2, TC)
    step = train.save_checkpoint(tmp_path / "ckpt", state)
    assert step == 3

    like = train.init_train_state(params, TC)
    restored = train.restore_checkpoint(tmp_path / "ckpt", like)
    assert int(restored["step"]) == 3
    for a, b in zip(jax.tree_util.tree_leaves(state["params"]),
                    jax.tree_util.tree_leaves(restored["params"])):
        assert jnp.array_equal(a, b)


def test_resume_is_deterministic(tmp_path):
    params = llama.init_params(TINY2, jax.random.PRNGKey(0))
    batch = next(batch_iter(jax.random.PRNGKey(1), 1))

    # Uninterrupted: 6 steps.
    s_full = train.init_train_state(params, TC)
    for _ in range(6):
        s_full, m_full = train.train_step(s_full, batch, TINY2, TC)

    # Interrupted: 3 steps, checkpoint, restore, 3 more.
    s_a = train.init_train_state(params, TC)
    for _ in range(3):
        s_a, _ = train.train_step(s_a, batch, TINY2, TC)
    train.save_checkpoint(tmp_path / "ckpt", s_a)
    s_b = train.restore_checkpoint(tmp_path / "ckpt",
                                   train.init_train_state(params, TC))
    for _ in range(3):
        s_b, m_b = train.train_step(s_b, batch, TINY2, TC)

    assert int(s_b["step"]) == 6
    assert float(m_b["loss"]) == pytest.approx(float(m_full["loss"]),
                                               rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_full["params"]),
                    jax.tree_util.tree_leaves(s_b["params"])):
        assert jnp.allclose(a, b, atol=1e-7), "resume diverged"


def test_train_driver_with_resume(tmp_path):
    params = llama.init_params(TINY2, jax.random.PRNGKey(0))
    state, hist = train.train(
        params, batch_iter(jax.random.PRNGKey(1), 5), TINY2, TC, steps=5,
        ckpt_dir=tmp_path / "ckpt", ckpt_every=100, log_every=1,
    )
    assert int(state["step"]) == 5 and len(hist) == 5
    # Second call resumes from step 5.
    state2, _ = train.train(
        params, batch_iter(jax.random.PRNGKey(1), 2), TINY2, TC, steps=2,
        ckpt_dir=tmp_path / "ckpt", ckpt_every=100, log_every=1,
    )
    assert int(state2["step"]) == 7


@pytest.mark.parametrize("remat", [True, "dots", "attn"])
def test_remat_grads_identical(remat):
    """jax.checkpoint rematerialization — full, dots-saveable, or the
    selective flash-residual policy (remat="attn", saves only the
    "flash_resid"-named custom_vjp residuals) — must not change loss or
    grads."""
    params = llama.init_params(TINY2, jax.random.PRNGKey(0))
    batch = next(batch_iter(jax.random.PRNGKey(1), 1))
    l0, g0 = jax.value_and_grad(
        lambda p: llama.loss_fn(p, batch, TINY2))(params)
    l1, g1 = jax.value_and_grad(
        lambda p: llama.loss_fn(p, batch, TINY2, remat=remat))(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        assert jnp.allclose(a, b, atol=1e-6), "remat changed gradients"
