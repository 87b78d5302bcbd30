"""Failure detection + elastic recovery (utils/failure.py) — the SURVEY §5
row the reference leaves empty. Fault injection drives the detect-restore-
skip loop against the real train step + Orbax checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.models import llama, train
from flashattn_tpu.models.config import ModelConfig
from flashattn_tpu.utils.failure import (
    StepTimer,
    TrainingFailure,
    check_finite,
    probe_collectives,
    resilient_train,
)

CFG = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=1,
    num_heads=2, num_kv_heads=2, head_dim=32, max_seq_len=64,
    dtype=jnp.float32,
)
TC = train.TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=20)


def data_stream(seed=0, b=2, s=33):
    rng = np.random.default_rng(seed)
    while True:
        yield jnp.asarray(
            rng.integers(0, CFG.vocab_size, size=(b, s)).astype(np.int32))


def test_check_finite():
    check_finite({"loss": 1.0, "grad_norm": 2.0}, step=1)
    with pytest.raises(TrainingFailure) as e:
        check_finite({"loss": float("nan")}, step=3)
    assert e.value.kind == "nonfinite"
    with pytest.raises(TrainingFailure):
        check_finite({"grad_norm": float("inf")}, step=4)


def test_step_timer_flags_persistent_slowdown_only():
    t = StepTimer(factor=3.0, calibrate=2, patience=2)
    for step, dt in enumerate((0.01, 0.01, 0.012, 0.2)):  # one straggler ok
        t.start()
        t._t0 -= dt  # simulate elapsed time
        t.stop(step)
    t.start(); t._t0 -= 0.2  # noqa: E702 — second consecutive slow step
    with pytest.raises(TrainingFailure) as e:
        t.stop(99)
    assert e.value.kind == "timeout"


def test_probe_collectives_healthy_mesh():
    from flashattn_tpu.parallel import make_mesh

    assert probe_collectives(make_mesh({"data": 8}), timeout_s=120.0)


def test_resilient_train_recovers_from_injected_nan(tmp_path):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    state = train.init_train_state(params, TC)
    poisoned = {"left": 1}

    def step_fn(state, batch):
        new_state, metrics = train.train_step(state, batch, CFG, TC)
        if int(new_state["step"]) == 3 and poisoned["left"]:
            poisoned["left"] -= 1  # fault fires once (a bad batch, skipped)
            metrics = dict(metrics, loss=jnp.float32(float("nan")))
        return new_state, metrics

    final, events = resilient_train(
        state, data_stream(), step_fn, steps=6, ckpt_dir=tmp_path,
        ckpt_every=2, max_recoveries=2)
    assert int(final["step"]) == 6
    assert len(events) == 1
    ev = events[0]
    assert ev.kind == "nonfinite" and ev.restored_step == 2
    # The final state must be finite and trainable.
    assert np.isfinite(float(jax.tree_util.tree_leaves(
        final["params"])[0].sum()))


def test_resilient_train_gives_up_on_persistent_fault(tmp_path):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    state = train.init_train_state(params, TC)

    def step_fn(state, batch):
        new_state, metrics = train.train_step(state, batch, CFG, TC)
        if int(new_state["step"]) >= 2:  # every batch after step 1 fails
            metrics = dict(metrics, loss=jnp.float32(float("inf")))
        return new_state, metrics

    with pytest.raises(TrainingFailure):
        resilient_train(state, data_stream(), step_fn, steps=6,
                        ckpt_dir=tmp_path, ckpt_every=2, max_recoveries=2)


def test_resilient_train_resumes_across_process_death(tmp_path):
    # Elasticity across process death: a "first process" checkpoints and
    # dies mid-run (simulated by stopping after its checkpoint); a fresh
    # state restored from ckpt_dir continues to the target step count.
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    state = train.init_train_state(params, TC)
    final1, _ = resilient_train(state, data_stream(),
                                lambda s, b: train.train_step(s, b, CFG, TC),
                                steps=4, ckpt_dir=tmp_path, ckpt_every=2)
    # "restart": fresh process restores the latest checkpoint.
    fresh = train.init_train_state(
        llama.init_params(CFG, jax.random.PRNGKey(1)), TC)
    restored = train.restore_checkpoint(tmp_path, fresh)
    assert int(restored["step"]) == 4
    final2, events = resilient_train(
        restored, data_stream(seed=7),
        lambda s, b: train.train_step(s, b, CFG, TC),
        steps=3, ckpt_dir=tmp_path, ckpt_every=2)
    assert int(final2["step"]) == 7 and not events
