"""Packed-document (varlen) training through the model layer: packed forward
must reproduce per-document unpacked forward exactly (fp32) — this checks
segment-masked attention AND per-document RoPE position restarts at once."""

import jax
import jax.numpy as jnp
import numpy as np

from flashattn_tpu.models import llama
from flashattn_tpu.models.config import ModelConfig

CFG = ModelConfig(
    vocab_size=128, hidden_size=128, intermediate_size=256, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=32, max_seq_len=256,
    dtype=jnp.float32,
)
LENS = [40, 17, 60]


def packed_inputs(seed=0, pad=11):
    total = sum(LENS) + pad
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, CFG.vocab_size, size=(1, total)).astype(np.int32)
    ids = np.full((1, total), -1, np.int32)
    off = 0
    for i, ln in enumerate(LENS):
        ids[0, off:off + ln] = i
        off += ln
    return jnp.asarray(tokens), jnp.asarray(ids)


def test_packed_forward_matches_unpacked():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tokens, seg = packed_inputs()
    packed = llama.forward(params, tokens, CFG, segment_ids=seg)
    off = 0
    for ln in LENS:
        doc = tokens[:, off:off + ln]
        solo = llama.forward(params, doc, CFG)
        np.testing.assert_allclose(
            np.asarray(packed[:, off:off + ln]), np.asarray(solo),
            rtol=2e-4, atol=2e-4)
        off += ln


def test_packed_loss_masks_boundaries():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tokens, seg = packed_inputs(seed=2)
    loss = llama.loss_fn(params, tokens, CFG, segment_ids=seg)
    assert np.isfinite(float(loss))
    # Oracle: mean of per-document losses weighted by predicted tokens.
    tot, cnt = 0.0, 0
    off = 0
    for ln in LENS:
        doc = tokens[:, off:off + ln]
        l = float(llama.loss_fn(params, doc, CFG))
        tot += l * (ln - 1)
        cnt += ln - 1
        off += ln
    assert abs(float(loss) - tot / cnt) < 2e-4, (float(loss), tot / cnt)


def test_packed_training_step():
    from flashattn_tpu.models import train

    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tokens, seg = packed_inputs(seed=3)
    tc = train.TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=20)
    loss_grad = jax.jit(jax.value_and_grad(
        lambda p: llama.loss_fn(p, tokens, CFG, segment_ids=seg)))
    opt = train.make_optimizer(tc)
    state = opt.init(params)
    import optax
    first = None
    for _ in range(10):
        loss, grads = loss_grad(params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        first = first if first is not None else float(loss)
    assert float(loss) < first


def test_packed_alibi_model_forward():
    """cfg.use_alibi must reach the varlen kernels through the model layer:
    packed forward == per-document forward (silently dropping the bias was
    a review finding — this pins the wiring)."""
    import numpy as np

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=32, max_seq_len=512,
        dtype=jnp.float32, use_alibi=True,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    lens = [60, 40]
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, sum(lens)), 0,
                              cfg.vocab_size, jnp.int32)
    seg = jnp.asarray([[0] * lens[0] + [1] * lens[1]], jnp.int32)
    packed = llama.forward(params, toks, cfg, segment_ids=seg)
    parts, off = [], 0
    for n in lens:
        parts.append(llama.forward(params, toks[:, off:off + n], cfg))
        off += n
    ref = jnp.concatenate(parts, axis=1)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
