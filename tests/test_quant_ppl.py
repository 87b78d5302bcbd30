"""Quantized-KV quality gate (BASELINE.json north_star: FP8-KV decode within
0.1 ppl of bf16).

A tiny model is trained to sharp next-token distributions (memorization), so
quantization error in the KV cache actually moves the loss; perplexity is
then measured through the REAL decode path (prefill + decode_step with the
flash-decode kernel) under bf16 / fp8 / int8 caches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.models import generate, llama, train
from flashattn_tpu.models.config import ModelConfig

CFG = ModelConfig(
    vocab_size=128, hidden_size=128, intermediate_size=256, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=32, max_seq_len=128,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def trained():
    tc = train.TrainConfig(learning_rate=2e-3, warmup_steps=2,
                           total_steps=80)
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    state = train.init_train_state(params, tc)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 65), 0,
                                CFG.vocab_size, jnp.int32)
    for _ in range(60):
        state, m = train.train_step(state, tokens, CFG, tc)
    assert float(m["loss"]) < 1.0, float(m["loss"])
    return state["params"], tokens


def decode_ppl(params, tokens, quant):
    """Teacher-forced NLL through prefill + decode_step (the decode path)."""
    b, s1 = tokens.shape
    s = s1 - 1
    caches = generate.init_caches(CFG, b, 128, quant=quant)
    # Prefill on the first token only, then decode the rest step by step.
    logits, caches = generate.prefill(params, tokens[:, :1], caches, CFG)
    nll, count = 0.0, 0
    for t in range(1, s + 1):
        target = tokens[:, t]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll += float(-jnp.take_along_axis(
            logp, target[:, None], axis=-1).sum())
        count += b
        if t < s:
            positions = jnp.full((b,), t, jnp.int32)
            logits, caches = generate.decode_step(
                params, target, positions, caches, CFG)
    return float(np.exp(nll / count))


def test_decode_path_matches_training_forward(trained):
    """bf16-cache decode ppl must agree with the training forward's ppl."""
    params, tokens = trained
    train_loss = float(llama.loss_fn(params, tokens, CFG))
    ppl_train = float(np.exp(train_loss))
    ppl_decode = decode_ppl(params, tokens, quant=None)
    assert abs(ppl_decode - ppl_train) < 0.05 * ppl_train + 0.05, (
        ppl_train, ppl_decode)


@pytest.mark.parametrize("quant,budget", [("fp8", 0.1), ("int8", 0.1)])
def test_quantized_kv_ppl_gate(trained, quant, budget):
    params, tokens = trained
    ppl_bf16 = decode_ppl(params, tokens, quant=None)
    ppl_q = decode_ppl(params, tokens, quant=quant)
    delta = abs(ppl_q - ppl_bf16)
    assert delta < budget, (
        f"{quant} KV cache ppl delta {delta:.4f} exceeds {budget} "
        f"(bf16 {ppl_bf16:.4f} vs {quant} {ppl_q:.4f})")


@pytest.mark.parametrize("bits,budget", [(8, 0.1), (4, 1.0)])
def test_weight_only_quant_ppl(trained, bits, budget):
    """Weight-only INT8/INT4 projections (T8) through the decode path:
    int8 must stay within the same 0.1-ppl budget as the KV gates; int4
    (4-bit weights on a sharply memorized model) gets a looser, honest one."""
    from flashattn_tpu.models import llama

    params, tokens = trained
    ppl_full = decode_ppl(params, tokens, quant=None)
    qparams = llama.quantize_params(params, bits=bits)
    ppl_q = decode_ppl(qparams, tokens, quant=None)
    delta = abs(ppl_q - ppl_full)
    assert delta < budget, (
        f"int{bits} weights ppl delta {delta:.4f} exceeds {budget} "
        f"(full {ppl_full:.4f} vs int{bits} {ppl_q:.4f})")


def test_weight_quant_plus_kv_quant_generation(trained):
    """The full quantized-inference stack: int8 weights + int8 KV cache."""
    from flashattn_tpu.models import generate, llama

    params, tokens = trained
    qparams = llama.quantize_params(params, bits=8)
    out = generate.generate(qparams, tokens[:1, :8], CFG,
                            max_new_tokens=8, max_len=128, quant="int8")
    assert out.shape == (1, 8)
