"""End-to-end logits parity against transformers' LlamaForCausalLM: a tiny
randomly-initialized HF model's weights convert into our pytree and the two
stacks must produce matching logits (fp32). Validates every convention at
once: weight transposes, RoPE, RMSNorm, SwiGLU, GQA, causal attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flashattn_tpu.models import generate, llama  # noqa: E402
from flashattn_tpu.models.convert import config_from_hf, params_from_hf  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(42)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    return model, hf_cfg


def test_logits_parity(hf_model):
    model, hf_cfg = hf_model
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(2, 48))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                    cfg))
    # fp32 end-to-end; small accumulation differences only.
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_greedy_generation_parity(hf_model):
    model, hf_cfg = hf_model
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    params = params_from_hf(model.state_dict(), cfg)

    prompt = np.asarray([[7, 3, 99, 21, 5]])
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, prompt.shape[1]:].numpy().tolist()
    ours = generate.generate(params, jnp.asarray(prompt, jnp.int32), cfg,
                             max_new_tokens=8, max_len=256)
    assert [int(t) for t in ours[0]] == hf_new


def test_mistral_sliding_window_parity():
    """transformers MistralForCausalLM with sliding_window < seq — validates
    our window semantics (and config mapping) against HF's implementation."""
    hf_cfg = transformers.MistralConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        sliding_window=24,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = transformers.MistralForCausalLM(hf_cfg).eval()
    import dataclasses

    cfg = dataclasses.replace(
        config_from_hf(hf_cfg, dtype=jnp.float32), attn_window=24)
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(1, 64))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                    cfg))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_qwen2_bias_parity():
    """transformers Qwen2ForCausalLM (q/k/v projection biases) — logits must
    match teacher-forced, validating the attn_bias path + config mapping."""
    hf_cfg = transformers.Qwen2Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        use_sliding_window=False,
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.attn_bias and cfg.attn_window is None
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(1, 48))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = llama.forward(params, jnp.asarray(tokens, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=2e-4, atol=2e-4)
    # decode path too: greedy generation must match HF exactly
    prompt = tokens[:, :8]
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, prompt.shape[1]:].numpy().tolist()
    out = generate.generate(params, jnp.asarray(prompt, jnp.int32), cfg,
                            max_new_tokens=8, max_len=256)
    assert [int(t) for t in out[0]] == hf_new


def test_phi3_fused_projection_parity():
    """transformers Phi3ForCausalLM fuses qkv and gate_up projections; the
    converter splits them — teacher-forced logits must match."""
    hf_cfg = transformers.Phi3Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        sliding_window=None,
        pad_token_id=0,  # Phi3Config defaults to 32000 >= our tiny vocab
        attn_implementation="eager",
    )
    torch.manual_seed(13)
    model = transformers.Phi3ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    params = params_from_hf(model.state_dict(), cfg)
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(1, 40))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = llama.forward(params, jnp.asarray(tokens, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_gemma2_parity():
    """transformers Gemma2ForCausalLM: validates in one shot the alternating
    local/global window pattern, (1+w) RMSNorm, sandwich (post) norms,
    GeGLU, attention + final logit soft-caps, scaled embeddings, the
    query_pre_attn_scalar softmax scale, explicit head_dim, and tied
    embeddings."""
    hf_cfg = transformers.Gemma2Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=48,  # != hidden/heads on purpose
        query_pre_attn_scalar=48,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        sliding_window=16,  # < seq so local/global layers really differ
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.window_pattern == "alternate" and cfg.use_post_norms
    assert cfg.norm_offset == 1.0 and cfg.tie_embeddings
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(2, 48))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                    cfg))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)

    prompt = np.asarray([[7, 3, 99, 21, 5]])
    with torch.no_grad():
        # eos_token_id=-1: Gemma2Config defaults eos to token 1, which this
        # tiny random model emits immediately — disable early stopping so
        # the comparison runs past the sliding-window boundary (window=16,
        # 5 + 24 = 29 positions).
        hf_out = model.generate(
            torch.from_numpy(prompt), max_new_tokens=24, do_sample=False,
            pad_token_id=0, eos_token_id=-1)
    hf_new = hf_out[0, prompt.shape[1]:].numpy().tolist()
    ours = generate.generate(params, jnp.asarray(prompt, jnp.int32), cfg,
                             max_new_tokens=24, max_len=256)
    assert [int(t) for t in ours[0]] == hf_new


def test_gemma1_parity():
    """transformers GemmaForCausalLM (Gemma-1): (1+w) RMSNorm, GeGLU,
    scaled tied embeddings, explicit head_dim — but none of Gemma-2's
    soft-caps / sandwich norms / alternating window."""
    hf_cfg = transformers.GemmaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=48,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        attn_implementation="eager",
    )
    torch.manual_seed(29)
    model = transformers.GemmaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.norm_offset == 1.0 and cfg.scale_embeddings
    assert cfg.logit_softcap is None and not cfg.use_post_norms
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(9)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(2, 48))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                    cfg))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)

    prompt = np.asarray([[7, 3, 99, 21, 5]])
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0, eos_token_id=-1)
    hf_new = hf_out[0, prompt.shape[1]:].numpy().tolist()
    ours = generate.generate(params, jnp.asarray(prompt, jnp.int32), cfg,
                             max_new_tokens=8, max_len=256)
    assert [int(t) for t in ours[0]] == hf_new


def test_qwen3_parity():
    """transformers Qwen3ForCausalLM: per-head q/k RMSNorm (pre-RoPE) and
    explicit head_dim != hidden/heads."""
    hf_cfg = transformers.Qwen3Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=48,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.qk_norm and cfg.head_dim == 48
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(2, 48))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                    cfg))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)

    prompt = np.asarray([[7, 3, 99, 21, 5]])
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, prompt.shape[1]:].numpy().tolist()
    ours = generate.generate(params, jnp.asarray(prompt, jnp.int32), cfg,
                             max_new_tokens=8, max_len=256)
    assert [int(t) for t in ours[0]] == hf_new


def test_llama3_rope_scaling_parity():
    """transformers LlamaForCausalLM with rope_scaling rope_type='llama3'
    (Llama-3.1+ checkpoints): the frequency remap must match HF's
    _compute_llama3_parameters — exercised past the original context so the
    stretched low-frequency band actually matters."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 32,
        },
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(17)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.rope_scaling == (8.0, 1.0, 4.0, 32)
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(5)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(1, 96))  # > orig 32
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                    cfg))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)

    # Decode path shares rope_tables; greedy generation must match too.
    prompt = tokens[:, :40]
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, prompt.shape[1]:].numpy().tolist()
    out = generate.generate(params, jnp.asarray(prompt, jnp.int32), cfg,
                            max_new_tokens=8, max_len=256)
    assert [int(t) for t in out[0]] == hf_new


def test_phi3_longrope_parity():
    """transformers Phi3ForCausalLM with rope_scaling type 'longrope'
    (Phi-3-mini-128k / Phi-3.5): per-dim short/long factor sets switch at
    the original context length and cos/sin carry the attention factor —
    teacher-forced logits must match BOTH below and above the boundary."""
    half = 16  # head_dim 32 -> 16 factors per set
    hf_cfg = transformers.Phi3Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        original_max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0 + 0.02 * i for i in range(half)],
            "long_factor": [2.0 + 0.25 * i for i in range(half)],
        },
        tie_word_embeddings=False,
        sliding_window=None,
        pad_token_id=0,
        attn_implementation="eager",
    )
    torch.manual_seed(23)
    model = transformers.Phi3ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.rope_longrope is not None and cfg.rope_longrope[2] == 64
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(7)
    for s in (48, 96):  # short side and long side of the 64 boundary
        tokens = rng.integers(0, hf_cfg.vocab_size, size=(1, s))
        with torch.no_grad():
            hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
        ours = llama.forward(params, jnp.asarray(tokens, jnp.int32), cfg)
        np.testing.assert_allclose(np.asarray(ours), hf_logits,
                                   rtol=2e-3, atol=2e-3)


def test_mixtral_moe_parity():
    """transformers MixtralForCausalLM: block-sparse MoE experts stack into
    our (E, H, F) layout, and HF's softmax->topk->renormalize routing equals
    our topk->softmax-over-selected (identical math). Teacher-forced logits
    + greedy decode must match."""
    hf_cfg = transformers.MixtralConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        sliding_window=None,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(31)
    model = transformers.MixtralForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.num_experts == 4 and cfg.top_k_experts == 2
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(11)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(2, 48))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                    cfg))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)

    prompt = np.asarray([[7, 3, 99, 21, 5]])
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, prompt.shape[1]:].numpy().tolist()
    ours = generate.generate(params, jnp.asarray(prompt, jnp.int32), cfg,
                             max_new_tokens=8, max_len=256)
    assert [int(t) for t in ours[0]] == hf_new


@pytest.mark.parametrize("norm_topk", [True, False])
def test_qwen3_moe_parity(norm_topk):
    """transformers Qwen3MoeForCausalLM: Qwen3 attention (per-head q/k
    RMSNorm) + sparse MoE with the mlp.experts naming and BOTH routing
    conventions (norm_topk_prob True = renormalized, False = full-softmax
    probabilities)."""
    hf_cfg = transformers.Qwen3MoeConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        moe_intermediate_size=192,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=48,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=norm_topk,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(37)
    model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.qk_norm and cfg.num_experts == 4
    assert cfg.moe_norm_topk == norm_topk
    params = params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(13)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(2, 48))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                    cfg))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_qwen2_moe_shared_expert_parity():
    """transformers Qwen2MoeForCausalLM: sparse experts PLUS the always-on
    sigmoid-gated shared expert and qwen2-style q/k/v biases."""
    hf_cfg = transformers.Qwen2MoeConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        moe_intermediate_size=192,
        shared_expert_intermediate_size=224,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=False,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        use_sliding_window=False,
        attn_implementation="eager",
    )
    torch.manual_seed(41)
    model = transformers.Qwen2MoeForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.moe_shared_intermediate == 224 and cfg.attn_bias
    params = params_from_hf(model.state_dict(), cfg)
    assert "shared" in params["layers"][0]["moe"]

    rng = np.random.default_rng(17)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(2, 48))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                    cfg))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_convert_cli_roundtrip(tmp_path, hf_model):
    """tools/convert_hf.py: HF save_pretrained dir -> Orbax checkpoint +
    config JSON -> load_converted reproduces the live conversion exactly."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from tools.convert_hf import convert, load_converted

    model, hf_cfg = hf_model
    src = tmp_path / "hf"
    model.save_pretrained(src)
    dst = tmp_path / "converted"
    convert(str(src), str(dst), "f32")
    params, cfg = load_converted(str(dst))
    assert cfg.num_layers == hf_cfg.num_hidden_layers
    live = params_from_hf(model.state_dict(), cfg)
    for a, b in zip(jax.tree_util.tree_leaves(live),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tokens = np.asarray([[5, 9, 42, 7, 13]])
    out = np.asarray(llama.forward(params, jnp.asarray(tokens, jnp.int32),
                                   cfg))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    np.testing.assert_allclose(out, hf_logits, rtol=2e-3, atol=2e-3)


def test_load_config_restores_hashable_tuples(tmp_path):
    """config.json round-trip must yield a HASHABLE ModelConfig (cfg is a
    static jit argument) — JSON lists for rope_scaling/rope_longrope must
    come back as (nested) tuples."""
    import dataclasses as dc
    import json as js

    from flashattn_tpu.models.config import ModelConfig
    from tools.convert_hf import load_config

    cfg = ModelConfig(
        rope_scaling=(8.0, 1.0, 4.0, 8192),
        rope_longrope=((1.0, 1.1), (2.0, 2.5), 64, 1.19),
    )
    fields = dc.asdict(cfg)
    fields["dtype"] = "bf16"
    (tmp_path / "config.json").write_text(js.dumps(fields))
    loaded = load_config(str(tmp_path))
    hash(loaded)  # would raise TypeError on lists
    assert loaded.rope_scaling == cfg.rope_scaling
    assert loaded.rope_longrope == cfg.rope_longrope
