"""HuggingFace Llama-family checkpoint -> flashattn_tpu param pytree.

Lets a user of the reference ecosystem bring real weights: any
``LlamaForCausalLM``-style state dict (torch tensors or numpy arrays) maps
onto the functional pytree in models/llama.py — including Mistral
(sliding window) and Qwen2 (q/k/v biases) variants of the architecture. Conventions verified by the
logits-parity test (tests/test_hf_parity.py) against transformers itself:
  - HF stores projections as [out, in]; our matmuls are x @ W, so every
    weight transposes.
  - HF RoPE is the rotate-half convention (first/second half split), same
    as llama.apply_rope — no permutation needed.
  - RMSNorm/SwiGLU match directly.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from flashattn_tpu.models.config import ModelConfig

Params = dict[str, Any]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x, np.float32)


def params_from_hf(state_dict: Mapping[str, Any], cfg: ModelConfig) -> Params:
    """Convert an HF Llama state dict to our param pytree (cfg.dtype)."""
    sd = {k: v for k, v in state_dict.items()}

    def take(name):
        return _np(sd[name])

    def linear(name):
        # HF nn.Linear weight is [out, in]; ours right-multiplies.
        return jnp.asarray(take(name).T, cfg.dtype)

    params: Params = {
        "embed": jnp.asarray(take("model.embed_tokens.weight"), cfg.dtype),
        "final_norm": jnp.asarray(take("model.norm.weight"), cfg.dtype),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = linear("lm_head.weight")
    nq_d = cfg.num_heads * cfg.head_dim
    nkv_d = cfg.num_kv_heads * cfg.head_dim
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        if p + "self_attn.qkv_proj.weight" in sd:
            # Phi-3-style fused projections: split [q; k; v] rows.
            qkv = take(p + "self_attn.qkv_proj.weight")
            wq = jnp.asarray(qkv[:nq_d].T, cfg.dtype)
            wk = jnp.asarray(qkv[nq_d:nq_d + nkv_d].T, cfg.dtype)
            wv = jnp.asarray(qkv[nq_d + nkv_d:].T, cfg.dtype)
        else:
            wq = linear(p + "self_attn.q_proj.weight")
            wk = linear(p + "self_attn.k_proj.weight")
            wv = linear(p + "self_attn.v_proj.weight")
        params["layers"].append({
            "attn_norm": jnp.asarray(take(p + "input_layernorm.weight"),
                                     cfg.dtype),
            "wq": wq,
            "wk": wk,
            "wv": wv,
            "wo": linear(p + "self_attn.o_proj.weight"),
            **({
                "bq": jnp.asarray(take(p + "self_attn.q_proj.bias"),
                                  cfg.dtype),
                "bk": jnp.asarray(take(p + "self_attn.k_proj.bias"),
                                  cfg.dtype),
                "bv": jnp.asarray(take(p + "self_attn.v_proj.bias"),
                                  cfg.dtype),
            } if cfg.attn_bias else {}),
            # Llama's pre-FFN norm is named post_attention_layernorm;
            # Gemma-2 (use_post_norms) names it pre_feedforward_layernorm
            # and post_attention_layernorm is the attn OUTPUT norm.
            "mlp_norm": jnp.asarray(
                take(p + ("pre_feedforward_layernorm.weight"
                          if cfg.use_post_norms
                          else "post_attention_layernorm.weight")),
                cfg.dtype),
            **({
                "post_attn_norm": jnp.asarray(
                    take(p + "post_attention_layernorm.weight"), cfg.dtype),
                "post_mlp_norm": jnp.asarray(
                    take(p + "post_feedforward_layernorm.weight"), cfg.dtype),
            } if cfg.use_post_norms else {}),
            **({
                "q_norm": jnp.asarray(
                    take(p + "self_attn.q_norm.weight"), cfg.dtype),
                "k_norm": jnp.asarray(
                    take(p + "self_attn.k_norm.weight"), cfg.dtype),
            } if cfg.qk_norm else {}),
            **_ffn_params(sd, p, cfg, take, linear),
        })
    return params


def _ffn_params(sd, p, cfg, take, linear) -> dict:
    """Dense SwiGLU (plain / Phi-3 fused) or sparse MoE (Mixtral's
    block_sparse_moe.w1/w3/w2 naming, Qwen3-MoE's mlp.experts gate/up/down
    naming) — experts stacked on axis 0 to our (E, H, F)/(E, F, H) layout
    (each HF weight is [out, in])."""

    def experts(prefix, name):
        return jnp.stack([
            jnp.asarray(_np(sd[f"{p}{prefix}.{j}.{name}.weight"]).T,
                        cfg.dtype)
            for j in range(cfg.num_experts)
        ])

    if p + "block_sparse_moe.gate.weight" in sd:  # Mixtral
        return {"moe": {
            "router": linear(p + "block_sparse_moe.gate.weight"),
            "w_gate": experts("block_sparse_moe.experts", "w1"),
            "w_up": experts("block_sparse_moe.experts", "w3"),
            "w_down": experts("block_sparse_moe.experts", "w2"),
        }}
    if p + "mlp.gate.weight" in sd:  # Qwen3-MoE / Qwen2-MoE
        moe = {
            "router": linear(p + "mlp.gate.weight"),
            "w_gate": experts("mlp.experts", "gate_proj"),
            "w_up": experts("mlp.experts", "up_proj"),
            "w_down": experts("mlp.experts", "down_proj"),
        }
        if p + "mlp.shared_expert.gate_proj.weight" in sd:  # Qwen2-MoE
            moe["shared"] = {
                "w_gate": linear(p + "mlp.shared_expert.gate_proj.weight"),
                "w_up": linear(p + "mlp.shared_expert.up_proj.weight"),
                "w_down": linear(p + "mlp.shared_expert.down_proj.weight"),
            }
            moe["shared_gate"] = linear(p + "mlp.shared_expert_gate.weight")
        return {"moe": moe}
    gup = {}
    if p + "mlp.gate_up_proj.weight" in sd:
        gup = _split_gate_up(take(p + "mlp.gate_up_proj.weight"), cfg.dtype)
    else:
        gup = {
            "w_gate": linear(p + "mlp.gate_proj.weight"),
            "w_up": linear(p + "mlp.up_proj.weight"),
        }
    return {**gup, "w_down": linear(p + "mlp.down_proj.weight")}


def _split_gate_up(gate_up: np.ndarray, dtype) -> dict:
    """Phi-3 fuses [gate; up] rows into one matrix."""
    half = gate_up.shape[0] // 2
    return {"w_gate": jnp.asarray(gate_up[:half].T, dtype),
            "w_up": jnp.asarray(gate_up[half:].T, dtype)}


def config_from_hf(hf_config, dtype=jnp.bfloat16) -> ModelConfig:
    """Map a transformers config onto ModelConfig. Llama conventions by
    default; Gemma-2 (sandwich norms, (1+w) RMSNorm, GeGLU, alternating
    window, attn+final soft-caps, scaled embeddings, query_pre_attn_scalar)
    and Qwen3 (per-head q/k RMSNorm, explicit head_dim) detected from
    model_type."""
    mt = getattr(hf_config, "model_type", "")
    gemma2 = mt == "gemma2"
    extra = {}
    if mt == "gemma":
        # Gemma-1: Gemma conventions minus the Gemma-2 additions (no
        # soft-caps, no sandwich norms, no alternating window).
        extra = dict(
            mlp_activation="gelu_tanh",
            scale_embeddings=True,
            norm_offset=1.0,
        )
    if gemma2:
        extra = dict(
            window_pattern="alternate",  # HF layer_types: even layers slide
            logit_softcap=getattr(hf_config, "attn_logit_softcapping", None),
            final_logit_softcap=getattr(
                hf_config, "final_logit_softcapping", None),
            mlp_activation="gelu_tanh",
            use_post_norms=True,
            scale_embeddings=True,
            attn_scale=getattr(
                hf_config, "query_pre_attn_scalar", None) ** -0.5,
            norm_offset=1.0,
        )
    if mt == "qwen3":
        extra = dict(qk_norm=True)
    if mt == "mixtral":
        extra = dict(
            num_experts=hf_config.num_local_experts,
            top_k_experts=hf_config.num_experts_per_tok,
        )
    if mt in ("qwen3_moe", "qwen2_moe"):
        # Qwen sparse-MoE families: Qwen3-MoE adds per-head q/k RMSNorm;
        # Qwen2-MoE adds the always-on shared expert (sigmoid-gated).
        assert getattr(hf_config, "decoder_sparse_step", 1) == 1 and not (
            getattr(hf_config, "mlp_only_layers", None)), (
            "mixed dense/MoE layer patterns not supported")
        extra = dict(
            num_experts=hf_config.num_experts,
            top_k_experts=hf_config.num_experts_per_tok,
            moe_norm_topk=bool(hf_config.norm_topk_prob),
        )
        if mt == "qwen3_moe":
            extra["qk_norm"] = True
        else:
            extra["moe_shared_intermediate"] = int(
                hf_config.shared_expert_intermediate_size)
    rs = getattr(hf_config, "rope_scaling", None)
    rs_type = rs.get("rope_type", rs.get("type")) if rs else None
    if rs_type == "llama3":
        # Llama-3.1+ frequency remap (transformers _compute_llama3_parameters).
        extra["rope_scaling"] = (
            float(rs["factor"]),
            float(rs["low_freq_factor"]),
            float(rs["high_freq_factor"]),
            int(rs["original_max_position_embeddings"]),
        )
    elif rs_type in ("longrope", "su"):
        # Phi-3 longrope (transformers _compute_longrope_parameters): the
        # default attention factor is sqrt(1 + ln(factor)/ln(original)).
        import math

        orig = int(getattr(hf_config, "original_max_position_embeddings",
                           hf_config.max_position_embeddings))
        factor = hf_config.max_position_embeddings / orig
        attn_factor = rs.get("attention_factor")
        if attn_factor is None:
            attn_factor = (1.0 if factor <= 1.0
                           else math.sqrt(1.0 + math.log(factor)
                                          / math.log(orig)))
        extra["rope_longrope"] = (
            tuple(float(f) for f in rs["short_factor"]),
            tuple(float(f) for f in rs["long_factor"]),
            orig,
            float(attn_factor),
        )
    elif rs_type not in (None, "default"):
        raise NotImplementedError(
            f"rope_scaling type {rs!r} not supported (llama3/longrope only)")
    return ModelConfig(
        **extra,
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads",
                             hf_config.num_attention_heads),
        # Gemma-2/Qwen3-style configs carry an explicit head_dim that need
        # not equal hidden_size // num_heads; honor it when present.
        head_dim=(getattr(hf_config, "head_dim", None)
                  or hf_config.hidden_size // hf_config.num_attention_heads),
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        norm_eps=hf_config.rms_norm_eps,
        dtype=dtype,
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        max_seq_len=hf_config.max_position_embeddings,
        # Mistral/Gemma-style sliding window when present and enabled.
        attn_window=(getattr(hf_config, "sliding_window", None)
                     if getattr(hf_config, "use_sliding_window", True)
                     else None),
        # Llama exposes attention_bias; the Qwen2 family has q/k/v biases.
        attn_bias=bool(getattr(hf_config, "attention_bias", False)
                       or mt in ("qwen2", "qwen2_moe")),
    )
