"""Flash-decode + quantized KV cache tests: kernel vs dense oracle over the
dequantized cache (ragged lengths), quantization error bounds, and
decode-path vs training-path logits parity on the tiny model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.models import generate, llama
from flashattn_tpu.models.config import TINY
from flashattn_tpu.ops.decode import decode_attention, decode_attention_chunk
from flashattn_tpu.ops.kvcache import dequantize, init_cache, quantize_tokens, update_cache
from flashattn_tpu.ops.reference import reference_attention
from flashattn_tpu.utils.verify import verify_results
from flashattn_tpu.utils.verify import verify_results


@pytest.mark.parametrize("quant", [None, "int8", "fp8"])
def test_decode_matches_oracle_ragged(quant):
    b, hq, hkv, d, smax = 2, 8, 4, 64, 512
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    cache = init_cache(b, hkv, smax, d, quant=quant)
    k_toks = jax.random.normal(keys[0], (b, hkv, 300, d), jnp.bfloat16)
    v_toks = jax.random.normal(keys[1], (b, hkv, 300, d), jnp.bfloat16)
    cache = update_cache(cache, k_toks, v_toks)
    cache = dataclasses.replace(cache, length=jnp.array([200, 300], jnp.int32))
    q = jax.random.normal(keys[2], (b, hq, d), jnp.bfloat16)

    o = decode_attention(q, cache, block_kv=256)
    k_d = dequantize(cache.k, cache.k_scale).astype(jnp.float32)
    v_d = dequantize(cache.v, cache.v_scale).astype(jnp.float32)
    for bi, length in enumerate([200, 300]):
        o_ref = reference_attention(
            q[bi : bi + 1, :, None, :].astype(jnp.float32),
            k_d[bi : bi + 1, :, :length],
            v_d[bi : bi + 1, :, :length],
        )[:, :, 0]
        r = verify_results(o_ref, o[bi : bi + 1], rtol=2e-2, atol=2e-2)
        assert r.passed, f"quant={quant} b={bi}: {r}"


@pytest.mark.parametrize("quant,max_err", [("int8", 0.02), ("fp8", 0.1)])
def test_quantize_roundtrip_error(quant, max_err):
    dtype = jnp.int8 if quant == "int8" else jnp.float8_e4m3fn
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 32), jnp.bfloat16)
    q, s = quantize_tokens(x, dtype)
    assert s.shape == (1, 2, 1, 64)
    x_rt = dequantize(q, s)
    rel = float(
        jnp.max(jnp.abs(x_rt.astype(jnp.float32) - x.astype(jnp.float32)))
        / jnp.max(jnp.abs(x.astype(jnp.float32)))
    )
    assert rel < max_err, rel


def test_decode_path_matches_forward():
    """Greedy decode must track the training-path forward logits: compare
    logits at each step against full re-forward (the SDPA-alignment idea
    applied across code paths)."""
    cfg = TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    b, s = 2, 16
    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size)

    caches = generate.init_caches(cfg, b, 128)
    logits_pf, caches = generate.prefill(params, prompt, caches, cfg)
    logits_full = llama.forward(params, prompt, cfg)[:, -1]
    r = verify_results(logits_full, logits_pf, rtol=3e-2, atol=5e-2)
    assert r.passed, f"prefill: {r}"

    tokens = prompt
    token = jnp.argmax(logits_pf, -1).astype(jnp.int32)
    for i in range(3):
        tokens = jnp.concatenate([tokens, token[:, None]], axis=1)
        positions = jnp.full((b,), s + i, jnp.int32)
        logits_dec, caches = generate.decode_step(params, token, positions, caches, cfg)
        logits_ref = llama.forward(params, tokens, cfg)[:, -1]
        r = verify_results(logits_ref, logits_dec, rtol=3e-2, atol=5e-2)
        assert r.passed, f"step {i}: {r}"
        token = jnp.argmax(logits_dec, -1).astype(jnp.int32)


def test_generate_shapes_and_quant_agreement():
    cfg = TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    out_bf16 = generate.generate(params, prompt, cfg, max_new_tokens=8)
    assert out_bf16.shape == (2, 8)
    out_int8 = generate.generate(params, prompt, cfg, max_new_tokens=8, quant="int8")
    # Random-init logits are near-uniform, so argmax can flip; require most
    # tokens to agree between bf16 and int8-KV decode.
    agree = float(jnp.mean((out_bf16 == out_int8).astype(jnp.float32)))
    assert agree >= 0.5, agree


def test_fp8e4m3_to_bf16_exhaustive():
    """All 256 byte patterns: exact for normals/zero; subnormals flush to 0;
    NaN excluded (quantizer never emits it)."""
    import numpy as np
    from flashattn_tpu.ops.common import fp8e4m3_to_bf16

    u = np.arange(256, dtype=np.uint8)
    x = jax.lax.bitcast_convert_type(jnp.asarray(u), jnp.float8_e4m3fn)
    got = np.asarray(fp8e4m3_to_bf16(x).astype(jnp.float32))
    exact = np.asarray(x.astype(jnp.float32))
    mag = u & 0x7F
    normal = (mag >= 8) & (mag != 0x7F)  # exclude subnormals and NaN
    assert np.array_equal(got[normal], exact[normal])
    sub = mag < 8
    assert np.all(got[sub] == 0.0)


@pytest.mark.parametrize("quant", [None, "int8"])
def test_decode_sliding_window(quant):
    """Windowed decode matches the oracle restricted to the last W tokens,
    per-sequence (ragged lengths)."""
    import numpy as np
    from flashattn_tpu.ops.decode import decode_attention, decode_attention_chunk
    from flashattn_tpu.ops.kvcache import dequantize, init_cache, update_cache
    from flashattn_tpu.ops.reference import reference_attention
    from flashattn_tpu.utils.verify import verify_results

    b, hq, hkv, d, s_max, w = 3, 4, 2, 64, 512, 100
    lens = [512, 200, 60]
    cache = init_cache(b, hkv, s_max, d, quant=quant)
    kn = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, s_max, d),
                           jnp.bfloat16)
    vn = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, s_max, d),
                           jnp.bfloat16)
    cache = update_cache(cache, kn, vn)
    cache = dataclasses.replace(cache,
                                length=jnp.asarray(lens, jnp.int32))
    q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, d), jnp.bfloat16)

    o = decode_attention(q, cache, window=w)
    kd = dequantize(cache.k, cache.k_scale).astype(jnp.float32)
    vd = dequantize(cache.v, cache.v_scale).astype(jnp.float32)
    for i, ln in enumerate(lens):
        lo = max(0, ln - w)
        o_ref = reference_attention(
            q[i:i + 1, :, None].astype(jnp.float32),
            kd[i:i + 1, :, lo:ln], vd[i:i + 1, :, lo:ln])
        r = verify_results(o_ref[:, :, 0], o[i:i + 1],
                           atol=3e-2, rtol=3e-2)
        assert r.passed, f"seq {i}: {r}"


@pytest.mark.parametrize("quant", [None, "int8"])
def test_decode_chunked(quant):
    """Chunked decode: T new tokens attend cache + themselves causally; must
    equal the full-attention oracle rows."""
    from flashattn_tpu.ops.decode import decode_attention_chunk
    from flashattn_tpu.ops.kvcache import dequantize, init_cache, update_cache
    from flashattn_tpu.ops.reference import reference_attention
    from flashattn_tpu.utils.verify import verify_results

    b, hq, hkv, d, s_max, t = 2, 4, 2, 64, 512, 16
    prior = 100
    cache = init_cache(b, hkv, s_max, d, quant=quant)
    kn = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, prior + t, d),
                           jnp.bfloat16)
    vn = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, prior + t, d),
                           jnp.bfloat16)
    cache = update_cache(cache, kn, vn)  # length = prior + t
    q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, t, d), jnp.bfloat16)

    o = decode_attention_chunk(q, cache)
    kd = dequantize(cache.k, cache.k_scale)[:, :, :prior + t].astype(
        jnp.float32)
    vd = dequantize(cache.v, cache.v_scale)[:, :, :prior + t].astype(
        jnp.float32)
    # Oracle: causal cross-attention of the t chunk rows vs all keys
    # (causal offset s_k - s_q aligns the chunk to the key tail).
    o_ref = reference_attention(q.astype(jnp.float32), kd, vd,
                                is_causal=True)
    r = verify_results(o_ref, o, atol=3e-2, rtol=3e-2)
    assert r.passed, r


def test_chunked_prefill_matches_prefill():
    from flashattn_tpu.models import generate, llama
    from flashattn_tpu.models.config import ModelConfig
    import numpy as np

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=32, max_seq_len=256,
        dtype=jnp.float32,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0,
                                cfg.vocab_size, jnp.int32)
    caches_a = generate.init_caches(cfg, 2, 256)
    logits_a, caches_a = generate.prefill(params, tokens, caches_a, cfg)
    caches_b = generate.init_caches(cfg, 2, 256)
    logits_b, caches_b = generate.chunked_prefill(params, tokens, caches_b,
                                                  cfg, chunk=32)
    np.testing.assert_allclose(np.asarray(logits_b), np.asarray(logits_a),
                               rtol=2e-4, atol=2e-4)
    for ca, cb in zip(caches_a, caches_b):
        np.testing.assert_allclose(np.asarray(cb.k), np.asarray(ca.k),
                                   rtol=1e-5, atol=1e-5)
        assert jnp.array_equal(ca.length, cb.length)


def test_fp8e4m3_to_bf16_fast_bound():
    """The select-free kernel variant is exact for normals and within 2^-7
    absolute on the 16 exp-field-0 codes (zero + subnormals) — far below
    the KV quantization step."""
    import numpy as np
    from flashattn_tpu.ops.common import fp8e4m3_to_bf16_fast

    codes = np.arange(256, dtype=np.uint8)
    x = jax.lax.bitcast_convert_type(jnp.asarray(codes), jnp.float8_e4m3fn)
    want = np.asarray(x.astype(jnp.float32))
    got = np.asarray(fp8e4m3_to_bf16_fast(x).astype(jnp.float32))
    finite = np.isfinite(want)
    sub = (codes & 0x78) == 0  # exp field 0
    np.testing.assert_array_equal(got[finite & ~sub], want[finite & ~sub])
    assert np.abs(got[finite & sub] - want[finite & sub]).max() <= 2.0**-7


def test_fp8e4m3_to_f32_fast_matches_bf16_fast():
    """The 4-op f32-layout hot-path converter (sign-extension single-mask
    chain; the only same-width final bitcast Mosaic can lower) must agree
    with the proven bf16-layout fast path on every e4m3 code — identical
    mapping, wider output type. (The round-2 'pair' two-bytes-per-lane
    candidate is gone: Mosaic cannot lower bitwidth-changing bitcasts at
    all, so it never compiled outside interpret mode.)"""
    import numpy as np
    from flashattn_tpu.ops.common import (fp8e4m3_to_bf16_fast,
                                          fp8e4m3_to_f32_fast)

    codes = np.arange(256, dtype=np.uint8).reshape(2, 128)
    x = jax.lax.bitcast_convert_type(jnp.asarray(codes), jnp.float8_e4m3fn)
    a = np.asarray(fp8e4m3_to_bf16_fast(x), dtype=np.float32)
    b = np.asarray(fp8e4m3_to_f32_fast(x), dtype=np.float32)
    same = (a == b) | (np.isnan(a) & np.isnan(b))
    assert same.all()


@pytest.mark.parametrize("t_chunk", [1, 8])
def test_dead_cache_garbage_cannot_poison(t_chunk):
    """NaN/Inf in DEAD cache positions (beyond `length`) must not reach the
    output: P is 0 there, but 0*NaN = NaN would poison the P.V dot without
    the kernel's dead-row V guard. Recycled serving slots reset `length`
    without wiping the tail, so this is a reachable state, not a fuzz case."""
    import dataclasses

    b, hq, hkv, d, s_max, length = 1, 4, 2, 64, 256, 100
    cache = init_cache(b, hkv, s_max, d, dtype=jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, length, d))
    vn = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, length, d))
    cache = update_cache(cache, kn, vn)
    # poison everything beyond the live region
    poison = jnp.full((b, hkv, s_max - length, d), jnp.nan)
    cache = dataclasses.replace(
        cache,
        k=cache.k.at[:, :, length:].set(poison),
        v=cache.v.at[:, :, length:].set(poison),
    )
    q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, t_chunk, d))
    if t_chunk == 1:
        o = decode_attention(q[:, :, 0], cache)[:, :, None]
    else:
        o = decode_attention_chunk(q, cache)
    assert bool(jnp.isfinite(o).all()), "dead-region NaN leaked into output"
    o_ref = reference_attention(q, kn, vn, is_causal=True)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r


@pytest.mark.parametrize("quant,kw", [
    ("int8", {"alibi": True}),
    ("fp8", {"alibi": True}),
    ("int8", {"logit_softcap": 30.0}),
    ("fp8", {"logit_softcap": 30.0}),
])
def test_decode_quant_variant_combinations(quant, kw):
    """Quantized caches compose with ALiBi / softcap: kernel vs the
    dequantized-cache oracle under the bf16 gate."""
    b, hq, hkv, d, s_max, length = 2, 4, 2, 64, 512, 300
    cache = init_cache(b, hkv, s_max, d, quant=quant)
    kn = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, length, d),
                           jnp.bfloat16)
    vn = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, length, d),
                           jnp.bfloat16)
    cache = update_cache(cache, kn, vn)
    q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, d), jnp.bfloat16)
    o = decode_attention(q, cache, **kw)
    kd = dequantize(cache.k, cache.k_scale)[:, :, :length]
    vd = dequantize(cache.v, cache.v_scale)[:, :, :length]
    o_ref = reference_attention(q[:, :, None], kd, vd, is_causal=True,
                                **kw)[:, :, 0]
    r = verify_results(o_ref, o, rtol=2e-2, atol=5e-2)
    assert r.passed, r


def test_pick_h_fuse_heuristic():
    """h_fuse gating follows the round-4 on-chip A/B
    (v5e_decode_hfuse{1,_auto}.jsonl): quantized caches on single-block
    streams fuse; bf16 and multi-block streams never do."""
    from flashattn_tpu.ops.decode import pick_h_fuse

    # Quantized (1-byte), single block: fuse up to hkv within budget.
    assert pick_h_fuse(1, 1, 8, 2048, 128) == 8
    # bf16 (2-byte): never fuse — no dequant cost to amortize, measured
    # regression 0.870 -> 0.845 at S=2048.
    assert pick_h_fuse(1, 2, 8, 2048, 128) == 1
    # Multi-block streams: never fuse (fp8 0.855 -> 0.759 at S=8192).
    assert pick_h_fuse(2, 1, 8, 4096, 128) == 1
    assert pick_h_fuse(4, 1, 8, 8192, 128) == 1
    # VMEM budget caps the fuse depth: 2*h*block*d*esize*2 <= 48 MB.
    assert pick_h_fuse(1, 1, 32, 32768, 128) == 2
    # Non-power-of-two head counts stay unfused rather than split ragged.
    assert pick_h_fuse(1, 1, 3, 2048, 128) == 1


@pytest.mark.parametrize("quant", ["int8", "fp8"])
def test_decode_h_fuse_kernel_path(quant, monkeypatch):
    """The h_fuse>1 kernel path (multi-head fetch + per-head loop inside a
    grid step) must match the h_fuse=1 path exactly on the same cache."""
    b, hq, hkv, d, smax = 2, 8, 4, 64, 512
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    cache = init_cache(b, hkv, smax, d, quant=quant)
    k_toks = jax.random.normal(keys[0], (b, hkv, smax, d), jnp.bfloat16)
    v_toks = jax.random.normal(keys[1], (b, hkv, smax, d), jnp.bfloat16)
    cache = update_cache(cache, k_toks, v_toks)
    q = jax.random.normal(keys[2], (b, hq, d), jnp.bfloat16)

    monkeypatch.setenv("FLASHATTN_DECODE_HFUSE", "1")
    jax.clear_caches()
    o_1 = decode_attention(q, cache, block_kv=512)
    monkeypatch.setenv("FLASHATTN_DECODE_HFUSE", "2")
    jax.clear_caches()
    o_2 = decode_attention(q, cache, block_kv=512)
    monkeypatch.delenv("FLASHATTN_DECODE_HFUSE")
    jax.clear_caches()
    r = verify_results(o_1, o_2, rtol=1e-6, atol=1e-6)
    assert r.passed, r
