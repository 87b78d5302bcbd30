"""Fused one-kernel backward (flash_bwd_fused.py) vs the two-kernel path and
the jnp oracle, across the full feature matrix.

The fused design has no reference analogue — a GPU SM cannot hold K/V-length
gradient accumulators in SRAM, which is why the reference splits the backward
into dQ/dKV kernels (``Phase_4.md:193-214``). TPU VMEM can, so the launcher
(flash_bwd.py) dispatches to the fused kernel whenever the resident
accumulators fit; these tests pin both implementations against each other and
the oracle so the dispatch can never silently change numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.ops.flash_bwd import flash_attention_backward
from flashattn_tpu.ops.flash_fwd import flash_attention_forward
from flashattn_tpu.ops.reference import reference_attention


def _both_impls(b=1, hq=2, hkv=2, s_q=256, s_k=256, d=64, causal=True,
                segments=False, **kw):
    ks = jax.random.split(jax.random.PRNGKey(17), 4)
    q = jax.random.normal(ks[0], (b, hq, s_q, d))
    k = jax.random.normal(ks[1], (b, hkv, s_k, d))
    v = jax.random.normal(ks[2], (b, hkv, s_k, d))
    do = jax.random.normal(ks[3], (b, hq, s_q, d))
    seg_ids = None
    if segments:
        sq = jnp.asarray(np.repeat(np.arange(4), s_q // 4))[None].repeat(b, 0)
        sk = jnp.asarray(np.repeat(np.arange(4), s_k // 4))[None].repeat(b, 0)
        seg_ids = (sq, sk)
    scale = 1.0 / np.sqrt(d)
    o, lse = flash_attention_forward(q, k, v, is_causal=causal, scale=scale,
                                     segment_ids=seg_ids, **kw)
    outs = {
        impl: flash_attention_backward(
            q, k, v, o, do, lse, is_causal=causal, scale=scale,
            segment_ids=seg_ids, impl=impl, **kw)
        for impl in ("split", "fused")
    }
    refkw = {kk: vv for kk, vv in kw.items()
             if kk not in ("dropout_rate", "dropout_seed")}
    oracle = None
    if "dropout_rate" not in kw:
        def ref_loss(q, k, v):
            r = reference_attention(q, k, v, is_causal=causal, scale=scale,
                                    segment_ids=seg_ids, **refkw)
            return jnp.sum(r * do)
        oracle = jax.grad(ref_loss, (0, 1, 2))(q, k, v)
    return outs, oracle


def _assert_close(outs, oracle):
    for a, b_, nm in zip(outs["split"], outs["fused"], ("dQ", "dK", "dV")):
        err = float(jnp.max(jnp.abs(a - b_)))
        assert np.isfinite(err) and err < 2e-3, f"{nm} split-vs-fused {err}"
    if oracle is not None:
        for a, b_, nm in zip(outs["fused"], oracle, ("dQ", "dK", "dV")):
            err = float(jnp.max(jnp.abs(a - b_)))
            den = float(jnp.max(jnp.abs(b_))) + 1e-6
            assert np.isfinite(err) and err / den < 2e-2, \
                f"{nm} fused-vs-oracle rel={err / den}"


@pytest.mark.parametrize("causal", [False, True])
def test_fused_square(causal):
    _assert_close(*_both_impls(causal=causal))


def test_fused_gqa():
    _assert_close(*_both_impls(hq=8, hkv=2))


@pytest.mark.parametrize("s_q,s_k", [(128, 384), (384, 128), (200, 200)])
def test_fused_cross_and_ragged(s_q, s_k):
    _assert_close(*_both_impls(s_q=s_q, s_k=s_k))


def test_fused_window():
    _assert_close(*_both_impls(window=96))


def test_fused_softcap():
    _assert_close(*_both_impls(logit_softcap=30.0))


def test_fused_alibi():
    _assert_close(*_both_impls(alibi=True))


def test_fused_segments():
    _assert_close(*_both_impls(segments=True))


def test_fused_dropout_matches_split():
    # No oracle for dropout; the two implementations must regenerate the
    # identical counter-based mask and agree bit-for-bit-ish in f32.
    outs, _ = _both_impls(dropout_rate=0.2, dropout_seed=7)
    _assert_close(outs, None)


def test_fused_feature_stack():
    _assert_close(*_both_impls(hq=8, hkv=2, window=96, alibi=True))


def test_vmem_dispatch_heuristic():
    from flashattn_tpu.ops.flash_bwd_fused import fused_backward_vmem_bytes

    # Pinned to the measured crossover (v5e_bwd_crossover.jsonl + compile
    # probes): the lane-padded estimate against the 128 MB physical VMEM
    # must keep every shape that compiled AND won on the fused path, and
    # exclude the shapes whose compiles ran out of VMEM.
    bound = 128 * 1024 * 1024
    for s, d in ((16384, 128), (32768, 128), (49152, 128),
                 (16384, 64), (32768, 64), (49152, 64)):
        assert fused_backward_vmem_bytes(s, s, d, 1024, 1024) <= bound, (s, d)
    for s, d in ((65536, 128), (61440, 64), (65536, 64), (131072, 128)):
        assert fused_backward_vmem_bytes(s, s, d, 1024, 1024) > bound, (s, d)
    # Lane padding: D=64 costs the same VMEM as D=128 (the regression that
    # dispatched D=64 S=64k to a non-compiling fused kernel).
    assert fused_backward_vmem_bytes(61440, 61440, 64, 1024, 1024) == \
        fused_backward_vmem_bytes(61440, 61440, 128, 1024, 1024)


def test_measured_fused_overrides_vmem_estimate(monkeypatch):
    # A measured autotune winner ("bwd_impl": "fused") is ground truth that
    # the config compiles and runs; the dispatch must honor it even when
    # the pessimistic VMEM estimate says it does not fit (the estimate once
    # demoted the tuned S=16k 2048^2-fused config to the 40% slower split).
    import flashattn_tpu.ops.autotune as at
    import flashattn_tpu.ops.flash_bwd_fused as fbf

    monkeypatch.setattr(at, "cached_bwd_impl",
                        lambda *a, **kw: "fused")
    monkeypatch.setattr(fbf, "fused_backward_vmem_bytes",
                        lambda *a, **kw: 10**12)  # "does not fit"
    called = {}
    real = fbf.flash_attention_backward_fused

    def recorder(*a, **kw):
        called["fused"] = True
        return real(*a, **kw)

    monkeypatch.setattr(fbf, "flash_attention_backward_fused", recorder)

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, do = (jax.random.normal(kk, (1, 2, 256, 64)) for kk in ks)
    o, lse = flash_attention_forward(q, k, v, is_causal=True)
    flash_attention_backward(q, k, v, o, do, lse, is_causal=True,
                             impl="auto")
    assert called.get("fused"), "measured fused winner was not honored"
