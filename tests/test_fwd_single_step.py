"""Single-step fwd fast path (num_kv_blocks == 1) correctness battery.

When S_k fits one kv fetch, every wavefront step is a whole q-row and the
kernel carries (m, l, acc) in VALUES instead of scratch, skipping the
init/finalize predication (flash_fwd.py::_fwd_kernel `single_step`). The
knob is trace-time static and auto-on, so most small-shape tests in the
suite already run it; this file pins the on/off paths AGAINST EACH OTHER
on identical shapes (FLASHATTN_SINGLE_STEP=0 forces the general path) and
against the jnp oracle for every feature that touches the stats algebra.
"""

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu.ops.common import BlockSizes
from flashattn_tpu.ops.flash_fwd import flash_attention_forward
from flashattn_tpu.ops.reference import (
    reference_attention,
    reference_attention_with_lse,
)
from flashattn_tpu.utils.verify import verify_results

from tests.test_flash_fwd import make_qkv

BS = BlockSizes(block_q=128, block_kv=512)  # 1 kv block at s_k <= 512


def _both_paths(monkeypatch, fn):
    """Run fn() with single_step auto (ON at these shapes) and forced OFF;
    return both results."""
    monkeypatch.delenv("FLASHATTN_SINGLE_STEP", raising=False)
    jax.clear_caches()
    on = fn()
    monkeypatch.setenv("FLASHATTN_SINGLE_STEP", "0")
    jax.clear_caches()
    off = fn()
    monkeypatch.delenv("FLASHATTN_SINGLE_STEP", raising=False)
    jax.clear_caches()
    return on, off


@pytest.mark.parametrize("s_q,s_k,causal,d", [
    (512, 512, True, 128),
    (512, 512, False, 128),
    (500, 500, True, 64),     # ragged tail + mxu_l spare-lane row-sum
    (1024, 512, True, 128),   # cross-attn S_q > S_k: zero-key guard rows
    (256, 512, True, 128),    # S_q < S_k bottom-right alignment
])
def test_single_step_matches_general_and_oracle(monkeypatch, s_q, s_k,
                                                causal, d):
    q, k, v = make_qkv(2, 4, 2, s_q, s_k, d)

    def run():
        return flash_attention_forward(q, k, v, is_causal=causal,
                                       block_sizes=BS)

    (o_on, lse_on), (o_off, lse_off) = _both_paths(monkeypatch, run)
    # The two kernel paths compute the same algebra in the same order —
    # they must agree bitwise-tight, far tighter than the oracle gate.
    assert verify_results(o_off, o_on, atol=1e-6, rtol=1e-6).passed
    assert verify_results(lse_off, lse_on, atol=1e-6, rtol=1e-6).passed
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=causal)
    assert verify_results(o_ref, o_on, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse_on, atol=1e-5, rtol=1e-5).passed


def test_single_step_segments(monkeypatch):
    s = 512
    q, k, v = make_qkv(1, 2, 2, s, s, 64)
    seg = (jnp.arange(s) // 96).astype(jnp.int32)[None, :]

    def run():
        return flash_attention_forward(q, k, v, is_causal=True,
                                       segment_ids=(seg, seg),
                                       block_sizes=BS)

    (o_on, lse_on), (o_off, lse_off) = _both_paths(monkeypatch, run)
    assert verify_results(o_off, o_on, atol=1e-6, rtol=1e-6).passed
    o_ref, lse_ref = reference_attention_with_lse(
        q, k, v, is_causal=True, segment_ids=(seg, seg))
    assert verify_results(o_ref, o_on, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse_on, atol=1e-5, rtol=1e-5).passed


def test_single_step_window_alibi_softcap(monkeypatch):
    s = 512
    q, k, v = make_qkv(1, 4, 4, s, s, 64)
    for kwargs in ({"window": 160}, {"alibi": True},
                   {"logit_softcap": 30.0}):
        def run():
            return flash_attention_forward(q, k, v, is_causal=True,
                                           block_sizes=BS, **kwargs)

        (o_on, _), (o_off, _) = _both_paths(monkeypatch, run)
        assert verify_results(o_off, o_on, atol=1e-6, rtol=1e-6).passed
        o_ref = reference_attention(q, k, v, is_causal=True, **kwargs)
        assert verify_results(o_ref, o_on, atol=1e-5, rtol=1e-5).passed


def test_single_step_dropout_matches_general(monkeypatch):
    """Dropout keep mask is keyed on global (row, col): identical pattern
    on both paths (l stays clean — LSE must agree exactly)."""
    s = 512
    q, k, v = make_qkv(1, 2, 2, s, s, 64)

    def run():
        return flash_attention_forward(q, k, v, is_causal=True,
                                       dropout_rate=0.3, dropout_seed=11,
                                       block_sizes=BS)

    (o_on, lse_on), (o_off, lse_off) = _both_paths(monkeypatch, run)
    assert verify_results(o_off, o_on, atol=1e-6, rtol=1e-6).passed
    assert verify_results(lse_off, lse_on, atol=1e-6, rtol=1e-6).passed


def test_single_step_unroll_compose(monkeypatch):
    """unroll_kv bands inside a single-step row: value-carried stats chain
    band-to-band with the same alpha algebra."""
    q, k, v = make_qkv(2, 2, 2, 384, 512, 64)
    bs = BlockSizes(block_q=128, block_kv=512, unroll_kv=2)

    def run():
        return flash_attention_forward(q, k, v, is_causal=True,
                                       block_sizes=bs)

    (o_on, lse_on), (o_off, _) = _both_paths(monkeypatch, run)
    assert verify_results(o_off, o_on, atol=1e-6, rtol=1e-6).passed
    o_ref, lse_ref = reference_attention_with_lse(q, k, v, is_causal=True)
    assert verify_results(o_ref, o_on, atol=1e-5, rtol=1e-5).passed
    assert verify_results(lse_ref, lse_on, atol=1e-5, rtol=1e-5).passed
