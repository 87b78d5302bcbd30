"""Tests for the verification harness (reference _verify_func.py semantics)."""

import numpy as np

from flashattn_tpu.utils.verify import verify_results


def test_identical_passes():
    x = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    r = verify_results(x, x)
    assert r.passed and r.allclose
    assert r.max_abs_err == 0.0
    assert r.cosine > 0.9999


def test_small_noise_passes():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    y = x + rng.normal(size=x.shape).astype(np.float32) * 1e-4
    assert verify_results(x, y).passed


def test_large_error_fails():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    y = x + 0.5
    assert not verify_results(x, y).passed


def test_sign_flip_fails_cosine():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    assert not verify_results(x, -x).passed
