"""Multi-device tests for ring / Ulysses attention on the 8-virtual-CPU mesh
(SURVEY.md §4 "multi-device tests via mesh simulation"). Oracle = the pure-jnp
reference attention on the UNSHARDED arrays; gradients checked through
jax.grad of the shard_mapped function — the cross-chip analogue of the
reference's SDPA alignment discipline."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from flashattn_tpu.ops.attention import flash_attention
from flashattn_tpu.ops.common import BlockSizes
from flashattn_tpu.ops.reference import reference_attention
from flashattn_tpu.parallel import (
    make_mesh,
    ring_flash_attention,
    sharded_ring_attention,
    ulysses_flash_attention,
)
from flashattn_tpu.utils.verify import verify_results

BS = BlockSizes(
    block_q=128, block_kv=128,
    block_q_dq=128, block_kv_dq=128,
    block_q_dkv=128, block_kv_dkv=128,
)


def make_inputs(b, hq, hkv, s, d, seed=3):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(keys[0], (b, hq, s, d))
    k = jax.random.normal(keys[1], (b, hkv, s, d))
    v = jax.random.normal(keys[2], (b, hkv, s, d))
    do = jax.random.normal(keys[3], (b, hq, s, d))
    return q, k, v, do


def shard_mapped(inner, mesh, seq_axis="sp", **kw):
    fn = functools.partial(inner, axis_name=seq_axis, block_sizes=BS, **kw)
    spec = P(None, None, seq_axis, None)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )


def grads(fn, q, k, v, do):
    loss = lambda q, k, v: jnp.sum(fn(q, k, v) * do)
    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("is_causal", [False, True])
@pytest.mark.parametrize("n_sp", [4, 8])
def test_ring_forward(is_causal, n_sp):
    mesh = make_mesh({"sp": n_sp})
    q, k, v, _ = make_inputs(1, 2, 2, 128 * n_sp, 64)
    o = shard_mapped(ring_flash_attention, mesh, is_causal=is_causal)(q, k, v)
    o_ref = reference_attention(q, k, v, is_causal=is_causal)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r


@pytest.mark.parametrize("is_causal", [False, True])
def test_ring_backward(is_causal):
    mesh = make_mesh({"sp": 4})
    q, k, v, do = make_inputs(1, 2, 2, 512, 64)
    ours = shard_mapped(ring_flash_attention, mesh, is_causal=is_causal)
    ref = lambda q, k, v: reference_attention(q, k, v, is_causal=is_causal)
    for name, a, b in zip(
        ("dQ", "dK", "dV"), grads(ref, q, k, v, do), grads(ours, q, k, v, do)
    ):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


def test_ring_gqa_causal():
    mesh = make_mesh({"sp": 4})
    q, k, v, do = make_inputs(1, 4, 2, 512, 64)
    ours = shard_mapped(ring_flash_attention, mesh, is_causal=True)
    ref = lambda q, k, v: reference_attention(q, k, v, is_causal=True)
    r = verify_results(ref(q, k, v), ours(q, k, v), atol=1e-5, rtol=1e-5)
    assert r.passed, r
    for name, a, b in zip(
        ("dQ", "dK", "dV"), grads(ref, q, k, v, do), grads(ours, q, k, v, do)
    ):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


@pytest.mark.parametrize("is_causal", [False, True])
def test_ulysses_forward_backward(is_causal):
    mesh = make_mesh({"sp": 4})
    q, k, v, do = make_inputs(1, 4, 4, 512, 64)
    ours = shard_mapped(ulysses_flash_attention, mesh, is_causal=is_causal)
    ref = lambda q, k, v: reference_attention(q, k, v, is_causal=is_causal)
    r = verify_results(ref(q, k, v), ours(q, k, v), atol=1e-5, rtol=1e-5)
    assert r.passed, r
    for name, a, b in zip(
        ("dQ", "dK", "dV"), grads(ref, q, k, v, do), grads(ours, q, k, v, do)
    ):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


def test_ring_matches_ulysses():
    """The two SP modes must agree with each other bit-for-bit-ish."""
    mesh = make_mesh({"sp": 4})
    q, k, v, _ = make_inputs(1, 4, 4, 512, 64, seed=11)
    o_ring = shard_mapped(ring_flash_attention, mesh, is_causal=True)(q, k, v)
    o_uly = shard_mapped(ulysses_flash_attention, mesh, is_causal=True)(q, k, v)
    r = verify_results(o_uly, o_ring, atol=1e-5, rtol=1e-5)
    assert r.passed, r


def test_sharded_ring_attention_3d_mesh():
    """dp x tp x sp mesh through the global-view convenience wrapper."""
    mesh = make_mesh({"data": 2, "model": 2, "sp": 2})
    q, k, v, do = make_inputs(2, 2, 2, 256, 64, seed=5)
    ours = lambda q, k, v: sharded_ring_attention(
        q, k, v, mesh, is_causal=True, block_sizes=BS
    )
    ref = lambda q, k, v: reference_attention(q, k, v, is_causal=True)
    r = verify_results(ref(q, k, v), ours(q, k, v), atol=1e-5, rtol=1e-5)
    assert r.passed, r
    for name, a, b in zip(
        ("dQ", "dK", "dV"), grads(ref, q, k, v, do), grads(ours, q, k, v, do)
    ):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


def test_ring_bf16():
    mesh = make_mesh({"sp": 4})
    q, k, v, _ = make_inputs(1, 2, 2, 512, 64, seed=9)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    o = shard_mapped(ring_flash_attention, mesh, is_causal=True)(q, k, v)
    o_ref = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        is_causal=True,
    )
    r = verify_results(o_ref, o.astype(jnp.float32), atol=2e-2, rtol=2e-2)
    assert r.passed, r


# ---------------- zigzag (load-balanced causal ring) ----------------


def test_zigzag_permutation_roundtrip():
    import numpy as np
    from flashattn_tpu.parallel.ring import zigzag_permutation

    perm = zigzag_permutation(16, 2)
    inv = zigzag_permutation(16, 2, inverse=True)
    assert np.array_equal(perm[inv], np.arange(16))
    # n=2 -> 4 chunks of 4; device 0 gets chunks (0,3), device 1 gets (1,2).
    assert perm.tolist() == [0, 1, 2, 3, 12, 13, 14, 15,
                             4, 5, 6, 7, 8, 9, 10, 11]


@pytest.mark.parametrize("n_sp", [2, 4])
def test_zigzag_forward(n_sp):
    from flashattn_tpu.parallel import sharded_ring_attention

    mesh = make_mesh({"sp": n_sp})
    q, k, v, _ = make_inputs(1, 2, 2, 128 * 2 * n_sp, 64)
    o = sharded_ring_attention(q, k, v, mesh, is_causal=True,
                               block_sizes=BS, mode="zigzag",
                               batch_axis=None, head_axis=None)
    o_ref = reference_attention(q, k, v, is_causal=True)
    r = verify_results(o_ref, o, atol=1e-5, rtol=1e-5)
    assert r.passed, r


def test_zigzag_backward():
    from flashattn_tpu.parallel import sharded_ring_attention

    mesh = make_mesh({"sp": 4})
    q, k, v, do = make_inputs(1, 2, 2, 512, 64, seed=13)
    ours = lambda q, k, v: sharded_ring_attention(
        q, k, v, mesh, is_causal=True, block_sizes=BS, mode="zigzag",
        batch_axis=None, head_axis=None)
    ref = lambda q, k, v: reference_attention(q, k, v, is_causal=True)
    for name, a, b in zip(
        ("dQ", "dK", "dV"), grads(ref, q, k, v, do), grads(ours, q, k, v, do)
    ):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


def test_zigzag_gqa():
    from flashattn_tpu.parallel import sharded_ring_attention

    mesh = make_mesh({"sp": 2})
    q, k, v, do = make_inputs(1, 4, 2, 256, 64, seed=17)
    ours = lambda q, k, v: sharded_ring_attention(
        q, k, v, mesh, is_causal=True, block_sizes=BS, mode="zigzag",
        batch_axis=None, head_axis=None)
    ref = lambda q, k, v: reference_attention(q, k, v, is_causal=True)
    r = verify_results(ref(q, k, v), ours(q, k, v), atol=1e-5, rtol=1e-5)
    assert r.passed, r
    for name, a, b in zip(
        ("dQ", "dK", "dV"), grads(ref, q, k, v, do), grads(ours, q, k, v, do)
    ):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


@pytest.mark.parametrize("is_causal", [False, True])
def test_ulysses_gqa_kv_smaller_than_axis(is_causal):
    """GQA with Hkv < axis size: the all-gather-KV fallback must still be
    exact (fwd + grads)."""
    mesh = make_mesh({"sp": 4})
    q, k, v, do = make_inputs(1, 8, 2, 512, 64, seed=21)
    ours = shard_mapped(ulysses_flash_attention, mesh, is_causal=is_causal)
    ref = lambda q, k, v: reference_attention(q, k, v, is_causal=is_causal)
    r = verify_results(ref(q, k, v), ours(q, k, v), atol=1e-5, rtol=1e-5)
    assert r.passed, r
    for name, a, b in zip(
        ("dQ", "dK", "dV"), grads(ref, q, k, v, do), grads(ours, q, k, v, do)
    ):
        r = verify_results(a, b, atol=1e-5, rtol=1e-5)
        assert r.passed, f"{name}: {r}"


@pytest.mark.parametrize("variant", ["window", "softcap", "alibi"])
def test_ulysses_variants_match_unsharded(variant):
    """Window / softcap / ALiBi compose with Ulysses head-all-to-all with
    no cross-device logic (full-sequence local attention; ALiBi slices the
    global slope table per head shard) — exact vs unsharded."""
    import functools

    from flashattn_tpu.parallel.ulysses import ulysses_flash_attention

    kw = {"window": dict(window=200),
          "softcap": dict(logit_softcap=20.0),
          "alibi": dict(alibi=True)}[variant]
    mesh = make_mesh({"sp": 4})
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (1, 8, 512, 64)) for kk in keys)
    ref = flash_attention(q, k, v, is_causal=True, **kw)
    fn = functools.partial(ulysses_flash_attention, axis_name="sp",
                           is_causal=True, **kw)
    got = jax.shard_map(fn, mesh=mesh,
                        in_specs=(P(None, None, "sp"),) * 3,
                        out_specs=P(None, None, "sp"),
                        check_vma=False)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
