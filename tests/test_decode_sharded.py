"""Multi-chip decode (north_star: "TP: heads/KV-cache sharded over mesh
axis"): the decode kernel is mesh-oblivious per KV head, so sharding the
cache over heads is a shard_map wrapper — verified against unsharded."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from flashattn_tpu.ops.decode import decode_attention
from flashattn_tpu.ops.kvcache import KVCache, init_cache, update_cache
from flashattn_tpu.parallel import make_mesh


def test_decode_tp_heads_sharded():
    b, hq, hkv, d, s = 2, 8, 4, 64, 512
    mesh = make_mesh({"model": 4})
    cache = init_cache(b, hkv, s, d, quant="int8")
    kn = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, s, d),
                           jnp.bfloat16)
    vn = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, s, d),
                           jnp.bfloat16)
    cache = update_cache(cache, kn, vn)
    q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, d), jnp.bfloat16)

    o_ref = decode_attention(q, cache)

    cache_specs = KVCache(
        k=P(None, "model"), v=P(None, "model"),
        k_scale=P(None, "model"), v_scale=P(None, "model"),
        length=P(),
    )
    o = jax.shard_map(
        decode_attention, mesh=mesh,
        in_specs=(P(None, "model"), cache_specs),
        out_specs=P(None, "model"),
        check_vma=False,
    )(q, cache)
    np.testing.assert_allclose(np.asarray(o.astype(jnp.float32)),
                               np.asarray(o_ref.astype(jnp.float32)),
                               atol=1e-5)


def test_decode_sequence_sharded():
    """Cache split over 'sp' (each device one slice + local length); the
    LSE merge must reproduce the unsharded decode for ragged lengths."""
    from flashattn_tpu.parallel.serving import sharded_decode_attention
    import dataclasses

    b, hq, hkv, d, s = 3, 4, 2, 64, 1024
    lens = [1000, 512, 100]
    mesh = make_mesh({"sp": 4})
    cache = init_cache(b, hkv, s, d)
    kn = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, s, d),
                           jnp.bfloat16)
    vn = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, s, d),
                           jnp.bfloat16)
    cache = update_cache(cache, kn, vn)
    cache = dataclasses.replace(cache, length=jnp.asarray(lens, jnp.int32))
    q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, d), jnp.bfloat16)

    o_ref = decode_attention(q, cache)
    o = sharded_decode_attention(q, cache, mesh)
    np.testing.assert_allclose(np.asarray(o.astype(jnp.float32)),
                               np.asarray(o_ref.astype(jnp.float32)),
                               atol=2e-2)


def test_decode_sequence_sharded_quantized():
    from flashattn_tpu.parallel.serving import sharded_decode_attention
    import dataclasses

    b, hq, hkv, d, s = 2, 4, 2, 64, 512
    mesh = make_mesh({"sp": 2})
    cache = init_cache(b, hkv, s, d, quant="int8")
    kn = jax.random.normal(jax.random.PRNGKey(3), (b, hkv, s, d),
                           jnp.bfloat16)
    cache = update_cache(cache, kn, kn)
    cache = dataclasses.replace(cache,
                                length=jnp.asarray([400, 300], jnp.int32))
    q = jax.random.normal(jax.random.PRNGKey(4), (b, hq, d), jnp.bfloat16)
    o_ref = decode_attention(q, cache)
    o = sharded_decode_attention(q, cache, mesh)
    np.testing.assert_allclose(np.asarray(o.astype(jnp.float32)),
                               np.asarray(o_ref.astype(jnp.float32)),
                               atol=2e-2)


def test_paged_decode_tp_heads_sharded():
    """Paged pool tensor-sharded over KV heads: pages split on axis 1,
    block table + lengths replicated — the paged kernel is mesh-oblivious
    per head exactly like the dense one."""
    from flashattn_tpu.ops.paged import (
        PagedKVCache, append_paged, init_paged_cache, paged_decode_attention,
        set_block_table)

    b, hq, hkv, d, s, page = 2, 8, 4, 64, 512, 128
    maxp = s // page
    mesh = make_mesh({"model": 4})
    paged = init_paged_cache(b, hkv, num_pages=b * maxp + 2, page_size=page,
                             head_dim=d, max_pages_per_seq=maxp,
                             dtype=jnp.bfloat16)
    perm = np.arange(2, 2 + b * maxp)[::-1].reshape(b, maxp)
    for bi in range(b):
        paged = set_block_table(paged, bi, jnp.asarray(perm[bi], jnp.int32), 0)
    kn = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, 500, d),
                           jnp.bfloat16)
    vn = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, 500, d),
                           jnp.bfloat16)
    paged = append_paged(paged, kn, vn)
    q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, d), jnp.bfloat16)

    o_ref = paged_decode_attention(q, paged)

    specs = PagedKVCache(
        k_pages=P(None, "model"), v_pages=P(None, "model"),
        k_scale=None, v_scale=None,
        block_table=P(), length=P(),
    )
    o = jax.shard_map(
        paged_decode_attention, mesh=mesh,
        in_specs=(P(None, "model"), specs),
        out_specs=P(None, "model"),
        check_vma=False,
    )(q, paged)
    np.testing.assert_allclose(np.asarray(o.astype(jnp.float32)),
                               np.asarray(o_ref.astype(jnp.float32)),
                               atol=1e-5)


def test_decode_tp_heads_sharded_alibi():
    """ALiBi decode under head sharding: shard the global slope table with
    the heads — matches the unsharded decode exactly."""
    from flashattn_tpu.ops.flash_fwd import default_alibi_slopes

    b, hq, hkv, d, s = 2, 8, 4, 64, 512
    mesh = make_mesh({"model": 4})
    cache = init_cache(b, hkv, s, d, dtype=jnp.bfloat16)
    kn = jax.random.normal(jax.random.PRNGKey(0), (b, hkv, s, d),
                           jnp.bfloat16)
    vn = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, s, d),
                           jnp.bfloat16)
    cache = update_cache(cache, kn, vn)
    q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, d), jnp.bfloat16)
    slopes = default_alibi_slopes(hq)

    o_ref = decode_attention(q, cache, alibi=True)

    cache_specs = KVCache(
        k=P(None, "model"), v=P(None, "model"),
        k_scale=None, v_scale=None, length=P(),
    )
    o = jax.shard_map(
        lambda q, c, sl: decode_attention(q, c, alibi=True, alibi_slopes=sl),
        mesh=mesh,
        in_specs=(P(None, "model"), cache_specs, P("model")),
        out_specs=P(None, "model"),
        check_vma=False,
    )(q, cache, slopes)
    np.testing.assert_allclose(np.asarray(o.astype(jnp.float32)),
                               np.asarray(o_ref.astype(jnp.float32)),
                               atol=1e-5)
