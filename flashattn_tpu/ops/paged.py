"""Paged KV cache + paged flash-decode (vLLM-style block tables, TPU-native).

Production serving extension beyond the reference's scope (the reference has
no decode path at all — SURVEY.md §2.3 T6 covers the dense decode kernel
this builds on). A contiguous per-slot cache (`ops/kvcache.py`) reserves
Smax tokens of HBM per sequence; a paged cache shares one pool of fixed-size
pages, so HBM holds the *sum of live context*, not `batch · Smax`:

  - `k_pages`/`v_pages`: [num_pages, Hkv, page_size, D] shared pool.
  - `block_table`: [B, max_pages_per_seq] int32 — logical block j of
    sequence b lives in physical page `block_table[b, j]`.
  - The decode kernel is the SAME `_decode_kernel` as the dense path
    (`ops/decode.py`): paging is purely an index-map concern. The block
    table rides the scalar-prefetch channel (SMEM) next to the lengths,
    and the K/V `BlockSpec` index maps translate logical block -> physical
    page — the TPU analogue of vLLM's gather, costing zero kernel-body ops
    (masking stays in logical position space).

Page allocation is host-side (`PageAllocator`): admission/eviction decide
page ownership in Python; the jitted steps only consume device arrays.
This mirrors production TPU serving stacks, where block tables are control
plane, not data plane.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.ops.common import LOG2E, interpret_default
from flashattn_tpu.ops.decode import (_decode_kernel, decode_slopes_rows,
                                      prep_decode_q)
from flashattn_tpu.ops.kvcache import (quantize_tokens,
                                        store_dtype_for)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Functional paged KV cache for one layer (pool shared by all slots)."""

    k_pages: jnp.ndarray  # [P, Hkv, page, D] — bf16 | int8 | fp8
    v_pages: jnp.ndarray  # [P, Hkv, page, D]
    k_scale: jnp.ndarray | None  # [P, Hkv, 1, page] f32 (None if bf16)
    v_scale: jnp.ndarray | None
    block_table: jnp.ndarray  # [B, max_pages_per_seq] int32 physical pages
    length: jnp.ndarray  # [B] int32 — valid tokens per sequence

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def max_len(self) -> int:
        return self.block_table.shape[1] * self.page_size

    @property
    def batch(self) -> int:
        return self.block_table.shape[0]


def init_paged_cache(
    batch: int,
    num_kv_heads: int,
    num_pages: int,
    page_size: int,
    head_dim: int,
    max_pages_per_seq: int,
    dtype=jnp.bfloat16,
    quant: str | None = None,  # None | "int8" | "fp8"
) -> PagedKVCache:
    """Allocate the page pool + an all-zeros block table.

    page_size must be a multiple of 128 (Mosaic lane tiling); 512-2048 is
    the practical range on v5e — smaller pages share memory at finer grain,
    larger pages amortize per-block DMA overhead (see benchmarks).
    """
    assert page_size % 128 == 0, f"page_size must be 128-aligned: {page_size}"
    store_dtype, scales = store_dtype_for(quant, dtype)
    shape = (num_pages, num_kv_heads, page_size, head_dim)
    zeros = jnp.zeros(shape, store_dtype)
    scale = (
        jnp.ones((num_pages, num_kv_heads, 1, page_size), jnp.float32)
        if scales else None
    )
    return PagedKVCache(
        k_pages=zeros,
        v_pages=jnp.zeros_like(zeros),
        k_scale=scale,
        v_scale=None if scale is None else jnp.ones_like(scale),
        block_table=jnp.zeros((batch, max_pages_per_seq), jnp.int32),
        length=jnp.zeros((batch,), jnp.int32),
    )


class PageAllocator:
    """Host-side reference-counted page allocator (control plane).

    The server owns one allocator per model (pages are shared across layers
    via identical tables, so allocation is per-sequence, not per-layer).
    Reference counts exist for prefix caching: a shared system-prompt's
    pages are retained once per sequence using them and freed when the last
    reference releases.
    """

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, -1, -1))
        self._rc = [0] * num_pages

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> list[int]:
        if n > len(self._free):
            raise MemoryError(
                f"paged KV pool exhausted: want {n}, have {len(self._free)}")
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._rc[p] = 1
        return pages

    def retain(self, pages: list[int]) -> None:
        """Add a reference to already-allocated pages (prefix sharing)."""
        for p in pages:
            assert self._rc[p] > 0, f"retain of free page {p}"
            self._rc[p] += 1

    def release(self, pages: list[int]) -> None:
        for p in pages:
            self._rc[p] -= 1
            assert self._rc[p] >= 0, f"double free of page {p}"
            if self._rc[p] == 0:
                self._free.append(p)


def pages_needed(tokens: int, page_size: int) -> int:
    return -(-tokens // page_size)


@jax.jit
def set_block_table(cache: PagedKVCache, slot, pages: jnp.ndarray,
                    length) -> PagedKVCache:
    """Install a sequence's page list + length into `slot` (admission).

    `pages` must be padded to max_pages_per_seq (dead entries are never
    dereferenced: the index map clamps to live blocks first).
    """
    return dataclasses.replace(
        cache,
        block_table=cache.block_table.at[slot].set(pages),
        length=cache.length.at[slot].set(length),
    )


@functools.partial(jax.jit, static_argnames=("first_block",))
def write_pages(
    cache: PagedKVCache,
    single,  # dense KVCache, B=1, same Hkv/D/quant (a prefill result)
    pages: jnp.ndarray,  # [n_blocks] int32; entries >= num_pages dropped
    first_block: int = 0,
) -> PagedKVCache:
    """Shard a single-sequence DENSE cache into pool pages (no table/length
    update — the pool-only half of admission, also used to install shared
    prefix pages that belong to no slot). Logical block first_block+j of
    the dense buffer lands in physical page `pages[j]` (first_block > 0 =
    install only a suffix, e.g. after a prefix-seeded prefill); entries
    >= num_pages are dropped by the scatter, so a caller only ever writes
    pages it owns."""
    p, hkv, page, d = cache.k_pages.shape
    nb = pages.shape[0]
    lo = first_block * page
    assert single.k.shape[0] == 1
    assert single.k.shape[2] >= lo + nb * page, (single.k.shape, nb, page)

    def shard(buf):  # [1, Hkv, S, D] -> [nb, Hkv, page, D]
        return buf[0, :, lo:lo + nb * page].reshape(
            hkv, nb, page, d).transpose(1, 0, 2, 3)

    k_pages = cache.k_pages.at[pages].set(shard(single.k), mode="drop")
    v_pages = cache.v_pages.at[pages].set(shard(single.v), mode="drop")
    if cache.quantized:
        def shard_s(buf):  # [1, Hkv, 1, S] -> [nb, Hkv, 1, page]
            return buf[0, :, 0, lo:lo + nb * page].reshape(
                hkv, nb, page).transpose(1, 0, 2)[:, :, None, :]
        k_scale = cache.k_scale.at[pages].set(shard_s(single.k_scale),
                                              mode="drop")
        v_scale = cache.v_scale.at[pages].set(shard_s(single.v_scale),
                                              mode="drop")
    else:
        k_scale = v_scale = None
    return dataclasses.replace(
        cache, k_pages=k_pages, v_pages=v_pages,
        k_scale=k_scale, v_scale=v_scale,
    )


def write_slot_paged(
    cache: PagedKVCache,
    single,  # dense KVCache, B=1, same Hkv/D/quant (a prefill result)
    slot,
    pages: jnp.ndarray,  # [max_pages_per_seq] int32; unowned entries >= P
) -> PagedKVCache:
    """Install a prefilled single-sequence DENSE cache into `slot`'s pages
    (continuous-batching admission: prefill runs contiguous B=1, then the
    filled cache shards into the pool page by page). The dense buffer's
    max_len must equal max_pages_per_seq * page_size."""
    maxp = cache.block_table.shape[1]
    assert single.k.shape[2] == maxp * cache.page_size, (
        single.k.shape, maxp, cache.page_size)
    cache = write_pages(cache, single, pages)
    return set_block_table(cache, slot, pages, single.length[0])


@functools.partial(jax.jit, static_argnames=("max_len",))
def pages_to_dense(
    cache: PagedKVCache,
    pages: jnp.ndarray,  # [n_blocks] int32 — pages holding the content
    max_len: int = 0,  # static: dense capacity
    length: jnp.ndarray | int = 0,
):
    """Gather pool pages back into a single-sequence DENSE KVCache of
    capacity max_len (raw quantized payload + scales copied verbatim — no
    requantization). Used to seed a suffix prefill with a shared prefix's
    K/V: positions [0, n_blocks·page) hold the gathered pages."""
    from flashattn_tpu.ops.kvcache import KVCache

    p, hkv, page, d = cache.k_pages.shape
    nb = pages.shape[0]
    n = nb * page
    assert max_len >= n, (max_len, n)

    def gather(buf):  # [P, Hkv, page, D] -> [1, Hkv, nb*page, D]
        g = buf[pages].transpose(1, 0, 2, 3).reshape(1, hkv, n, d)
        pad = jnp.zeros((1, hkv, max_len - n, d), buf.dtype)
        return jnp.concatenate([g, pad], axis=2)

    if cache.quantized:
        def gather_s(buf):  # [P, Hkv, 1, page] -> [1, Hkv, 1, max_len]
            g = buf[pages][:, :, 0].transpose(1, 0, 2).reshape(1, hkv, 1, n)
            pad = jnp.ones((1, hkv, 1, max_len - n), buf.dtype)
            return jnp.concatenate([g, pad], axis=3)
        k_scale, v_scale = gather_s(cache.k_scale), gather_s(cache.v_scale)
    else:
        k_scale = v_scale = None
    return KVCache(
        k=gather(cache.k_pages), v=gather(cache.v_pages),
        k_scale=k_scale, v_scale=v_scale,
        length=jnp.asarray([length], jnp.int32).reshape(1),
    )


@functools.partial(jax.jit, static_argnames=())
def append_paged(
    cache: PagedKVCache,
    k_new: jnp.ndarray,  # [B, Hkv, T, D] compute dtype
    v_new: jnp.ndarray,
    active: jnp.ndarray | None = None,  # [B] bool — continuous batching
) -> PagedKVCache:
    """Append T tokens per sequence at its current length, through the table.

    Token t of sequence b lands in physical page
    `table[b, (len_b + t) // page]` at row `(len_b + t) % page`. The write
    is one XLA scatter over the flattened (B·T) token list. Sequences must
    own enough pages (the server allocates ahead of the step). Inactive and
    past-capacity tokens are DROPPED (scatter mode="drop", index = P), so a
    masked append can never corrupt the pool — stronger than the dense
    cache's write-then-overwrite convention, whose clamped dynamic slice
    can clobber live data when an inactive slot sits near capacity.
    """
    b, hkv, t, d = k_new.shape
    page = cache.page_size
    if cache.quantized:
        k_q, k_s = quantize_tokens(k_new, cache.k_pages.dtype)
        v_q, v_s = quantize_tokens(v_new, cache.v_pages.dtype)
    else:
        k_q = k_new.astype(cache.k_pages.dtype)
        v_q = v_new.astype(cache.v_pages.dtype)
        k_s = v_s = None

    pos = cache.length[:, None] + jnp.arange(t)[None, :]  # [B, T] logical
    logical = pos // page  # [B, T] block index
    offs = (pos % page).reshape(-1)  # [B*T]
    max_pages_per_seq = cache.block_table.shape[1]
    pids = jnp.take_along_axis(
        cache.block_table,
        jnp.minimum(logical, max_pages_per_seq - 1), axis=1)  # [B, T]
    # Route dead writes to page index P: out of bounds -> scatter drops them.
    num_pages = cache.k_pages.shape[0]
    dead = logical >= max_pages_per_seq
    if active is not None:
        dead = dead | ~active[:, None]
    pids = jnp.where(dead, num_pages, pids).reshape(-1)  # [B*T]

    # [B, Hkv, T, D] -> [B*T, Hkv, D] scatter rows
    def put(pages_buf, vals):
        rows = vals.transpose(0, 2, 1, 3).reshape(b * t, hkv, d)
        return pages_buf.at[pids, :, offs, :].set(rows, mode="drop")

    k_pages = put(cache.k_pages, k_q)
    v_pages = put(cache.v_pages, v_q)
    if cache.quantized:
        def put_scale(buf, s):  # s: [B, Hkv, 1, T] -> rows [B*T, Hkv]
            rows = s[:, :, 0].transpose(0, 2, 1).reshape(b * t, hkv)
            return buf.at[pids, :, 0, offs].set(rows, mode="drop")
        k_scale = put_scale(cache.k_scale, k_s)
        v_scale = put_scale(cache.v_scale, v_s)
    else:
        k_scale = v_scale = None
    advance = t if active is None else t * active.astype(jnp.int32)
    return dataclasses.replace(
        cache, k_pages=k_pages, v_pages=v_pages,
        k_scale=k_scale, v_scale=v_scale,
        length=cache.length + advance,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "debug", "window",
                              "sink", "logit_softcap", "alibi")
)
def paged_decode_attention(
    q: jnp.ndarray,  # [B, Hq, D] — one new token per sequence
    cache: PagedKVCache,
    scale: float | None = None,
    interpret: bool | None = None,
    debug: bool = False,
    window: int | None = None,
    sink: int = 0,
    logit_softcap: float | None = None,
    alibi: bool = False,
    alibi_slopes: jnp.ndarray | None = None,  # (Hq,) f32; None = standard
) -> jnp.ndarray:
    """Single-step decode against the paged cache -> [B, Hq, D].

    Same kernel as the dense `decode_attention`; block_kv == page_size and
    the K/V index maps dereference the block table (scalar-prefetched to
    SMEM). Dead blocks clamp onto the live range so ragged batches stream
    only live pages.
    """
    return _paged_decode(q[:, :, None], cache, scale, interpret, debug,
                         window, logit_softcap, alibi,
                         alibi_slopes, sink=sink)[:, :, 0]


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "debug", "window",
                              "sink", "logit_softcap", "alibi")
)
def paged_decode_attention_chunk(
    q: jnp.ndarray,  # [B, Hq, T, D] — T new tokens per sequence
    cache: PagedKVCache,
    scale: float | None = None,
    interpret: bool | None = None,
    debug: bool = False,
    window: int | None = None,
    sink: int = 0,
    logit_softcap: float | None = None,
    alibi: bool = False,
    alibi_slopes: jnp.ndarray | None = None,  # (Hq,) f32; None = standard
) -> jnp.ndarray:
    """Chunked decode (chunked prefill / speculative verification) against
    the paged cache; the chunk's K/V must already be appended."""
    return _paged_decode(q, cache, scale, interpret, debug, window,
                         logit_softcap, alibi, alibi_slopes, sink=sink)


def _paged_decode(
    q: jnp.ndarray,  # [B, Hq, T, D]
    cache: PagedKVCache,
    scale: float | None,
    interpret: bool | None,
    debug: bool,
    window: int | None,
    logit_softcap: float | None,
    alibi: bool,
    alibi_slopes: jnp.ndarray | None = None,
    sink: int = 0,
):
    assert sink == 0 or window is not None, "sink requires window"
    b, hq, t_chunk, d = q.shape
    _, hkv, page, dk = cache.k_pages.shape
    assert dk == d
    assert not (alibi and logit_softcap), "alibi + softcap: pick one"
    assert hq % hkv == 0
    assert b == cache.batch, (b, cache.batch)
    group = hq // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = interpret_default()
    num_kv_blocks = cache.block_table.shape[1]
    block_kv = page

    rows = group * t_chunk
    quantized = cache.quantized
    int8_mode = quantized and cache.k_pages.dtype == jnp.int8
    pre = scale if logit_softcap else scale * LOG2E
    q4, q_scale = prep_decode_q(q, hkv, int8_mode, pre)

    def q_index(b_i, h_i, kv_i, lens, table):
        return (b_i, h_i, 0, 0)

    def _page(kv_i, lens, table, b_i):
        # Clamp dead blocks onto the live range (no re-fetch DMA), THEN
        # translate logical block -> physical page through the table.
        last = jnp.maximum(pl.cdiv(lens[b_i], block_kv) - 1, 0)
        first = (
            jnp.maximum(lens[b_i] - (t_chunk - 1) - window, 0) // block_kv
            if window is not None else 0)
        c = jnp.clip(kv_i, first, last)
        if sink:  # sink blocks sit left of the window: fetch their own page
            c = jnp.where(kv_i * block_kv < sink,
                          jnp.minimum(kv_i, last), c)
        return table[b_i, c]

    def kv_index(b_i, h_i, kv_i, lens, table):
        return (_page(kv_i, lens, table, b_i), h_i, 0, 0)

    def scale_index(b_i, h_i, kv_i, lens, table):
        return (_page(kv_i, lens, table, b_i), h_i, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, rows, d), q_index),
        pl.BlockSpec((1, 1, block_kv, d), kv_index),
        pl.BlockSpec((1, 1, block_kv, d), kv_index),
    ]
    args = [q4, cache.k_pages, cache.v_pages]
    if int8_mode:
        in_specs.append(pl.BlockSpec((1, 1, rows, 1), q_index))
        args.append(q_scale)
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, 1, block_kv), scale_index),
            pl.BlockSpec((1, 1, 1, block_kv), scale_index),
        ]
        args += [cache.k_scale, cache.v_scale]
    if alibi:
        in_specs.append(pl.BlockSpec(
            (1, rows, 1), lambda b_i, h_i, kv_i, lens, table: (h_i, 0, 0)))
        args.append(decode_slopes_rows(alibi_slopes, hq, hkv, t_chunk))

    def kernel(lengths_ref, table_ref, *rest, **kw):
        # The table is consumed by the index maps only; the kernel body is
        # the dense decode kernel, reasoning in logical positions.
        del table_ref
        return _decode_kernel(lengths_ref, *rest, **kw)

    kernel = functools.partial(
        kernel,
        quantized=quantized,
        int8_mode=int8_mode,
        group=rows,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        window=window,
        sink=sink,
        chunk=t_chunk,
        with_lse=False,
        softcap=float(logit_softcap or 0.0),
        alibi_hq=hq if alibi else 0,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv, num_kv_blocks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, rows, d), q_index),
            scratch_shapes=[
                # Leading h_fuse=1 axis: the shared kernel indexes
                # scratches [hh, ...] (paged keeps one head per step — the
                # page indirection already owns the index map).
                pltpu.VMEM((1, rows, 128), jnp.float32),
                pltpu.VMEM((1, rows, 128), jnp.float32),
                pltpu.VMEM((1, rows, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        debug=debug,
    )(cache.length, cache.block_table, *args)
    return out.reshape(b, hq, t_chunk, d)
