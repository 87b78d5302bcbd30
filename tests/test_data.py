"""Packed-document data pipeline (models/data.py): packing invariants,
deterministic resume, prefetch transparency, and end-to-end training through
train.train with segment ids."""

import numpy as np
import jax
import jax.numpy as jnp

from flashattn_tpu.models import data as D
from flashattn_tpu.models import llama, train
from flashattn_tpu.models.config import TINY


def corpus(n=40, seed=0, vmax=100):
    rng = np.random.default_rng(seed)
    return [rng.integers(1, vmax, size=int(rng.integers(3, 60))).tolist()
            for _ in range(n)]


def test_pack_documents_invariants():
    docs = corpus()
    rows = list(D.pack_documents(docs, row_len=33, pad_id=0))
    flat_tokens, flat_segs = [], []
    for t, s in rows:
        assert t.shape == (33,) and s.shape == (33,)
        live = s >= 0
        # Padding only ever follows the live region.
        assert not np.any(np.diff(live.astype(int)) > 0)
        # Each segment id is one contiguous run.
        ids = s[live]
        changes = np.sum(np.diff(ids) != 0) + 1
        assert changes == len(np.unique(ids))
        flat_tokens.append(t[live])
        flat_segs.append(ids)
    # Token stream is preserved exactly (packing only regroups).
    got = np.concatenate(flat_tokens)
    want = np.concatenate([np.asarray(d) for d in docs])
    np.testing.assert_array_equal(got, want)
    # Every (doc-chunk) boundary got a distinct id within its row.
    total_live = sum(len(x) for x in flat_tokens)
    assert total_live == len(want)


def test_long_document_splits():
    rows = list(D.pack_documents([list(range(100))], row_len=33))
    got = np.concatenate([t[s >= 0] for t, s in rows])
    np.testing.assert_array_equal(got, np.arange(100))
    # Chunks carry distinct segment ids (no cross-chunk attention).
    all_ids = np.concatenate([s[s >= 0] for t, s in rows])
    assert len(np.unique(all_ids)) >= 100 // 33


def test_batches_deterministic_resume():
    ds = D.PackedDataset(corpus(), batch_size=2, seq_len=32, seed=7)
    it = ds.batches()
    first = [next(it) for _ in range(5)]
    resumed = next(ds.batches(start_step=3))
    np.testing.assert_array_equal(resumed["tokens"], first[3]["tokens"])
    np.testing.assert_array_equal(resumed["segment_ids"],
                                  first[3]["segment_ids"])
    # Different seed -> different order.
    other = next(D.PackedDataset(corpus(), 2, 32, seed=8).batches())
    assert not np.array_equal(other["tokens"], first[0]["tokens"])


def test_prefetch_transparent():
    ds = D.PackedDataset(corpus(), batch_size=2, seq_len=32, seed=7)
    plain = [next(ds.batches()) for _ in range(1)][0]
    fetched = next(D.prefetch(ds.batches(), size=2))
    np.testing.assert_array_equal(plain["tokens"], fetched["tokens"])


def test_train_loop_consumes_packed_batches():
    cfg = TINY
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ds = D.PackedDataset(corpus(vmax=cfg.vocab_size - 1), batch_size=2,
                         seq_len=64, seed=1)
    tc = train.TrainConfig(total_steps=4, warmup_steps=1)
    state, hist = train.train(params, D.prefetch(ds.batches()), cfg, tc,
                              steps=2, log_every=1)
    assert int(state["step"]) == 2
    assert all(np.isfinite(h["loss"]) for h in hist)
    # Packed loss must differ from treating the same rows as ONE document
    # (boundary masking is live).
    batch = next(ds.batches())
    l_seg = llama.loss_fn(state["params"], jnp.asarray(batch["tokens"]), cfg,
                          segment_ids=jnp.asarray(batch["segment_ids"]))
    l_dense = llama.loss_fn(state["params"], jnp.asarray(batch["tokens"]),
                            cfg)
    assert not np.allclose(float(l_seg), float(l_dense))
