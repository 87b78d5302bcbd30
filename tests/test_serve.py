"""Continuous-batching server tests: slot admission/eviction mid-flight must
reproduce per-request greedy generation exactly (fp32 model => bitwise path
equality between the batched ragged decode and isolated generation)."""

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu.models import generate, llama
from flashattn_tpu.models.config import ModelConfig
from flashattn_tpu.models.serve import InferenceServer, Request

CFG = ModelConfig(
    vocab_size=128, hidden_size=128, intermediate_size=256, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=32, max_seq_len=512,
    dtype=jnp.float32,
)


def make_params():
    return llama.init_params(CFG, jax.random.PRNGKey(0))


def oracle(params, prompt, n_new):
    out = generate.generate(
        params, jnp.asarray([prompt], jnp.int32), CFG,
        max_new_tokens=n_new, max_len=512)
    return [int(t) for t in out[0]]


def test_single_request_matches_generate():
    params = make_params()
    prompt = [5, 9, 42, 7]
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512)
    srv.submit(Request(uid=1, prompt=prompt, max_new_tokens=8))
    got = srv.run()
    assert got[1] == oracle(params, prompt, 8)


def test_more_requests_than_slots():
    """4 requests, 2 slots, different prompt + generation lengths: slots must
    recycle mid-flight and every output must match isolated generation."""
    params = make_params()
    reqs = [
        (1, [3, 1, 4, 1, 5], 6),
        (2, [2, 7], 9),
        (3, list(range(20)), 4),
        (4, [99], 7),
    ]
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512)
    for uid, prompt, n in reqs:
        srv.submit(Request(uid=uid, prompt=prompt, max_new_tokens=n))
    got = srv.run()
    assert set(got) == {1, 2, 3, 4}
    for uid, prompt, n in reqs:
        assert got[uid] == oracle(params, prompt, n), uid


def test_eos_frees_slot_early():
    params = make_params()
    prompt = [5, 9, 42, 7]
    full = oracle(params, prompt, 8)
    eos = full[2]  # stop at the 3rd generated token
    srv = InferenceServer(params, CFG, max_slots=1, max_len=512)
    srv.submit(Request(uid=1, prompt=prompt, max_new_tokens=8,
                       eos_token=eos))
    srv.submit(Request(uid=2, prompt=[11, 13], max_new_tokens=3))
    got = srv.run()
    assert got[1] == full[:3] and got[1][-1] == eos
    assert got[2] == oracle(params, [11, 13], 3)


def test_quantized_server_runs():
    params = make_params()
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          quant="int8")
    srv.submit(Request(uid=1, prompt=[1, 2, 3], max_new_tokens=5))
    got = srv.run()
    assert len(got[1]) == 5


def test_paged_server_matches_dense():
    """paged=True (block-table pool) must reproduce the dense server's
    outputs exactly — same requests, slot churn, and page recycling, with a
    pool deliberately too small to hold all requests at once
    (admission backpressure)."""
    params = make_params()
    reqs = [
        (1, [3, 1, 4, 1, 5], 6),
        (2, [2, 7], 9),
        (3, list(range(20)), 4),
        (4, [99], 7),
    ]
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          paged=True, page_size=128, num_pages=5)
    for uid, prompt, n in reqs:
        srv.submit(Request(uid=uid, prompt=prompt, max_new_tokens=n))
    got = srv.run()
    assert set(got) == {1, 2, 3, 4}
    for uid, prompt, n in reqs:
        assert got[uid] == oracle(params, prompt, n), uid
    assert srv.allocator.free_pages == 5, "all pages must be released"


def test_prefix_caching_matches_oracle():
    """N requests sharing one registered system-prompt prefix: each output
    must match isolated generation on the FULL prompt, while the prefix's
    pages are prefilled once and shared (pool too small to duplicate them
    per request — duplication would trip the allocator)."""
    params = make_params()
    prefix = list(range(40, 40 + 256))  # 2 pages of 128
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          paged=True, page_size=128,
                          num_pages=2 + 2 * 3)  # prefix + 2 slots x 3 pages
    pid = srv.register_prefix(prefix)
    reqs = [
        (1, prefix + [7, 8, 9], 5),
        (2, prefix + [3], 6),
        (3, prefix + list(range(30)), 4),
    ]
    for uid, prompt, n in reqs:
        srv.submit(Request(uid=uid, prompt=prompt, max_new_tokens=n,
                           prefix_id=pid))
    got = srv.run()
    for uid, prompt, n in reqs:
        assert got[uid] == oracle(params, prompt, n), uid
    # registry still holds the prefix's 2 pages; everything else is free
    assert srv.allocator.free_pages == 6
    srv.unregister_prefix(pid)
    assert srv.allocator.free_pages == 8


def test_prefix_plus_plain_requests_interleave():
    """Prefix-sharing and plain requests coexist in one batch."""
    params = make_params()
    prefix = list(range(10, 10 + 128))
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          paged=True, page_size=128, num_pages=8)
    pid = srv.register_prefix(prefix)
    srv.submit(Request(uid=1, prompt=prefix + [5, 6], max_new_tokens=4,
                       prefix_id=pid))
    srv.submit(Request(uid=2, prompt=[9, 8, 7], max_new_tokens=5))
    got = srv.run()
    assert got[1] == oracle(params, prefix + [5, 6], 4)
    assert got[2] == oracle(params, [9, 8, 7], 5)


def test_server_stats():
    params = make_params()
    prefix = list(range(10, 10 + 128))
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          paged=True, page_size=128, num_pages=8)
    pid = srv.register_prefix(prefix)
    st = srv.stats()
    assert st["active_slots"] == 0 and st["queued"] == 0
    assert st["pages_used"] == 1 and st["prefix_pages"] == 1
    srv.submit(Request(uid=1, prompt=prefix + [5], max_new_tokens=4,
                       prefix_id=pid))
    srv.step()  # admit
    st = srv.stats()
    assert st["active_slots"] == 1
    assert st["pages_used"] > 1 and st["page_utilization"] > 0
    srv.run()
    assert srv.stats()["pages_used"] == 1  # only the registry ref remains


@pytest.mark.parametrize("paged", [False, True])
def test_chunked_admission_matches_oracle(paged):
    """admit_chunk streams prompts through the batch caches in bounded
    chunks (no B=1 staging prefill); outputs must still match isolated
    generation exactly, including slot recycling."""
    params = make_params()
    reqs = [
        (1, [(3 + i) % 120 for i in range(197)], 5),  # long: many chunks
        (2, [2, 7], 6),                # shorter than one chunk
        (3, list(range(60)), 4),
    ]
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          paged=paged, page_size=128, admit_chunk=64)
    for uid, prompt, n in reqs:
        srv.submit(Request(uid=uid, prompt=prompt, max_new_tokens=n))
    got = srv.run()
    for uid, prompt, n in reqs:
        assert got[uid] == oracle(params, prompt, n), uid


def test_chunked_admission_with_prefix():
    """Chunked admission composes with prefix caching: the stream starts at
    the shared boundary and only the suffix chunks run."""
    params = make_params()
    prefix = list(range(20, 20 + 128))
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          paged=True, page_size=128, num_pages=8,
                          admit_chunk=64)
    pid = srv.register_prefix(prefix)
    prompt = prefix + list(range(70))
    srv.submit(Request(uid=1, prompt=prompt, max_new_tokens=5,
                       prefix_id=pid))
    got = srv.run()
    assert got[1] == oracle(params, prompt, 5)
    assert srv.allocator.free_pages == 7  # only the registry page held


def test_chunked_admission_placeholder_not_finished_early():
    """While a prompt streams in chunks, the decode loop must not touch the
    placeholder slot: with max_new_tokens=1 and a multi-chunk prompt, a
    garbage decrement would _finish() it mid-admission (releasing pages and
    emitting garbage output)."""
    params = make_params()
    long_prompt = [(5 + i) % 120 for i in range(200)]  # 4 chunks of 64
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          paged=True, page_size=128, admit_chunk=64)
    srv.submit(Request(uid=1, prompt=[2, 7], max_new_tokens=30))
    srv.step(); srv.step()  # uid1 decoding
    srv.submit(Request(uid=2, prompt=long_prompt, max_new_tokens=1))
    # a queued request ready to steal uid2's slot if it is freed early
    srv.submit(Request(uid=3, prompt=[9, 9], max_new_tokens=3))
    got = srv.run()
    assert got[2] == oracle(params, long_prompt, 1)
    assert got[1] == oracle(params, [2, 7], 30)
    assert got[3] == oracle(params, [9, 9], 3)


def test_chunked_admission_near_capacity_decoder_not_clobbered():
    """Dense backend: a slot decoding within admit_chunk of max_len must
    survive another slot's streaming chunks bit-exactly (the masked append
    preserves inactive rows instead of writing a clamped dead chunk over
    their live tail)."""
    params = make_params()
    long_a = [(11 + i) % 120 for i in range(440)]  # decodes near 512
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          admit_chunk=64)
    srv.submit(Request(uid=1, prompt=long_a, max_new_tokens=40))
    # stream uid1 fully, then let it decode past 448 = 512 - 64
    while 0 in srv._admitting or not srv.slots[0].out:
        srv.step()
    for _ in range(15):
        srv.step()  # uid1 position ~455+
    srv.submit(Request(uid=2, prompt=[(7 * i) % 120 for i in range(100)],
                       max_new_tokens=4))
    got = srv.run()
    assert got[1] == oracle(params, long_a, 40), "live tail clobbered"
    assert got[2] == oracle(params, [(7 * i) % 120 for i in range(100)], 4)


def test_server_sampling():
    """Per-request SamplingParams: sampled slots are deterministic for a
    fixed (seed, uid) regardless of batch composition; greedy requests in
    the same batch stay exact."""
    from flashattn_tpu.models.sampling import SamplingParams

    params = make_params()
    sp = SamplingParams(temperature=1.3, top_k=20)
    greedy_prompt = [2, 7]

    def run_server(extra_greedy):
        srv = InferenceServer(params, CFG, max_slots=2, max_len=512, seed=7)
        srv.submit(Request(uid=1, prompt=[5, 9, 42], max_new_tokens=10,
                           sampling=sp))
        if extra_greedy:
            srv.submit(Request(uid=2, prompt=greedy_prompt,
                               max_new_tokens=8))
        return srv.run()

    a = run_server(extra_greedy=True)
    b = run_server(extra_greedy=False)
    assert a[1] == b[1], "sampled output must not depend on batch makeup"
    assert all(0 <= t < CFG.vocab_size for t in a[1])
    assert a[2] == oracle(params, greedy_prompt, 8)
    assert a[1] != oracle(params, [5, 9, 42], 10), (
        "temperature 1.3 should diverge from greedy for this seed")


def test_server_logprobs():
    """return_logprobs=True yields one logprob per generated token, equal
    to the model's own teacher-forced log-softmax at that position."""
    import numpy as np

    params = make_params()
    prompt = [5, 9, 42, 7]
    srv = InferenceServer(params, CFG, max_slots=1, max_len=512,
                          return_logprobs=True)
    srv.submit(Request(uid=1, prompt=prompt, max_new_tokens=5))
    got = srv.run()
    lps = srv.finished_logprobs[1]
    assert len(lps) == len(got[1]) == 5
    # oracle: run the full sequence through the training forward
    seq = prompt + got[1]
    logits = llama.forward(params, jnp.asarray([seq], jnp.int32), CFG)
    lsm = jax.nn.log_softmax(logits[0], axis=-1)
    want = [float(lsm[len(prompt) - 1 + i, tok])
            for i, tok in enumerate(got[1])]
    np.testing.assert_allclose(lps, want, rtol=2e-4, atol=2e-4)


def test_warmup_compiles_without_side_effects():
    """warmup() must not change serving state or outputs."""
    params = make_params()
    srv = InferenceServer(params, CFG, max_slots=2, max_len=256)
    srv.warmup()
    assert srv.stats()["active_slots"] == 0
    srv.submit(Request(uid=1, prompt=[5, 9], max_new_tokens=6))
    assert srv.run()[1] == oracle(params, [5, 9], 6)


def test_impossible_request_raises_not_livelocks():
    """A request that passes submit's capacity check but can never be
    admitted because registered prefixes hold the pages must raise once
    nothing is in flight — not spin forever."""
    params = make_params()
    prefix = list(range(20, 20 + 256))  # holds 2 pages permanently
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          paged=True, page_size=128, num_pages=4)
    pid = srv.register_prefix(prefix)
    del pid
    srv.submit(Request(uid=1, prompt=[1, 2, 3], max_new_tokens=300))  # 3 pages
    with pytest.raises(RuntimeError, match="can ever be free"):
        srv.run()


def test_unknown_prefix_id_rejected_at_submit():
    params = make_params()
    srv = InferenceServer(params, CFG, max_slots=1, max_len=512,
                          paged=True, page_size=128)
    with pytest.raises(AssertionError, match="unknown prefix_id"):
        srv.submit(Request(uid=1, prompt=[1], max_new_tokens=2,
                           prefix_id=99))


def test_step_timing_and_device_calibration():
    # Observability: phase timers populate after steps, and the on-device
    # calibration yields a positive device_step_ms + tokens/s bound.
    params = make_params()
    server = InferenceServer(params, CFG, max_slots=2, max_len=512)
    server.submit(Request(uid=0, prompt=[5, 9, 3], max_new_tokens=4))
    server.run()
    st = server.stats()
    assert st["steps"] > 0
    assert st["decode_ms_avg"] > 0 and st["wall_tokens_per_s"] > 0
    assert 0.0 <= st["sched_overhead_frac"] <= 1.0
    t = server.calibrate_device_step(iters=8)
    assert t > 0
    st = server.stats()
    assert st["device_step_ms"] > 0
    assert st["device_tokens_per_s_bound"] > 0


def test_device_step_fn_closes_over_no_weight_constants():
    """Regression for the round-3 serve-bench crash: closing the calibrate
    step over params/caches baked 2.38 GB of weights into the traced HLO as
    constants and killed the remote-compile transport (VERDICT r3 item #4).
    params/caches must ride as jit arguments — the trace-time constant
    pool must stay tiny (positions/active masks only)."""
    import numpy as np

    params = make_params()
    server = InferenceServer(params, CFG, max_slots=2, max_len=512)
    server.submit(Request(uid=0, prompt=[5, 9, 3], max_new_tokens=2))
    server.run()
    fn, args = server.device_step_fn()
    closed = jax.make_jaxpr(fn)(*args)
    const_bytes = sum(
        int(np.prod(np.shape(c))) * np.dtype(getattr(c, "dtype", np.float32)).itemsize
        for c in closed.consts)
    assert const_bytes < 1 * 1024 * 1024, (
        f"device-step closure captures {const_bytes/1e6:.1f} MB of constants; "
        "params/caches must be jit arguments")


def test_calibrate_admit_prefix_device_timing():
    """calibrate_admit (device-time shared-prefix admission A/B) runs on
    the paged backend, returns both paths' ms + speedup, and mutates no
    live server state (all cache ops are functional)."""
    params = make_params()
    srv = InferenceServer(params, CFG, max_slots=2, max_len=512,
                          paged=True, page_size=128)
    before = jax.device_get(srv.caches[0].k_pages)
    out = srv.calibrate_admit(prompt_len=384, prefix_len=128, iters=2)
    assert set(out) == {"prefill_ms_replicated", "prefill_ms_shared",
                       "device_speedup"}
    assert out["prefill_ms_replicated"] > 0
    assert out["prefill_ms_shared"] > 0
    import numpy as np

    np.testing.assert_array_equal(before,
                                  jax.device_get(srv.caches[0].k_pages))
