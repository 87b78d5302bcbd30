"""Benchmark timing + FLOPs model.

Port of the reference harness discipline (``code/Performance_Comparison.py``):
  - steady-state timing with warmup (``:111-128``; device-event timing on GPU
    becomes block_until_ready-bracketed wall clock on TPU — same rationale:
    exclude cold-start compile, measure device time not dispatch,
    ``Phase_5.md:40-69``)
  - FLOPs model from the flash-attn repo: 4·B·H·S_q·S_k·D, halved if causal;
    bwd = 2.5×, fwd+bwd = 3.5× (``:98-107``)
  - bwd measured as fwd_bwd − fwd (``:92-95``)
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def _sync(out) -> None:
    """Force a scalar readback of one output element.

    Device execution is in-order on a single stream, so materializing one
    element of the LAST dispatched call drains the whole queue. We do this
    instead of jax.block_until_ready because on tunneled/relay platforms
    (axon) block_until_ready returns before execution completes.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf[(0,) * leaf.ndim])


def measure(
    fn: Callable, *args, warmup: int = 3, n1: int = 5, n2: int = 20,
    # kept for call-site compat; repeat overrides n2 when larger
    repeat: int | None = None,
) -> float:
    """Steady-state seconds per call via two-point slope timing.

    Times n1 and n2 back-to-back dispatches, each bracket ending in a forced
    scalar readback, and returns (T2 - T1)/(n2 - n1). The slope cancels the
    fixed dispatch + readback overhead (tens of ms through the axon relay),
    which a single timed loop would smear over every iteration. Same
    rationale as the reference's CUDA-event timing — measure device time,
    not host/launch overhead (Phase_5.md:40-69).
    """
    if repeat is not None:
        n2 = max(n2, repeat)
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)

    def bracket(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    # Auto-scale iteration counts so the bracket delta dwarfs relay jitter
    # (~tens of ms): target >= 0.5 s of pure kernel time in the long bracket.
    est = bracket(n1) / n1
    target = 0.5
    scale_n = max(1, int(target / max(est * (n2 - n1), 1e-9)))
    n1, n2 = n1 * scale_n, n2 * scale_n
    # Relay timing is occasionally non-monotone (queue pipelining): take the
    # median of three slopes and retry once if all are degenerate.
    for _ in range(2):
        slopes = sorted(
            (bracket(n2) - bracket(n1)) / (n2 - n1) for _ in range(3)
        )
        if slopes[1] > 0:
            return slopes[1]
    return max(slopes[1], 1e-9)


def measure_looped(
    fn: Callable, *args, iters: int = 200, warmup: int = 1
) -> float:
    """Seconds per call for SMALL kernels (< ~1 ms device time).

    Per-dispatch host cost through the relay runtime is ~300 us, so kernels
    cheaper than that are rate-limited by the host in a dispatch loop. This
    wraps fn in an on-device lax.scan (a data dependency on the previous
    iteration's output defeats loop-invariant hoisting) and times ONE
    dispatch of `iters` chained executions.
    """
    import jax.numpy as jnp

    first, rest = args[0], args[1:]

    @jax.jit
    def run(first, rest):
        # Only the perturbed first arg rides the scan carry; everything else
        # is loop-invariant (a big carry forces per-iteration buffer copies).
        def body(carry, _):
            out = fn(carry, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            # Opaque ~zero derived from the output, folded into the input:
            # defeats loop-invariant hoisting without changing values.
            dep = (leaf.reshape(-1)[0] * 1e-30).astype(jnp.float32)
            return (carry.astype(jnp.float32) + dep).astype(carry.dtype), None
        carry, _ = jax.lax.scan(body, first, None, length=iters)
        return carry

    out = None
    for _ in range(warmup):
        out = run(first, rest)
    _sync(out)
    t0 = time.perf_counter()
    out = run(first, rest)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def measure_auto(
    fn: Callable, *args, warmup: int = 3, repeat: int | None = None,
    floor_s: float = 1.5e-3,
) -> float:
    """measure(), re-measured with measure_looped() below the dispatch floor.

    Slope timing assumes back-to-back dispatches pipeline on the device; when
    the kernel is cheaper than the per-dispatch host cost (~300 us through
    the relay) the loop is HOST-bound and the slope reports dispatch rate,
    not device time — the round-3 short-S pathology (S=512 causal D=64 read
    6.27 TF, non-monotonic vs S=1024). Anything measured under `floor_s` is
    therefore suspect and re-measured with the on-device lax.scan loop,
    whose per-iteration time has no host component. Costs one extra compile
    per affected shape.
    """
    sec = measure(fn, *args, warmup=warmup, repeat=repeat)
    if sec >= floor_s:
        return sec
    iters = min(4000, max(200, int(0.3 / max(sec, 1e-7))))
    return measure_looped(fn, *args, iters=iters)


def attention_flops(
    b: int,
    h: int,
    s_q: int,
    s_k: int,
    d: int,
    mode: str = "fwd",
    is_causal: bool = False,
) -> float:
    """Reference FLOPs convention (Performance_Comparison.py:98-107)."""
    base = 4.0 * b * h * s_q * s_k * d
    if is_causal:
        base /= 2.0
    factor = {"fwd": 1.0, "bwd": 2.5, "fwd_bwd": 3.5}[mode]
    return base * factor


def tflops(flops: float, seconds: float) -> float:
    return flops / seconds / 1e12
