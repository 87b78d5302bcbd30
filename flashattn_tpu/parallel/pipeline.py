"""Pipeline parallelism (GPipe-style) over a mesh axis — SURVEY.md T10.

TPU-native design: no scheduler process, no send/recv library. The pipeline
IS a shard_map program — each device holds one STAGE of layers (params
sharded on the 'pp' axis), microbatch activations rotate stage-to-stage with
``lax.ppermute``, and the classic GPipe schedule (M microbatches through n
stages in M + n - 1 ticks) is a static Python loop the compiler unrolls.
Because ``ppermute`` has a transpose rule, ``jax.grad`` through the pipeline
produces the reverse-schedule backward automatically — no hand-written
1F1B machinery for v1 (bubble fraction (n-1)/(M+n-1), amortized by M).

Devices outside their active window compute garbage that is masked out of
the rotation — the standard cost of an SPMD pipeline (every device runs the
same program every tick).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def pipeline_apply(
    stage_fn: Callable,  # (stage_params, x) -> x, applied by EVERY stage
    stage_params,  # this device's stage parameters (pytree)
    x: jnp.ndarray,  # [M, mb, ...] microbatched input (replicated)
    axis_name: str,
) -> jnp.ndarray:
    """Run x through n pipeline stages; call INSIDE shard_map.

    Args:
      stage_fn: the per-stage computation; stages must share a signature
        (same activation shape in/out).
      stage_params: the local shard of the stage-stacked parameters.
      x: [M, microbatch, ...] — M microbatches; every device passes the
        same x (only stage 0 reads it).

    Returns:
      [M, microbatch, ...] outputs of the LAST stage (valid on every device
      — the result is rotated back to close the ring).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    m = x.shape[0]
    mb_shape = x.shape[1:]
    perm = [(i, (i + 1) % n) for i in range(n)]

    carry = jnp.zeros(mb_shape, x.dtype)  # activation arriving from stage-1
    outs = jnp.zeros_like(x)
    for t in range(m + n - 1):
        # Stage 0 injects microbatch t; everyone else consumes the rotation.
        inject = x[min(t, m - 1)]
        inp = jnp.where(idx == 0, inject, carry)
        out = stage_fn(stage_params, inp)
        # The last stage's output for microbatch (t - n + 1) is ready.
        if t >= n - 1:
            outs = outs.at[t - n + 1].set(out)
        carry = lax.ppermute(out, axis_name, perm)
    # outs rows are only valid on the LAST stage; rotate them home to all
    # devices (one collective; replicated output keeps the caller simple).
    last = n - 1
    valid = jnp.where(idx == last, outs, jnp.zeros_like(outs))
    return lax.psum(valid, axis_name)


def stack_stage_params(per_stage_params: list):
    """[stage0_tree, stage1_tree, ...] -> one tree with a leading stage axis
    (shard it with PartitionSpec('pp', ...) so each device gets its stage)."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_stage_params
    )


def unstack_stage_params(stacked):
    """Inside shard_map: drop the (local, length-1) stage axis."""
    return jax.tree_util.tree_map(lambda x: x[0], stacked)
