"""jax.profiler tracing helper (SURVEY.md §5 tracing subsystem)."""

import jax
import jax.numpy as jnp

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.common import BlockSizes
from flashattn_tpu.utils.profiling import profile_fn


def test_profile_fn_writes_trace(tmp_path):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 256, 64)) for kk in keys)
    bs = BlockSizes(block_q=128, block_kv=128)
    log_dir = profile_fn(
        lambda q, k, v: flash_attention(q, k, v, is_causal=True,
                                        block_sizes=bs),
        q, k, v, log_dir=str(tmp_path / "trace"))
    assert log_dir
