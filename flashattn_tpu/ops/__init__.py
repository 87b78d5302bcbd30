from flashattn_tpu.ops.reference import reference_attention, reference_attention_with_lse
from flashattn_tpu.ops.attention import (
    flash_attention,
    flash_attention_forward,
    flash_attention_backward,
)

__all__ = [
    "reference_attention",
    "reference_attention_with_lse",
    "flash_attention",
    "flash_attention_forward",
    "flash_attention_backward",
]
