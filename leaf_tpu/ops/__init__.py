from leaf_tpu.ops.flash_attention import flash_attention
from leaf_tpu.ops.packed_attention import packed_attention

__all__ = ["flash_attention", "packed_attention"]
