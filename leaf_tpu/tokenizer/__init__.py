from leaf_tpu.tokenizer.bpe import (
    CLIPTokenizer,
    DEFAULT_CONTEXT_LENGTH,
    get_tokenizer,
)

__all__ = ["CLIPTokenizer", "DEFAULT_CONTEXT_LENGTH", "get_tokenizer"]
