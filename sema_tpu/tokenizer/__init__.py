"""Host-side tokenization for the BERT-family encoders."""

from sema_tpu.tokenizer.wordpiece import (
    HashTokenizer,
    WordPieceTokenizer,
    load_tokenizer,
)

__all__ = ["WordPieceTokenizer", "HashTokenizer", "load_tokenizer"]
