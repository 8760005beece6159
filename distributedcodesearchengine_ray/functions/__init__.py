from .tokenizer import tokenize, tokenize_array, token_count_array
from .codec import (
    varint_encode,
    varint_decode,
    delta_varint_encode,
    delta_varint_decode,
)

__all__ = [
    "tokenize",
    "tokenize_array",
    "token_count_array",
    "varint_encode",
    "varint_decode",
    "delta_varint_encode",
    "delta_varint_decode",
]
