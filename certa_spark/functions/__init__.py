from certa_spark.functions.hashing import hash32, hash64, md5_hex
from certa_spark.functions.text import (
    bow_cosine,
    record_text,
    tokenize,
)

__all__ = [
    "hash32",
    "hash64",
    "md5_hex",
    "bow_cosine",
    "record_text",
    "tokenize",
]
