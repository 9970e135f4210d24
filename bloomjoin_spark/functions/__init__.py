from .api import (
    approx_distinct,
    approx_topk,
    token_profile,
    approx_quantiles,
    hash_keys32,
    hash_keys64,
    hash_keys_pandas,
    token_frequencies,
)

__all__ = [
    "approx_distinct",
    "approx_topk",
    "token_profile",
    "approx_quantiles",
    "hash_keys32",
    "hash_keys64",
    "hash_keys_pandas",
    "token_frequencies",
]
