from .api import approx_distinct, approx_quantiles, token_frequencies

__all__ = ["approx_distinct", "approx_quantiles", "token_frequencies"]
