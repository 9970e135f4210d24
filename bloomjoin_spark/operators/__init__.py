from .bloom_join import bloom_join

__all__ = ["bloom_join"]
