from .base import Sketch
from .bloom import BloomSketch, bloom_params, bloom_sizing

__all__ = ["Sketch", "BloomSketch", "bloom_params", "bloom_sizing"]
