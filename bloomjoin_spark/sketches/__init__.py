from .base import Sketch
from .bloom import BloomSketch, bloom_params, bloom_sizing, format_bloom_params
from .cms import CmsSketch, cms_params
from .fd import FrequentDirectionsSketch
from .hll import HllSketch
from .kll import KllSketch
from .tdigest import TDigestSketch
from .theta import ThetaSketch
from .topk import TopKSketch

__all__ = [
    "BloomSketch",
    "CmsSketch",
    "FrequentDirectionsSketch",
    "HllSketch",
    "KllSketch",
    "Sketch",
    "TDigestSketch",
    "ThetaSketch",
    "TopKSketch",
    "bloom_params",
    "format_bloom_params",
    "bloom_sizing",
    "cms_params",
]
