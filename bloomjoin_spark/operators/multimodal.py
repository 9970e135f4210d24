"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing is REAL (schemas, Arrow batch shapes, pruned
scans, vectorized feature extraction via ``mapInPandas``); the codec
step is STUBBED: the container has no image/audio libraries, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
PIL/soundfile import, and the tested path uses a deterministic fake
decoder (hash-derived features) with the exact same UDF signature and
batch shape a real decoder would have.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import splitmix64

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, modality string, "
    "n_bytes int, declared_width int, declared_height int"
)


def decode_image(data: bytes) -> "np.ndarray":
    """Real image decode — stub: PIL is not in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed in "
            "this environment; the pipeline is exercised with "
            "fake_decode_features instead"
        ) from e
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)))


def decode_audio(data: bytes) -> "np.ndarray":
    """Real audio decode — stub: soundfile is not in this container."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "audio decoding requires soundfile, which is not installed"
        ) from e
    import io

    import soundfile

    return soundfile.read(io.BytesIO(data))[0]


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of the text
    (an opaque blob as far as the pipeline is concerned), with declared
    metadata derived from the id."""
    t = F.col(text_col)
    payload = F.encode(t, "utf-8")
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
        F.octet_length(payload).cast("int").alias("n_bytes"),
        ((F.col(id_col) % 64) * 16 + 16).cast("int").alias("declared_width"),
        ((F.col(id_col) % 48) * 16 + 16).cast("int").alias("declared_height"),
    )


def fake_decode_features(payload: np.ndarray, n_features: int = 8) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: n_features
    floats derived from the payload bytes (vectorized per batch). Keeps
    the batch shape / dtype contract of a real extractor."""
    h = pd.util.hash_array(payload.astype(object), categorize=False)
    seeds = np.arange(1, n_features + 1, dtype=np.uint64)
    feats = np.empty((h.size, n_features), dtype=np.float64)
    for j in range(n_features):
        feats[:, j] = splitmix64(h ^ seeds[j]).astype(np.float64) / 2.0**64
    return feats


def extract_features(
    media: DataFrame, n_features: int = 8, out_col: str = "features"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Projects to
    (media_id, payload) only so the scan prunes other columns; output is
    (media_id, modality-agnostic feature vector, n_bytes measured)."""

    def fx(it):
        for pdf in it:
            payload = pdf["payload"].to_numpy()
            feats = fake_decode_features(payload, n_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    out_col: list(feats),
                    "n_bytes_measured": [len(b) for b in payload],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        fx, schema=f"media_id bigint, {out_col} array<double>, n_bytes_measured int"
    )


def frame_sample_plan(
    media: DataFrame, every_n: int = 10, max_frames: int = 4
) -> DataFrame:
    """Video frame-sampling PLAN: which frame indices to decode per
    media row (decode itself is stubbed). Pure JVM expression."""
    declared_frames = (F.col("n_bytes") / 32 + 1).cast("int")
    idxs = F.slice(
        F.sequence(F.lit(0), declared_frames - 1, F.lit(every_n)), 1, max_frames
    )
    return media.filter(F.col("modality") == "video").select(
        "media_id", F.col("n_bytes"), idxs.alias("frame_indices")
    )


def fake_decode_image(data: bytes, side: int = 16) -> np.ndarray:
    """Deterministic FAKE decoder (container has no codec libs): maps the
    payload bytes onto a (side, side) uint8 'pixel' grid by tiling. The
    batch contract (bytes in → HxW array out) matches what a real
    PIL-backed decode_image would return."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros((side, side), dtype=np.uint8)
    reps = -(-side * side // arr.size)
    return np.tile(arr, reps)[: side * side].reshape(side, side)


def resize_images(
    media: DataFrame,
    height: int = 8,
    width: int = 8,
    decode=fake_decode_image,
    out_col: str = "pixels",
) -> DataFrame:
    """Image resize over binary payloads — the Spark-side plumbing is
    real (column-pruned scan, Arrow batches, one decode+resize per row
    inside numpy, list output schema); the DECODE step is the injected
    ``decode`` callable (deterministic fake by default; swap in a real
    PIL decode on a cluster with codec libs). Resize = nearest-neighbor
    index sampling, vectorized per image."""

    def fx(it):
        for pdf in it:
            out_rows = []
            for b in pdf["payload"].to_numpy():
                img = decode(bytes(b))
                yi = np.linspace(0, img.shape[0] - 1, height).round().astype(int)
                xi = np.linspace(0, img.shape[1] - 1, width).round().astype(int)
                out_rows.append(img[np.ix_(yi, xi)].ravel().astype(np.int32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": height,
                    "width": width,
                    out_col: out_rows,
                }
            )

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            fx,
            schema=f"media_id bigint, height int, width int, {out_col} array<int>",
        )
    )
