"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself is STUBBED (this container has no image/audio
libraries): `decode_image_meta` uses a deterministic fake derived from
the byte payload, and `decode_image_pixels` raises NotImplementedError
with the integration point documented. Everything around the stub — the
binary schema, the mapInPandas batch shape, partition sizing, the
metadata struct — is real and tested; swapping the fake for
PIL/libvips/ffmpeg is a one-function change.

Scale notes: binary payloads ride in the same parquet row groups as
their metadata; `mapInPandas` processes Arrow batches so the Python
boundary is crossed per-batch, not per-row. For 100 TB of media, keep
`spark.sql.files.maxPartitionBytes` sized so a batch of blobs fits in
executor memory, and select() only the metadata columns when the blob
is not needed (column pruning skips the bytes entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = "doc_id bigint, blob binary, media_type string, n_bytes int"
IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, channels int, format string"
)


def make_blob_table(documents: DataFrame) -> DataFrame:
    """Fake media table from the documents fixture: the utf-8 bytes of
    the text stand in for an encoded image payload."""
    return documents.select(
        F.col("doc_id"),
        F.encode("text", "utf-8").alias("blob"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )


def fake_decode_dims(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic stand-in for a real header parse: dimensions are a
    pure function of payload size (so an ANSI-SQL oracle can replicate
    them)."""
    width = 16 + n_bytes % 64
    height = 16 + (n_bytes * 7) % 48
    return width, height, 3


def decode_image_meta(blobs: DataFrame) -> DataFrame:
    """Extract image metadata from binary payloads via mapInPandas.

    Real pipelines replace the `fake_decode_dims` call with
    `PIL.Image.open(io.BytesIO(buf))` — the Arrow batch shape, schema
    and partitioning are identical."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["blob"].map(len)
            dims = sizes.map(fake_decode_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": sizes.astype("int32"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "channels": dims.map(lambda d: d[2]).astype("int32"),
                    "format": "fake",
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(decode, schema=IMAGE_META_SCHEMA)


def decode_image_pixels(blobs: DataFrame):  # pragma: no cover - stub
    """Real pixel decode — requires an image library not present in this
    container. Integration point: mapInPandas over (doc_id, blob) with
    PIL/torchvision, yielding array<array<int>> or a flattened tensor
    column."""
    raise NotImplementedError(
        "pixel decode requires an image library (PIL/libvips); "
        "use decode_image_meta for the metadata path, or plug a decoder "
        "into the same mapInPandas shape"
    )


def resize_images(
    blobs: DataFrame, *, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize plumbing: (doc_id, width, height, pixels binary) with the
    output buffer sized exactly width*height*3. The resample itself is
    the stubbed decode step (deterministic bytes derived from the
    payload by tiling); a real pipeline swaps in
    ``PIL.Image.open(...).resize((w, h)).tobytes()`` — batch shape,
    output schema and buffer sizing are identical."""
    out_len = width * height * 3

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                bytes((buf * (out_len // max(len(buf), 1) + 1))[:out_len])
                for buf in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": pixels,
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        resize, schema="doc_id bigint, width int, height int, pixels binary"
    )


def extract_features(blobs: DataFrame, *, dim: int = 64) -> DataFrame:
    """Feature-extraction plumbing: (doc_id, embedding array<float>) via
    mapInPandas. The featurizer is a deterministic stand-in (byte
    histogram folded to `dim` buckets, L2-normalized) — swap in a real
    vision/audio encoder with the same signature. Output composes
    directly with operators/similarity.py (cosine_topk / lsh_topk /
    ivf_topk / embedding_near_dup_pairs)."""
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf["blob"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                norm = float(np.sqrt((hist * hist).sum())) or 1.0
                out.append((hist / norm).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": out})

    return blobs.select("doc_id", "blob").mapInPandas(
        featurize, schema="doc_id bigint, embedding array<float>"
    )


def sample_frames(
    blobs: DataFrame, *, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (doc_id,
    frame_idx, byte_offset) rows — one per sampled frame — via posexplode
    of a computed offset array. The actual frame extraction at each
    offset is the stubbed decode step; offset arithmetic, fan-out shape
    and schema are real."""
    n_frames = F.least(
        F.floor(F.col("n_bytes") / every_n_bytes).cast("int") + 1, F.lit(max_frames)
    )
    offsets = F.transform(
        F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_n_bytes
    )
    return blobs.select(
        "doc_id", F.posexplode(offsets).alias("frame_idx", "byte_offset")
    )
