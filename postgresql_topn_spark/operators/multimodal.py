"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Metadata decode is REAL: `decode_image_meta` parses PNG/GIF/BMP/JPEG
headers with pure stdlib `struct` (`parse_image_header`). Pixel decode
is REAL for NetPBM (`parse_netpbm`: binary/ASCII PPM+PGM, 8/16-bit —
the uncompressed interchange format needs no codec), as is per-frame
VIDEO extraction for fixed-frame-size NetPBM containers
(`extract_frames`: offset arithmetic + byte slicing + raster decode
at every sampled frame; `sample_frames` remains the offsets-only
stage for codecs decoded elsewhere), and
`decode_image_pixels` takes a `decoder=` callable to plug PIL/libvips
for codec formats (JPEG/PNG) that this container cannot decode;
undecodable rows yield NULL pixels instead of failing the scan.
`resize_pixels` is a real numpy nearest-neighbor resample over decoded
rows. The remaining deterministic stand-ins (`resize_images` /
`byte_histogram_features` over raw bytes; `extract_features` is its
DEPRECATED alias and warns) exist so the Arrow-batched raw-bytes UDF
plumbing stays pytest-covered; the real-pixel path
(`decode_image_pixels` -> `pixel_block_features` /
`pixel_histogram_features`) is what every oracled gate uses.

Scale notes: binary payloads ride in the same parquet row groups as
their metadata; `mapInPandas` processes Arrow batches so the Python
boundary is crossed per-batch, not per-row. For 100 TB of media, keep
`spark.sql.files.maxPartitionBytes` sized so a batch of blobs fits in
executor memory, and select() only the metadata columns when the blob
is not needed (column pruning skips the bytes entirely).

NULL doc_id rows are dropped at the scan before every mapInPandas leg:
they are unjoinable garbage, and a NULL in the Arrow int64 id column
would coerce it to float64, corrupting ids above 2^53 for the whole
batch (the nullable-int64 coercion class; see sketch_state.py).
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


# PNG color type -> sample channels (PNG spec, 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Geometry sanity bounds for the pure-Python PNG decoder: the zlib
# inflate is capped at the IHDR-declared h*(stride+1), and these bound
# the declaration itself so a lying IHDR can't re-open the bomb budget.
# The pixel-byte bound is 256 MiB of raw samples — 8K RGBA exactly —
# and deliberately EXCLUDES the one filter byte per row (r12 ADVICE:
# bounding h*(stride+1) at 2^28 rejected the decoder's own documented
# 8192x8192 RGBA limit by exactly h bytes). Module-level so tests can
# pin the boundary semantics at small scale by patching.
_PNG_MAX_PIXEL_BYTES = 1 << 28
_PNG_MAX_ROWS = 1 << 25
# JPEG SOF markers carry frame dimensions; C4/C8/CC are DHT/JPG/DAC,
# which share the 0xC0-0xCF range but are not frame headers.
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}


def parse_image_header(buf: bytes) -> tuple[str, int, int, int] | None:
    """(format, width, height, channels) from the leading bytes of a
    PNG / GIF / BMP / JPEG payload, pure stdlib — the REAL header parse
    for `decode_image_meta` (no image library needed for metadata; only
    pixel decode requires one). Returns None for anything else.

    This is header arithmetic, not validation: a payload that lies in
    its header parses to the lie, like `identify`/PIL's lazy open."""
    import struct

    n = len(buf)
    if n >= 26 and buf[:8] == b"\x89PNG\r\n\x1a\n" and buf[12:16] == b"IHDR":
        w, h = struct.unpack(">II", buf[16:24])
        color_type = buf[25]
        return ("png", w, h, _PNG_CHANNELS.get(color_type, 3))
    if n >= 10 and buf[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", buf[6:10])
        return ("gif", w, h, 3)
    if n >= 30 and buf[:2] == b"BM":
        hdr_size = struct.unpack("<I", buf[14:18])[0]
        if hdr_size >= 40:  # BITMAPINFOHEADER and successors
            w, h = struct.unpack("<ii", buf[18:26])
            bits = struct.unpack("<H", buf[28:30])[0]
        elif hdr_size == 12 and n >= 24:  # ancient BITMAPCOREHEADER
            w, h = struct.unpack("<hh", buf[18:22])
            bits = struct.unpack("<H", buf[22:24])[0]
        else:
            return None
        return ("bmp", abs(w), abs(h), max(1, min(4, bits // 8)))
    if n >= 4 and buf[:2] == b"\xff\xd8":
        # scan marker segments for a start-of-frame (SOF0..SOF15)
        i = 2
        while i + 4 <= n:
            if buf[i] != 0xFF:
                return None  # desynced; corrupt stream
            marker = buf[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", buf[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", buf[i + 5 : i + 9])
                return ("jpeg", w, h, buf[i + 9] if i + 9 < n else 3)
            i += 2 + seg_len
        return None
    return None


def decode_image_meta(blobs: DataFrame, *, decoder: str = "header") -> DataFrame:
    """Extract image metadata from binary payloads via mapInPandas.

    ``decoder="header"`` (default) runs the real pure-stdlib header
    parse (:func:`parse_image_header`) — unrecognized payloads get
    format ``"unknown"`` and NULL dimensions. ``decoder="fake"`` keeps
    the size-derived deterministic stub so the suite query stays
    replicable by an ANSI-SQL oracle. Pixel decode
    (`decode_image_pixels`) still needs a real image library; the Arrow
    batch shape, schema and partitioning here are shared by both."""
    if decoder not in ("header", "fake"):
        raise ValueError(f"decoder must be 'header' or 'fake', got {decoder!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a SQL-NULL blob must yield a NULL row, never a dead scan
            # (len(None)/bytes(None) raised; review pin)
            sizes = [None if b is None else len(b) for b in pdf["blob"]]
            if decoder == "fake":
                parsed = [
                    (None, None, None, None)
                    if s is None
                    else ("fake", *fake_decode_dims(s))
                    for s in sizes
                ]
            else:
                parsed = [
                    (None, None, None, None)
                    if buf is None
                    else (
                        parse_image_header(bytes(buf))
                        or ("unknown", None, None, None)
                    )
                    for buf in pdf["blob"]
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(sizes, dtype="Int32"),
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "channels": pd.array([p[3] for p in parsed], dtype="Int32"),
                    "format": [p[0] for p in parsed],
                }
            )

    return blobs.select("doc_id", "blob").where(F.col("doc_id").isNotNull()).mapInPandas(decode, schema=IMAGE_META_SCHEMA)


PIXELS_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, pixels array<int>"
)


def parse_netpbm(buf: bytes):
    """(width, height, channels, flat uint8 pixel list) from a NetPBM
    payload — P5/P6 (binary PGM/PPM) and P2/P3 (ASCII) with 8- or
    16-bit maxval (16-bit is big-endian per spec, scaled down to 8
    bits). Pure stdlib: NetPBM is the uncompressed interchange format,
    so REAL pixel decode needs no codec library. Returns None for
    non-NetPBM or truncated payloads."""
    import re as _re

    if len(buf) < 2 or buf[0:1] != b"P" or buf[1:2] not in b"2356":
        return None
    kind = buf[:2].decode()
    channels = 3 if kind in ("P3", "P6") else 1
    # header tokens: whitespace-separated ints, '#' comments to EOL
    pos, vals = 2, []
    while len(vals) < 3 and pos < len(buf):
        m = _re.compile(rb"\s*(#[^\n]*\n|\s)*(\d+)").match(buf, pos)
        if not m:
            return None
        vals.append(int(m.group(2)))
        pos = m.end()
    if len(vals) < 3:
        return None
    w, h, maxval = vals
    if w < 1 or h < 1 or maxval < 1 or maxval > 65535:
        return None
    n = w * h * channels
    # Samples are clamped to the declared maxval before scaling: the
    # spec says a sample never exceeds maxval, so a lying payload
    # (raw byte 255 under maxval=7, or an ASCII token "999") would
    # otherwise scale to a value far outside 0..255 — silently
    # corrupting every featurizer fed from the "pixels" (r12 review;
    # the fuzz suite's well-formedness invariant pins 0..255).
    if kind in ("P5", "P6"):
        pos += 1  # exactly one whitespace byte after maxval
        if maxval > 255:
            raw = buf[pos : pos + 2 * n]
            if len(raw) < 2 * n:
                return None
            import struct as _struct

            vals16 = _struct.unpack(f">{n}H", raw)
            px = [min(v, maxval) * 255 // maxval for v in vals16]
        else:
            raw = buf[pos : pos + n]
            if len(raw) < n:
                return None
            px = (
                list(raw)
                if maxval == 255
                else [min(v, maxval) * 255 // maxval for v in raw]
            )
    else:  # ASCII
        toks = _re.sub(rb"#[^\n]*", b"", buf[pos:]).split()
        if len(toks) < n:
            return None
        # a non-decimal sample token is a corrupt payload -> None,
        # like any truncation ("never raise" — int() on it would throw
        # ValueError out of the decoder and kill the scan task)
        if not all(t.isdigit() for t in toks[:n]):
            return None
        px = [min(int(t), maxval) for t in toks[:n]]
        if maxval != 255:
            px = [v * 255 // maxval for v in px]
    return (w, h, channels, px)


def decode_image_pixels(
    blobs: DataFrame, *, decoder=None, out_col: str = "pixels"
) -> DataFrame:
    """REAL pixel decode via mapInPandas: NetPBM payloads (PPM/PGM,
    binary or ASCII) decode with pure stdlib (`parse_netpbm`);
    codec formats (JPEG/PNG/...) go through `decoder` — any callable
    ``bytes -> (width, height, channels, flat-uint8-list) | None``,
    e.g. a 3-line PIL wrapper — and rows neither path can decode come
    back with NULL pixels (graceful: one corrupt payload must not kill
    a 100 TB scan; filter ``pixels IS NOT NULL`` downstream).

    Output: (doc_id, width, height, channels, pixels) with pixels
    row-major interleaved (H x W x C flattened) — the layout
    `resize_pixels` and any tensor-building stage consume."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "width": [], "height": [],
                   "channels": [], "pixels": []}
            for buf in pdf["blob"]:
                if buf is None:  # SQL-NULL blob -> NULL row, not a crash
                    parsed = None
                else:
                    b = bytes(buf)
                    parsed = parse_netpbm(b)
                    if parsed is None and decoder is not None:
                        parsed = decoder(b)
                if parsed is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["pixels"].append(None)
                else:
                    w, h, c, px = parsed
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(c)
                    out["pixels"].append(px)
            # keyed by out_col, matching the renamed schema (a
            # hardcoded 'pixels' key crashed every non-default out_col
            # with RESULT_COLUMN_NAMES_MISMATCH; review pin)
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "channels": pd.array(out["channels"], dtype="Int32"),
                    out_col: out["pixels"],
                }
            )

    return blobs.select("doc_id", "blob").where(F.col("doc_id").isNotNull()).mapInPandas(
        decode, schema=PIXELS_SCHEMA.replace("pixels", out_col)
    )


def resize_pixels(
    imgs: DataFrame,
    out_w: int,
    out_h: int,
    *,
    pixels_col: str = "pixels",
) -> DataFrame:
    """Nearest-neighbor resize over DECODED pixel rows (the output of
    `decode_image_pixels`): source index = floor((i + 0.5) * src/dst)
    per axis — the standard NN sampling grid, numpy-vectorized per
    Arrow batch. NULL-pixel rows pass through as NULL."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"target size must be positive, got {out_w}x{out_h}")
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = []
            for w, h, c, px in zip(
                pdf["width"], pdf["height"], pdf["channels"], pdf[pixels_col]
            ):
                # same contract as decode: an inconsistent row (user
                # decoder returning len(px) != w*h*c, NULL dims with
                # pixels, ...) becomes a NULL row, never a dead scan
                try:
                    if px is None or pd.isna(w) or pd.isna(h) or pd.isna(c):
                        raise ValueError("incomplete row")
                    w, h, c = int(w), int(h), int(c)
                    a = np.asarray(list(px), dtype=np.uint8).reshape(h, w, c)
                    ys = ((np.arange(out_h) + 0.5) * h / out_h).astype(int)
                    xs = ((np.arange(out_w) + 0.5) * w / out_w).astype(int)
                    res.append(a[ys][:, xs].reshape(-1).tolist())
                except (ValueError, TypeError, IndexError):
                    # IndexError: a zero-height/width image is
                    # self-consistent (0 == w*h*c) but unsampleable
                    res.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array([out_w if r is not None else None for r in res], dtype="Int32"),
                    "height": pd.array([out_h if r is not None else None for r in res], dtype="Int32"),
                    # failed rows null EVERY image field incl. channels
                    # — a survivor of the input would make 'channels IS
                    # NOT NULL' misclassify dead rows (review pin)
                    "channels": pd.array(
                        [
                            c if r is not None else None
                            for c, r in zip(pdf["channels"], res)
                        ],
                        dtype="Int32",
                    ),
                    pixels_col: res,
                }
            )

    return imgs.select(
        "doc_id", "width", "height", "channels", pixels_col
    ).where(F.col("doc_id").isNotNull()).mapInPandas(resize, schema=PIXELS_SCHEMA.replace("pixels", pixels_col))


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
                None
                if buf is None  # NULL blob -> NULL row, not a crash
                else bytes((buf * (out_len // max(len(buf), 1) + 1))[:out_len])
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

    return blobs.select("doc_id", "blob").where(F.col("doc_id").isNotNull()).mapInPandas(
        resize, schema="doc_id bigint, width int, height int, pixels binary"
    )


def byte_histogram_features(blobs: DataFrame, *, dim: int = 64) -> DataFrame:
    """Feature-extraction PLUMBING over RAW (possibly undecodable)
    blobs: (doc_id, embedding array<float>) via mapInPandas. The
    featurizer is a deterministic stand-in (byte histogram folded to
    `dim` buckets, L2-normalized) — it reads UNDECODED bytes and
    carries no pixel-domain signal, so it is a batch-shape/schema
    fixture, NOT an embedding. It exists so the Arrow-batched
    raw-bytes UDF contract stays pytest-covered; swap in a real
    vision/audio encoder with the same signature. For payloads the
    codecs here CAN decode, use the real pixel-domain featurizers:
    `decode_image_pixels` -> `pixel_block_features` (spatial
    block-mean embedding, the semantic-dedup path) or
    `pixel_histogram_features` (intensity histogram). Output composes
    directly with operators/similarity.py (cosine_topk / lsh_topk /
    ivf_topk / embedding_near_dup_pairs)."""
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf["blob"]:
                if buf is None:  # NULL blob -> NULL row, not a crash
                    out.append(None)
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                norm = float(np.sqrt((hist * hist).sum())) or 1.0
                out.append((hist / norm).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": out})

    return blobs.select("doc_id", "blob").where(F.col("doc_id").isNotNull()).mapInPandas(
        featurize, schema="doc_id bigint, embedding array<float>"
    )


def extract_features(blobs: DataFrame, *, dim: int = 64) -> DataFrame:
    """DEPRECATED name for `byte_histogram_features` (VERDICT r7 item
    3): "extract_features" read like the default featurizer while its
    byte-histogram output is signal-free plumbing. The embedding role
    belongs to the real pixel-domain path — `decode_image_pixels` ->
    `pixel_block_features` — which every oracled multimodal gate uses.
    This alias warns and delegates so no consumer silently gets the
    stand-in under the generic name."""
    import warnings

    warnings.warn(
        "extract_features is a signal-free byte-histogram stand-in; "
        "use decode_image_pixels + pixel_block_features for real "
        "embeddings, or call byte_histogram_features explicitly for "
        "the raw-bytes plumbing fixture",
        DeprecationWarning,
        stacklevel=2,
    )
    return byte_histogram_features(blobs, dim=dim)


def sample_frames(
    blobs: DataFrame, *, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling OFFSET plumbing for opaque video payloads: emits
    (doc_id, frame_idx, byte_offset) rows — one per sampled frame —
    via posexplode of a computed offset array, without touching the
    payload bytes (the right stage when the codec lives elsewhere —
    the offsets feed a downstream decoder worker pool). For container
    formats this repo CAN decode, :func:`extract_frames` is the full
    path: the same fan-out plus a REAL per-offset NetPBM frame decode."""
    n_frames = F.least(
        F.floor(F.col("n_bytes") / every_n_bytes).cast("int") + 1, F.lit(max_frames)
    )
    offsets = F.transform(
        F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_n_bytes
    )
    return blobs.select(
        "doc_id", F.posexplode(offsets).alias("frame_idx", "byte_offset")
    )


def synth_video_pgm(doc_id: int) -> bytes:
    """A REAL multi-frame 'video' payload: 2..6 concatenated binary
    PGM (P5) frames, constant frame geometry per document so frame f
    starts at byte offset f * frame_nbytes — the fixed-size-frame
    container layout (YUV4MPEG-style) that makes offset arithmetic a
    pure function of metadata. Pixels are a pure integer function of
    (doc_id, frame_idx, flat index), so a SQL oracle replays every
    decoded pixel while the Spark side exercises genuine header parse
    + byte slicing + raster decode:

    width = 8 + doc_id % 9, height = 8 + (doc_id*5) % 7,
    n_frames = 2 + doc_id % 5, m = 6 + doc_id % 7,
    frame f, pixel i = ((i % m) * 41 + f * 17 + doc_id * 29) % 256."""
    w = 8 + doc_id % 9
    h = 8 + (doc_id * 5) % 7
    n_frames = 2 + doc_id % 5
    m = 6 + doc_id % 7
    header = f"P5\n{w} {h}\n255\n".encode()
    frames = []
    for f in range(n_frames):
        px = bytes(
            ((i % m) * 41 + f * 17 + doc_id * 29) % 256
            for i in range(w * h)
        )
        frames.append(header + px)
    return b"".join(frames)


VIDEO_BLOB_SCHEMA = (
    "doc_id bigint, blob binary, media_type string, n_bytes int, "
    "n_frames int, frame_nbytes int"
)


def make_video_blob_table(documents: DataFrame) -> DataFrame:
    """(doc_id, blob, media_type, n_bytes, n_frames, frame_nbytes) of
    synthesized multi-frame NetPBM payloads (`synth_video_pgm`) — the
    container metadata (frame count + fixed frame size) rides next to
    the bytes, exactly what `extract_frames` needs for offset
    arithmetic."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [synth_video_pgm(int(d)) for d in pdf["doc_id"]]
            nf = [2 + int(d) % 5 for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": blobs,
                    "media_type": "video/x-netpbm-frames",
                    "n_bytes": [len(b) for b in blobs],
                    "n_frames": nf,
                    "frame_nbytes": [
                        len(b) // n for b, n in zip(blobs, nf)
                    ],
                }
            )

    from postgresql_topn_spark.operators.dedup import spread_small_scan

    base = documents.select("doc_id").where(F.col("doc_id").isNotNull())
    # same starved-scan spread as make_png_blob_table
    return spread_small_scan(documents, base).mapInPandas(
        synth, VIDEO_BLOB_SCHEMA
    )


FRAME_PIXELS_SCHEMA = (
    "doc_id bigint, frame_idx int, byte_offset int, n_bytes int, "
    "width int, height int, channels int, pixels array<int>"
)


def extract_frames(
    blobs: DataFrame, *, every_n_frames: int = 1, max_frames: int = 8
) -> DataFrame:
    """REAL frame extraction (the round-9 replacement of the last
    decode stand-in): for fixed-frame-size payloads carrying
    (blob, n_frames, frame_nbytes), sample every `every_n_frames`-th
    frame up to `max_frames`, slice the payload at each computed byte
    offset and DECODE the frame there with the real NetPBM raster
    parser (`parse_netpbm` — the same codec the image path uses).
    Emits one (doc_id, frame_idx, byte_offset, n_bytes, width,
    height, channels, pixels) row per sampled frame (`n_bytes` = the
    CONTAINER's total payload size, carried so downstream stages need
    no doc-keyed join to see it); a slice that does not
    parse (corrupt tail, lying metadata) yields NULL dims/pixels, not
    a dead scan.

    Fan-out happens INSIDE the Arrow batch (one mapInPandas pass per
    payload, emitting k rows) rather than via posexplode-then-decode,
    so the blob bytes are never duplicated per frame row upstream of
    the decoder. NULL doc_id rows are dropped at the scan (the
    nullable-int64 Arrow coercion guard, see module docstring)."""
    if every_n_frames < 1 or max_frames < 1:
        raise ValueError(
            f"every_n_frames/max_frames must be >= 1, got "
            f"{every_n_frames}/{max_frames}"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_idx", "byte_offset", "n_bytes",
                "width", "height", "channels", "pixels",
            )}
            for did, buf, nf, fb in zip(
                pdf["doc_id"], pdf["blob"], pdf["n_frames"],
                pdf["frame_nbytes"],
            ):
                if buf is None or pd.isna(nf) or pd.isna(fb):
                    continue  # nothing addressable to sample
                b = bytes(buf)
                idxs = list(range(0, int(nf), every_n_frames))[:max_frames]
                for f in idxs:
                    off = f * int(fb)
                    parsed = parse_netpbm(b[off : off + int(fb)])
                    out["doc_id"].append(did)
                    out["frame_idx"].append(f)
                    out["byte_offset"].append(off)
                    out["n_bytes"].append(len(b))
                    if parsed is None:
                        for k in ("width", "height", "channels", "pixels"):
                            out[k].append(None)
                    else:
                        w, h, c, px = parsed
                        out["width"].append(w)
                        out["height"].append(h)
                        out["channels"].append(c)
                        out["pixels"].append(px)
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "frame_idx": pd.array(out["frame_idx"], dtype="Int32"),
                    "byte_offset": pd.array(
                        out["byte_offset"], dtype="Int32"
                    ),
                    "n_bytes": pd.array(out["n_bytes"], dtype="Int32"),
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "channels": pd.array(out["channels"], dtype="Int32"),
                    # object dtype even when the batch is empty/all-NULL:
                    # a numpy float64 column cannot convert to the Arrow
                    # list<int32> schema
                    "pixels": pd.Series(out["pixels"], dtype="object"),
                }
            )

    return (
        blobs.select("doc_id", "blob", "n_frames", "frame_nbytes")
        .where(F.col("doc_id").isNotNull())
        .mapInPandas(decode, schema=FRAME_PIXELS_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Audio: real RIFF/WAV parsing + PCM windowed energy features
# ---------------------------------------------------------------------------

WAV_META_SCHEMA = (
    "doc_id bigint, n_bytes int, channels int, sample_rate int, "
    "bits int, n_samples int"
)
AUDIO_ENERGY_SCHEMA = (
    "doc_id bigint, window_idx int, win_samples int, sum_sq bigint, peak int"
)


def synth_png(doc_id: int) -> bytes:
    """A REAL PNG payload (8-bit gray or RGB, zlib-compressed, correct
    CRCs) whose pixels are a pure integer function of doc_id — the
    image twin of synth_wav_pcm16: a SQL oracle can replay every
    derived pixel statistic while the Spark side exercises genuine PNG
    encode -> chunk walk -> inflate -> unfilter. Deterministic: fixed
    zlib level, filter 0 on every scanline.

    width = 8 + doc_id % 17, height = 8 + (doc_id*3) % 13,
    channels = 1 (odd doc_id, color type 0) or 3 (even, color type 2),
    flat pixel i = ((i % (8 + doc_id % 9)) * 37 + doc_id * 31) % 256 —
    each doc's pixels cycle over 8..16 DISTINCT values whose positions
    depend on doc_id, so intensity HISTOGRAMS differ per document
    (a flat i-linear formula makes every histogram uniform and
    degenerates any downstream similarity)."""
    import struct
    import zlib

    w = 8 + doc_id % 17
    h = 8 + (doc_id * 3) % 13
    channels = 1 if doc_id % 2 == 1 else 3
    stride = w * channels
    m = 8 + doc_id % 9
    flat = bytes(
        ((i % m) * 37 + doc_id * 31) % 256 for i in range(h * stride)
    )
    raw = b"".join(
        b"\x00" + flat[r * stride : (r + 1) * stride] for r in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if channels == 1 else 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def make_png_blob_table(documents: DataFrame) -> DataFrame:
    """(doc_id, blob, media_type, n_bytes) of synthesized REAL PNGs —
    parse_image_header reads their headers, decode_png_pixels inflates
    and unfilters their pixels."""
    from collections.abc import Iterator as _It

    def synth(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            blobs = [synth_png(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": blobs,
                    "media_type": "image/png",
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    from postgresql_topn_spark.operators.dedup import spread_small_scan

    base = documents.select("doc_id").where(F.col("doc_id").isNotNull())
    # synth + the downstream decode/featurize stages fuse onto this
    # frame's partitioning — spread a starved single-file scan first
    # (no-op when the scan already splits; guide §2.5 input skew)
    return spread_small_scan(documents, base).mapInPandas(synth, BLOB_SCHEMA)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_pixels(buf: bytes):
    """REAL pure-stdlib PNG pixel decode — the plug for
    `decode_image_pixels(decoder=...)` that removes the "codec formats
    need an external library" caveat for PNG: chunk walk, IDAT
    inflate (zlib), scanline unfilter (all five PNG filter types:
    None/Sub/Up/Average/Paeth), row-major interleaved output.

    Supports 8-bit depth, color types 0/2/4/6 (gray/RGB/gray+alpha/
    RGBA); palette (type 3) and 16-bit depth return None, as does any
    truncated or non-PNG payload — graceful, never raises (one corrupt
    payload must not kill a 100 TB scan)."""
    import struct
    import zlib

    try:
        if buf is None or len(buf) < 8 or buf[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        pos, w, channels, idat = 8, None, None, []
        h = 0
        while pos + 8 <= len(buf):
            ln, tag = struct.unpack(">I4s", buf[pos : pos + 8])
            data = buf[pos + 8 : pos + 8 + ln]
            if len(data) < ln:
                return None  # truncated chunk
            if tag == b"IHDR":
                if ln < 13:
                    return None
                w, h = struct.unpack(">II", data[:8])
                depth, ctype = data[8], data[9]
                interlace = data[12]
                channels = _PNG_CHANNELS.get(ctype)
                if depth != 8 or ctype == 3 or channels is None or interlace:
                    return None
            elif tag == b"IDAT":
                idat.append(data)
            elif tag == b"IEND":
                break
            pos += 12 + ln  # length + tag + data + crc
        if w is None or not idat or w < 1 or h < 1:
            return None
        stride = w * channels
        # Cap the inflate at the h*(stride+1) bytes the unfilter loop
        # will read: IHDR is parsed before any decompression, so the
        # expected size is known, and an uncapped zlib.decompress would
        # let a decompression-bomb payload (a few KB inflating to GBs)
        # allocate executor-killing buffers that the except clause
        # can't undo — the exact "one corrupt payload must not kill a
        # 100 TB scan" hazard this decoder promises against. Valid
        # files inflate to exactly this size, so output is unchanged.
        need = h * (stride + 1)
        # and bound the GEOMETRY itself (see the constants' comment):
        # pixel bytes and row count are bounded separately so the h
        # filter bytes the inflate needs on top never push a valid
        # image at the documented 8K-RGBA limit over the cap.
        if h * stride > _PNG_MAX_PIXEL_BYTES or h > _PNG_MAX_ROWS:
            return None
        raw = zlib.decompressobj().decompress(b"".join(idat), need)
        if len(raw) < need:
            return None
        px: list[int] = []
        prev = bytes(stride)
        pos = 0
        for _ in range(h):
            f = raw[pos]
            line = bytearray(raw[pos + 1 : pos + 1 + stride])
            pos += 1 + stride
            bpp = channels  # bytes per pixel at 8-bit depth
            if f == 1:  # Sub
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif f == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif f == 3:  # Average
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    c = prev[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
            elif f != 0:
                return None
            px.extend(line)
            prev = bytes(line)
        return (w, h, channels, px)
    except Exception:
        return None


def pixel_histogram_features(
    imgs: DataFrame,
    *,
    bins: int = 16,
    pixels_col: str = "pixels",
    out_col: str = "embedding",
) -> DataFrame:
    """REAL image featurizer over DECODED pixel rows (the output of
    `decode_image_pixels`): a `bins`-bin intensity histogram as integer
    COUNTS in a dense double array — the classic color-histogram
    image descriptor. Counts, not fractions, on purpose: cosine is
    scale-invariant (cos of count vectors == cos of normalized
    histograms) and integer counts are exact in float64, so every
    downstream similarity stays bit-identical across engines.

    Pure Catalyst: explode -> (doc, bucket) hash count (map-side
    combined) -> map_from_entries -> dense bucket array. NULL-pixel
    rows (undecodable payloads) are skipped. `bins` must divide 256.

    Returns (doc_id, `out_col` array<double>) ready for
    `similarity.cosine_topk`."""
    if bins < 1 or 256 % bins != 0:
        raise ValueError(f"bins must divide 256, got {bins}")
    width = 256 // bins
    ex = imgs.where(F.col(pixels_col).isNotNull()).select(
        "doc_id", F.explode(pixels_col).alias("__px")
    )
    cnt = ex.groupBy(
        "doc_id",
        F.floor(F.col("__px") / F.lit(width)).cast("int").alias("__b"),
    ).agg(F.count(F.lit(1)).alias("__c"))
    m = cnt.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("__b", "__c"))
        ).alias("__m")
    )
    return m.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(bins - 1)),
            lambda b: F.coalesce(
                F.element_at(F.col("__m"), b), F.lit(0)
            ).cast("double"),
        ).alias(out_col),
    )


def pixel_block_features(
    imgs: DataFrame,
    *,
    grid: int = 4,
    pixels_col: str = "pixels",
    out_col: str = "embedding",
) -> DataFrame:
    """SPATIAL image descriptor over DECODED pixel rows (the output of
    `decode_image_pixels`): the grid x grid block-mean embedding — the
    image plane is partitioned into grid*grid cells by the indicator
    gy = (y*g)//h / gx = (x*g)//w (every pixel belongs to exactly one
    cell; the equivalent gather bounds are y in [ceil(gy*h/g),
    ceil((gy+1)*h/g)) — ceil, not floor, or the two forms disagree
    whenever g does not divide h), and feature b = gy*grid+gx is the
    MEAN intensity of cell (gy, gx), all channels pooled. The classic "tiny image" descriptor: unlike an
    intensity histogram it carries WHERE the light is, so images with
    equal palettes but different layouts separate (this is the real
    replacement for the byte-histogram `extract_features` stand-in —
    that one reads undecoded bytes and carries no pixel signal;
    VERDICT r6 item 4).

    Determinism: block sums are exact integer folds and the mean is a
    single IEEE double division (sum/cnt) — bit-identical across
    engines, so a DuckDB oracle can replay the embedding AND every
    cosine computed from it (cosine over block-mean vectors folds
    dimension-sequentially downstream, the repo's discipline).

    Scale shape (r13): one Arrow-batched numpy stage, ZERO exchanges —
    fused right after the decode stage that produced the pixel rows.
    Until r12 this was a scan-stage Catalyst gather (nested
    transform/aggregate higher-order functions); HOF lambdas are
    evaluated INTERPRETED per element, and the measured cost was ~4.3 s
    for 5k small images at sf0.1 where the numpy kernel (one
    `np.bincount` per image over a cached per-shape cell-index array)
    does the identical arithmetic in ~0.3 s — the optimization guide's
    "hand whole batches to vectorized native code" rule. Values are
    bit-identical: block sums accumulate exact integers (every partial
    sum < 2^53, so float64 accumulation is exact regardless of order)
    and the mean stays ONE IEEE double division (sum/cnt), so the
    DuckDB oracle replay and the committed numpy-differential test are
    unchanged. Cells that contain no pixel (image smaller than the
    grid) contribute feature 0. NULL-pixel rows (undecodable payloads)
    are skipped, like the other featurizers; degenerate rows (NULL
    dims, NULL pixel elements) take a pure-Python fallback that
    mirrors the old expression form's null semantics.

    Returns (doc_id, `out_col` array<double>), length grid*grid, ready
    for `similarity.cosine_topk` / `semdedup.semantic_dedup`."""
    if grid < 1:
        raise ValueError(f"grid must be >= 1, got {grid}")
    g = int(grid)
    import numpy as np

    src = imgs.where(F.col(pixels_col).isNotNull()).select(
        "doc_id", "width", "height", "channels", pixels_col
    )
    id_t = src.schema["doc_id"].dataType.simpleString()
    out_schema = f"doc_id {id_t}, {out_col} array<double>"

    def _block_means_py(w, h, c, px):
        """Faithful slow path for degenerate rows: replicates the old
        expression form — NULL/non-positive dims make every cell empty
        (0.0), a NULL pixel element nulls its cell's mean, an index
        past the end of `px` fails the row (the ANSI element_at
        contract)."""
        out = []
        dims_ok = (
            w is not None
            and h is not None
            and c is not None
            and w > 0
            and h > 0
            and c > 0
        )
        for b in range(g * g):
            gy, gx = b // g, b % g
            if not dims_ok:
                out.append(0.0)
                continue
            ys = [y for y in range(h) if (y * g) // h == gy]
            xs = [x for x in range(w) if (x * g) // w == gx]
            n = len(ys) * len(xs) * c
            if n == 0:
                out.append(0.0)
                continue
            s, isnull = 0, False
            for y in ys:
                for x in xs:
                    for ch in range(c):
                        v = px[(y * w + x) * c + ch]
                        if v is None:
                            isnull = True
                            break
                        s += int(v)
            out.append(None if isnull else float(s) / n)
        return out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cell_cache: dict = {}  # (w, h, c) -> per-pixel cell index array
        n_cells = g * g
        for pdf in batches:
            embs = []
            for w, h, c, px in zip(
                pdf["width"], pdf["height"], pdf["channels"], pdf[pixels_col]
            ):
                try:
                    if pd.isna(w) or pd.isna(h) or pd.isna(c):
                        raise TypeError("null dims")
                    wi, hi, ci = int(w), int(h), int(c)
                    if wi <= 0 or hi <= 0 or ci <= 0:
                        raise TypeError("degenerate dims")
                    key = (wi, hi, ci)
                    cells = cell_cache.get(key)
                    if cells is None:
                        y = np.repeat(np.arange(hi), wi)
                        x = np.tile(np.arange(wi), hi)
                        cells = np.repeat(
                            ((y * g) // hi) * g + (x * g) // wi, ci
                        )
                        cell_cache[key] = cells
                    pix = np.asarray(px, dtype=np.float64)
                    if len(pix) < len(cells):
                        # old form's ANSI element_at: reading past the
                        # pixel array fails the row, loudly
                        raise IndexError(
                            f"pixels holds {len(pix)} values, "
                            f"{wi}x{hi}x{ci} needs {len(cells)}"
                        )
                    pix = pix[: len(cells)]
                    sums = np.bincount(
                        cells, weights=pix, minlength=n_cells
                    )
                    cnts = np.bincount(cells, minlength=n_cells)
                    emb = np.divide(
                        sums,
                        cnts,
                        out=np.zeros(n_cells),
                        where=cnts > 0,
                    )
                    embs.append(emb.tolist())
                except (TypeError, ValueError):
                    # NULL dims / NULL pixel elements: the expression
                    # form's null semantics, off the fast path
                    embs.append(
                        _block_means_py(
                            None if pd.isna(w) else int(w),
                            None if pd.isna(h) else int(h),
                            None if pd.isna(c) else int(c),
                            px,
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], out_col: embs})

    return src.mapInPandas(kernel, schema=out_schema)


def synth_wav_pcm16(doc_id: int) -> bytes:
    """A REAL RIFF/WAVE payload (PCM16 mono, 8 kHz) whose samples are a
    pure integer function of doc_id — so a SQL oracle can replay every
    derived metric while the Spark side exercises genuine WAV encode /
    parse / decode: sample i = ((doc_id*31 + i*17) % 2048) - 1024,
    n = 512 + (doc_id % 7) * 256."""
    import struct

    n = 512 + (doc_id % 7) * 256
    samples = [((doc_id * 31 + i * 17) % 2048) - 1024 for i in range(n)]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def make_audio_blob_table(documents: DataFrame) -> DataFrame:
    """(doc_id, blob, media_type, n_bytes) of synthesized WAV payloads —
    the audio twin of make_blob_table, except the payloads are REAL
    WAV files (parse_wav_meta round-trips them)."""
    from collections.abc import Iterator as _It

    def synth(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            blobs = [synth_wav_pcm16(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": blobs,
                    "media_type": "audio/wav",
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    from postgresql_topn_spark.operators.dedup import spread_small_scan

    base = documents.select("doc_id").where(F.col("doc_id").isNotNull())
    # synth + the downstream decode/featurize stages fuse onto this
    # frame's partitioning — spread a starved single-file scan first
    # (no-op when the scan already splits; guide §2.5 input skew)
    return spread_small_scan(documents, base).mapInPandas(synth, BLOB_SCHEMA)


def _wav_chunks(buf: bytes):
    """ONE RIFF chunk-list walk shared by metadata and PCM decode:
    (fmt_tuple, data_offset, data_len) or None. fmt may be preceded by
    LIST/JUNK chunks in real files; chunks are word-aligned. data_len
    is the DECLARED chunk length — a lying/truncated header can exceed
    the buffer; consumers must clamp to the bytes that exist."""
    import struct

    if buf is None or len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_span = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data" and data_span is None:
            data_span = (pos + 8, clen)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is not None and data_span is not None:
            break
    if fmt is None or data_span is None:
        return None
    return fmt, data_span[0], data_span[1]


def parse_wav_meta(buf: bytes):
    """(channels, sample_rate, bits, n_samples) from a RIFF/WAVE
    payload, pure stdlib — the audio analogue of parse_image_header.
    Returns None for non-WAV payloads. Header arithmetic, not
    validation — a lying header parses to the lie."""
    parsed = _wav_chunks(buf)
    if parsed is None:
        return None
    fmt, _, data_len = parsed
    _, channels, rate, _, block_align, bits = fmt
    if block_align == 0:
        return None
    return channels, rate, bits, data_len // block_align


def decode_wav_meta(blobs: DataFrame) -> DataFrame:
    """Real WAV header metadata over a binary column (mapInPandas,
    Arrow-batched). Unparseable payloads yield NULL fields — a corrupt
    blob cannot kill a 100 TB scan."""
    from collections.abc import Iterator as _It

    def decode(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, n_bytes in zip(
                pdf["doc_id"], pdf["blob"], pdf["n_bytes"]
            ):
                meta = parse_wav_meta(bytes(blob) if blob is not None else None)
                ch, rate, bits, n = meta if meta else (None,) * 4
                rows.append((doc_id, n_bytes, ch, rate, bits, n))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "channels",
                    "sample_rate",
                    "bits",
                    "n_samples",
                ],
            )

    return blobs.select("doc_id", "blob", "n_bytes").where(F.col("doc_id").isNotNull()).mapInPandas(
        decode, WAV_META_SCHEMA
    )


def audio_energy_windows(blobs: DataFrame, *, window: int = 256) -> DataFrame:
    """Windowed energy features over PCM16 WAV payloads: per `window`
    samples, the EXACT integer sum of squares and the absolute peak —
    the loudness/silence profile a speech-data pipeline filters on
    (silence trimming, clipping detection) before any lossy feature
    stage. Integer outputs keep the metric engine-portable (no float
    summation order). One mapInPandas pass (parse + numpy int64
    square-sum per window); undecodable or non-PCM16 payloads emit no
    rows. At 100 TB: the blob column streams through the scan stage
    once, windows/blob bounded by payload size."""
    import numpy as np
    from collections.abc import Iterator as _It

    def feats(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                if blob is None:
                    continue
                buf = bytes(blob)
                parsed = _wav_chunks(buf)
                if parsed is None:
                    continue
                (_, channels, _, _, _, bits), off, clen = parsed
                if bits != 16 or channels != 1:
                    continue
                # clamp to bytes that EXIST and to whole int16 samples:
                # a lying/truncated data length (odd, or past the buffer
                # end) must skip gracefully, never raise in frombuffer —
                # a corrupt blob cannot kill a 100 TB scan
                data = buf[off : off + clen]
                data = data[: (len(data) // 2) * 2]
                if not data:
                    continue
                s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                for w in range(0, len(s), window):
                    chunk = s[w : w + window]
                    out.append(
                        (
                            doc_id,
                            w // window,
                            len(chunk),
                            int((chunk * chunk).sum()),
                            int(np.abs(chunk).max()),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "window_idx",
                    "win_samples",
                    "sum_sq",
                    "peak",
                ],
            )

    return blobs.select("doc_id", "blob").where(F.col("doc_id").isNotNull()).mapInPandas(
        feats, AUDIO_ENERGY_SCHEMA
    )
