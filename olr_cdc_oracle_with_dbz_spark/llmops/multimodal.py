"""Multimodal column handling (SURVEY §2B L7 / M-ops).

Images/audio/video are opaque ``binary`` columns + a typed metadata struct
— the lakehouse-native layout for multimodal training data: parquet stores
the bytes inline (small assets) or a URI (large assets), and the engine
moves them through Arrow batches without interpreting them.

Decode is REAL for the formats a pure-numpy parser can cover —
uncompressed 24-bit BMP and binary P6 PPM (``decode_image``), with a PPM
re-encoder for the resize path — and remains an honest
NotImplementedError seam for compressed image/audio/video formats (no
PIL/ffmpeg/soundfile in this container). ``decode_fake`` is the
deterministic stand-in plumbing tests use for arbitrary payloads. The
Spark-side plumbing — schema, partitioning, mapInPandas batch shape — is
real and exact-checked where SQL can reach it (byte lengths, metadata
projection).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog, key_bounds
from olr_cdc_oracle_with_dbz_spark.registry import register
from olr_cdc_oracle_with_dbz_spark.plans.canonical import ordered, presort_ranges, presort_static, ordered_static

#: metadata struct carried beside every binary asset column
ASSET_META_SCHEMA = "mime string, n_bytes long, width int, height int"


def attach_binary_asset(docs: DataFrame) -> DataFrame:
    """Build a binary asset column + metadata struct from document text.

    Stand-in for real assets: the utf-8 bytes of the text ARE the payload,
    so sizes/hashes are verifiable end-to-end. Real pipelines swap the
    payload source; every downstream operator is payload-agnostic.
    """
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("asset"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
        ).alias("meta"),
    )


@register(
    "m1_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           md5(text) AS payload_md5
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def m1_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset round-trip: byte length, first byte, payload hash."""
    assets = attach_binary_asset(Catalog(spark, sf_dir).documents)
    return assets.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.ascii(F.decode(F.expr("substring(asset, 1, 1)"), "utf-8")).alias("first_byte"),
        F.md5(F.col("asset")).alias("payload_md5"),
    ).transform(ordered_static, key_bounds(sf_dir, "documents"), "doc_id")


# ---------------------------------------------------------------------------
# decode / feature-extract kernels (Pandas-UDF seam)
# ---------------------------------------------------------------------------

_FEATURE_DIM = 8


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of an uncompressed 24-bit BI_RGB BMP → (H,W,3) RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BI_RGB BMP is wired (got bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    h = abs(height)
    stride = (width * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of a binary P6 PPM (maxval ≤ 255) → (H,W,3) RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — tokens separated by whitespace,
    # with '#' comments running to end-of-line; one whitespace byte then raw
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not wired")
    raw = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=pos)
    return raw.reshape(height, width, 3).copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H,W,3) uint8 → binary P6 PPM bytes (the re-encode half of resize)."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


def decode_image(payload: bytes, mime: str) -> np.ndarray:
    """Decode a supported image payload → (H,W,3) uint8 RGB array.

    Pure-numpy codecs for the two formats that need no external library:
    uncompressed 24-bit BMP and binary P6 PPM. Compressed formats
    (PNG/JPEG) and audio/video stay behind the NotImplementedError seam
    until a codec library (PIL/ffmpeg) is available in the environment.
    """
    if mime in ("image/bmp", "image/x-ms-bmp") or payload[:2] == b"BM":
        return _decode_bmp(payload)
    if mime in ("image/x-portable-pixmap", "image/ppm") or payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise NotImplementedError(
        f"codec for {mime!r} not wired in this environment (PIL/ffmpeg/"
        "soundfile unavailable); BMP and P6 PPM decode natively, "
        "decode_fake covers plumbing tests for other formats"
    )


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Decode a real media asset → feature array (same 8-dim contract as
    :func:`decode_fake`, computed over decoded PIXELS not raw bytes)."""
    px = decode_image(payload, mime).reshape(-1).astype(np.float64)
    return np.array(
        [
            float(px.size),
            float(px.sum() % 997),
            float(px.mean().round(6)),
            float(px.min()),
            float(px.max()),
            float(len(np.unique(px))),
            float(int(px[0])),
            float(int(px[-1])),
        ]
    )


def decode_fake(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in decoder: fixed-width byte-statistics features."""
    arr = np.frombuffer(payload[:256], dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        arr = np.zeros(1)
    return np.array(
        [
            float(len(payload)),
            float(arr.sum() % 997),
            float(arr.mean().round(6)),
            float(arr.min()),
            float(arr.max()),
            float(len(np.unique(arr))),
            float(int(arr[0])),
            float(int(arr[-1])),
        ]
    )


def _decode_fake_batch(payloads, mimes) -> list[np.ndarray]:
    """Vectorized twin of :func:`decode_fake` — one padded uint8 matrix per
    Arrow batch instead of a Python loop (bit-identical output; the
    per-item path stays the contract for real codecs, whose decode is
    per-item C-library work by nature)."""
    n = len(payloads)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    heads = np.minimum(lens, 256)
    mat = np.zeros((n, 256), dtype=np.uint8)
    for i, p in enumerate(payloads):  # memcpy per row, no per-byte Python
        mat[i, : heads[i]] = np.frombuffer(p[:256], dtype=np.uint8)
    # mask padding with per-stat neutral values; empty payloads fall back
    # to decode_fake's zeros(1) semantics (all byte stats = 0)
    idx = np.arange(256)[None, :]
    valid = idx < np.maximum(heads, 1)[:, None]
    f = mat.astype(np.float64)
    sums = np.where(valid, f, 0.0).sum(axis=1)
    denom = np.maximum(heads, 1)
    means = np.round(sums / denom, 6)
    mins = np.where(valid, f, np.inf).min(axis=1)
    maxs = np.where(valid, f, -np.inf).max(axis=1)
    mins[heads == 0] = 0.0
    maxs[heads == 0] = 0.0
    firsts = f[:, 0]
    lasts = f[np.arange(n), np.maximum(heads - 1, 0)]
    # distinct byte count via a (n, 257) presence table — pad value 256
    # never collides with a real byte
    coded = np.where(valid, mat, 256)
    uniq = np.zeros((n, 257), dtype=bool)
    uniq[np.arange(n)[:, None], coded] = True
    n_uniq = uniq[:, :256].sum(axis=1)
    n_uniq[heads == 0] = 1  # zeros(1) has exactly one distinct value
    out = np.column_stack(
        [lens.astype(np.float64), sums % 997, means, mins, maxs,
         n_uniq.astype(np.float64), firsts, lasts]
    )
    return list(out)


def extract_features(
    assets: DataFrame, decoder=decode_fake, batch_note: str = "fake"
) -> DataFrame:
    """mapInPandas feature extraction over (asset, meta) — the real batch
    shape: one Arrow batch in, one fixed-width feature frame out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is decode_fake:
                feats = _decode_fake_batch(list(pdf["asset"]), pdf["mime"])
            else:
                feats = [decoder(p, m) for p, m in zip(pdf["asset"], pdf["mime"])]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "features": [list(map(float, f)) for f in feats],
                }
            )
            yield out

    flat = assets.select("doc_id", "asset", F.col("meta.mime").alias("mime"))
    return flat.mapInPandas(run, "doc_id bigint, features array<double>")


@register(
    "m2_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS DOUBLE) AS f_len,
           TRUE AS dim_ok,
           TRUE AS stats_ok
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def m2_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the decode seam (deterministic fake codec).

    Proves the distributed plumbing: binary column → Arrow batch →
    per-asset decode → fixed-width vector, partition-parallel. Checked
    output: the SQL-reachable feature (payload length) exactly, plus
    internal-consistency bounds on the rest of the vector (q29b pattern —
    fixed width, byte-stat ordering min ≤ mean ≤ max, bounded mod-sum),
    so the driver hash covers the seam without a byte-level SQL decoder.
    """
    assets = attach_binary_asset(Catalog(spark, sf_dir).documents).transform(
        presort_static, key_bounds(sf_dir, "documents"), "doc_id"  # pre-kernel: sampler
        # after the decode kernel would run every decode twice (canonical.py)
    )
    feats = extract_features(assets)
    f = F.col("features")
    return feats.select(
        "doc_id",
        F.round(F.element_at(f, 1), 6).alias("f_len"),
        (F.size(f) == _FEATURE_DIM).alias("dim_ok"),
        (
            (F.element_at(f, 4) <= F.element_at(f, 3))
            & (F.element_at(f, 3) <= F.element_at(f, 5))
            & (F.element_at(f, 2) >= 0)
            & (F.element_at(f, 2) < 997)
        ).alias("stats_ok"),
    ).sortWithinPartitions("doc_id")


def resize_assets(
    assets: DataFrame, width: int, height: int, use_real_codec: bool = False
) -> DataFrame:
    """Resize kernel through the decode seam (mapInPandas, Arrow-batched).

    With ``use_real_codec`` the payload is decoded (BMP/P6 PPM, pure
    numpy), nearest-neighbor-resampled to ``width×height`` pixels, and
    re-encoded as P6 PPM; without it, the fake codec nearest-neighbor
    samples the raw payload bytes to exactly ``width*height`` bytes. Both
    paths exercise the same Spark contract — output sizing, metadata
    rewrite, Arrow batch shape.
    """
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p in pdf["asset"]:
                if use_real_codec:
                    px = decode_image(p, "image/*")
                    yi = np.linspace(0, px.shape[0] - 1, height).astype(np.int64)
                    xi = np.linspace(0, px.shape[1] - 1, width).astype(np.int64)
                    out_payloads.append(encode_ppm(px[yi][:, xi]))
                    continue
                buf = np.frombuffer(p, dtype=np.uint8)
                if buf.size == 0:
                    buf = np.zeros(1, dtype=np.uint8)
                idx = np.linspace(0, buf.size - 1, n_out).astype(np.int64)
                out_payloads.append(buf[idx].tobytes())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "asset": out_payloads}
            )

    flat = assets.select("doc_id", "asset")
    resized = flat.mapInPandas(run, "doc_id bigint, asset binary")
    meta = F.struct(
        F.lit("image/x-portable-pixmap" if use_real_codec else "image/raw").alias(
            "mime"
        ),
        F.length("asset").cast("long").alias("n_bytes"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
    )
    return resized.select("doc_id", "asset", meta.alias("meta"))


def sample_frames(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub: real impl would demux video payloads; the
    plumbing (explode one asset → many frame rows) is exercised with
    synthetic frame indices derived from payload size."""
    n_frames = (F.col("meta.n_bytes") / 100).cast("int") + 1
    return assets.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)
