"""Multimodal column handling (SURVEY §2B L7 / M-ops).

Images/audio/video are opaque ``binary`` columns + a typed metadata struct
— the lakehouse-native layout for multimodal training data: parquet stores
the bytes inline (small assets) or a URI (large assets), and the engine
moves them through Arrow batches without interpreting them.

The decode/resize/frame-sample kernels are STUBS behind a clearly marked
seam (no image/audio libs in this container): ``decode_fake`` is the
deterministic stand-in used by tests; ``decode_real`` raises
NotImplementedError until a codec library is wired in. The Spark-side
plumbing — schema, partitioning, mapInPandas batch shape — is real and
exact-checked where SQL can reach it (byte lengths, metadata projection).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog
from olr_cdc_oracle_with_dbz_spark.registry import register
from olr_cdc_oracle_with_dbz_spark.plans.canonical import ordered

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
    ).transform(ordered, "doc_id", partitions=8)


# ---------------------------------------------------------------------------
# decode / feature-extract kernels (Pandas-UDF seam)
# ---------------------------------------------------------------------------

_FEATURE_DIM = 8


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Decode a real media asset → feature array. NOT WIRED IN THIS ENV."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/soundfile) are not available in this "
        "container; use decode_fake for plumbing tests"
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


def extract_features(
    assets: DataFrame, decoder=decode_fake, batch_note: str = "fake"
) -> DataFrame:
    """mapInPandas feature extraction over (asset, meta) — the real batch
    shape: one Arrow batch in, one fixed-width feature frame out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
    assets = attach_binary_asset(Catalog(spark, sf_dir).documents)
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
    ).transform(ordered, "doc_id", partitions=8)


def resize_assets(
    assets: DataFrame, width: int, height: int, use_real_codec: bool = False
) -> DataFrame:
    """Resize kernel through the decode seam (mapInPandas, Arrow-batched).

    Real implementation decodes → resamples → re-encodes (PIL/ffmpeg —
    not in this container, gated behind ``use_real_codec``); the fake
    codec nearest-neighbor-samples the payload bytes to exactly
    ``width*height`` bytes, so output sizing, metadata rewrite, and batch
    shape — the Spark-side contract — are fully exercised.
    """
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p in pdf["asset"]:
                if use_real_codec:
                    decode_real(p, "image/*")  # raises until codecs wired
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
        F.lit("image/raw").alias("mime"),
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
