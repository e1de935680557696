"""Multimodal column plumbing (task brief: image/audio/video as opaque binary
columns + typed metadata; decode / feature-extract as Pandas UDFs over
mapInPandas).

The container has no image/audio libraries, so the *decode* step is a
clearly-marked deterministic fake (`_fake_decode`) behind the same interface a
real decoder would use — the Spark-side plumbing (schema, Arrow batch shape,
partitioning, UDF signature) is real and tested (tests/test_multimodal.py).
A real deployment swaps `_fake_decode` for PIL/ffmpeg without touching the
Spark plan.

The reference's media handling is S3 asset copy/convert
(MedicalReportSegmenterParser.java:151-231) — media bytes are opaque there
too; only references flow through the extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_DDL = (
    "doc_id string, media_ref string, payload binary, "
    "media_type string, width int, height int"
)

FEATURE_DDL = (
    "doc_id string, media_ref string, n_bytes long, media_type string, "
    "thumb_w int, thumb_h int, feature array<double>"
)

_FEATURE_DIM = 8
_THUMB = 32


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic media table from the documents table: payload =
    utf-8 bytes of the text (an opaque stand-in blob), typed metadata columns.
    Pure Spark SQL — this is the 'ingest' side a real pipeline would read
    from object storage."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "cast(doc_id as string) as doc_id",
        "concat('img/', doc_id, '/0.png') as media_ref",
        "encode(text, 'utf-8') as payload",
        "case when doc_id % 4 = 0 then 'image/png' "
        "when doc_id % 4 = 1 then 'image/jpeg' "
        "when doc_id % 4 = 2 then 'audio/wav' else 'video/mp4' end as media_type",
        "cast(64 + doc_id % 512 as int) as width",
        "cast(64 + (doc_id * 7) % 512 as int) as height",
    )


def _fake_decode(payload: pd.Series) -> np.ndarray:
    """STUB decode: a real implementation would decode pixels/samples here
    (PIL.Image.open / soundfile.read). This deterministic fake derives an
    8-dim feature (per-chunk byte means, np.array_split chunking) so
    downstream plumbing is exercised with stable values. Raises
    NotImplementedError for non-bytes payloads, like a real decoder would
    on corrupt data.

    Fully vectorized across the Arrow batch: one buffer concat + one float64
    cumsum gives every chunk sum as a difference of exact integer prefix
    sums — bit-identical to per-blob float64 chunk means (sums are exact
    integers < 2^53), and oracle-checkable in DuckDB (ORACLE_MEDIA_FEATURES
    mirrors the same chunking arithmetic)."""
    if not payload.map(lambda b: isinstance(b, (bytes, bytearray))).all():
        raise NotImplementedError("real media decode requires image/audio libs")
    n = len(payload)
    lens = payload.map(len).to_numpy().astype(np.int64)
    buf = np.frombuffer(b"".join(payload), dtype=np.uint8)
    # np.array_split sizes: first (len % DIM) chunks get len//DIM + 1
    k = np.arange(_FEATURE_DIM)
    sizes = (lens // _FEATURE_DIM)[:, None] + (
        k[None, :] < (lens % _FEATURE_DIM)[:, None]
    )
    csum = np.cumsum(sizes, axis=1)
    blob_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    ends = blob_starts[:, None] + csum
    starts = ends - sizes
    prefix = np.concatenate(([0.0], np.cumsum(buf, dtype=np.float64)))
    sums = prefix[ends] - prefix[starts]
    feats = np.where(sizes > 0, sums / np.maximum(sizes, 1), 0.0)
    return feats


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched binary in, fixed-dim
    float features + resized-thumbnail metadata out. The batch shape (one
    pdf per Arrow batch, payload column as bytes objects) is what a real
    image decoder consumes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode(pdf["payload"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "media_type": pdf["media_type"],
                    # resize plan: clamp the longer edge to _THUMB, keep ratio
                    "thumb_w": np.minimum(pdf["width"], _THUMB).astype("int32"),
                    "thumb_h": np.minimum(pdf["height"], _THUMB).astype("int32"),
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_DDL)


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-expressible metadata slice (oracle-checkable): byte sizes + type
    distribution of the media table."""
    return (
        media_table(spark, sf_dir)
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max("width").alias("max_w"),
        )
        .orderBy("media_type")
    )


ORACLE_MEDIA_METADATA = """
WITH media AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
    ENCODE(text) AS payload,
    CASE WHEN doc_id % 4 = 0 THEN 'image/png'
         WHEN doc_id % 4 = 1 THEN 'image/jpeg'
         WHEN doc_id % 4 = 2 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type,
    CAST(64 + doc_id % 512 AS INT) AS width
  FROM documents
)
SELECT media_type, COUNT(*) AS n_assets,
  CAST(SUM(OCTET_LENGTH(payload)) AS BIGINT) AS total_bytes,
  MAX(width) AS max_w
FROM media GROUP BY media_type ORDER BY media_type
"""

# ---------------------------------------------------------------------------
# video frame sampling: 1 asset row → N frame rows (task brief: frame-sample
# as a Pandas UDF over mapInPandas). The decode is stubbed like _fake_decode
# (no ffmpeg in the container) but the FAN-OUT PLUMBING — duration probe,
# uniform sampling grid, row explosion inside Arrow batches, per-frame
# schema — is real, and the sampling grid itself is value-verified by a
# DuckDB generate_series oracle.
# ---------------------------------------------------------------------------

FRAME_DDL = "doc_id string, media_ref string, frame_idx int, ts_ms bigint"
_FRAME_STEP_MS = 1000
_MAX_FRAMES = 16


def sample_frames(media: DataFrame) -> DataFrame:
    """Uniform frame sampling over video assets (mapInPandas fan-out).

    A real implementation probes the container for duration and decodes one
    frame per grid point; here duration_ms = 10 × payload bytes (the
    deterministic stand-in probe) and the frame payload itself is omitted —
    the grid (frame_idx, ts_ms) and the 1→N Arrow-batch explosion are the
    Spark-side contract under test."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vid = pdf[pdf["media_type"].eq("video/mp4")]
            if not len(vid):
                continue
            dur = vid["payload"].map(len).to_numpy() * 10
            n_frames = np.minimum(
                np.maximum(dur // _FRAME_STEP_MS, 1), _MAX_FRAMES
            ).astype(np.int64)
            idx = np.concatenate([np.arange(n) for n in n_frames])
            rep = np.repeat(np.arange(len(vid)), n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": vid["doc_id"].to_numpy()[rep],
                    "media_ref": vid["media_ref"].to_numpy()[rep],
                    "frame_idx": idx.astype("int32"),
                    "ts_ms": (idx * _FRAME_STEP_MS).astype("int64"),
                }
            )

    return media.mapInPandas(op, schema=FRAME_DDL)


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(media_table(spark, sf_dir)).orderBy(
        "doc_id", "frame_idx"
    )


ORACLE_MEDIA_FRAMES = f"""
WITH vid AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
    CONCAT('img/', doc_id, '/0.png') AS media_ref,
    LEAST(GREATEST((OCTET_LENGTH(ENCODE(text)) * 10) // {_FRAME_STEP_MS}, 1),
          {_MAX_FRAMES}) AS n_frames
  FROM documents WHERE doc_id % 4 = 3
)
SELECT doc_id, media_ref,
  CAST(UNNEST(generate_series(0, CAST(n_frames AS INT) - 1)) AS INT)
    AS frame_idx,
  CAST(UNNEST(generate_series(0, CAST(n_frames AS INT) - 1))
    * {_FRAME_STEP_MS} AS BIGINT) AS ts_ms
FROM vid ORDER BY doc_id, frame_idx
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode path, oracle-verified: every one of the 8 feature values
    is projected as floor(mean × 4096) — ×4096 is a pure exponent shift
    (exact) and the float64 chunk means are bit-identical between the
    vectorized decode and DuckDB's AVG over unnested payload bytes, so the
    quantized ints match exactly."""
    feats = extract_media_features(media_table(spark, sf_dir))
    proj = [
        f"cast(floor(element_at(feature, {i + 1}) * 4096) as bigint)"
        f" as f{i}_q12"
        for i in range(_FEATURE_DIM)
    ]
    return feats.selectExpr(
        "doc_id", "media_ref", "n_bytes", "media_type",
        "thumb_w", "thumb_h", *proj,
    )


_F_COLS = ", ".join(
    f"COALESCE(CAST(FLOOR(AVG(CASE WHEN chunk={k} THEN b END)*4096)"
    f" AS BIGINT), 0) AS f{k}_q12"
    for k in range(_FEATURE_DIM)
)
_F_OUT = ", ".join(
    f"COALESCE(f{k}_q12, 0) AS f{k}_q12" for k in range(_FEATURE_DIM)
)

# byte extraction: hex(payload) → per-byte substring → strpos nibble decode;
# chunk assignment mirrors np.array_split (first n%DIM chunks one byte
# longer). AVG over int bytes is an exact-integer float64 sum → identical
# IEEE division to the decode kernel.
ORACLE_MEDIA_FEATURES = f"""
WITH media AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
    CONCAT('img/', doc_id, '/0.png') AS media_ref,
    hex(ENCODE(text)) AS h,
    OCTET_LENGTH(ENCODE(text)) AS n_bytes,
    CASE WHEN doc_id % 4 = 0 THEN 'image/png'
         WHEN doc_id % 4 = 1 THEN 'image/jpeg'
         WHEN doc_id % 4 = 2 THEN 'audio/wav' ELSE 'video/mp4' END
      AS media_type,
    LEAST(CAST(64 + doc_id % 512 AS INT), {_THUMB}) AS thumb_w,
    LEAST(CAST(64 + (doc_id * 7) % 512 AS INT), {_THUMB}) AS thumb_h
  FROM documents
),
bytes AS (
  SELECT doc_id, i,
    (strpos('0123456789ABCDEF', substr(h, 2*i+1, 1))-1)*16
      + (strpos('0123456789ABCDEF', substr(h, 2*i+2, 1))-1) AS b,
    n_bytes // {_FEATURE_DIM} AS l, n_bytes % {_FEATURE_DIM} AS r
  FROM media, UNNEST(generate_series(0, CAST(n_bytes AS INT)-1)) AS t(i)
),
chunked AS (
  SELECT doc_id,
    CASE WHEN i < r*(l+1) THEN i // (l+1)
         ELSE r + (i - r*(l+1)) // (CASE WHEN l=0 THEN 1 ELSE l END)
    END AS chunk, b
  FROM bytes
),
feats AS (SELECT doc_id, {_F_COLS} FROM chunked GROUP BY doc_id)
SELECT m.doc_id, m.media_ref, CAST(m.n_bytes AS BIGINT) AS n_bytes,
  m.media_type, m.thumb_w, m.thumb_h, {_F_OUT}
FROM media m LEFT JOIN feats USING (doc_id)
"""


OPS = {
    "media_metadata": q_media_metadata,
    "media_decode_features": q_media_features,
    "media_frame_sample": q_media_frames,
}
ORACLES = {
    "media_metadata": ORACLE_MEDIA_METADATA,
    "media_decode_features": ORACLE_MEDIA_FEATURES,
    "media_frame_sample": ORACLE_MEDIA_FRAMES,
}
