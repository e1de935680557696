"""Similarity search over the `embeddings` table (vec_id, embedding
float[], label) — ANN operators for the training-data pipeline (task brief).

Two paths:
- brute-force top-k cosine (the correctness baseline): broadcast the query
  vectors, score every row, window top-k. All arithmetic is integer-quantized
  (floor(x*1000 + 0.5)) so the exact dot products — and therefore the
  DuckDB-vs-Spark value hashes — are bit-identical across engines (float
  summation order never matters on integers).
- LSH-bucketed top-k (the scale path): an axis-aligned sign-bit bucket
  (the simplest random-hyperplane LSH family with hyperplanes = coordinate
  axes) prunes candidates to the query's bucket before exact scoring. At
  10^12 rows the bucket join replaces the full scan; here it stays
  oracle-checkable because the bucketing is pure SQL.

Scale notes: queries are broadcast (small side), candidates shuffle only in
the LSH variant's bucket join; top-k is a window over per-query partitions —
k rows per query survive the exchange (partial top-k via AQE/codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_QUERIES = 5
TOP_K = 10

# integer-quantized embedding: floor(x*1000 + 0.5) per element
_QVEC = "transform(embedding, x -> cast(floor(x * 1000 + 0.5) as bigint))"
_DOT = (
    "aggregate(zip_with(qa, qb, (x, y) -> x * y), cast(0 as bigint),"
    " (acc, v) -> acc + v)"
)
_NORM2 = "aggregate(transform({v}, x -> x * x), cast(0 as bigint), (acc, v) -> acc + v)"


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
        "vec_id", f"{_QVEC} as qv"
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id as q_id", "qv as qa"
    )
    cand = emb.selectExpr("vec_id", "qv as qb")
    pairs = cand.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("q_id")
    )
    return pairs.selectExpr(
        "q_id",
        "vec_id",
        f"cast(floor(1000.0 * {_DOT} / sqrt(cast({_NORM2.format(v='qa')} as double)"
        f" * cast({_NORM2.format(v='qb')} as double))) as bigint) as cos_milli",
    )


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_milli"), F.asc("vec_id")
    )
    return (
        _scored(spark, sf_dir)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cos_milli", "rank")
        .orderBy("q_id", "rank")
    )


_D_QVEC = "list_transform(embedding, x -> CAST(FLOOR(x * 1000 + 0.5) AS BIGINT))"
_D_DOT = (
    "list_aggregate(list_transform(generate_series(1, LEN(qa)),"
    " i -> qa[i] * qb[i]), 'sum')"
)
_D_NORM2 = "list_aggregate(list_transform({v}, x -> x * x), 'sum')"

ORACLE_ANN_BRUTEFORCE = f"""
WITH q AS (
  SELECT vec_id AS q_id, {_D_QVEC} AS qa FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id, {_D_QVEC} AS qb FROM embeddings
), scored AS (
  SELECT q_id, vec_id,
    CAST(FLOOR(1000.0 * {_D_DOT} / SQRT(CAST({_D_NORM2.format(v='qa')} AS DOUBLE)
      * CAST({_D_NORM2.format(v='qb')} AS DOUBLE))) AS BIGINT) AS cos_milli
  FROM c, q WHERE vec_id <> q_id
), ranked AS (
  SELECT q_id, vec_id, cos_milli,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, vec_id ASC)
      AS rank
  FROM scored
)
SELECT q_id, vec_id, cos_milli, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K} ORDER BY q_id, rank
"""

# --- LSH-bucketed variant ----------------------------------------------------

_LSH_BITS = 4
_BUCKET = "".join(
    f"(case when element_at(embedding, {i + 1}) >= 0 then {1 << i} else 0 end) + "
    for i in range(_LSH_BITS)
)[:-3]
_D_BUCKET = "".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END) + "
    for i in range(_LSH_BITS)
)[:-3]


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
        "vec_id", f"{_QVEC} as qv", f"cast({_BUCKET} as int) as bucket"
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id as q_id", "qv as qa", "bucket"
    )
    cand = emb.selectExpr("vec_id", "qv as qb", "bucket")
    pairs = cand.join(F.broadcast(queries), "bucket").filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = pairs.selectExpr(
        "q_id",
        "vec_id",
        f"cast(floor(1000.0 * {_DOT} / sqrt(cast({_NORM2.format(v='qa')} as double)"
        f" * cast({_NORM2.format(v='qb')} as double))) as bigint) as cos_milli",
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_milli"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cos_milli", "rank")
        .orderBy("q_id", "rank")
    )


ORACLE_ANN_LSH = f"""
WITH e AS (
  SELECT vec_id, {_D_QVEC} AS qv, CAST({_D_BUCKET} AS INT) AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, qv AS qa, bucket FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, c.vec_id,
    CAST(FLOOR(1000.0 * {_D_DOT} / SQRT(CAST({_D_NORM2.format(v='qa')} AS DOUBLE)
      * CAST({_D_NORM2.format(v='qb')} AS DOUBLE))) AS BIGINT) AS cos_milli
  FROM (SELECT vec_id, qv AS qb, bucket FROM e) c JOIN q USING (bucket)
  WHERE c.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, vec_id, cos_milli,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, vec_id ASC)
      AS rank
  FROM scored
)
SELECT q_id, vec_id, cos_milli, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K} ORDER BY q_id, rank
"""

OPS = {
    "ann_cosine_topk": q_ann_bruteforce,
    "ann_lsh_topk": q_ann_lsh,
}
ORACLES = {
    "ann_cosine_topk": ORACLE_ANN_BRUTEFORCE,
    "ann_lsh_topk": ORACLE_ANN_LSH,
}
