"""Batch job driver: read → guardrails → skew-aware partitioning → cascade →
write + manifest (SURVEY.md §3.4 Spark lifecycle, §2.1 S4/S5/S6).

Scale design (the 100 TB story):
- **Input** is an Iceberg table bucket-partitioned by doc_id; in this sandbox
  a parquet file stands in and `bucket = pmod(hash(doc_id), N)` reproduces the
  partition spec. Only `doc_id, spans` are read (column pruning reaches the
  scan) and bucket pruning limits each chunk's scan to 1/N of the data.
- **Guardrails (S4)**: documents over `max_spans` go to a quarantine sink with
  a metric row instead of poisoning a task (the reference rejects >300k-block
  PDFs for the same reason, MedicalReportSegmenterParser.java:136-139,250-253).
- **Skew**: the extraction cost is ~linear in span count, so instead of
  hash-partitioning blindly we split each bucket into a salted number of
  tasks: heavy docs (top size tier) are spread round-robin by a salt derived
  from hash(doc_id) so no task gets two whales; AQE can't help a map-only
  stage, salting at the repartition does.
- **Shuffle count**: exactly one repartition per bucket (to spread work);
  the cascade itself is a single mapInPandas — no other exchange.
- **Resume**: per-bucket overwrite + manifest append (see manifest.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import manifest as mf
from .pipeline import run_mode

DEFAULT_MAX_SPANS = 50_000
HEAVY_SPANS = 5_000


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    """Iceberg-style bucket(doc_id) column (pmod of a stable hash)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )


def split_guardrail(
    df: DataFrame, max_spans: int = DEFAULT_MAX_SPANS
) -> tuple[DataFrame, DataFrame]:
    """(processable, quarantined) — S4 QoS caps."""
    n = F.size("spans")
    return df.filter(n <= max_spans), df.filter(n > max_spans)


def salt_partition(df: DataFrame, tasks: int) -> DataFrame:
    """Spread documents across ``tasks`` partitions with whale isolation.

    Light docs hash anywhere; heavy docs (> HEAVY_SPANS spans) get a salt from
    a *different* hash so consecutive heavy doc_ids land on different tasks.
    One explicit shuffle; the map stage after it is shuffle-free.
    """
    salted = df.withColumn(
        "_salt",
        F.when(
            F.size("spans") > HEAVY_SPANS,
            F.pmod(F.xxhash64("doc_id", F.lit("heavy")), F.lit(tasks)),
        ).otherwise(F.pmod(F.xxhash64("doc_id"), F.lit(tasks))),
    )
    return salted.repartition(tasks, "_salt").drop("_salt")


def run_extraction_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    mode: str = "extract_full",
    n_buckets: int = 8,
    tasks_per_bucket: int | None = None,
    max_spans: int = DEFAULT_MAX_SPANS,
    resume: bool = True,
) -> dict:
    """End-to-end batch job with per-bucket checkpointing.

    Returns a metrics dict: {buckets_run, docs, spans, quarantined, wall_sec}.
    """
    from .io import read_documents

    run_id = mf.new_run_id()
    tasks = tasks_per_bucket or spark.sparkContext.defaultParallelism
    docs = read_documents(spark, input_path).select("doc_id", "spans")
    docs = with_bucket(docs, n_buckets)

    pending = (
        mf.pending_buckets(spark, output_path, n_buckets)
        if resume
        else list(range(n_buckets))
    )
    totals = {"buckets_run": 0, "docs": 0, "spans": 0, "quarantined": 0}
    t_all = time.monotonic()
    for b in pending:
        t0 = time.monotonic()
        chunk = docs.filter(F.col("bucket") == b).drop("bucket")
        ok, bad = split_guardrail(chunk, max_spans)
        ok = salt_partition(ok, tasks)

        extracted = run_mode(ok, mode)
        out_dir = os.path.join(output_path, f"bucket={b}")
        from .io import write_spans

        write_spans(extracted, out_dir, mode="overwrite")

        q_dir = os.path.join(output_path, "_quarantine", f"bucket={b}")
        n_quarantined = bad.count()
        if n_quarantined:
            bad.select(
                "doc_id", F.size("spans").alias("n_spans")
            ).write.mode("overwrite").parquet(q_dir)

        written = spark.read.parquet(out_dir)
        n_docs = written.count()
        n_spans = written.select(
            F.coalesce(F.sum(F.size("spans")), F.lit(0)).alias("s")
        ).collect()[0]["s"]
        mf.commit_bucket(
            spark, output_path, b, n_docs, n_spans, n_quarantined,
            time.monotonic() - t0, input_path, run_id,
        )
        totals["buckets_run"] += 1
        totals["docs"] += n_docs
        totals["spans"] += int(n_spans)
        totals["quarantined"] += n_quarantined
    totals["wall_sec"] = time.monotonic() - t_all
    return totals


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_path, "bucket=*"))
