"""Physical-plan hygiene (task brief: '.explain the plan and iterate').

Asserts the properties that matter at 100 TB:
- column pruning + predicate pushdown reach the parquet scan,
- the extraction cascade plan contains NO shuffle exchange,
- small dimensions are broadcast in the relational harness,
- partial aggregation (map-side combine) appears before the exchange.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from grobid_clinical_report_spark import relational, runner, textops
from grobid_clinical_report_spark.pipeline import run_mode

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_extraction_plan_is_shuffle_free(spark, tmp_path):
    docs = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "x", "media_ref": None, "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    plan = _plan(run_mode(spark.read.parquet(p), "extract_full"))
    assert "Exchange" not in plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan


def test_staged_bucket_scan_prunes_partitions(spark, tmp_path):
    """stage_bucketed_input writes partitionBy(bucket); a per-bucket job's
    filter must become a PartitionFilter at the scan (directory pruning —
    1/N of the data read), not a post-scan predicate over everything."""
    docs = spark.createDataFrame(
        [
            (f"d{i}", [{"kind": "text", "text": "x", "media_ref": None,
                        "offset": 0}])
            for i in range(20)
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    src = str(tmp_path / "src.parquet")
    docs.write.parquet(src)
    staged = str(tmp_path / "staged")
    runner.stage_bucketed_input(spark, src, staged, n_buckets=4)
    chunk = spark.read.parquet(staged).filter(F.col("bucket") == 2)
    plan = _plan(chunk)
    part = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "bucket" in part  # pruned at the directory level
    if "PushedFilters:" in plan:  # no data-filter fallback for the bucket
        pushed = plan.split("PushedFilters:")[1].splitlines()[0]
        assert "bucket" not in pushed


def test_scan_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .select("l_returnflag", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan
    # only the needed columns are read
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_guardrail_filter_prunes_columns(spark):
    plan = _plan(textops.q_guardrail(spark, SF))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema  # only source/n_chars needed
    # partial aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_topk_uses_broadcast_join(spark):
    plan = _plan(relational.q_top_orders_per_cust(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_salt_partition_single_exchange(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "cast(doc_id as string) as doc_id",
        "array(struct('text' as kind, text, cast(null as string) as media_ref,"
        " 0 as offset)) as spans",
    )
    plan = _plan(run_mode(runner.salt_partition(docs, 8), "extract_full"))
    # exactly one exchange node in the plan tree: the salt repartition
    assert plan.count("Exchange (") == 1

def test_load_wide_skips_shuffle_when_scan_parallel(spark, tmp_path):
    """_load_wide must NOT inject a repartition (full shuffle) when the scan
    already has >= defaultParallelism splits (round-1 verdict: the
    unconditional repartition was a gratuitous shuffle at scale)."""
    n = spark.sparkContext.defaultParallelism
    src = spark.range(n * 10).selectExpr(
        "id as doc_id", "'un texte clinique simple' as text"
    )
    p = str(tmp_path / "documents.parquet")
    src.repartition(n * 2).write.parquet(p)
    df = textops._load_wide(spark, str(tmp_path), "documents")
    assert df.rdd.getNumPartitions() >= n
    assert "Exchange" not in _plan(df.selectExpr("doc_id", "length(text) as l"))
    # single-file scan (fewer splits than cores) still spreads
    p1 = str(tmp_path / "one" / "documents.parquet")
    src.coalesce(1).write.parquet(p1)
    df1 = textops._load_wide(spark, str(tmp_path / "one"), "documents")
    assert df1.rdd.getNumPartitions() >= n


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located joins via bucketing (task brief): two tables bucketed by
    the join key join WITHOUT an exchange on either side — the batch
    equivalent of pre-partitioning the 100 TB corpus by doc_id so
    spans-to-metadata joins never shuffle the big side."""
    import uuid

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    left = f"bj_left_{uuid.uuid4().hex[:8]}"
    right = f"bj_right_{uuid.uuid4().hex[:8]}"
    docs = spark.range(10_000).selectExpr(
        "id as doc_id", "id % 7 as quality"
    )
    meta = spark.range(10_000).selectExpr(
        "id as doc_id", "concat('s', id % 3) as source"
    )
    try:
        docs.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(left)
        meta.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(right)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(left).join(spark.table(right), "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-locates both sides
        assert joined.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {left}")
        spark.sql(f"DROP TABLE IF EXISTS {right}")
    _ = wh


def test_sample_mix_plan_broadcasts_rates_and_scans_twice(spark):
    """The mixing gate must be a broadcast join (rates table is one row per
    source), and the corpus must be scanned at most twice (probe side +
    source-totals agg) — a third scan means the totals were computed in a
    separate branch Catalyst can't reuse (the bug this test pins)."""
    from grobid_clinical_report_spark import mixing

    import re

    plan = _plan(mixing.q_sample_mix(spark, SF))
    assert "BroadcastHashJoin" in plan
    # formatted explain prints each node twice (tree + detail) — count the
    # numbered detail headers
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2


def test_ann_ivf_probes_are_broadcast(spark):
    """The IVF candidate join must broadcast the probe side (nprobe rows
    per query — driver-sized) so the inverted-list scan never shuffles."""
    from grobid_clinical_report_spark import similarity as sim

    plan = _plan(sim.q_ann_ivf(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_window_is_shard_partitioned(spark):
    """Sequence packing must never materialize a global order: the running-
    token window is PARTITIONED BY the md5 shard key (hash exchange on
    shard), with no single-partition exchange anywhere in the plan."""
    from grobid_clinical_report_spark import mixing

    plan = _plan(mixing.q_pack_sequences(spark, SF))
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


def test_lm_quality_model_is_broadcast(spark):
    """The 256-row bigram model joins back to the corpus via broadcast —
    the corpus-sized side must never shuffle on the bigram key. The one
    SinglePartition exchange allowed is the bounded counts-table total
    (key space ≤ charset², scale-independent)."""
    from grobid_clinical_report_spark import textops

    plan = _plan(textops.q_lm_quality(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_corpus_filter_plan_hygiene(spark):
    """The composite filter's only shuffles are the doc-keyed word
    aggregation (with map-side partial aggregation) and its join back —
    no broadcast-nested-loop, no cartesian product."""
    from grobid_clinical_report_spark import textops

    plan = _plan(textops.q_corpus_filter(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_corpus_filter_and_gopher_share_word_explode(spark):
    """VERDICT r4 next #4: corpus_filter and gopher_repetition route their
    word explode through session.materialize under one shared name, so in
    a combined run the SECOND query reads the first's cached explode (an
    InMemoryTableScan in its plan) instead of re-exploding the corpus."""
    from grobid_clinical_report_spark import textops

    spark.catalog.clearCache()
    try:
        textops.q_corpus_filter(spark, SF).count()
        plan = _plan(textops.q_gopher_repetition(spark, SF))
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    finally:
        spark.catalog.clearCache()


def test_curate_plan_hygiene(spark):
    """The composed curation decision table must stay join-clean: the
    near-dup component kill-list (pair-graph docs only, ≪ corpus) joins
    broadcast, and nothing degenerates to a cartesian/nested-loop."""
    plan = _plan(textops.q_curate(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
