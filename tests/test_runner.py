"""Job-level tests: guardrail quarantine, skew salting, manifest resume
(SURVEY.md §5.2.3/5, FIXTURES.md fx-skew-0006 + resume contract)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from grobid_clinical_report_spark import datagen, manifest as mf, runner
from grobid_clinical_report_spark.schema import DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def input_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("docs") / "documents.parquet")
    datagen.write_documents_parquet(
        p, n_docs=40, heavy_docs=1, heavy_spans=600, max_spans=300
    )
    return p


def test_guardrail_split(spark, input_path):
    df = spark.read.parquet(input_path)
    ok, bad = runner.split_guardrail(df, max_spans=500)
    assert bad.count() == 1  # the heavy doc over the cap
    assert ok.count() == df.count() - 1


def test_salt_partition_isolates_whales(spark, input_path):
    df = spark.read.parquet(input_path)
    tasks = 4
    salted = runner.salt_partition(df, tasks)
    assert salted.rdd.getNumPartitions() == tasks
    # every partition gets at most ceil(heavy/tasks) heavy docs (here: 1)
    heavy_per_part = (
        salted.withColumn("pid", F.spark_partition_id())
        .filter(F.size("spans") > runner.HEAVY_SPANS)
        .groupBy("pid")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert heavy_per_part is None or heavy_per_part <= 1


def test_job_runs_and_resumes_idempotently(spark, input_path, tmp_path):
    out = str(tmp_path / "out")
    m1 = runner.run_extraction_job(
        spark, input_path, out, n_buckets=4, max_spans=500
    )
    assert m1["buckets_run"] == 4
    assert m1["quarantined"] == 1
    # the bucket jobs actually overlapped (driver-side thread pool): the
    # cluster is never idle between per-bucket jobs
    assert m1["peak_concurrency"] >= 2
    first = {
        r["doc_id"]: r["spans"]
        for r in runner.read_extracted(spark, out).collect()
    }
    assert len(first) == m1["docs"] > 0

    # simulate a crash after 4 committed buckets: delete one bucket's data
    # AND its manifest row → resume must redo exactly that bucket
    import shutil

    shutil.rmtree(os.path.join(out, "bucket=2"))
    done_before = mf.completed_buckets(spark, out)
    assert done_before == {0, 1, 2, 3}
    # rewrite manifest without bucket 2 (a crash before commit)
    m = mf.read_manifest(spark, out).filter(F.col("bucket") != 2)
    pdf = m.toPandas()
    shutil.rmtree(mf.manifest_path(out))
    spark.createDataFrame(pdf, mf.MANIFEST_SCHEMA).write.parquet(
        mf.manifest_path(out)
    )

    m2 = runner.run_extraction_job(
        spark, input_path, out, n_buckets=4, max_spans=500
    )
    assert m2["buckets_run"] == 1  # only the missing bucket
    second = {
        r["doc_id"]: r["spans"]
        for r in runner.read_extracted(spark, out).collect()
    }
    assert second == first  # byte-identical resume (FIXTURES.md §5)

    # a third run is a no-op
    m3 = runner.run_extraction_job(
        spark, input_path, out, n_buckets=4, max_spans=500
    )
    assert m3["buckets_run"] == 0


def test_staged_buckets_match_unstaged(spark, input_path, tmp_path):
    """stage_buckets=True (one-pass bucket-partitioned staging, directory
    pruning per bucket job) must produce byte-identical output to the
    unstaged path, and the staged copy must actually exist partitioned."""
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    ma = runner.run_extraction_job(
        spark, input_path, out_a, n_buckets=4, max_spans=500
    )
    mb = runner.run_extraction_job(
        spark, input_path, out_b, n_buckets=4, max_spans=500,
        stage_buckets=True,
    )
    assert (ma["docs"], ma["spans"]) == (mb["docs"], mb["spans"])
    a = {
        r["doc_id"]: r["spans"]
        for r in runner.read_extracted(spark, out_a).collect()
    }
    b = {
        r["doc_id"]: r["spans"]
        for r in runner.read_extracted(spark, out_b).collect()
    }
    assert a == b
    assert os.path.isdir(os.path.join(out_b, "_staged_input", "bucket=3"))
    # resume over a staged run is still a no-op (staging reused, 0 buckets)
    m3 = runner.run_extraction_job(
        spark, input_path, out_b, n_buckets=4, max_spans=500,
        stage_buckets=True,
    )
    assert m3["buckets_run"] == 0


def test_stale_staging_restaged_on_param_change(spark, input_path, tmp_path):
    """ADVICE r3 (medium): a leftover staging from a crashed run with MORE
    buckets must not be trusted by a new run with fewer buckets — documents
    in buckets >= n_buckets would silently vanish. The _STAGING_META
    sidecar (a 1-row text dataset written through Spark, so it lives on the
    same filesystem as the staged data — ADVICE r4) pins
    (n_buckets, input_path) exactly."""
    import glob
    import json

    def read_meta(staged_dir):
        return json.loads(
            spark.read.text(os.path.join(staged_dir, "_STAGING_META"))
            .head().value
        )

    staged = str(tmp_path / "staged")
    # simulate the crashed prior run: staged with 8 buckets, no manifest
    runner.stage_bucketed_input(spark, input_path, staged, n_buckets=8)
    assert len(glob.glob(os.path.join(staged, "bucket=*"))) == 8
    # same params → skipped (idempotent): mtime of the sidecar part file
    # unchanged
    [meta_part] = glob.glob(
        os.path.join(staged, "_STAGING_META", "part-*")
    )
    t0 = os.path.getmtime(meta_part)
    runner.stage_bucketed_input(spark, input_path, staged, n_buckets=8)
    assert os.path.getmtime(meta_part) == t0
    # fewer buckets → MUST re-stage (old guard passed because bucket=1 dir
    # existed, dropping buckets 2..7)
    runner.stage_bucketed_input(spark, input_path, staged, n_buckets=2)
    assert sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(staged, "bucket=*"))
    ) == ["bucket=0", "bucket=1"]
    assert read_meta(staged)["n_buckets"] == 2
    # every document survives the re-staging
    n_in = spark.read.parquet(input_path).count()
    assert spark.read.parquet(staged).count() == n_in
    # changed input path → re-stage too (content may differ)
    other = str(tmp_path / "docs2.parquet")
    datagen.write_documents_parquet(other, n_docs=7)
    runner.stage_bucketed_input(spark, other, staged, n_buckets=2)
    assert (
        spark.read.parquet(staged).count()
        == spark.read.parquet(other).count()
    )


def test_fixtures_survive_inside_scale_run(spark, input_path, tmp_path):
    """Fixture docs embedded in the corpus extract identically inside a
    bucketed scale run (FIXTURES.md §4)."""
    out = str(tmp_path / "out2")
    runner.run_extraction_job(spark, input_path, out, n_buckets=2, max_spans=500)
    rows = {
        r["doc_id"]: r["spans"]
        for r in runner.read_extracted(spark, out).collect()
    }
    got = [
        (s["kind"], s["text"], s["media_ref"]) for s in rows["fx-full-0001"]
    ]
    assert got == [tuple(e) for e in datagen.FX_FULL_EXPECTED]


def test_resume_rejects_incompatible_config(spark, input_path, tmp_path):
    """Resume must refuse to mix outputs of different job shapes (mode /
    n_buckets / max_spans / input) under one output directory."""
    out = str(tmp_path / "out3")
    runner.run_extraction_job(
        spark, input_path, out, n_buckets=2, max_spans=500
    )
    for kw in (
        {"mode": "extract_header"},
        {"n_buckets": 4},
        {"max_spans": 400},
    ):
        with pytest.raises(ValueError, match="incompatible"):
            runner.run_extraction_job(
                spark, input_path, out,
                **{"n_buckets": 2, "max_spans": 500, **kw},
            )


def test_quarantine_cleared_on_recompute(spark, input_path, tmp_path):
    """Re-running with a raised max_spans (resume=False) must not leave
    stale quarantine rows from the stricter previous run."""
    out = str(tmp_path / "out4")
    m1 = runner.run_extraction_job(
        spark, input_path, out, n_buckets=2, max_spans=500
    )
    assert m1["quarantined"] == 1
    m2 = runner.run_extraction_job(
        spark, input_path, out, n_buckets=2, max_spans=100_000, resume=False
    )
    assert m2["quarantined"] == 0
    q = spark.read.parquet(os.path.join(out, "_quarantine", "bucket=*"))
    assert q.count() == 0


def test_quarantine_reprocessing_chunks_whales(spark, input_path, tmp_path):
    """Second-pass whale path: the quarantined doc is windowed, extracted,
    and re-merged with offsets in order — quarantine doesn't lose data.
    continuity_cap == max_spans forces the WINDOWED (>cap) branch so this
    covers the monster-tail path, not the un-windowed continuity path."""
    out = str(tmp_path / "out5")
    m = runner.run_extraction_job(
        spark, input_path, out, n_buckets=2, max_spans=500
    )
    assert m["quarantined"] == 1
    q = runner.process_quarantined(
        spark, input_path, out, max_spans=500, continuity_cap=500
    )
    assert q["docs"] == 1 and q["spans"] > 0
    rows = spark.read.parquet(os.path.join(out, "bucket=quarantine")).collect()
    spans = rows[0]["spans"]
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs)
    # the unified bucket=* view now covers ALL docs (whales included —
    # bucket=quarantine sits next to the regular buckets)
    total = runner.read_extracted(spark, out).count()
    docs_in = spark.read.parquet(input_path).count()
    assert total == docs_in


def test_quarantine_zone_continuity(spark, tmp_path):
    """VERDICT r3 #5: a whale whose HEADER crosses the window boundary must
    produce the same spans as an un-windowed run with a raised cap. Whales
    under continuity_cap take the un-windowed path, so zone decisions are
    document-global — no re-opened zones, no double-emitted fields."""
    import pandas as pd

    from grobid_clinical_report_spark.pipeline import extract_full_pdf

    cap = 20
    # header block of 26 lines (crosses the 20-span window boundary),
    # then a body with clear structure
    lines = [("text", "COMPTE RENDU OPÉRATOIRE", None),
             ("text", "Le 12.03.2019", None)]
    lines += [
        ("text", f"Service de Chirurgie {i} — 9401{i % 10} CRETEIL", None)
        for i in range(24)
    ]
    lines += [("text", "", None),
              ("text", "INTERVENTION :", None)]
    lines += [
        ("text", f"Le geste opératoire numéro {i} s'est déroulé sans "
                 "complication notable.", None)
        for i in range(10)
    ]
    spans = datagen._with_offsets(lines)
    pdf = pd.DataFrame([{"doc_id": "whale-hdr", "spans": spans}])

    inp = str(tmp_path / "whale.parquet")
    spark.createDataFrame(pdf, DOCUMENTS_SCHEMA).write.parquet(inp)
    out = str(tmp_path / "out6")
    m = runner.run_extraction_job(
        spark, inp, out, n_buckets=1, max_spans=cap
    )
    assert m["quarantined"] == 1
    runner.process_quarantined(spark, inp, out, max_spans=cap)
    got = spark.read.parquet(
        os.path.join(out, "bucket=quarantine")
    ).collect()
    got_spans = [
        (s["kind"], s["text"], s["media_ref"]) for s in got[0]["spans"]
    ]
    want = extract_full_pdf(pdf)  # un-windowed reference run
    want_spans = [
        (s["kind"], s["text"], s["media_ref"])
        for s in want["spans"].iloc[0]
    ]
    assert got_spans == want_spans


def test_jsonl_documents_round_trip_and_extraction(spark, tmp_path):
    """JSON-lines source/sink (io.py): the LLM-corpus interchange shape.
    Write the documents table as .jsonl, read it back with the ENFORCED
    schema, and the rows — and a full extraction pass over them — must
    match the parquet path exactly (including null media_ref fields on
    text spans, which ignoreNullFields would otherwise drop)."""
    from grobid_clinical_report_spark import datagen
    from grobid_clinical_report_spark.io import read_documents, write_spans
    from grobid_clinical_report_spark.pipeline import run_mode

    pq_dir = str(tmp_path / "docs_pq")
    datagen.write_documents_parquet(pq_dir, n_docs=40, shards=2)
    docs_pq = read_documents(spark, pq_dir).select("doc_id", "spans")

    jl_dir = str(tmp_path / "docs.jsonl")
    write_spans(docs_pq, jl_dir)
    docs_jl = read_documents(spark, jl_dir).select("doc_id", "spans")

    def rows(df):
        return sorted(
            (
                r["doc_id"],
                tuple(
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in r["spans"]
                ),
            )
            for r in df.collect()
        )

    assert rows(docs_jl) == rows(docs_pq)
    got = rows(run_mode(docs_jl, "extract_full"))
    want = rows(run_mode(docs_pq, "extract_full"))
    # 40 synthetic + the embedded fixture corpus
    assert got == want and len(got) == docs_pq.count()


def test_jsonl_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    """A corrupt line in a JSONL corpus must neither crash the job nor
    vanish: it lands on the quarantine side of split_guardrail (counted,
    stored) while the well-formed documents extract normally."""
    import json as _json

    from grobid_clinical_report_spark import runner
    from grobid_clinical_report_spark.io import read_documents

    jl = tmp_path / "docs.jsonl"
    good = {
        "doc_id": "ok-1",
        "spans": [
            {"kind": "line", "text": "DIAGNOSTIC :", "media_ref": None,
             "offset": 0}
        ],
    }
    jl.write_text(
        _json.dumps(good)
        + "\nTHIS IS NOT JSON\n"
        + '{"doc_id": "bad-spans", "spans": "nope"}\n'
    )
    docs = read_documents(spark, str(jl)).select("doc_id", "spans")
    ok, bad = runner.split_guardrail(docs)
    assert [r["doc_id"] for r in ok.collect()] == ["ok-1"]
    assert sorted(
        (r["doc_id"] or "<corrupt>") for r in bad.collect()
    ) == ["<corrupt>", "bad-spans"]

    out = str(tmp_path / "out")
    m = runner.run_extraction_job(spark, str(jl), out, n_buckets=1)
    assert m["docs"] == 1 and m["quarantined"] == 2


def test_chunked_corpus_writer_matches_single_shot_semantics(spark, tmp_path):
    """write_documents_parquet_chunked must read exactly like the one-frame
    writer's output: unique doc_ids across chunks (seed-embedded ids),
    fixtures and heavy whales present ONCE (chunk 0 only), same schema. The
    chunked path exists because the one-frame build peaks at ~10x the
    parquet size in RAM (a 2M-doc corpus OOM-risks a 128 GB box)."""
    from grobid_clinical_report_spark import datagen

    p = str(tmp_path / "chunked")
    datagen.write_documents_parquet_chunked(
        p, n_docs=900, chunk_docs=400, shards_per_chunk=4, heavy_docs=2
    )
    df = spark.read.parquet(p)
    total = df.count()
    n_fx = df.filter("doc_id like 'fx-%'").count()
    assert total == 900 + n_fx + 2 and n_fx > 0
    assert df.select("doc_id").distinct().count() == total
    # exactly the single-shot writer's schema (the extraction input DDL)
    single = str(tmp_path / "single")
    datagen.write_documents_parquet(single, n_docs=10)
    assert df.schema == spark.read.parquet(single).schema
    # whales only once
    heavy = df.selectExpr("size(spans) as n").filter("n >= 20000").count()
    assert heavy == 2


def test_trained_weights_serve_extraction(spark, input_path, tmp_path):
    """Deployment: run_extraction_job with extract_fn (a trained decoder)
    produces the same rows as run_trained_ner applied directly; resume is
    idempotent under the same job_tag and REFUSED under a different one
    (different weights must never mix into one output directory)."""
    import numpy as np

    from grobid_clinical_report_spark import trainer
    from grobid_clinical_report_spark.io import read_documents

    docs = read_documents(spark, input_path).select("doc_id", "spans")
    ts = trainer.build_training_set(docs).cache()
    W, T, _ = trainer.train(ts, epochs=2, shards=2, batch_docs=8)
    ts.unpersist()

    out = str(tmp_path / "served")
    fn = lambda df: trainer.run_trained_ner(df, W, T)  # noqa: E731
    m1 = runner.run_extraction_job(
        spark, input_path, out, mode="ner", n_buckets=3, max_spans=500,
        extract_fn=fn, job_tag="wtest1",
    )
    assert m1["buckets_run"] == 3
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
        for r in runner.read_extracted(spark, out).collect()
    }
    want = {
        r["doc_id"]: [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
        for r in trainer.run_trained_ner(
            docs.where(F.size("spans") <= 500), W, T
        ).collect()
    }
    assert got == want

    m2 = runner.run_extraction_job(
        spark, input_path, out, mode="ner", n_buckets=3, max_spans=500,
        extract_fn=fn, job_tag="wtest1",
    )
    assert m2["buckets_run"] == 0
    with pytest.raises(ValueError, match="incompatible"):
        runner.run_extraction_job(
            spark, input_path, out, mode="ner", n_buckets=3, max_spans=500,
            extract_fn=fn, job_tag="wtest2",
        )
    with pytest.raises(ValueError, match="job_tag"):
        runner.run_extraction_job(
            spark, input_path, str(tmp_path / "x"), mode="ner",
            n_buckets=3, extract_fn=fn,
        )
