#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1.4).

NOT the driver bench — `bench.py` is frozen for measurement. This file
exists so individual queries can be timed with the noop sink, best-of-N,
labeled in the UI, and so `.explain("formatted")` plans can be captured to
plans/<tag>/ without touching the frozen harness.

Usage:
  python bench_extra.py --queries ner_entities,extract_full_cascade [--runs 3]
  python bench_extra.py --plans plans/r08 --suffix after   # capture plans
  python bench_extra.py --all                              # every headline leg

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS, same as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.abspath(__file__))

# the headline bench's query list (bench.py), minus the three corpus
# extraction legs which need the spans corpus (handled separately below)
BENCH_QUERIES = [
    "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_neardup_pairs",
    "dedup_components", "curate_corpus", "dedup_substring",
    "dedup_embedding", "langid", "quality_score", "lm_quality",
    "corpus_filter", "gopher_repetition", "decontaminate", "kmv_distinct",
    "sample_mix", "pack_sequences", "token_count", "fingerprint",
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "embedding_clusters",
    "semantic_prune", "rel_pricing_summary", "rel_topk_per_group",
    "rel_sessionization", "rel_event_windows", "rel_length_quantiles",
    "rel_asof_join", "rel_range_join", "media_decode_features",
    "media_frame_sample",
]
EXTRACTION_LEGS = ["extract_full_cascade", "extract_header", "ner_entities"]


def _corpus_df(spark, mode):
    import bench
    from grobid_clinical_report_spark.pipeline import apply_split_hint, run_mode
    from grobid_clinical_report_spark.runner import split_guardrail

    corpus = bench.corpus_path(bench._sf_from_dir(SF_DIR))
    apply_split_hint(spark, mode)
    docs = spark.read.parquet(corpus).select("doc_id", "spans")
    ok, _ = split_guardrail(docs)
    return run_mode(ok, mode)


def build(spark, name):
    """DataFrame for one headline leg (same construction as bench.py)."""
    import __spark_entry__ as E

    if name == "extract_full_cascade":
        return _corpus_df(spark, "extract_full")
    if name == "extract_header":
        return _corpus_df(spark, "extract_header")
    if name == "ner_entities":
        return _corpus_df(spark, "ner")
    return E.queries()[name](spark, SF_DIR)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--queries", default="")
    p.add_argument("--all", action="store_true")
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--plans", default="")
    p.add_argument("--suffix", default="after")
    args = p.parse_args()

    names = (
        EXTRACTION_LEGS + BENCH_QUERIES
        if args.all
        else [n for n in args.queries.split(",") if n]
    )
    from grobid_clinical_report_spark.session import get_spark

    spark = get_spark(app="bench-extra", cpus=CPUS, max_partition_bytes="4m")
    out = {}
    for name in names:
        if args.plans:
            os.makedirs(os.path.join(REPO, args.plans), exist_ok=True)
            df = build(spark, name)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(REPO, args.plans, f"{name}_{args.suffix}.txt"),
                "w",
            ) as f:
                f.write(plan)
            spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
            print(f"plan: {name}")
            continue
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            df = build(spark, name)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
            spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}))
    if out:
        print(json.dumps({"sf_dir": SF_DIR, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
