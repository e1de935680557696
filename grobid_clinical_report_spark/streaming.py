"""Incremental extraction via Structured Streaming.

The reference is strictly batch (no streaming surface — SURVEY.md §2.8), and
exact resume is manifest-based (manifest.py). This module is the *additive*
streaming deployment shape for the same cascade: new document files landing
in a directory are picked up by a file-source stream, run through the
identical `run_mode` stages inside `foreachBatch` (exactly-once via the
streaming checkpoint + idempotent parquet epochs), and appended to the spans
sink. `availableNow` triggers let the same code run as an incremental batch
job — the natural mode for a 10^12-doc table that grows by partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .pipeline import run_mode
from .schema import DOCUMENTS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    mode: str = "extract_full",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 64,
):
    """Start (and return) an availableNow streaming query: processes every
    file currently in ``input_dir`` that the checkpoint hasn't seen, then
    stops. Re-running continues where the checkpoint left off — the
    streaming-native equivalent of the manifest anti-join resume."""
    checkpoint_dir = checkpoint_dir or os.path.join(output_dir, "_checkpoint")
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df, epoch_id: int) -> None:
        out = run_mode(batch_df, mode)
        (
            out.write.mode("append").parquet(
                os.path.join(output_dir, "spans")
            )
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# stateful streaming: cross-batch exact dedup (applyInPandasWithState)
# ---------------------------------------------------------------------------


def stream_dedup_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    mode: str = "extract_full",
    checkpoint_dir: str | None = None,
):
    """Streaming extraction with a custom stateful operator: documents whose
    normalized-content fingerprint was already seen in ANY earlier
    micro-batch are dropped before the (expensive) cascade runs.

    The dedup state is a per-fingerprint GroupState kept in the streaming
    state store — the `applyInPandasWithState` shape for custom stateful
    operators. At 10^12 scale the state is hash-partitioned by fingerprint
    across executors; the extraction itself stays the same run_mode pass.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    checkpoint_dir = checkpoint_dir or os.path.join(output_dir, "_checkpoint")
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .parquet(input_dir)
        .withColumn(
            "fp",
            F.md5(
                F.concat_ws(
                    "", F.transform(F.col("spans"), lambda s: s["text"])
                )
            ),
        )
    )

    def keep_first(key, pdfs, state):
        if not state.exists:
            state.update((True,))
            first = next(pdfs, None)
            if first is not None and len(first):
                yield first.iloc[:1][["doc_id", "spans"]]
        # fingerprint already seen (this or an earlier batch): drop

    deduped = stream.groupBy("fp").applyInPandasWithState(
        keep_first,
        outputStructType=DOCUMENTS_SCHEMA,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def process(batch_df, epoch_id: int) -> None:
        run_mode(batch_df, mode).write.mode("append").parquet(
            os.path.join(output_dir, "spans")
        )

    return (
        deduped.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
