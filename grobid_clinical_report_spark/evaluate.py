"""Sequence-labeling evaluation: per-label token- and field-level P/R/F1.

The reference's PRIMARY quality mechanism is trainer evaluation
(`MedicalReportTrainerRunner.java:25,134-143` — modes 0-train / 1-eval /
2-split / 3-n-fold on all 11 `*Trainer` classes;
`doc/Training-the-medical-report-models.md:78-99` documents the reported
per-label token-level and field-level precision/recall/F1). GROBID core
computes these single-threaded over one evaluation file; here the same
metrics are distributed Spark SQL over a (gold, predicted) label table of
any size — the shape a surrogate-labeler refit (SURVEY.md §7.0) evaluates
at corpus scale.

Metric arithmetic is INTEGER end-to-end (counts → milli-P/R/F1 by integer
division) so the DuckDB oracle hashes identically:

    precision_milli = 1000·tp / (tp + fp)      [= 1000·tp / n_pred]
    recall_milli    = 1000·tp / (tp + fn)      [= 1000·tp / n_gold]
    f1_milli        = 2000·tp / (n_gold + n_pred)   [= 2·P·R/(P+R) in counts]

Levels:
- token: each (doc_id, seq, tok_idx) row scores gold-vs-pred directly.
- field: a field is a MAXIMAL RUN of consecutive tokens (same doc_id, seq;
  tok_idx contiguous) carrying the same non-'other' label — the
  TaggingTokenCluster analog (SURVEY.md §2.4 L2). A gold field counts as tp
  only under EXACT span match: a predicted field with identical
  (doc_id, seq, label, start, end). This is GROBID's strict field criterion.
- a '__micro__' row per level aggregates the per-label counts, excluding
  'other' at token level ('other' is the negative class, never a field).

Scale shape: two groupBy aggregations + one label-keyed join at token level;
field level adds one window pass per side (partitioned by (doc_id, seq) —
millions of small partitions, no skew) and a field-keyed join. Output is
O(|labels|), so every join after the first aggregation is broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

OTHER = "other"

_METRIC_COLS = """
  n_gold, n_pred, tp,
  n_pred - tp as fp,
  n_gold - tp as fn,
  case when n_pred = 0 then 0 else 1000 * tp div n_pred end as precision_milli,
  case when n_gold = 0 then 0 else 1000 * tp div n_gold end as recall_milli,
  case when n_gold + n_pred = 0 then 0
       else 2000 * tp div (n_gold + n_pred) end as f1_milli
"""


def _prf_from_counts(counts: DataFrame, level: str) -> DataFrame:
    """(label, n_gold, n_pred, tp) → per-label metric rows + '__micro__'.

    The micro row aggregates counts over labels != 'other' (the negative
    class must not dominate the headline number; field tables contain no
    'other' rows, so there the filter is a no-op)."""
    micro = (
        counts.filter(F.col("label") != OTHER)
        .agg(
            F.sum("n_gold").alias("n_gold"),
            F.sum("n_pred").alias("n_pred"),
            F.sum("tp").alias("tp"),
        )
        .selectExpr(
            "'__micro__' as label",
            "coalesce(n_gold, 0L) as n_gold",
            "coalesce(n_pred, 0L) as n_pred",
            "coalesce(tp, 0L) as tp",
        )
    )
    return counts.unionByName(micro).selectExpr(
        f"'{level}' as level", "label", *_METRIC_COLS.split(",")
    )


def _pair_counts(gold: DataFrame, pred: DataFrame, keys: list[str]) -> DataFrame:
    """Per-label (n_gold, n_pred, tp) from two keyed label tables.

    tp = inner join on keys + label; n_gold/n_pred are per-side label
    counts; the three tiny aggregates meet in a full outer join on label
    (a label may exist on one side only)."""
    g = gold.groupBy("label").agg(F.count("*").alias("n_gold"))
    p = pred.groupBy("label").agg(F.count("*").alias("n_pred"))
    t = (
        gold.join(pred, keys + ["label"])
        .groupBy("label")
        .agg(F.count("*").alias("tp"))
    )
    return (
        g.join(p, "label", "full_outer")
        .join(t, "label", "full_outer")
        .selectExpr(
            "label",
            "coalesce(n_gold, 0L) as n_gold",
            "coalesce(n_pred, 0L) as n_pred",
            "coalesce(tp, 0L) as tp",
        )
    )


def token_prf(df: DataFrame, gold: str = "gold", pred: str = "pred") -> DataFrame:
    """Token-level per-label P/R/F1 over (doc_id, seq, tok_idx, gold, pred).

    One pass per side: gold-side counts carry tp (gold == pred on the same
    row), pred-side counts give n_pred — no join on the token table."""
    g = df.groupBy(F.col(gold).alias("label")).agg(
        F.count("*").alias("n_gold"),
        F.sum((F.col(gold) == F.col(pred)).cast("long")).alias("tp"),
    )
    p = df.groupBy(F.col(pred).alias("label")).agg(
        F.count("*").alias("n_pred")
    )
    counts = g.join(p, "label", "full_outer").selectExpr(
        "label",
        "coalesce(n_gold, 0L) as n_gold",
        "coalesce(n_pred, 0L) as n_pred",
        "coalesce(tp, 0L) as tp",
    )
    return _prf_from_counts(counts, "token")


def label_runs(df: DataFrame, label_col: str) -> DataFrame:
    """Maximal same-label runs → (doc_id, seq, label, start, end), dropping
    'other'. A run breaks on a label change OR a tok_idx gap (zone
    projections can make token indices non-contiguous within a line)."""
    w = Window.partitionBy("doc_id", "seq").orderBy("tok_idx")
    lab = F.col(label_col)
    brk = (
        (~F.lag(lab).over(w).eqNullSafe(lab))
        | (~F.lag("tok_idx").over(w).eqNullSafe(F.col("tok_idx") - 1))
    ).cast("long")
    wid = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("brk", brk)
        .withColumn("run_id", F.sum("brk").over(wid))
        .groupBy("doc_id", "seq", "run_id")
        .agg(
            F.first(lab).alias("label"),
            F.min("tok_idx").alias("start"),
            F.max("tok_idx").alias("end"),
        )
        .filter(F.col("label") != OTHER)
        .select("doc_id", "seq", "label", "start", "end")
    )


def field_prf(df: DataFrame, gold: str = "gold", pred: str = "pred") -> DataFrame:
    """Field-level per-label P/R/F1: exact-span match of maximal label runs
    (GROBID's strict field criterion)."""
    gf = label_runs(df.select("doc_id", "seq", "tok_idx", gold), gold)
    pf = label_runs(df.select("doc_id", "seq", "tok_idx", pred), pred)
    counts = _pair_counts(gf, pf, ["doc_id", "seq", "start", "end"])
    return _prf_from_counts(counts, "field")


def evaluate_labels(
    df: DataFrame, gold: str = "gold", pred: str = "pred"
) -> DataFrame:
    """Full trainer-eval report: token + field levels in one table."""
    return token_prf(df, gold, pred).unionByName(field_prf(df, gold, pred))


# ---------------------------------------------------------------------------
# Driver query: evaluate a deterministic perturbed prediction against the
# NER supervision table (the refit-evaluation workflow, reference eval
# mode 1). The perturbation rule is pure integer arithmetic so the DuckDB
# oracle applies the IDENTICAL rule to the identical literal gold rows:
#   (seq·31 + tok_idx·7) % 5 == 0            → pred 'other'   (deletion)
#   (seq·31 + tok_idx·7) % 5 == 1 and 'other' → pred 'persname' (insertion)
# ---------------------------------------------------------------------------

_PERTURB = (
    "case when (seq * 31 + tok_idx * 7) % 5 = 0 then 'other' "
    f"when (seq * 31 + tok_idx * 7) % 5 = 1 and label = '{OTHER}' "
    "then 'persname' else label end"
)


def q_eval_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import datagen
    from .pipeline import run_training_ner
    from .schema import DOCUMENTS_SCHEMA

    pdf = datagen.fixture_documents_pdf()
    keep = sorted(datagen.FX_NER_TRAINING)
    pdf = pdf[pdf.doc_id.isin(keep)].reset_index(drop=True)
    docs = spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA)
    sup = run_training_ner(docs).selectExpr(
        "doc_id", "seq", "tok_idx", "label as gold", f"{_PERTURB} as pred"
    )
    return evaluate_labels(sup).orderBy("level", "label")


def _oracle_eval() -> str:
    from .fixture_oracle import _training_ner_oracle_sql

    perturb = _PERTURB
    return f"""
WITH gold_rows AS ({_training_ner_oracle_sql()}),
sup AS (
  SELECT doc_id, seq, tok_idx, label AS gold, {perturb} AS pred
  FROM gold_rows
),
tok_g AS (
  SELECT gold AS label, COUNT(*) AS n_gold,
         SUM(CASE WHEN gold = pred THEN 1 ELSE 0 END) AS tp
  FROM sup GROUP BY gold
),
tok_p AS (SELECT pred AS label, COUNT(*) AS n_pred FROM sup GROUP BY pred),
tok_counts AS (
  SELECT COALESCE(g.label, p.label) AS label,
         COALESCE(n_gold, 0) AS n_gold, COALESCE(n_pred, 0) AS n_pred,
         COALESCE(tp, 0) AS tp
  FROM tok_g g FULL OUTER JOIN tok_p p ON g.label = p.label
),
tok_all AS (
  SELECT * FROM tok_counts
  UNION ALL
  SELECT '__micro__', COALESCE(SUM(n_gold), 0), COALESCE(SUM(n_pred), 0),
         COALESCE(SUM(tp), 0)
  FROM tok_counts WHERE label <> '{OTHER}'
),
runs_g AS (
  SELECT doc_id, seq, gold AS label,
         SUM(CASE WHEN prev_lab IS DISTINCT FROM gold
                    OR prev_idx IS DISTINCT FROM tok_idx - 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id, seq ORDER BY tok_idx
                 ROWS UNBOUNDED PRECEDING) AS run_id,
         tok_idx
  FROM (SELECT doc_id, seq, tok_idx, gold,
               LAG(gold) OVER w AS prev_lab, LAG(tok_idx) OVER w AS prev_idx
        FROM sup WINDOW w AS (PARTITION BY doc_id, seq ORDER BY tok_idx))
),
fields_g AS (
  SELECT doc_id, seq, label, MIN(tok_idx) AS start, MAX(tok_idx) AS "end"
  FROM runs_g GROUP BY doc_id, seq, label, run_id
  HAVING label <> '{OTHER}'
),
runs_p AS (
  SELECT doc_id, seq, pred AS label,
         SUM(CASE WHEN prev_lab IS DISTINCT FROM pred
                    OR prev_idx IS DISTINCT FROM tok_idx - 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id, seq ORDER BY tok_idx
                 ROWS UNBOUNDED PRECEDING) AS run_id,
         tok_idx
  FROM (SELECT doc_id, seq, tok_idx, pred,
               LAG(pred) OVER w AS prev_lab, LAG(tok_idx) OVER w AS prev_idx
        FROM sup WINDOW w AS (PARTITION BY doc_id, seq ORDER BY tok_idx))
),
fields_p AS (
  SELECT doc_id, seq, label, MIN(tok_idx) AS start, MAX(tok_idx) AS "end"
  FROM runs_p GROUP BY doc_id, seq, label, run_id
  HAVING label <> '{OTHER}'
),
fld_g AS (SELECT label, COUNT(*) AS n_gold FROM fields_g GROUP BY label),
fld_p AS (SELECT label, COUNT(*) AS n_pred FROM fields_p GROUP BY label),
fld_t AS (
  SELECT g.label, COUNT(*) AS tp
  FROM fields_g g JOIN fields_p p
    ON g.doc_id = p.doc_id AND g.seq = p.seq AND g.label = p.label
   AND g.start = p.start AND g."end" = p."end"
  GROUP BY g.label
),
fld_counts AS (
  SELECT COALESCE(g.label, p.label) AS label,
         COALESCE(n_gold, 0) AS n_gold, COALESCE(n_pred, 0) AS n_pred,
         COALESCE(tp, 0) AS tp
  FROM fld_g g
  FULL OUTER JOIN fld_p p ON g.label = p.label
  LEFT JOIN fld_t t ON COALESCE(g.label, p.label) = t.label
),
fld_all AS (
  SELECT * FROM fld_counts
  UNION ALL
  SELECT '__micro__', COALESCE(SUM(n_gold), 0), COALESCE(SUM(n_pred), 0),
         COALESCE(SUM(tp), 0)
  FROM fld_counts
),
combined AS (
  SELECT 'token' AS level, * FROM tok_all
  UNION ALL
  SELECT 'field' AS level, * FROM fld_all
)
SELECT level, label,
  CAST(n_gold AS BIGINT) AS n_gold, CAST(n_pred AS BIGINT) AS n_pred,
  CAST(tp AS BIGINT) AS tp,
  CAST(n_pred - tp AS BIGINT) AS fp,
  CAST(n_gold - tp AS BIGINT) AS fn,
  CAST(CASE WHEN n_pred = 0 THEN 0 ELSE 1000 * tp // n_pred END AS BIGINT)
    AS precision_milli,
  CAST(CASE WHEN n_gold = 0 THEN 0 ELSE 1000 * tp // n_gold END AS BIGINT)
    AS recall_milli,
  CAST(CASE WHEN n_gold + n_pred = 0 THEN 0
            ELSE 2000 * tp // (n_gold + n_pred) END AS BIGINT) AS f1_milli
FROM combined ORDER BY level, label
"""


# ---------------------------------------------------------------------------
# n-fold evaluation (reference eval modes 2-split / 3-n-fold,
# MedicalReportTrainerRunner.java:134-143): per-fold micro P/R/F1 so a
# refit run sees metric VARIANCE across held-out folds, not one number.
# Mode 2 (90/10 split eval) is the n_folds=10, single-fold reading of the
# same table. The fold key must hash identically in Spark and DuckDB, so
# it is ascii(first hex char of md5(doc_id)) mod n — both engines expose
# md5() and ascii().
# ---------------------------------------------------------------------------


def _fold_expr(n_folds: int) -> str:
    return f"ascii(substring(md5(doc_id), 1, 1)) % {n_folds}"


def nfold_micro(df: DataFrame, n_folds: int = 3) -> DataFrame:
    """Per-fold micro token- and field-level metrics over a (doc_id, seq,
    tok_idx, gold, pred) table. Token level is ONE aggregation (three
    conditional sums grouped by fold); field level reuses label_runs with
    the doc-level fold carried through the runs."""
    d = df.selectExpr("*", f"{_fold_expr(n_folds)} as fold")
    tok = (
        d.groupBy("fold")
        .agg(
            F.sum((F.col("gold") != OTHER).cast("long")).alias("n_gold"),
            F.sum((F.col("pred") != OTHER).cast("long")).alias("n_pred"),
            F.sum(
                (
                    (F.col("gold") == F.col("pred"))
                    & (F.col("gold") != OTHER)
                ).cast("long")
            ).alias("tp"),
        )
        .selectExpr("'token' as level", "fold", *_METRIC_COLS.split(","))
    )
    gf = label_runs(d.select("doc_id", "seq", "tok_idx", "gold"), "gold")
    pf = label_runs(d.select("doc_id", "seq", "tok_idx", "pred"), "pred")
    tpj = (
        gf.join(pf, ["doc_id", "seq", "label", "start", "end"])
        .selectExpr(f"{_fold_expr(n_folds)} as fold")
        .groupBy("fold")
        .agg(F.count("*").alias("tp"))
    )
    gc = (
        gf.selectExpr(f"{_fold_expr(n_folds)} as fold")
        .groupBy("fold")
        .agg(F.count("*").alias("n_gold"))
    )
    pc = (
        pf.selectExpr(f"{_fold_expr(n_folds)} as fold")
        .groupBy("fold")
        .agg(F.count("*").alias("n_pred"))
    )
    fld = (
        gc.join(pc, "fold", "full_outer")
        .join(tpj, "fold", "full_outer")
        .selectExpr(
            "fold",
            "coalesce(n_gold, 0L) as n_gold",
            "coalesce(n_pred, 0L) as n_pred",
            "coalesce(tp, 0L) as tp",
        )
        .selectExpr("'field' as level", "fold", *_METRIC_COLS.split(","))
    )
    return tok.unionByName(fld)


def q_eval_nfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import datagen
    from .pipeline import run_training_ner
    from .schema import DOCUMENTS_SCHEMA

    pdf = datagen.fixture_documents_pdf()
    keep = sorted(datagen.FX_NER_TRAINING)
    pdf = pdf[pdf.doc_id.isin(keep)].reset_index(drop=True)
    docs = spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA)
    sup = run_training_ner(docs).selectExpr(
        "doc_id", "seq", "tok_idx", "label as gold", f"{_PERTURB} as pred"
    )
    return nfold_micro(sup, n_folds=3).orderBy("level", "fold")


def _oracle_nfold() -> str:
    from .fixture_oracle import _training_ner_oracle_sql

    fold = _fold_expr(3)
    runs_tpl = """
  SELECT doc_id, seq, {col} AS label,
         SUM(CASE WHEN prev_lab IS DISTINCT FROM {col}
                    OR prev_idx IS DISTINCT FROM tok_idx - 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id, seq ORDER BY tok_idx
                 ROWS UNBOUNDED PRECEDING) AS run_id,
         tok_idx
  FROM (SELECT doc_id, seq, tok_idx, {col},
               LAG({col}) OVER w AS prev_lab, LAG(tok_idx) OVER w AS prev_idx
        FROM sup WINDOW w AS (PARTITION BY doc_id, seq ORDER BY tok_idx))
"""
    fields_tpl = """
  SELECT doc_id, seq, label, MIN(tok_idx) AS start, MAX(tok_idx) AS "end"
  FROM {src} GROUP BY doc_id, seq, label, run_id HAVING label <> 'other'
"""
    metric = """
  CAST(n_gold AS BIGINT) AS n_gold, CAST(n_pred AS BIGINT) AS n_pred,
  CAST(tp AS BIGINT) AS tp,
  CAST(n_pred - tp AS BIGINT) AS fp, CAST(n_gold - tp AS BIGINT) AS fn,
  CAST(CASE WHEN n_pred = 0 THEN 0 ELSE 1000 * tp // n_pred END AS BIGINT)
    AS precision_milli,
  CAST(CASE WHEN n_gold = 0 THEN 0 ELSE 1000 * tp // n_gold END AS BIGINT)
    AS recall_milli,
  CAST(CASE WHEN n_gold + n_pred = 0 THEN 0
            ELSE 2000 * tp // (n_gold + n_pred) END AS BIGINT) AS f1_milli
"""
    return f"""
WITH gold_rows AS ({_training_ner_oracle_sql()}),
sup AS (
  SELECT doc_id, seq, tok_idx, label AS gold, {_PERTURB} AS pred
  FROM gold_rows
),
tok AS (
  SELECT {fold} AS fold,
         SUM(CASE WHEN gold <> 'other' THEN 1 ELSE 0 END) AS n_gold,
         SUM(CASE WHEN pred <> 'other' THEN 1 ELSE 0 END) AS n_pred,
         SUM(CASE WHEN gold = pred AND gold <> 'other' THEN 1 ELSE 0 END)
           AS tp
  FROM sup GROUP BY 1
),
runs_g AS ({runs_tpl.format(col="gold")}),
runs_p AS ({runs_tpl.format(col="pred")}),
fields_g AS ({fields_tpl.format(src="runs_g")}),
fields_p AS ({fields_tpl.format(src="runs_p")}),
fld_t AS (
  SELECT {fold} AS fold, COUNT(*) AS tp FROM (
    SELECT g.doc_id FROM fields_g g JOIN fields_p p
      ON g.doc_id = p.doc_id AND g.seq = p.seq AND g.label = p.label
     AND g.start = p.start AND g."end" = p."end") GROUP BY 1
),
fld_g AS (SELECT {fold} AS fold, COUNT(*) AS n_gold FROM fields_g GROUP BY 1),
fld_p AS (SELECT {fold} AS fold, COUNT(*) AS n_pred FROM fields_p GROUP BY 1),
fld AS (
  SELECT COALESCE(g.fold, p.fold, t.fold) AS fold,
         COALESCE(n_gold, 0) AS n_gold, COALESCE(n_pred, 0) AS n_pred,
         COALESCE(tp, 0) AS tp
  FROM fld_g g
  FULL OUTER JOIN fld_p p ON g.fold = p.fold
  FULL OUTER JOIN fld_t t ON COALESCE(g.fold, p.fold) = t.fold
),
combined AS (
  SELECT 'token' AS level, fold, n_gold, n_pred, tp FROM tok
  UNION ALL
  SELECT 'field' AS level, fold, n_gold, n_pred, tp FROM fld
)
SELECT level, CAST(fold AS INT) AS fold, {metric}
FROM combined ORDER BY level, fold
"""


# ---------------------------------------------------------------------------
# Token-level confusion matrix: WHICH label a wrong token became, the
# error-analysis companion to the P/R/F1 report (the reference's eval
# output per `doc/Training-the-medical-report-models.md:78-99` reports
# per-label metrics; the confusion pairs are what a refit loop reads to
# decide which label boundaries to fix first). Output is O(|labels|²):
# one pair-keyed aggregation plus a broadcast-sized per-gold-total join.
# ---------------------------------------------------------------------------


def confusion_matrix(
    df: DataFrame, gold: str = "gold", pred: str = "pred"
) -> DataFrame:
    """(…, gold, pred) token table → (gold, pred, n, row_milli) pairs.

    row_milli = 1000·n div (total tokens with this gold label) — integer
    arithmetic end-to-end so the DuckDB oracle hashes identically. Every
    observed (gold, pred) pair is emitted, including the correct diagonal
    (its row_milli is the per-label token recall in milli)."""
    pairs = (
        df.groupBy(F.col(gold).alias("gold"), F.col(pred).alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("gold").agg(F.sum("n").alias("gold_total"))
    return (
        pairs.join(F.broadcast(totals), "gold")
        .selectExpr("gold", "pred", "n", "1000 * n div gold_total as row_milli")
    )


def q_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import datagen
    from .pipeline import run_training_ner
    from .schema import DOCUMENTS_SCHEMA

    pdf = datagen.fixture_documents_pdf()
    keep = sorted(datagen.FX_NER_TRAINING)
    pdf = pdf[pdf.doc_id.isin(keep)].reset_index(drop=True)
    docs = spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA)
    sup = run_training_ner(docs).selectExpr(
        "doc_id", "seq", "tok_idx", "label as gold", f"{_PERTURB} as pred"
    )
    return confusion_matrix(sup).orderBy("gold", "pred")


def _oracle_confusion() -> str:
    from .fixture_oracle import _training_ner_oracle_sql

    return f"""
WITH gold_rows AS ({_training_ner_oracle_sql()}),
sup AS (
  SELECT label AS gold, {_PERTURB} AS pred FROM gold_rows
),
pairs AS (SELECT gold, pred, COUNT(*) AS n FROM sup GROUP BY gold, pred),
totals AS (SELECT gold, SUM(n) AS gold_total FROM pairs GROUP BY gold)
SELECT p.gold, p.pred, CAST(n AS BIGINT) AS n,
       CAST(1000 * n // gold_total AS BIGINT) AS row_milli
FROM pairs p JOIN totals t ON p.gold = t.gold
ORDER BY p.gold, p.pred
"""


OPS = {
    "eval_labels": q_eval_labels,
    "eval_nfold": q_eval_nfold,
    "eval_confusion": q_eval_confusion,
}
ORACLES = {
    "eval_labels": _oracle_eval(),
    "eval_nfold": _oracle_nfold(),
    "eval_confusion": _oracle_confusion(),
}
