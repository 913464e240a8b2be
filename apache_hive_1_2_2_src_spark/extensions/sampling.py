"""Sampling & sequence-packing operators for training-data pipelines
(SURVEY.md §2.11 — BASELINE.json mandate; no reference analogue).

Two mix-construction stages every large-scale pretraining corpus build runs
after curation:

- **Stratified (per-source) sampling** — re-weight a heterogeneous corpus by
  giving each source its own keep-rate and sampling DETERMINISTICALLY
  (``doc_id % 100 < rate``), so the mix is reproducible run-over-run and
  cheap (a per-row filter, no shuffle). At 100 TB the same predicate pushes
  down to the scan; the only aggregate is the per-source audit row.
- **Sequence packing** — assign curated docs to fixed-budget context-window
  bins (first-fit in deterministic doc_id order per language): bin_id =
  floor(running-token-count-before / budget). One window shuffle keyed by
  ``lang``; the 100 TB variant packs per (lang, shard) so every shard packs
  independently — same two-line change the docstring of each op notes.

Both ops are pure built-in DataFrame code (window + filter + agg — no UDFs)
and fully DuckDB-oracled: integer token counts, integer bin math, exact
deterministic membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table

_SQL_WORDS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _words(col: str = "text") -> Column:
    return F.filter(F.split(F.col(col), " "), lambda x: x != "")


@register(
    "sample_stratified_by_source",
    oracle="""
    WITH rated AS (
      SELECT doc_id, source,
             20 * (CAST(regexp_extract(source, '[0-9]+$') AS INTEGER) % 4 + 1)
               AS rate_pct
      FROM documents
    )
    SELECT source,
           MIN(rate_pct) AS rate_pct,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE doc_id % 100 < rate_pct) AS n_kept
    FROM rated
    GROUP BY source
    """,
    doc="Stratified per-source sampling for training-mix construction: each "
    "source gets a deterministic keep-rate (here derived from its numeric "
    "suffix: 20/40/60/80%), membership is `doc_id % 100 < rate` — exactly "
    "reproducible, no RNG, no shuffle (the filter is a per-row map that "
    "pushes to the scan); the returned per-source audit row (total vs "
    "kept) is the only aggregate. The 100 TB form is identical; swap the "
    "rate CASE for a broadcast-joined mixing-weights dim table.",
    tags=("extension", "sampling"),
)
def sample_stratified_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rate = 20 * (
        F.regexp_extract("source", r"[0-9]+$", 0).cast("int") % 4 + 1
    )
    rated = d.withColumn("rate_pct", rate)
    return rated.groupBy("source").agg(
        F.min("rate_pct").alias("rate_pct"),
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("doc_id") % 100 < F.col("rate_pct"), 1)).alias("n_kept"),
    )


@register(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, len({_SQL_WORDS}) AS n_tok FROM documents
    ),
    c AS (
      SELECT lang, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM d
    )
    SELECT lang,
           CAST(cum_before // 2048 AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM c
    GROUP BY lang, bin_id
    """,
    doc="Sequence packing for context-window construction: docs are packed "
    "per language in deterministic doc_id order into 2048-token bins — "
    "bin_id = floor(tokens-before-this-doc / 2048), the streaming first-"
    "fit approximation (a doc can straddle its bin boundary; real packers "
    "truncate/pad, which is a per-row map on top of this assignment). One "
    "window shuffle keyed by lang; at 100 TB pack per (lang, shard) so "
    "shards pack independently. Output: per-bin audit (doc count + token "
    "sum) — all integer math, bit-identical across engines.",
    tags=("extension", "sampling", "packing"),
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(_words()).alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return (
        c.withColumn("bin_id", F.floor(F.col("cum_before") / 2048).cast("bigint"))
        .groupBy("lang", "bin_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("bin_tokens"))
    )
