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


@register(
    "sample_temperature_mix",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    s AS (
      SELECT lang, n_docs,
             CAST(FLOOR(SQRT(n_docs * 1000000.0)) AS BIGINT) AS w_scaled
      FROM c
    )
    SELECT lang, n_docs,
           CAST(ROUND(n_docs * 1.0 / SUM(n_docs) OVER (), 6) AS DOUBLE)
             AS raw_share,
           w_scaled,
           CAST(ROUND(w_scaled * 1.0 / SUM(w_scaled) OVER (), 6) AS DOUBLE)
             AS temp_share
    FROM s
    """,
    doc="Temperature-based language rebalancing (the multilingual-pretraining "
    "mix rule: sample language l with probability ∝ n_l^α, α=0.5): per-lang "
    "doc counts → sqrt-temperature weights → normalized shares, so "
    "low-resource languages are up-sampled. Determinism: SQRT is "
    "IEEE-exact-rounded (bit-identical cross-engine), and the weight is "
    "floored to a scaled BIGINT before normalization, so every share is a "
    "single division of exact integers. The groupBy shuffles |langs| rows; "
    "the unpartitioned share window runs over those few rows only — at "
    "100 TB this stays a metadata-sized result driving a broadcast-joined "
    "per-row sampling predicate (see sample_stratified_by_source).",
    tags=("extension", "sampling"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    s = c.withColumn(
        "w_scaled",
        F.floor(F.sqrt(F.col("n_docs") * 1000000.0)).cast("bigint"),
    )
    w = Window.partitionBy()
    return s.select(
        "lang",
        "n_docs",
        F.round(F.col("n_docs") * 1.0 / F.sum("n_docs").over(w), 6).alias("raw_share"),
        "w_scaled",
        F.round(F.col("w_scaled") * 1.0 / F.sum("w_scaled").over(w), 6).alias(
            "temp_share"
        ),
    )


@register(
    "sample_reservoir_per_source",
    oracle="""
    SELECT source, doc_id, rk FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY md5(text), doc_id) AS rk
      FROM documents
    ) WHERE rk <= 5
    """,
    doc="Deterministic fixed-size per-stratum sample (reservoir sampling "
    "without the reservoir): rank docs within each source by a content "
    "hash — md5 is uniform, so the 5 lowest-hash docs are a uniform "
    "5-sample, yet exactly reproducible run-over-run (no RNG, the "
    "registry's nondeterminism rule). One shuffle keyed by source; at "
    "100 TB a hot stratum is handled by the two-level form — per-partition "
    "top-5 (map-side sort-limit) then merge — which AQE's skew split "
    "approximates; the hash order also makes the sample STABLE under "
    "corpus append (a new doc evicts at most one row).",
    tags=("extension", "sampling"),
)
def sample_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5("text"), F.col("doc_id"))
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


@register(
    "pipeline_shard_assign",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang, md5(text) AS hx,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang, n_tok,
             ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
              + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) % 32
               AS shard_id
      FROM h
    )
    SELECT shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM s GROUP BY shard_id
    """,
    doc="Content-hash shard assignment for training-data output (the step "
    "that writes the final webdataset/tfrecord shards): shard = first byte "
    "of md5(text) mod 32, computed portably via hex-digit position math "
    "(md5 hex is identical cross-engine; no engine-specific hash()). The "
    "returned audit — per-shard doc count, token sum, language spread, id "
    "range — is what a pipeline asserts on before publishing: hash "
    "uniformity bounds shard imbalance regardless of corpus order or skew "
    "(unlike doc_id range sharding). Per-row map + one groupBy(shard_id) "
    "of 32 groups; at 100 TB the same column feeds "
    "df.write.partitionBy('shard_id') so assignment and layout share one "
    "shuffle.",
    tags=("extension", "pipeline", "sampling"),
)
def pipeline_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5("text")
    # Spark spells hex→int as conv(,16,10); the oracle uses hex-digit
    # position math — different expressions, same value by construction.
    shard = F.conv(F.substring(hx, 1, 2), 16, 10).cast("int") % 32
    s = d.select(
        "doc_id",
        "lang",
        F.size(_words()).alias("n_tok"),
        shard.alias("shard_id"),
    )
    return s.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("shard_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "sample_split_train_val",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
             CASE WHEN ((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) < 243
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    ),
    leak AS (
      SELECT COUNT(*) AS n_shared_texts FROM (
        SELECT DISTINCT t.hx FROM
          (SELECT DISTINCT md5(text) AS hx FROM s WHERE split = 'train') t
          JOIN (SELECT DISTINCT md5(text) AS hx FROM s WHERE split = 'val') v
          ON t.hx = v.hx
      )
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(n_shared_texts AS BIGINT) AS n_shared_texts
    FROM s, leak
    GROUP BY split, n_shared_texts
    """,
    doc="Deterministic train/validation split + leakage audit (the step "
    "before any eval set is trusted): split = first md5(text) byte < 243 "
    "(~95/5), computed portably via hex-digit position math so Spark and "
    "the oracle agree byte-for-byte; content-hash splitting (not doc_id) "
    "means exact duplicate texts land in the SAME split by construction — "
    "and the audit PROVES it by counting distinct texts present in both "
    "splits (must be 0). Per-row map + one groupBy + one dedup-join on the "
    "32-char hash; at 100 TB the leak join is keyed by md5, no skew.",
    tags=("extension", "sampling", "split"),
)
def sample_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5("text")
    byte0 = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(hx, 1, 1)) - 1) * 16
        + F.instr(F.lit("0123456789abcdef"), F.substring(hx, 2, 1))
        - 1
    )
    s = d.select(
        "doc_id",
        F.md5("text").alias("hx"),
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n_tok"),
        F.when(byte0 < 243, "train").otherwise("val").alias("split"),
    )
    train_hx = s.filter(F.col("split") == "train").select("hx").distinct()
    val_hx = s.filter(F.col("split") == "val").select("hx").distinct()
    leak = (
        train_hx.join(val_hx, "hx")
        .agg(F.count(F.lit(1)).alias("n_shared_texts"))
    )
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "n_docs", "n_tokens", "n_shared_texts")
    )


@register(
    "sample_token_budget",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, n_chars, len({_SQL_WORDS}) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d
    ),
    sel AS (SELECT * FROM c WHERE cum <= 200)
    SELECT source,
           COUNT(*) AS n_selected,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_selected,
           MAX(cum) <= 200 AS within_budget
    FROM sel
    GROUP BY source
    """,
    doc="Token-budget corpus selection (beyond-reference): fill a fixed "
    "per-source token budget with the 'best' documents first — the mix-"
    "construction step that turns a curated corpus plus a sampling recipe "
    "('at most N tokens from each source, prefer longer docs') into the "
    "actual training set. Deterministic greedy prefix: docs rank by "
    "(n_chars DESC, doc_id) per source, a running-sum window computes the "
    "inclusive cumulative token count, and the prefix with cum <= budget "
    "is kept — pure window + filter, one shuffle keyed by source, no RNG. "
    "At 100 TB the quality proxy comes from the scored table and the "
    "window keys by (source, shard) so no single source serializes into "
    "one partition — same structure as pipeline_pack_sequences. Output is "
    "the per-source audit a pipeline asserts before shipping (doc count, "
    "tokens used, budget respected); integer math end to end.",
    tags=("extension", "sampling", "pipeline"),
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    budget = 200
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", F.size(_words()).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = d.withColumn("cum", F.sum("n_tok").over(w)).where(F.col("cum") <= budget)
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_tok").cast("long").alias("tokens_selected"),
        (F.max("cum") <= budget).alias("within_budget"),
    )


@register(
    "pipeline_corpus_diff",
    oracle="""
    WITH v1 AS (SELECT doc_id, text, source FROM documents),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text,
             source
      FROM documents WHERE doc_id % 13 <> 0
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text || ' new' AS text, source
      FROM documents WHERE doc_id % 17 = 0
    ),
    diff AS (
      SELECT COALESCE(v1.source, v2.source) AS source,
             CASE WHEN v1.doc_id IS NULL THEN 'added'
                  WHEN v2.doc_id IS NULL THEN 'removed'
                  WHEN v1.text <> v2.text THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    )
    SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM diff GROUP BY source, status
    """,
    doc="Corpus-version diff audit (beyond-reference; the CDC primitive "
    "behind dataset versioning — what changed between corpus v1 and v2 "
    "before retraining): FULL OUTER join on doc_id classifies every doc "
    "added / removed / changed / unchanged, rolled up per source. v2 is "
    "derived deterministically from v1 in BOTH engines (drop %13, mutate "
    "%11, add %17 under shifted ids) so the diff logic itself is what the "
    "oracle certifies. One key-partitioned full-outer join + partial-agg "
    "rollup: at 100 TB compare xxhash64(text) instead of text (8-byte "
    "compare, same classification) and the join co-partitions on the id — "
    "no broadcast, no skew (ids are unique).",
    tags=("extension", "pipeline", "versioning"),
)
def pipeline_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    v1 = d
    v2 = d.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.concat("text", F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
    ).unionAll(
        d.where(F.col("doc_id") % 17 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat("text", F.lit(" new")).alias("text"),
            "source",
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    diff = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer").select(
        F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.text") != F.col("b.text"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return diff.groupBy("source", "status").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@register(
    "sample_kfold_assign",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text,
             len({_SQL_WORDS}) AS n_tok,
             ((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
              + strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) % 5
               AS fold_id
      FROM documents
    ),
    leak AS (
      SELECT COUNT(*) AS n_multi_fold_texts FROM (
        SELECT md5(text) AS hx
        FROM s GROUP BY md5(text)
        HAVING COUNT(DISTINCT fold_id) > 1
      )
    )
    SELECT fold_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(n_multi_fold_texts AS BIGINT) AS n_multi_fold_texts
    FROM s, leak
    GROUP BY fold_id, n_multi_fold_texts
    """,
    doc="K-fold cross-validation assignment (beyond-reference; the eval-"
    "construction sibling of sample_split_train_val): fold_id = first "
    "md5(text) byte mod 5 via the same portable hex-digit math, so folds "
    "are content-keyed — exact duplicates land in the SAME fold by "
    "construction (no train/test leakage through dups), stable under "
    "re-runs and corpus growth, and the audit PROVES the property by "
    "counting texts assigned to more than one fold (must be 0). Per-row "
    "map + one groupBy; at 100 TB the only wide op is the audit's "
    "group-by-hash, keyed by md5 — uniform, no skew.",
    tags=("extension", "sampling", "split"),
)
def sample_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    hexpos = lambda i: (  # noqa: E731
        F.instr(F.lit("0123456789abcdef"), F.substring(F.md5("text"), i, 1)) - 1
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.size(_words()).alias("n_tok"),
        ((hexpos(1) * 16 + hexpos(2)) % 5).alias("fold_id"),
    )
    leak = (
        d.groupBy(F.md5("text").alias("hx"))
        .agg(F.countDistinct("fold_id").alias("nf"))
        .where(F.col("nf") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_multi_fold_texts"))
    )
    return (
        d.groupBy("fold_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(leak))
    )


@register(
    "sample_mixture_allocate",
    oracle="""
    WITH t AS (
      SELECT source,
             COUNT(*) AS n_docs,
             SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
               AS n_tokens
      FROM documents GROUP BY source
    ),
    a AS (
      SELECT source, n_docs, n_tokens,
             CAST(FLOOR(200000 * n_tokens / SUM(n_tokens) OVER ()) AS BIGINT)
               AS alloc_prop
      FROM t
    ),
    c AS (
      SELECT *,
             alloc_prop > 60000 AS capped,
             LEAST(alloc_prop, 60000) AS alloc_capped
      FROM a
    ),
    r AS (
      SELECT *,
             200000 - SUM(alloc_capped) OVER () AS leftover,
             SUM(CASE WHEN NOT capped THEN n_tokens ELSE 0 END) OVER ()
               AS uncapped_tokens
      FROM c
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           alloc_prop,
           capped,
           CAST(alloc_capped + CASE WHEN capped OR uncapped_tokens = 0 THEN 0
                ELSE FLOOR(leftover * n_tokens / uncapped_tokens) END
                AS BIGINT) AS alloc_final
    FROM r
    """,
    doc="Training-mixture token allocation with a per-domain cap + one "
    "redistribution round (the Pile/DoReMi-style mixing rule: no domain "
    "may exceed 30% of the 200k-token budget; the excess re-flows to "
    "uncapped domains in proportion to their size): per-source token "
    "totals -> proportional floor allocation -> cap at 60k -> leftover "
    "redistributed over uncapped sources. ALL-INTEGER arithmetic (floor "
    "divisions of exact BIGINT sums), so the allocation is bit-identical "
    "cross-engine and run-over-run — no float shares anywhere. One "
    "groupBy shuffle over |sources| keys; the window passes run on the "
    "metadata-sized source table, exactly like sample_temperature_mix. "
    "At 100 TB this result drives the per-row broadcast sampling "
    "predicate; the allocation itself never touches the corpus again.",
    tags=("extension", "sampling", "mixture"),
)
def sample_mixture_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    budget, cap = 200000, 60000
    t = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.size(_words()).alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    a = t.withColumn(
        "alloc_prop",
        F.floor(F.lit(budget) * F.col("n_tokens") / F.sum("n_tokens").over(w)).cast(
            "long"
        ),
    )
    c = a.withColumn("capped", F.col("alloc_prop") > cap).withColumn(
        "alloc_capped", F.least(F.col("alloc_prop"), F.lit(cap))
    )
    r = c.withColumn(
        "leftover", F.lit(budget) - F.sum("alloc_capped").over(w)
    ).withColumn(
        "uncapped_tokens",
        F.sum(F.when(~F.col("capped"), F.col("n_tokens")).otherwise(0)).over(w),
    )
    return r.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "alloc_prop",
        "capped",
        (
            F.col("alloc_capped")
            + F.when(
                F.col("capped") | (F.col("uncapped_tokens") == 0), F.lit(0)
            ).otherwise(
                F.floor(
                    F.col("leftover") * F.col("n_tokens") / F.col("uncapped_tokens")
                )
            )
        )
        .cast("long")
        .alias("alloc_final"),
    )


@register(
    "pipeline_publish_shards",
    # The manifest is computed from the RE-READ published directory, so the
    # oracle (which recomputes from the source table) certifies the entire
    # publish loop: gate -> shard -> partitioned write -> read-back. Any
    # row lost or duplicated by the write path breaks the hash.
    oracle="""
    WITH kept AS (
      SELECT doc_id, lang, text, n_chars FROM documents
      WHERE n_chars >= 120 AND lang IS NOT NULL
    ),
    s AS (
      SELECT doc_id, lang, n_chars,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
             ((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
              + strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) % 8
               AS shard_id
      FROM kept
    )
    SELECT CAST(shard_id AS INT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM s GROUP BY shard_id
    """,
    doc="Publish capstone — the last step of the training-data pipeline: "
    "quality-gate the corpus (n_chars >= 120, lang present), assign "
    "content-hash shards (md5 first byte mod 8, the pipeline_shard_assign "
    "math), WRITE the dataset partitionBy(shard_id) parquet, RE-READ the "
    "published directory, and emit the release manifest (per-shard doc/"
    "token/char counts, language spread, id range) from the re-read data. "
    "Because the manifest derives from what was actually published — not "
    "from the pre-write DataFrame — the oracle certifies the whole loop: "
    "a row dropped by the writer, a shard routed wrong, or a partition "
    "column mangled on read-back all break the value hash. At 100 TB this "
    "is one shuffle (the partitionBy exchange); the manifest aggregation "
    "reads footer-pruned columns only, and consumers open shard "
    "directories directly (partition pruning on shard_id).",
    tags=("extension", "pipeline", "sampling", "sink"),
)
def pipeline_publish_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache_hive_1_2_2_src_spark.sources.io import _tmp

    d = load_table(spark, sf_dir, "documents")
    kept = d.filter((F.col("n_chars") >= 120) & F.col("lang").isNotNull())
    shard = F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("int") % 8
    staged = kept.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(_words()).alias("n_tok"),
        shard.alias("shard_id"),
    )
    out = _tmp("published_shards")
    # repartition by the partition column first: without it every task can
    # open up to 8 writers (small-files explosion at scale — the
    # maxRecordsPerFile / AQE coalesce territory); with it, one writer per
    # shard directory.
    staged.repartition(8, "shard_id").write.mode("overwrite").partitionBy(
        "shard_id"
    ).parquet(out)
    published = spark.read.parquet(out)
    return published.groupBy(F.col("shard_id").cast("int").alias("shard_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


_DSIR_B = 512
_DSIR_K = 100
_DSIR_SCALE = 100_000
_DSIR_TARGET = ("src0", "src1")


def _det_ln_floor_sql(num: str, den: str, scale: int) -> str:
    """``floor(scale·ln(num/den))`` for positive BIGINT ``num``/``den`` as
    dialect-neutral SQL using ONLY IEEE-754 +,-,*,/ (each correctly
    rounded and therefore bit-identical in Spark's codegen and DuckDB's
    kernels) plus exact integer ops — never libm's ``ln``, whose JVM and
    libm implementations may differ by 1 ulp and flip the FLOOR when the
    scaled value lands on an integer boundary (ADVICE r12; flaky,
    data-dependent). Recipe: exact power-of-two range reduction
    (``e = floor(log2(q))`` from the bit length of ``floor(q)`` via
    ``bin()``, identical in both dialects; division by ``2^e`` is exact
    scaling), then the atanh series ``ln m = 2z(1 + z²/3 + …)`` with
    ``z=(m-1)/(m+1) ≤ 1/3`` truncated after z¹¹ — truncation error
    <1e-7, far below the 1e-5 score resolution, and DETERMINISTIC: both
    engines evaluate the same literal operation tree, so the floored
    value cannot diverge. ``power(2.0, e)`` is exact (the result is
    representable, any faithful rounding returns it). Pinned bit-for-bit
    across engines over randomized counts in tests/test_sampling_ops.py.

    Standing assumption (ADVICE r13): bit-parity additionally requires
    that NEITHER engine contracts the polynomial into FMA or
    reassociates the FP operation tree — both evaluate the literal
    tree with one correctly-rounded op per node. True for this build
    (and pinned by the boundary-adversarial test in the default suite);
    a DuckDB/JVM build compiled with FMA contraction or fast-math-style
    reassociation could flip a floor on engineered integer-boundary
    ratios — if parity ever fails on a new platform, check that first."""
    q = (
        f"(CAST(greatest({num}, {den}) AS DOUBLE)"
        f" / CAST(least({num}, {den}) AS DOUBLE))"
    )
    e = f"(length(bin(CAST(FLOOR({q}) AS BIGINT))) - 1)"
    m = f"({q} / power(2.0, {e}))"
    z = f"(({m} - 1.0) / ({m} + 1.0))"
    zz = f"({z} * {z})"
    lnm = (
        f"(2.0 * {z} * (1.0 + {zz} * (0.3333333333333333 + {zz} * (0.2 + {zz}"
        f" * (0.14285714285714285 + {zz} * (0.1111111111111111 + {zz}"
        f" * 0.09090909090909091))))))"
    )
    sgn = f"(CASE WHEN {num} >= {den} THEN 1.0 ELSE -1.0 END)"
    v = f"({sgn} * ({e} * 0.6931471805599453 + {lnm}))"
    return f"CAST(FLOOR({scale}.0 * {v}) AS BIGINT)"


@register(
    "sample_dsir_importance",
    # Full replay: the DuckDB side recomputes the hashed-feature models
    # (Java String.hashCode fold — the same list_reduce replica the
    # bucketing oracles use), the integerized per-bucket log-ratio, and
    # the top-k selection. One flipped bucket count, one mis-hashed
    # word, or one boundary doc swapped shifts the integer checksums.
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    dw AS (SELECT DISTINCT w FROM w),
    hb AS (
      SELECT w,
             CAST((CASE WHEN length(w) = 0 THEN 0
                   ELSE list_reduce(
                     list_prepend(CAST(0 AS BIGINT), list_transform(
                       range(1, length(w) + 1),
                       i -> CAST(ord(substr(w, i, 1)) AS BIGINT))),
                     (a, b) -> (a * 31 + b) % 4294967296)
                   END % 2147483648) % {_DSIR_B} AS INT) AS b
      FROM dw
    ),
    wb AS (SELECT doc_id, source, b FROM w JOIN hb USING (w)),
    t AS (SELECT b, COUNT(*) AS t FROM wb
          WHERE source IN {_DSIR_TARGET} GROUP BY b),
    r AS (SELECT b, COUNT(*) AS r FROM wb
          WHERE source NOT IN {_DSIR_TARGET} GROUP BY b),
    tot AS (SELECT
      (SELECT COUNT(*) FROM wb WHERE source IN {_DSIR_TARGET}) AS tn,
      (SELECT COUNT(*) FROM wb WHERE source NOT IN {_DSIR_TARGET}) AS rn),
    nd AS (
      SELECT gs.b,
             CAST((COALESCE(t.t, 0) + 1) * (tot.rn + {_DSIR_B}) AS BIGINT)
               AS num,
             CAST((COALESCE(r.r, 0) + 1) * (tot.tn + {_DSIR_B}) AS BIGINT)
               AS den
      FROM (SELECT unnest(range(0, {_DSIR_B})) AS b) gs
      LEFT JOIN t ON t.b = gs.b LEFT JOIN r ON r.b = gs.b CROSS JOIN tot
    ),
    score AS (
      SELECT b, {_det_ln_floor_sql("num", "den", _DSIR_SCALE)} AS lb FROM nd
    ),
    dwt AS (
      SELECT doc_id, SUM(lb) AS wgt
      FROM wb JOIN score ON score.b = wb.b
      WHERE source NOT IN {_DSIR_TARGET} GROUP BY doc_id
    ),
    sel AS (SELECT doc_id, wgt,
                   ROW_NUMBER() OVER (ORDER BY wgt DESC, doc_id) AS rk
            FROM dwt)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(wgt) AS BIGINT) AS weight_sum,
           CAST(SUM(doc_id) AS BIGINT) AS docid_sum,
           CAST(MIN(wgt) AS BIGINT) AS min_weight,
           CAST(MAX(wgt) AS BIGINT) AS max_weight
    FROM sel WHERE rk <= {_DSIR_K}
    """,
    doc="DSIR-style importance resampling (Xie et al. 2023, 'Data "
    "Selection for Language Models via Importance Resampling' — public "
    "paper; no reference analogue): fit hashed-unigram bag-of-words "
    "models for a TARGET domain (sources src0/src1) and the raw pool, "
    "weight every candidate doc by its per-token log-likelihood ratio, "
    "and keep the top-k most target-like. Determinism devices: features "
    "hash through the Java String.hashCode bucket (the engine's exact "
    "interop hash, replayed bucket-for-bucket in DuckDB) into 512 "
    "buckets, and the per-bucket add-1-smoothed log ratio ln(p_t/p_r) "
    "is integerized once per BUCKET (floor at 1e-5 resolution) through "
    "the libm-free shared-arithmetic ln of _det_ln_floor_sql — both "
    "engines evaluate the identical IEEE operation tree, so a 1-ulp "
    "JVM-vs-libm ln divergence can never flip the floor (ADVICE r12) — "
    "making doc weights integer sums, order-independent and "
    "hash-certifiable; "
    "selection is top-k by (weight, doc_id), the paper's Gumbel noise "
    "dropped for replayability. Scale: token->bucket is one codegen "
    "expression; the models are two B-row aggregates (broadcastable at "
    "any corpus size); weighting is one groupBy(doc_id) — no all-pairs "
    "stage anywhere.",
    tags=("extension", "sampling", "pipeline", "dsir"),
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from apache_hive_1_2_2_src_spark.extensions.dedup import _words
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import hive_bucket_id

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    is_target = F.col("source").isin(*_DSIR_TARGET)
    words = d.select(
        "doc_id", is_target.alias("tgt"), F.explode(_words()).alias("w")
    )
    wb = words.withColumn("b", hive_bucket_id("w", _DSIR_B, "string")).select(
        "doc_id", "tgt", "b"
    )
    tcnt = wb.where("tgt").groupBy("b").agg(F.count(F.lit(1)).alias("t"))
    rcnt = wb.where(~F.col("tgt")).groupBy("b").agg(F.count(F.lit(1)).alias("r"))
    tot = wb.agg(
        F.count(F.when(F.col("tgt"), 1)).alias("tn"),
        F.count(F.when(~F.col("tgt"), 1)).alias("rn"),
    )
    score = (
        spark.range(_DSIR_B)
        .select(F.col("id").cast("int").alias("b"))
        .join(tcnt, "b", "left")
        .join(rcnt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            ((F.coalesce("t", F.lit(0)) + 1) * (F.col("rn") + _DSIR_B))
            .cast("long")
            .alias("num"),
            ((F.coalesce("r", F.lit(0)) + 1) * (F.col("tn") + _DSIR_B))
            .cast("long")
            .alias("den"),
        )
        # the SAME 1-ulp-proof ln template the oracle runs (F.expr parses
        # the identical SQL text) — see _det_ln_floor_sql
        .select(
            "b", F.expr(_det_ln_floor_sql("num", "den", _DSIR_SCALE)).alias("lb")
        )
    )
    dwt = (
        wb.where(~F.col("tgt"))
        .join(F.broadcast(score), "b")
        .groupBy("doc_id")
        .agg(F.sum("lb").alias("wgt"))
    )
    w = Window.orderBy(F.col("wgt").desc(), F.col("doc_id"))
    sel = dwt.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= _DSIR_K)
    return sel.agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("wgt").cast("long").alias("weight_sum"),
        F.sum("doc_id").cast("long").alias("docid_sum"),
        F.min("wgt").cast("long").alias("min_weight"),
        F.max("wgt").cast("long").alias("max_weight"),
    )


def ntile_over_buckets(
    df: DataFrame,
    part_cols: list[str],
    bucket_col: str,
    order_cols: list,
    k: int,
    out_col: str = "tile",
) -> DataFrame:
    """Exact distributed NTILE(k) OVER (PARTITION BY part ORDER BY
    order_cols) with NO per-partition global window — the r14 scale-safe
    twin of the per-key-global-NTILE anti-pattern (VERDICT r13 item 1).

    Requires ``bucket_col`` to be an order-prefix: sorting a partition by
    (bucket, order_cols) must equal sorting it by order_cols alone (e.g.
    bucket = leading byte of the sort key, or a monotone quantization of
    it). Then: rows rank only inside (part, bucket); per-bucket counts
    aggregate to metadata size; cumulative bucket offsets come from a
    triangular self-join over that aggregate (no window at all); and the
    tile is computed ARITHMETICALLY from the exact 1-based global rank
    ``off + local_rank`` — the first n%k tiles hold n div k + 1 rows,
    the rest n div k, exactly NTILE's row distribution. Output is
    bit-identical to the single-task window form; the only corpus-sized
    shuffle keys on (part, bucket)."""
    from pyspark.sql.window import Window

    w_local = Window.partitionBy(*part_cols, bucket_col).orderBy(*order_cols)
    local = df.withColumn("_lr", F.row_number().over(w_local))
    # The counts frame is metadata-sized (|parts| x |buckets| rows) but its
    # LINEAGE is the full input; eager-checkpointing it means the offsets
    # self-join and the totals each read the materialized counts instead
    # of re-evaluating the (possibly expensive) input subtree — one input
    # evaluation for counts + one for the rank pass, instead of three.
    cnts = (
        df.groupBy(*part_cols, bucket_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    a, b = cnts.alias("a"), cnts.alias("b")
    cond = F.lit(True)
    for p in part_cols:
        cond = cond & (F.col(f"a.{p}") == F.col(f"b.{p}"))
    cond = cond & (F.col(f"b.{bucket_col}") < F.col(f"a.{bucket_col}"))
    offs = (
        a.join(b, cond, "left")
        .groupBy(
            *[F.col(f"a.{c}").alias(c) for c in [*part_cols, bucket_col]]
        )
        .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_off"))
    )
    tot = cnts.groupBy(*part_cols).agg(F.sum("_c").alias("_n"))
    ranked = local.join(
        F.broadcast(offs), [*part_cols, bucket_col]
    ).join(F.broadcast(tot), part_cols)
    tile = F.expr(
        f"CAST(CASE WHEN (_off + _lr) <= (_n % {k}) * (_n div {k} + 1) "
        f"THEN (_off + _lr - 1) div (_n div {k} + 1) "
        f"ELSE (_n % {k}) + (_off + _lr - 1 - (_n % {k}) * (_n div {k} + 1)) "
        f"div (_n div {k}) END + 1 AS INT)"
    )
    return ranked.withColumn(out_col, tile).drop("_lr", "_off", "_n")


_EPOCH_SHARDS = 8


@register(
    "pipeline_epoch_shuffle",
    # Full replay: both engines compute the identical md5-keyed
    # permutation per epoch, the identical NTILE shard split, and the
    # identical cross-epoch stayed-in-shard counts — a single doc
    # ordered differently in either engine shifts a shard boundary and
    # breaks docid_sum/n_stayed.
    oracle=f"""
    WITH ep AS (SELECT unnest([0, 1]) AS epoch),
    keyed AS (
      SELECT d.doc_id, ep.epoch,
             md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                 CAST(ep.epoch AS VARCHAR)) AS h
      FROM documents d CROSS JOIN ep
    ),
    sharded AS (
      SELECT doc_id, epoch,
             NTILE({_EPOCH_SHARDS}) OVER (PARTITION BY epoch
                                          ORDER BY h, doc_id) - 1
               AS shard_id
      FROM keyed
    ),
    moved AS (
      SELECT a.epoch, a.shard_id, a.doc_id,
             CASE WHEN a.epoch = 0 THEN 1
                  WHEN b.shard_id = a.shard_id THEN 1 ELSE 0 END AS stayed
      FROM sharded a
      LEFT JOIN sharded b ON b.doc_id = a.doc_id AND b.epoch = 0
    )
    SELECT CAST(epoch AS INT) AS epoch,
           CAST(shard_id AS INT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS docid_sum,
           CAST(SUM(stayed) AS BIGINT) AS n_stayed
    FROM moved GROUP BY epoch, shard_id
    """,
    doc="Deterministic per-epoch training-order shuffle — the step every "
    "pretraining run does between epochs (reshuffle the corpus so "
    "batches differ across epochs, but REPRODUCIBLY — restarting the "
    "run must regenerate the same order): each epoch permutes docs by "
    "md5(doc_id:epoch) (an RNG-free keyed permutation both engines "
    "compute byte-identically) and splits the order into 8 shards via "
    "NTILE. The audit reports per-(epoch, shard) membership checksums "
    "plus n_stayed — how many of a shard's docs sat in the same shard "
    "at epoch 0, certifying the epochs genuinely decorrelate (n_stayed "
    "≈ n_docs/8 for epoch 1) while staying replayable. Scale (r14, "
    "VERDICT r13 item 1a): the order-and-split is RANGE-PARTITIONED — "
    "the first md5 byte is a fixed 256-way range partitioner of the "
    "sort key (uniform by construction, no sampling nondeterminism), "
    "rows rank inside (epoch, bucket) only, bucket offsets come from a "
    "256-row-per-epoch metadata aggregate (triangular self-join, no "
    "window), and the NTILE shard is computed arithmetically from the "
    "exact global rank — identical output to a global NTILE with NO "
    "per-epoch single-task sort anywhere in the plan (plan-asserted: "
    "the executed plan's only Window partitions by (epoch, bkt)).",
    tags=("extension", "sampling", "pipeline"),
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    ep = spark.range(2).select(F.col("id").cast("int").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(ep)).select(
        "doc_id", "epoch",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"),
                F.col("epoch").cast("string"),
            )
        ).alias("h"),
    )
    # Global order by (h, doc_id) == order by (bkt, h, doc_id) since bkt
    # is a prefix of h — the order-prefix contract ntile_over_buckets
    # needs to reconstruct the exact global rank from per-bucket ranks.
    keyed = keyed.withColumn("bkt", F.substring("h", 1, 2))
    sharded = ntile_over_buckets(
        keyed, ["epoch"], "bkt", ["h", "doc_id"], _EPOCH_SHARDS
    ).select(
        "doc_id", "epoch", (F.col("tile") - 1).cast("int").alias("shard_id")
    )
    e0 = sharded.filter(F.col("epoch") == 0).select(
        "doc_id", F.col("shard_id").alias("shard0")
    )
    moved = sharded.join(e0, "doc_id", "left").select(
        "epoch", "shard_id", "doc_id",
        F.when(F.col("epoch") == 0, F.lit(1))
        .when(F.col("shard0") == F.col("shard_id"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("stayed"),
    )
    return moved.groupBy("epoch", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("long").alias("docid_sum"),
        F.sum("stayed").cast("long").alias("n_stayed"),
    )


_CURR_BANDS = 3
_CURR_SHARDS = 4


@register(
    "pipeline_curriculum_order",
    # Full replay: both engines compute the identical integer difficulty
    # score, the identical per-lang band split, the identical
    # band-salted md5 permutation and shard split — the oracle uses
    # plain NTILE windows (DuckDB is serial anyway), Spark the
    # distributed ntile_over_buckets machinery; outputs must hash equal.
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, unnest({_SQL_WORDS}) AS w FROM documents
    ),
    sc AS (
      SELECT doc_id, lang,
             CAST(SUM(length(w)) * 1000 // COUNT(*) AS BIGINT) AS s
      FROM w GROUP BY doc_id, lang
    ),
    banded AS (
      SELECT doc_id, lang, s,
             NTILE({_CURR_BANDS}) OVER (PARTITION BY lang
                                        ORDER BY s, doc_id) AS band
      FROM sc
    ),
    keyed AS (
      SELECT *, md5(CAST(doc_id AS VARCHAR) || ':' ||
                    CAST(band AS VARCHAR)) AS h
      FROM banded
    ),
    sharded AS (
      SELECT doc_id, lang, s, band,
             NTILE({_CURR_SHARDS}) OVER (PARTITION BY lang, band
                                         ORDER BY h, doc_id) - 1 AS shard_id
      FROM keyed
    )
    SELECT lang, CAST(band AS INT) AS band, CAST(shard_id AS INT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS docid_sum,
           CAST(SUM(s) AS BIGINT) AS sum_score,
           CAST(MIN(s) AS BIGINT) AS min_score,
           CAST(MAX(s) AS BIGINT) AS max_score
    FROM sharded GROUP BY lang, band, shard_id
    """,
    doc="Curriculum data ordering (Bengio et al. 2009, 'Curriculum "
    "Learning' — public paper; the easy→hard schedule many pretraining "
    "runs use for the first epochs): per language, documents are "
    "banded into {bands} difficulty terciles by an integer score "
    "(mean word length ×1000 — exact integer division, "
    "order-independent), then each band is shuffled REPRODUCIBLY by a "
    "band-salted md5 permutation and split into {shards} shards — the "
    "training loader walks bands in order, shards within a band in "
    "the keyed-random order, so restarts regenerate the same "
    "curriculum. Composes the round's two scale devices end to end: "
    "BOTH splits run through ntile_over_buckets (band: bucket = "
    "s div 128; shard: bucket = md5 prefix), so no language — and no "
    "(language, band) — ever serializes through one window task "
    "(plan-asserted). The per-(lang, band, shard) audit carries "
    "min/max score, making band monotonicity (easy bands strictly "
    "before hard) hash-visible.",
    tags=("extension", "sampling", "pipeline"),
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    words = d.select("doc_id", "lang", F.explode(_words()).alias("w"))
    sc = words.groupBy("doc_id", "lang").agg(
        F.expr("CAST(SUM(length(w)) * 1000 div COUNT(*) AS BIGINT)").alias("s")
    )
    banded = ntile_over_buckets(
        sc.withColumn("qs", F.expr("CAST(s div 128 AS INT)")),
        ["lang"],
        "qs",
        [F.col("s"), F.col("doc_id")],
        _CURR_BANDS,
        out_col="band",
    ).drop("qs")
    keyed = banded.withColumn(
        "h",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"),
                F.col("band").cast("string"),
            )
        ),
    ).withColumn("bkt", F.substring("h", 1, 2))
    sharded = ntile_over_buckets(
        keyed, ["lang", "band"], "bkt", ["h", "doc_id"], _CURR_SHARDS
    ).select(
        "lang", "band", "s", "doc_id",
        (F.col("tile") - 1).cast("int").alias("shard_id"),
    )
    return sharded.groupBy(
        "lang", F.col("band").cast("int").alias("band"), "shard_id"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("long").alias("docid_sum"),
        F.sum("s").cast("long").alias("sum_score"),
        F.min("s").alias("min_score"),
        F.max("s").alias("max_score"),
    )
