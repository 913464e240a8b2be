"""ACID table emulation: base + delta merge-on-read, minor and major
compaction (SURVEY §1.1's one deliberate architecture swap, completed).

Hive 1.2.2's transactional tables store a ``base_N/`` snapshot plus
``delta_M_M/`` directories of row-versioned edits; every read merges them
(reference anchors: ``ql/io/AcidUtils.java`` — directory resolution,
``ql/io/orc/OrcRawRecordMerger.java`` — (txnid, bucket, rowid) merge with
highest-transaction-wins + delete tombstones, ``ql/txn/compactor/Worker.java``
— minor/major compaction). The Spark-native answer is the Delta/Iceberg
shape: the SAME algebra expressed as a union + per-key argmax over a
version column — no lock manager needed for the read path, and Catalyst
plans the merge as one shuffle with map-side partial ``max_by``.

Three registered queries certify the three halves of the story:

- ``acid_read_compacted``   — merge-on-read: base ∪ delta_1 ∪ delta_2,
  highest version wins per key, delete tombstones drop the row.
- ``acid_minor_compaction`` — compact(delta_1, delta_2) first (deltas-only
  argmax, base untouched — Hive's MINOR compactor), then merge with base;
  MUST produce the identical snapshot (same oracle, hash-checked).
- ``acid_major_compaction`` — materialize the merged snapshot as the new
  base (Hive's MAJOR compactor: rewrite base_N, drop deltas), re-read it
  from parquet, and reconcile — proving compaction is a pure rewrite.

Determinism: the edit batches derive from ``orders`` by integer-modulus
rules evaluated identically in Spark and the DuckDB oracle CTEs (no rand,
no time); money flows through DECIMAL(18,2) (registry.py rules).

Scale (100 TB): the merge shuffles once on the row key; at cluster scale
the base is bucketed on the key so merge-on-read co-locates shuffle-free
(the ``bucketed_smb_join`` layout), and deltas stay small between
compactions — exactly why Hive compacts. ``max_by(struct, ver)`` carries a
map-side partial, so shuffle volume is ~|distinct keys touched|, not
~|rows x versions|. Delete tombstones cost one filter, no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.operators.helpers import dec
from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.sources.io import _tmp
from apache_hive_1_2_2_src_spark.tables import load_table

# The shared edit-batch derivation (modulus rules — see module docstring):
#   delta v1: key%7==0 -> UPDATE price+10 ; key%7==1 -> DELETE
#   delta v2: key%21==0 -> DELETE (tombstone over the v1 update)
#             key%7==1 AND key%2==0 -> UPSERT back (status 'R', price 42.00)
_ACID_CTES = """
    base AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p, 0 AS ver, 'U' AS op
      FROM orders
    ),
    d1 AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CASE WHEN o_orderkey % 7 = 0
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 10
                            AS DECIMAL(18,2)) END AS p,
             1 AS ver,
             CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE 'D' END AS op
      FROM orders WHERE o_orderkey % 7 IN (0, 1)
    ),
    d2 AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 21 = 0 THEN o_orderstatus ELSE 'R' END AS st,
             CASE WHEN o_orderkey % 21 = 0 THEN NULL
                  ELSE CAST(42.00 AS DECIMAL(18,2)) END AS p,
             2 AS ver,
             CASE WHEN o_orderkey % 21 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders
      WHERE o_orderkey % 21 = 0 OR (o_orderkey % 7 = 1 AND o_orderkey % 2 = 0)
    )
"""

# Merge-on-read + verdict aggregate: one row per surviving key's latest
# version, reconciled per status (count, exact decimal total, key span).
_ACID_ORACLE = f"""
    WITH {_ACID_CTES},
    all_rows AS (
      SELECT * FROM base UNION ALL SELECT * FROM d1 UNION ALL SELECT * FROM d2
    ),
    latest AS (
      SELECT k, st, p, op,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
      FROM all_rows
    )
    SELECT st AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(p) AS DOUBLE) AS sum_price,
           MIN(k) AS min_key, MAX(k) AS max_key
    FROM latest WHERE rn = 1 AND op <> 'D'
    GROUP BY st
"""


def _acid_versions(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Base snapshot + the two derived delta batches (k, st, p, ver, op)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        dec("o_totalprice").alias("p"),
        F.lit(0).alias("ver"),
        F.lit("U").alias("op"),
    )
    d1 = o.filter(F.col("o_orderkey") % 7 < 2).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.when(
            F.col("o_orderkey") % 7 == 0,
            (dec("o_totalprice") + 10).cast("decimal(18,2)"),
        ).alias("p"),
        F.lit(1).alias("ver"),
        F.when(F.col("o_orderkey") % 7 == 0, "U").otherwise("D").alias("op"),
    )
    d2 = o.filter(
        (F.col("o_orderkey") % 21 == 0)
        | ((F.col("o_orderkey") % 7 == 1) & (F.col("o_orderkey") % 2 == 0))
    ).select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 21 == 0, F.col("o_orderstatus"))
        .otherwise(F.lit("R"))
        .alias("st"),
        F.when(
            F.col("o_orderkey") % 21 == 0, F.lit(None).cast("decimal(18,2)")
        )
        .otherwise(F.lit("42.00").cast("decimal(18,2)"))
        .alias("p"),
        F.lit(2).alias("ver"),
        F.when(F.col("o_orderkey") % 21 == 0, "D").otherwise("U").alias("op"),
    )
    return base, d1, d2


def _merge_latest(*versions: DataFrame) -> DataFrame:
    """Highest-version-wins merge (OrcRawRecordMerger semantics): one
    shuffle on the row key; max_by(struct) keeps the partial-aggregation
    map-side combine, so shuffle volume is ~|keys|, not ~|rows x deltas|."""
    allv = versions[0]
    for v in versions[1:]:
        allv = allv.unionByName(v)
    return (
        allv.groupBy("k")
        .agg(F.max_by(F.struct("op", "st", "p"), F.col("ver")).alias("w"))
        .select("k", "w.op", "w.st", "w.p")
        .filter(F.col("op") != "D")
    )


def _verdict(snapshot: DataFrame) -> DataFrame:
    return snapshot.groupBy(F.col("st").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p").cast("double").alias("sum_price"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


@register(
    "acid_read_compacted",
    oracle=_ACID_ORACLE,
    doc="ACID merge-on-read (ql/io/AcidUtils.java directory resolution + "
    "ql/io/orc/OrcRawRecordMerger.java highest-txn-wins, re-expressed "
    "Delta-style): base snapshot ∪ two derived delta batches (updates, "
    "delete tombstones, and a re-insert over a prior delete), merged with "
    "ONE shuffle via groupBy(key).max_by(struct, version); tombstone "
    "winners drop. The verdict aggregate (per-status count, exact decimal "
    "total, key span) shifts if a tombstone leaks, an update double-"
    "applies, or a resurrected key is lost. Oracle replays the identical "
    "version algebra with a ROW_NUMBER window in DuckDB.",
    tags=("workload", "acid", "merge"),
)
def acid_read_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, d1, d2 = _acid_versions(spark, sf_dir)
    return _verdict(_merge_latest(base, d1, d2))


@register(
    "acid_minor_compaction",
    oracle=_ACID_ORACLE,
    doc="MINOR compaction (ql/txn/compactor/Worker.java, minor mode): "
    "collapse the delta chain into one delta — per-key argmax over the "
    "DELTAS ONLY, tombstones kept (they must still mask base rows!) — "
    "then merge base ∪ compacted-delta. Registered against the SAME "
    "oracle as acid_read_compacted: hash-equality certifies the algebra "
    "compact(d1,d2) ∘ merge(base) ≡ merge(base,d1,d2), i.e. minor "
    "compaction never changes a read. The subtle bug this pins: dropping "
    "tombstones during minor compaction (they look like dead rows but "
    "still mask the base) resurrects every deleted key.",
    tags=("workload", "acid", "compaction"),
)
def acid_minor_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, d1, d2 = _acid_versions(spark, sf_dir)
    # Deltas-only argmax — keep tombstones (filter op != 'D' here would be
    # the resurrect-deleted-keys bug); retain the max version number so the
    # final merge still orders compacted-delta above base.
    deltas = d1.unionByName(d2)
    compacted_delta = (
        deltas.groupBy("k")
        .agg(F.max_by(F.struct("op", "st", "p"), F.col("ver")).alias("w"),
             F.max("ver").alias("ver"))
        .select("k", "w.op", "w.st", "w.p", "ver")
    )
    return _verdict(_merge_latest(base, compacted_delta))


@register(
    "acid_major_compaction",
    oracle=_ACID_ORACLE,
    doc="MAJOR compaction (ql/txn/compactor/Worker.java, major mode): "
    "materialize the merged snapshot as the NEW base (parquet rewrite — "
    "tombstones and overwritten versions physically gone), then re-read "
    "it from disk and run the same verdict aggregate. Same oracle as "
    "acid_read_compacted: hash-equality across the write+read roundtrip "
    "proves compaction is a pure rewrite (no row, cent, or status drifts "
    "through the file boundary). At 100 TB the rewrite is partitioned + "
    "bucketed on the key so post-compaction reads prune AND co-locate.",
    tags=("workload", "acid", "compaction", "sink"),
)
def acid_major_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, d1, d2 = _acid_versions(spark, sf_dir)
    new_base = _tmp("acid_major_base")
    _merge_latest(base, d1, d2).write.mode("overwrite").parquet(new_base)
    return _verdict(spark.read.parquet(new_base))
