"""General matchpath PTF pattern compiler.

Hive's ``matchpath`` (reference anchor ``ql/udf/ptf/MatchPath.java``, ~900
LoC: SymbolParser / SymbolFunction chains + tpath result expressions) matches
a regex-like symbol pattern against each partition's row sequence and emits
per-match result rows. Spark has no MATCH_RECOGNIZE, so this module compiles
the pattern grammar to pure window algebra — the Spark-first answer that
stays partition-parallel at any scale:

1. **Classify** each row to its first matching symbol (chained CASE — one
   codegen expression).
2. **Compress to runs** (maximal same-symbol stretches) via the
   lag-breakpoint + running-sum trick on ONE window spec, then a groupBy
   carrying per-run aggregates: length, start key, measure sum, and the
   first/last row's measure (min_by/max_by on row number) for
   boundary-partial consumption.
3. **Match over runs**: a k-element pattern becomes k-1 ``lead()`` columns
   over the runs sequence — each candidate match is ONE row of the runs
   frame, so matching is embarrassingly parallel and never re-scans rows.

Supported grammar (matchpath's common cases): space-separated symbols, each
optionally quantified — ``+`` (one-or-more rows), ``?`` (zero-or-one row),
``*`` (zero-or-more rows); plain = exactly one row. ``?``/``*`` compile by
VARIANT EXPANSION: each optional element is either absent or present (as
``1``/``+`` respectively), the cross product of choices yields ≤ 2^n
concrete variants, each variant is compiled independently and the results
unioned — variants match different run-window shapes, so the union is
disjoint by construction. Variants whose adjacency collapses to a
same-symbol pair (e.g. ``A B* A`` with B absent → ``A A``) are
unsatisfiable against maximal runs and are skipped; at least one variant
must survive (asserted at compile time, not silently empty). In every
concrete variant, adjacent elements must name DIFFERENT symbols. Matches
are non-overlapping-at-run granularity: one emitted row per
leftmost-greedy match, the same maximal semantics as the
``ptf_matchpath_emulated``/``_multisym`` queries.

Consumption semantics per element position (MatchPath anchors a match at a
starting row and consumes greedily forward):

- ``+`` elements consume their whole run (greedy), any position.
- un-quantified elements consume exactly one row: in the MIDDLE of a
  pattern the run length must be exactly 1 (a longer run would feed the
  next row back into a different element's symbol — unsatisfiable); as the
  FIRST element it consumes its run's LAST row (the only row adjacent to
  the next element's run); as the LAST element it consumes its run's FIRST
  row. The per-run first/last measure values make the path aggregates exact
  in all three cases.

Scale: one Exchange for the row window, one groupBy reusing that
partitioning, one Exchange for the runs window — O(1) shuffles regardless
of pattern length; pattern length only widens the lead() column list.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.operators.helpers import DEC
from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


@dataclass(frozen=True)
class _Elem:
    sym: str
    plus: bool


def _parse(pattern: str) -> list[tuple[str, str]]:
    """Tokenize to (symbol, quantifier) with quantifier in {'1','+','?','*'}."""
    elems = []
    for tok in pattern.split():
        if tok[-1] in "+?*":
            elems.append((tok[:-1], tok[-1]))
        else:
            elems.append((tok, "1"))
    if not elems:
        raise ValueError("empty matchpath pattern")
    return elems


def _expand(parsed: list[tuple[str, str]]) -> list[list[_Elem]]:
    """Expand ?/* elements into present/absent variants; drop variants whose
    adjacency collapses to a same-symbol pair (unsatisfiable vs maximal
    runs). Raises if NO variant survives."""
    variants: list[list[_Elem]] = [[]]
    for sym, q in parsed:
        if q in ("?", "*"):
            present = _Elem(sym, q == "*")
            variants = [v + [] for v in variants] + [v + [present] for v in variants]
        else:
            variants = [v + [_Elem(sym, q == "+")] for v in variants]
    ok = []
    for v in variants:
        if not v:
            continue
        if any(a.sym == b.sym for a, b in zip(v, v[1:])):
            continue
        ok.append(v)
    if not ok:
        raise ValueError(
            "pattern has no satisfiable variant: every expansion is empty or "
            "collapses adjacent same-symbol elements (unsatisfiable against "
            "maximal runs) — merge the repeated symbols instead"
        )
    return ok


def match_path(
    df: DataFrame,
    partition_col: str,
    order_cols: list[str],
    symbols: dict[str, Column],
    pattern: str,
    measure: Column,
) -> DataFrame:
    """Compile ``pattern`` over ``symbols`` and return one row per match:
    (partition_col, path_start = first order col of the first consumed row
    cast to string, path_len, path_value = decimal-exact sum of ``measure``
    over the consumed rows, as double).

    ``symbols`` maps name -> boolean Column over df's columns; rows are
    classified to the FIRST matching symbol (chained CASE, mirroring
    MatchPath's SymbolParser first-match order); unclassified rows break
    runs and can never join a match.
    """
    parsed = _parse(pattern)
    names = list(symbols)
    for sym, _q in parsed:
        if sym not in symbols:
            raise ValueError(f"pattern symbol {sym!r} not in symbols")
    variants = _expand(parsed)
    sym_id = {n: i for i, n in enumerate(names)}

    cls: Column = F.lit(-1)
    for n in reversed(names):
        cls = F.when(symbols[n], F.lit(sym_id[n])).otherwise(cls)

    w = Window.partitionBy(partition_col).orderBy(*order_cols)
    rows = df.select(
        partition_col,
        *order_cols,
        measure.alias("__m"),
        cls.alias("__sym"),
        F.row_number().over(w).alias("__rn"),
    )
    new_run = (
        F.col("__sym") != F.coalesce(F.lag("__sym").over(w), F.lit(-2))
    ).cast("int")
    rows = rows.withColumn(
        "__run",
        F.sum(new_run).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = rows.groupBy(partition_col, "__run").agg(
        F.min("__sym").alias("sym"),
        F.count(F.lit(1)).alias("len"),
        F.min(order_cols[0]).alias("start_key"),
        F.max(order_cols[0]).alias("end_key"),
        F.sum(F.col("__m").cast(DEC)).alias("sv"),
        F.min_by("__m", "__rn").cast(DEC).alias("first_m"),
        F.max_by("__m", "__rn").cast(DEC).alias("last_m"),
    )

    # One runs frame shared by every variant. Multi-variant patterns (from
    # ?/*) re-derive the runs subtree per variant in the plan; at cluster
    # scale persist/localCheckpoint `runs` before a many-variant pattern.
    rw = Window.partitionBy(partition_col).orderBy("__run")
    run_struct = F.struct(
        "sym", "len", "start_key", "end_key", "sv", "first_m", "last_m"
    )

    def variant_matches(elems: list[_Elem]) -> DataFrame:
        seq = runs.select(
            partition_col,
            "__run",
            run_struct.alias("e0"),
            *[
                F.lead(run_struct, j).over(rw).alias(f"e{j}")
                for j in range(1, len(elems))
            ],
        )
        cond = F.lit(True)
        path_len: Column = F.lit(0)
        path_val: Column = F.lit(0).cast(DEC)
        start_key: Column | None = None
        last = len(elems) - 1
        for j, e in enumerate(elems):
            r = F.col(f"e{j}")
            cond = cond & (r["sym"] == sym_id[e.sym])
            if e.plus:
                consumed_len, consumed_val = r["len"], r["sv"]
                elem_start = r["start_key"]
            elif j == 0:
                # un-quantified first element: consume the run's LAST row.
                consumed_len, consumed_val = F.lit(1), r["last_m"]
                elem_start = r["end_key"]
            elif j == last:
                # un-quantified last element: consume the run's FIRST row.
                consumed_len, consumed_val = F.lit(1), r["first_m"]
                elem_start = r["start_key"]
            else:
                # un-quantified middle element: run must be exactly 1 row.
                cond = cond & (r["len"] == 1)
                consumed_len, consumed_val = F.lit(1), r["sv"]
                elem_start = r["start_key"]
            path_len = path_len + consumed_len
            path_val = path_val + consumed_val
            if j == 0:
                start_key = elem_start
        # All leads must exist (match cannot hang off the partition edge).
        for j in range(1, len(elems)):
            cond = cond & F.col(f"e{j}").isNotNull()
        return seq.filter(cond).select(
            partition_col,
            start_key.cast("string").alias("path_start"),
            path_len.cast("long").alias("path_len"),
            path_val.cast("double").alias("path_value"),
        )

    out = variant_matches(variants[0])
    for v in variants[1:]:
        # Variants differ in run-window SHAPE (element count / symbol list),
        # so their match sets are disjoint — plain union, no dedup needed.
        out = out.unionByName(variant_matches(v))
    return out


@register(
    "ptf_matchpath_grammar",
    oracle="""
    WITH cls AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value > 60.0 THEN 2
                  WHEN value < 30.0 THEN 0 ELSE 1 END AS sym,
             LAG(CASE WHEN value > 60.0 THEN 2
                      WHEN value < 30.0 THEN 0 ELSE 1 END) OVER w AS lsym
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    marked AS (
      SELECT *, CASE WHEN lsym IS NULL OR lsym <> sym THEN 1 ELSE 0 END AS nr
      FROM cls
    ),
    numbered AS (
      SELECT *, SUM(nr) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_idx
      FROM marked
    ),
    runs AS (
      SELECT user_id, run_idx, MIN(sym) AS sym, COUNT(*) AS len,
             MIN(ts) AS start_key,
             SUM(CAST(value AS DECIMAL(18,2))) AS sv
      FROM numbered GROUP BY user_id, run_idx
    ),
    seq AS (
      SELECT *,
             LEAD(sym, 1) OVER rw AS s1, LEAD(len, 1) OVER rw AS l1,
             LEAD(sv, 1) OVER rw AS v1,
             LEAD(sym, 2) OVER rw AS s2, LEAD(len, 2) OVER rw AS l2,
             LEAD(sv, 2) OVER rw AS v2
      FROM runs
      WINDOW rw AS (PARTITION BY user_id ORDER BY run_idx)
    )
    SELECT user_id,
           CAST(start_key AS VARCHAR) AS path_start,
           CAST(len + 1 + l2 AS BIGINT) AS path_len,
           CAST(sv + v1 + v2 AS DOUBLE) AS path_value
    FROM seq
    WHERE sym = 2 AND s1 = 0 AND l1 = 1 AND s2 = 2
    """,
    doc="matchpath PTF, general pattern grammar (ql/udf/ptf/MatchPath.java "
    "SymbolParser/SymbolFunction chains): the compiled 'HIGH+ LOW HIGH+' "
    "dip detector — a single LOW row sandwiched between two HIGH runs of "
    "the per-user value series — via the match_path() compiler in this "
    "module: classify -> run-compress -> k-1 lead()s over runs. The "
    "un-quantified middle LOW requires run length exactly 1 (longer dips "
    "do NOT match — that inequality is the grammar feature the 'symbol+' "
    "emulations cannot express). Oracle replicates the identical runs "
    "algebra in SQL. Scale: 3 shuffles total (row window, runs groupBy "
    "reusing it, runs window), independent of pattern length.",
    tags=("window", "ptf", "matchpath"),
)
def ptf_matchpath_grammar(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return match_path(
        e,
        "user_id",
        ["ts", "event_id"],
        symbols={
            "HIGH": F.col("value") > 60.0,
            "LOW": F.col("value") < 30.0,
            "MID": F.lit(True),
        },
        pattern="HIGH+ LOW HIGH+",
        measure=F.col("value"),
    )
