"""Z-order (Morton-curve) clustering layout — the multi-dimensional
data-skipping lever for 100 TB tables.

Hive 1.2.2 has no analogue (its layout tools are partitions + bucketing +
`SORT BY`, all single-dimension); modern lakehouse engines (Delta OPTIMIZE
ZORDER BY, Iceberg sort orders) cluster on a space-filling curve so that
parquet row-group min/max statistics stay NARROW on **every** z-ordered
column at once, letting scans with predicates on any of the dimensions skip
row groups. A single-column sort gives perfect skipping on that column and
ZERO skipping on the others; Morton interleaving trades a constant factor
on each dimension for bounded spans on all of them.

Construction (identical integer math in Spark and the DuckDB oracle):

1. min-max scale each dimension to 16 bits:
   ``s = ((v - vmin) * 65535) DIV max(vmax - vmin, 1)`` — pure BIGINT ops,
   no floats, so both engines agree bit-for-bit;
2. interleave the bits: ``morton = Σ_i ((sx>>i)&1)<<2i | ((sy>>i)&1)<<(2i+1)``
   (y owns the odd bits, so the HIGH morton bits alternate y15,x15,y14,…);
3. cluster on the curve: production recipe is
   ``repartitionByRange(N, "morton").sortWithinPartitions("morton")`` before
   the write — range partitioning makes files contiguous curve segments,
   and a contiguous segment of the curve is a small axis-aligned box stack.

The registered query reports the layout quality metric directly: bucketing
rows by the top 5 morton bits (32 curve segments — the >>27 buckets a
32-file write would produce) and emitting each bucket's scaled min/max and
span fraction per dimension. Top-5-bit buckets pin y to 1/8 and x to 1/4 of
their ranges, so every x_span_frac <= ~0.25 and y_span_frac <= ~0.125 + one
scaling quantum — versus a single-column sort where the non-sorted span is
~1.0 everywhere. tests/test_layout_zorder.py proves the skipping is real at
the PARQUET level: it writes z-bucketed vs x-sorted layouts and reads the
row-group footer statistics back with pyarrow, counting how many row groups
a y-only predicate may skip under each layout.

Scale: scaling bounds come from one metadata-sized aggregate (broadcast
cross join); the morton column is pure codegen bit math; the only shuffle
is the groupBy (or, in the write recipe, the range exchange Spark needs for
any global clustering anyway). Nothing is quadratic, nothing collects.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table

_BITS = 16
_SCALE_MAX = (1 << _BITS) - 1  # 65535


def _scale16_expr(v: str, vmin: str, vmax: str) -> str:
    """Min-max scale to [0, 65535] — the 16-bit instance of _scale_expr."""
    return _scale_expr(v, vmin, vmax, _SCALE_MAX)


def morton32(sx: Column, sy: Column) -> Column:
    """Interleave two 16-bit ints into a 32-bit Morton code (y = odd bits).

    Inputs are widened to BIGINT first: on INT inputs the y15 term lands on
    bit 31 — the int32 sign bit — and the code goes negative (caught by the
    hypothesis extremes test). The registered query feeds BIGINTs (DIV on
    bigint), but the helper must not depend on that."""
    sx, sy = sx.cast("long"), sy.cast("long")
    terms = []
    for i in range(_BITS):
        terms.append(F.shiftleft(F.shiftright(sx, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(sy, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(add, terms)


_MORTON_SQL = " + ".join(
    f"(((sx >> {i}) & 1) << {2 * i}) + (((sy >> {i}) & 1) << {2 * i + 1})"
    for i in range(_BITS)
)


@register(
    "layout_zorder_clustering",
    oracle=f"""
    WITH src AS (
      SELECT l_orderkey AS x, l_partkey AS y FROM lineitem
    ),
    ext AS (
      SELECT MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax
      FROM src
    ),
    scaled AS (
      SELECT ((x - xmin) * {_SCALE_MAX}) // greatest(xmax - xmin, 1) AS sx,
             ((y - ymin) * {_SCALE_MAX}) // greatest(ymax - ymin, 1) AS sy
      FROM src, ext
    ),
    z AS (SELECT sx, sy, ({_MORTON_SQL}) AS morton FROM scaled)
    SELECT CAST(morton >> 27 AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(sx) AS sx_lo, MAX(sx) AS sx_hi,
           MIN(sy) AS sy_lo, MAX(sy) AS sy_hi,
           ROUND((MAX(sx) - MIN(sx)) / 65535.0, 6) AS x_span_frac,
           ROUND((MAX(sy) - MIN(sy)) / 65535.0, 6) AS y_span_frac
    FROM z GROUP BY zbucket
    """,
    doc="Z-order clustering layout metric over lineitem(l_orderkey, "
    "l_partkey): min-max scale both keys to 16 bits (integer-only math), "
    "interleave into a 32-bit Morton code, bucket by the top 5 bits (the "
    "32 curve segments a 32-file z-ordered write produces), and report "
    "each bucket's per-dimension min/max and span fraction. The spans are "
    "the data-skipping guarantee: every bucket is pinned to <=1/4 of the "
    "x range AND <=1/8 of the y range (+1 scaling quantum), so parquet "
    "row-group stats under this layout prune scans with predicates on "
    "EITHER dimension — a single-column sort prunes only its own column. "
    "See tests/test_layout_zorder.py for the footer-statistics proof.",
    tags=("extension", "layout", "zorder"),
)
def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("x"), F.col("l_partkey").alias("y")
    )
    ext = li.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    )
    scaled = li.crossJoin(F.broadcast(ext)).select(
        F.expr(_scale16_expr("x", "xmin", "xmax")).alias("sx"),
        F.expr(_scale16_expr("y", "ymin", "ymax")).alias("sy"),
    )
    z = scaled.select("sx", "sy", morton32(F.col("sx"), F.col("sy")).alias("morton"))
    return z.groupBy(
        F.shiftright(F.col("morton"), 27).cast("long").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("sx").alias("sx_lo"),
        F.max("sx").alias("sx_hi"),
        F.min("sy").alias("sy_lo"),
        F.max("sy").alias("sy_hi"),
        F.round((F.max("sx") - F.min("sx")) / 65535.0, 6).alias("x_span_frac"),
        F.round((F.max("sy") - F.min("sy")) / 65535.0, 6).alias("y_span_frac"),
    )


_BITS3 = 10  # 3 dims x 10 bits = 30-bit code; top 6 bits -> 64 segments


def _scale_expr(v: str, vmin: str, vmax: str, maxval: int) -> str:
    """Min-max scale to [0, maxval], integer-only (Spark SQL DIV).

    Everything is widened to BIGINT *inside* the expression: with native
    INT32 inputs and a range above ~32767, ``(v - vmin) * maxval`` would
    silently wrap (ANSI off) and produce garbage curve codes. Widening
    makes the expression exact for any INT32 column (intermediate bounded
    by 2^32 * 65535 < 2^48), but NOT for arbitrary BIGINT columns: once
    ``vmax - vmin`` exceeds ``(2^63 - 1) DIV maxval`` (~2^47 at the 16-bit
    scale) the product itself wraps int64 and the codes are garbage with no
    error. Callers that cannot bound the column range statically must check
    it first — the public write recipes (``zorder_layout`` /
    ``hilbert_layout``) collect the one-row extent and go through
    ``_check_scale_range``, which raises instead of wrapping."""
    d = f"(CAST({v} AS BIGINT) - CAST({vmin} AS BIGINT))"
    r = f"(CAST({vmax} AS BIGINT) - CAST({vmin} AS BIGINT))"
    return f"({d} * {maxval}) DIV greatest({r}, 1)"


def _check_scale_range(bounds: dict, maxval: int) -> None:
    """Refuse ranges whose ``(v - vmin) * maxval`` would wrap int64, and
    refuse NON-INTEGER key columns outright: the write recipes inline the
    collected bounds as bare SQL literals (``str(b[...])``), which only
    round-trips for ints — a date/timestamp/decimal bound would produce an
    unquoted literal that fails to parse or silently changes value. Keys
    of those types must be cast to BIGINT first (``unix_timestamp``,
    ``datediff``, ``CAST(dec AS BIGINT)``) — which is also what the
    integer scaling arithmetic in ``_scale_expr`` assumes.

    ``bounds`` maps names to python ints/None (one collected extent row);
    checked pairwise as (xmin, xmax), (ymin, ymax), ... in key order."""
    limit = ((1 << 63) - 1) // maxval
    vals = list(bounds.items())
    for (lo_k, lo), (hi_k, hi) in zip(vals[::2], vals[1::2]):
        if lo is None or hi is None:
            raise ValueError(f"curve layout: all-NULL key column ({lo_k}/{hi_k})")
        for k, v in ((lo_k, lo), (hi_k, hi)):
            if not isinstance(v, int) or isinstance(v, bool):
                raise TypeError(
                    f"curve layout: key column for {k} has non-integer "
                    f"bound {v!r} ({type(v).__name__}); z-order/Hilbert "
                    "layouts take INTEGER keys only — cast dates/"
                    "timestamps/decimals to BIGINT (unix_timestamp, "
                    "datediff, CAST(x AS BIGINT)) before clustering"
                )
        if int(hi) - int(lo) > limit:
            raise ValueError(
                f"curve layout: range of {lo_k[:-3]} is {int(hi) - int(lo)}, "
                f"above the int64-safe limit {limit} for a {maxval + 1}-cell "
                "grid; rescale the key (e.g. DIV a constant) first"
            )


def morton3(sx: Column, sy: Column, sz: Column) -> Column:
    """Interleave three 10-bit ints into a 30-bit Morton code
    (bit 3i = x_i, 3i+1 = y_i, 3i+2 = z_i)."""
    sx, sy, sz = sx.cast("long"), sy.cast("long"), sz.cast("long")
    terms = []
    for i in range(_BITS3):
        terms.append(F.shiftleft(F.shiftright(sx, i).bitwiseAND(F.lit(1)), 3 * i))
        terms.append(F.shiftleft(F.shiftright(sy, i).bitwiseAND(F.lit(1)), 3 * i + 1))
        terms.append(F.shiftleft(F.shiftright(sz, i).bitwiseAND(F.lit(1)), 3 * i + 2))
    return reduce(add, terms)


_MORTON3_SQL = " + ".join(
    f"(((sx >> {i}) & 1) << {3 * i}) + (((sy >> {i}) & 1) << {3 * i + 1})"
    f" + (((sz >> {i}) & 1) << {3 * i + 2})"
    for i in range(_BITS3)
)


@register(
    "layout_zorder3d_clustering",
    oracle=f"""
    WITH src AS (
      SELECT l_orderkey AS x, l_partkey AS y, l_suppkey AS z FROM lineitem
    ),
    ext AS (
      SELECT MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax,
             MIN(z) AS zmin, MAX(z) AS zmax
      FROM src
    ),
    scaled AS (
      SELECT ((x - xmin) * 1023) // greatest(xmax - xmin, 1) AS sx,
             ((y - ymin) * 1023) // greatest(ymax - ymin, 1) AS sy,
             ((z - zmin) * 1023) // greatest(zmax - zmin, 1) AS sz
      FROM src, ext
    ),
    m AS (SELECT sx, sy, sz, ({_MORTON3_SQL}) AS morton FROM scaled)
    SELECT CAST(morton >> 24 AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND((MAX(sx) - MIN(sx)) / 1023.0, 6) AS x_span_frac,
           ROUND((MAX(sy) - MIN(sy)) / 1023.0, 6) AS y_span_frac,
           ROUND((MAX(sz) - MIN(sz)) / 1023.0, 6) AS z_span_frac
    FROM m GROUP BY zbucket
    """,
    doc="3-D Z-order clustering (round 9, extends the 2-D layout row): "
    "lineitem (l_orderkey, l_partkey, l_suppkey) scaled to 10 bits each "
    "and interleaved into a 30-bit Morton code; buckets = top 6 bits (the "
    "64 curve segments a 64-file write produces). Fixing 6 leading bits "
    "pins each dimension's top TWO bits, so every bucket's span is <= 1/4 "
    "of EVERY dimension's range (+1 scaling quantum) — row-group stats "
    "prune scans with a predicate on ANY of the three columns. Same "
    "broadcast-bounds + codegen-bit-math shape as the 2-D query: one "
    "metadata aggregate, one groupBy shuffle, nothing quadratic.",
    tags=("extension", "layout", "zorder"),
)
def layout_zorder3d_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("x"),
        F.col("l_partkey").alias("y"),
        F.col("l_suppkey").alias("z"),
    )
    ext = li.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
        F.min("z").alias("zmin"), F.max("z").alias("zmax"),
    )
    mx = 1023
    scaled = li.crossJoin(F.broadcast(ext)).select(
        F.expr(_scale_expr("x", "xmin", "xmax", mx)).alias("sx"),
        F.expr(_scale_expr("y", "ymin", "ymax", mx)).alias("sy"),
        F.expr(_scale_expr("z", "zmin", "zmax", mx)).alias("sz"),
    )
    m = scaled.select(
        "sx", "sy", "sz",
        morton3(F.col("sx"), F.col("sy"), F.col("sz")).alias("morton"),
    )
    return m.groupBy(F.shiftright(F.col("morton"), 24).cast("long").alias("zbucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round((F.max("sx") - F.min("sx")) / 1023.0, 6).alias("x_span_frac"),
        F.round((F.max("sy") - F.min("sy")) / 1023.0, 6).alias("y_span_frac"),
        F.round((F.max("sz") - F.min("sz")) / 1023.0, 6).alias("z_span_frac"),
    )


def zorder_layout(
    df: DataFrame,
    xcol: str,
    ycol: str,
    n_files: int,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Production z-order write recipe: attach the morton column and
    range-cluster into ``n_files`` contiguous curve segments. Caller writes
    with ``.drop("__morton").write.parquet(...)`` (or keeps the column).
    Keys must be INTEGER columns (``_check_scale_range`` raises TypeError
    otherwise) — cast dates/timestamps/decimals to BIGINT first.

    ``tiebreaker``: a UNIQUE (or near-unique) column to break curve-code
    ties in the range partitioner. RangePartitioner cannot split rows
    whose range key is EQUAL, so a hot cell — 90% of rows on one (x, y)
    — lands in ONE output partition no matter what n_files says
    (measured: 2M rows, 90% hot -> max partition 1.84M, 29.4x the ideal;
    SCALE.md r17). With the table's natural unique key as tiebreaker the
    same overlay balances to ~1x. Deterministic by construction — never
    a rand() salt, which is unsafe in a shuffle key under partial task
    retries (nondeterministic re-draws can dup/lose rows on fetch
    failure). Within-file order still sorts by the curve code alone.

    The scaling bounds come from one metadata-sized aggregate that is
    COLLECTED (one row, four longs — negligible at any scale): driver-side
    bounds let us refuse key ranges wide enough to wrap the int64 scaling
    arithmetic (see ``_scale_expr``) instead of silently producing garbage
    codes, and inlining them as literals drops the broadcast-crossJoin from
    the per-row path. The function therefore triggers one Spark job when
    called — fine for a write recipe."""
    b = df.agg(
        F.min(xcol).alias("xmin"),
        F.max(xcol).alias("xmax"),
        F.min(ycol).alias("ymin"),
        F.max(ycol).alias("ymax"),
    ).first()
    _check_scale_range(b.asDict(), _SCALE_MAX)
    with_z = (
        df.withColumn(
            "__sx", F.expr(_scale16_expr(xcol, str(b["xmin"]), str(b["xmax"])))
        )
        .withColumn(
            "__sy", F.expr(_scale16_expr(ycol, str(b["ymin"]), str(b["ymax"])))
        )
        .withColumn("__morton", morton32(F.col("__sx"), F.col("__sy")))
        .drop("__sx", "__sy")
    )
    keys = ["__morton"] + ([tiebreaker] if tiebreaker else [])
    return with_z.repartitionByRange(n_files, *keys).sortWithinPartitions(
        "__morton"
    )


# ---- Hilbert-curve layout (round 9) -------------------------------------
#
# The xy->d transform is the classic per-level rotate/flip walk (public
# algorithm; e.g. the Wikipedia "Hilbert curve" C listing): at each level s
# (high bit to low), quadrant (rx, ry) contributes s^2*((3*rx) XOR ry) to d
# and the frame rotates/reflects. The walk is SEQUENTIAL state, so both
# engines run it as a fold whose accumulator packs (d, x, y) into ONE
# BIGINT:
#
#   acc = d * 2^26 + (x + 4096) * 2^13 + (y + 4096)
#
# 12-bit coordinates (grid 4096^2, d < 2^24); intermediate x/y go NEGATIVE
# during the reflections (|x| <= 4095 — verified by exhaustive trace),
# hence the +4096 bias; the packed value stays < 2^51. Bitwise & on
# negative BIGINTs is two's-complement in Python, Spark, and DuckDB alike,
# which is exactly what the masked rx/ry tests rely on.
# tests/test_layout_hilbert.py pins the SQL fold against a Python
# reference AND the curve properties (bijectivity + unit-step adjacency)
# that a wrong rotation variant cannot satisfy.

_HB = 12                      # bits per coordinate
_HGRID = 1 << _HB             # 4096
_HMAX = _HGRID - 1            # 4095
_HBIAS = _HGRID               # bias keeping packed coords positive
_HF = 1 << (_HB + 1)          # 8192: field width for one biased coord
_HD = _HF * _HF               # 2^26: d field shift


def hilbert_xy2d_py(x: int, y: int, bits: int = _HB) -> int:
    """Python reference walk (test ground truth)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_fold_sql(x_expr: str, y_expr: str, engine: str) -> str:
    """The packed-state Hilbert fold as ONE SQL expression with identical
    integer arithmetic in both engines; only the spellings differ
    (DIV vs //, ``a ^ b`` vs ``xor(a, b)``, aggregate vs list_reduce,
    0- vs 1-indexed single-element bind)."""
    if engine == "spark":
        idiv = "DIV"

        def xor(a: str, b: str) -> str:
            return f"({a} ^ {b})"

        def bind(value: str, var: str, body: str) -> str:
            return f"transform(array({value}), {var} -> {body})[0]"

        levels = (
            f"transform(sequence({_HB - 1}, 0, -1), "
            f"i -> shiftleft(CAST(1 AS BIGINT), i))"
        )

        def reduce_(lvl: str, acc0: str, step: str) -> str:
            return f"aggregate({lvl}, CAST({acc0} AS BIGINT), (acc, s) -> {step})"
    elif engine == "duckdb":
        idiv = "//"

        def xor(a: str, b: str) -> str:
            return f"xor({a}, {b})"

        def bind(value: str, var: str, body: str) -> str:
            return f"list_transform([{value}], {var} -> {body})[1]"

        levels = (
            f"list_transform(range({_HB - 1}, -1, -1), "
            f"i -> (CAST(1 AS BIGINT) << i))"
        )

        def reduce_(lvl: str, acc0: str, step: str) -> str:
            return (
                f"list_reduce(list_prepend(CAST({acc0} AS BIGINT), {lvl}), "
                f"(acc, s) -> {step})"
            )
    else:
        raise ValueError(engine)

    acc0 = f"(({x_expr}) + {_HBIAS}) * {_HF} + (({y_expr}) + {_HBIAS})"
    unpack = (
        f"named_struct('x', (acc {idiv} {_HF}) % {_HF} - {_HBIAS}, "
        f"'y', acc % {_HF} - {_HBIAS}, 'd', acc {idiv} {_HD})"
    ) if engine == "spark" else (
        f"struct_pack(x := (acc {idiv} {_HF}) % {_HF} - {_HBIAS}, "
        f"y := acc % {_HF} - {_HBIAS}, d := acc {idiv} {_HD})"
    )
    quad = (
        "named_struct('rx', CASE WHEN (t.x & s) > 0 THEN CAST(1 AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END, 'ry', CASE WHEN (t.y & s) > 0 THEN "
        "CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    ) if engine == "spark" else (
        "struct_pack(rx := CASE WHEN (t.x & s) > 0 THEN CAST(1 AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END, ry := CASE WHEN (t.y & s) > 0 THEN "
        "CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    )
    newx = ("CASE WHEN r.ry = 0 THEN (CASE WHEN r.rx = 1 THEN s - 1 - t.y "
            "ELSE t.y END) ELSE t.x END")
    newy = ("CASE WHEN r.ry = 0 THEN (CASE WHEN r.rx = 1 THEN s - 1 - t.x "
            "ELSE t.x END) ELSE t.y END")
    d2 = f"(t.d + s * s * {xor('3 * r.rx', 'r.ry')})"
    inner = bind(
        quad,
        "r",
        f"{d2} * {_HD} + ({newx} + {_HBIAS}) * {_HF} + ({newy} + {_HBIAS})",
    )
    step = bind(unpack, "t", inner)
    return f"(({reduce_(levels, acc0, step)}) {idiv} {_HD})"


_HILBERT_ORACLE = f"""
    WITH src AS (
      SELECT l_orderkey AS x, l_partkey AS y FROM lineitem
    ),
    ext AS (
      SELECT MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax
      FROM src
    ),
    scaled AS (
      SELECT ((x - xmin) * {_HMAX}) // greatest(xmax - xmin, 1) AS sx,
             ((y - ymin) * {_HMAX}) // greatest(ymax - ymin, 1) AS sy
      FROM src, ext
    ),
    h AS (SELECT sx, sy, {{fold}} AS hd FROM scaled)
    SELECT CAST(hd >> 19 AS BIGINT) AS hbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(sx) AS sx_lo, MAX(sx) AS sx_hi,
           MIN(sy) AS sy_lo, MAX(sy) AS sy_hi,
           ROUND((MAX(sx) - MIN(sx)) / {_HMAX}.0, 6) AS x_span_frac,
           ROUND((MAX(sy) - MIN(sy)) / {_HMAX}.0, 6) AS y_span_frac
    FROM h GROUP BY hbucket
""".format(fold=hilbert_fold_sql("sx", "sy", "duckdb"))


@register(
    "layout_hilbert_clustering",
    oracle=_HILBERT_ORACLE,
    doc="Hilbert-curve clustering layout (round 9 — the locality upgrade "
    "over Morton: every contiguous Hilbert range is a CONNECTED compact "
    "region. Measured: ALIGNED top-bit segments — what this query "
    "reports — tile identically to Morton's, but production file splits "
    "cut the curve at arbitrary row-balanced boundaries, where Morton's "
    "seam-straddling worst file spans ~the whole x range and Hilbert's "
    "stays 2.3x tighter — tests/test_layout_hilbert.py): lineitem keys "
    "min-max scaled to 12 bits, the classic rotate/flip xy->d walk run "
    "as a packed-BIGINT fold (sequential state per level — identical "
    "integer arithmetic in Spark aggregate() and DuckDB list_reduce(), "
    "two's-complement masking pinned against a Python reference and the "
    "bijectivity+adjacency curve properties in "
    "tests/test_layout_hilbert.py), bucketed by the top 5 curve bits. "
    "Same scale shape as the Morton queries: one broadcast bounds "
    "aggregate, pure codegen fold, one groupBy shuffle; write recipe is "
    "repartitionByRange on the Hilbert code.",
    tags=("extension", "layout", "hilbert"),
)
def layout_hilbert_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("x"), F.col("l_partkey").alias("y")
    )
    ext = li.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    )
    scaled = li.crossJoin(F.broadcast(ext)).select(
        F.expr(_scale_expr("x", "xmin", "xmax", _HMAX)).alias("sx"),
        F.expr(_scale_expr("y", "ymin", "ymax", _HMAX)).alias("sy"),
    )
    h = scaled.select(
        "sx", "sy", F.expr(hilbert_fold_sql("sx", "sy", "spark")).alias("hd")
    )
    return h.groupBy(F.shiftright(F.col("hd"), 19).cast("long").alias("hbucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("sx").alias("sx_lo"),
        F.max("sx").alias("sx_hi"),
        F.min("sy").alias("sy_lo"),
        F.max("sy").alias("sy_hi"),
        F.round((F.max("sx") - F.min("sx")) / float(_HMAX), 6).alias("x_span_frac"),
        F.round((F.max("sy") - F.min("sy")) / float(_HMAX), 6).alias("y_span_frac"),
    )


def hilbert_layout(
    df: DataFrame,
    xcol: str,
    ycol: str,
    n_files: int,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Production Hilbert write recipe (mirror of zorder_layout): attach
    the packed Hilbert code and range-cluster into n_files contiguous —
    and, unlike Morton, CONNECTED — curve segments. Caller writes with
    ``.drop("__hilbert").write.parquet(...)``. Like ``zorder_layout``, the
    one-row extent is collected so over-wide key ranges raise
    (``_check_scale_range``) instead of wrapping int64, and the bounds are
    inlined as literals (no crossJoin on the per-row path). Integer keys
    only — same TypeError contract as ``zorder_layout``. ``tiebreaker``:
    same hot-cell range-partitioner device as ``zorder_layout`` — pass
    the table's unique key so equal Hilbert codes can split across
    output files (SCALE.md r17)."""
    b = df.agg(
        F.min(xcol).alias("xmin"),
        F.max(xcol).alias("xmax"),
        F.min(ycol).alias("ymin"),
        F.max(ycol).alias("ymax"),
    ).first()
    _check_scale_range(b.asDict(), _HMAX)
    sx = _scale_expr(xcol, str(b["xmin"]), str(b["xmax"]), _HMAX)
    sy = _scale_expr(ycol, str(b["ymin"]), str(b["ymax"]), _HMAX)
    with_h = df.withColumn(
        "__hilbert",
        F.expr(hilbert_fold_sql(f"({sx})", f"({sy})", "spark")),
    )
    keys = ["__hilbert"] + ([tiebreaker] if tiebreaker else [])
    return with_h.repartitionByRange(n_files, *keys).sortWithinPartitions(
        "__hilbert"
    )
