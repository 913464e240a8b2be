"""Round-8 property tests: the ACID merge algebra and the Morton interleave
are checked against independent pure-Python reference models on randomized
inputs (hypothesis) — the test dimension golden files can't give
(SURVEY.md §5.4)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.extensions.layout import morton32
from apache_hive_1_2_2_src_spark.operators.acid import _merge_latest

# One edit: (key, version, op, status, price-cents). Versions are unique per
# key in real delta chains; hypothesis may repeat (key, ver) — we dedupe
# keeping the LAST generated, mirroring a writer re-issuing a txn.
_EDIT = st.tuples(
    st.integers(min_value=0, max_value=9),  # key
    st.integers(min_value=1, max_value=5),  # version
    st.sampled_from(["U", "D"]),
    st.sampled_from(["A", "B", "C"]),
    st.integers(min_value=0, max_value=99_999),  # cents
)


def _reference_merge(base: dict, edits: list) -> dict:
    """Sequential-apply reference model: replay edits in version order;
    highest version wins; 'D' removes the key."""
    by_key_ver = {}
    for k, ver, op, stt, cents in edits:
        by_key_ver[(k, ver)] = (op, stt, cents)
    state = dict(base)
    for (k, ver), (op, stt, cents) in sorted(by_key_ver.items()):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (stt, cents)
    return state


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edits=st.lists(_EDIT, min_size=0, max_size=25))
def test_acid_merge_matches_sequential_apply(spark, edits):
    """union + per-key max_by(version) ≡ replaying the edit log in order —
    the OrcRawRecordMerger contract, on arbitrary edit sets (including
    delete-then-reinsert, repeated versions, untouched keys)."""
    base = {k: ("A", 1000 + k) for k in range(10)}

    # Hive semantics: a re-issued (key, version) pair is one txn — keep the
    # last write. Spark-side we replicate by deduping before the merge.
    dedup = {}
    for e in edits:
        dedup[(e[0], e[1])] = e
    edit_rows = [
        (k, stt if op == "U" else None, float(cents) if op == "U" else None, ver, op)
        for (k, ver, op, stt, cents) in dedup.values()
    ]
    schema = "k int, st string, p double, ver int, op string"
    base_df = spark.createDataFrame(
        [(k, stt, float(cents), 0, "U") for k, (stt, cents) in base.items()], schema
    )
    dfs = [base_df]
    if edit_rows:
        dfs.append(spark.createDataFrame(edit_rows, schema))
    got = {
        r.k: (r.st, r.p) for r in _merge_latest(*dfs).collect()
    }
    want = {
        k: (stt, float(cents))
        for k, (stt, cents) in _reference_merge(base, list(dedup.values())).items()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65_535),
            st.integers(min_value=0, max_value=65_535),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_morton_matches_python_reference(spark, pairs):
    """The Spark bit-math morton expression equals the obvious Python
    interleave for arbitrary 16-bit pairs (incl. 0 and 65535 extremes)."""

    def ref(x: int, y: int) -> int:
        m = 0
        for i in range(16):
            m |= ((x >> i) & 1) << (2 * i)
            m |= ((y >> i) & 1) << (2 * i + 1)
        return m

    df = spark.createDataFrame(pairs, "x int, y int")
    got = [
        (r.x, r.y, r.m)
        for r in df.select("x", "y", morton32(F.col("x"), F.col("y")).alias("m"))
        .collect()
    ]
    for x, y, m in got:
        assert m == ref(x, y)


def test_bpe_train_matches_python_reference(spark):
    """The SQL BPE loop must equal a straight Python reimplementation of
    Sennrich-style BPE (greedy left-to-right non-overlapping merges) on a
    corpus built to stress the run logic: 'banana'-class words where the
    winning pair overlaps itself ('aaaa', 'anana') and frequency ties
    broken lexicographically."""
    from collections import Counter

    from apache_hive_1_2_2_src_spark.extensions.text import (
        _BPE_BASE_SPARK,
        _BPE_STEPS,
        _bpe_sql,
    )

    corpus = (
        ["banana"] * 5 + ["aaaa"] * 3 + ["bandana"] * 2 + ["anna"] * 4
        + ["ban"] * 6 + ["nab"] * 6
    )
    spark.createDataFrame(
        [(" ".join(corpus),)], "text string"
    ).createOrReplaceTempView("bpe_docs")
    got = [
        (r.step, r.pair_a, r.pair_b, r.pair_freq, r.tokens_after)
        for r in spark.sql(_bpe_sql(_BPE_BASE_SPARK)).orderBy("step").collect()
    ]

    # independent reference
    words = Counter(corpus)
    symtab = {w: list(w) for w in words}
    expect = []
    for step in range(1, _BPE_STEPS + 1):
        pairs: Counter = Counter()
        for w, cnt in words.items():
            s = symtab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        (pa, pb), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w in symtab:
            s, out, i = symtab[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == (pa, pb):
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            symtab[w] = out
        tokens = sum(len(symtab[w]) * cnt for w, cnt in words.items())
        expect.append((step, pa, pb, freq, tokens))
    assert got == expect
