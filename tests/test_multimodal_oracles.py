"""Gates for the multimodal kernels' byte-math oracles.

Both multimodal oracles recompute Python byte arithmetic
(``sum(utf8_bytes[...])``) as SQL ``ord()`` over characters — valid iff the
corpus is pure ASCII (byte i == codepoint of char i). This asserts that
assumption per test SF so a regenerated non-ASCII corpus fails loudly here
with the remedy (switch the oracle to rows-only) instead of hash-failing at
the driver.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_documents_are_pure_ascii(oracle_con):
    non_ascii, empty = oracle_con.execute(
        """
        SELECT COUNT(*) FILTER (octet_length(encode(text)) <> length(text)),
               COUNT(*) FILTER (length(text) = 0)
        FROM documents
        """
    ).fetchone()
    assert non_ascii == 0, (
        f"{SF_DIR}: {non_ascii} non-ASCII documents — the multimodal ord()-based "
        "oracles are unsound for this corpus; demote them to rows-only"
    )
    assert empty == 0  # ceil(0/128)=0 frames is handled, but keep the gate tight


def test_decode_stub_matches_oracle(spark, registry, oracle_con):
    q = registry["multimodal_decode_stub"]
    srows = sorted(tuple(r) for r in q.build(spark, SF_DIR).collect())
    orows = sorted(tuple(r) for r in oracle_con.execute(q.oracle).fetchall())
    assert srows == orows


def test_frame_sample_matches_oracle(spark, registry, oracle_con):
    q = registry["multimodal_frame_sample"]
    srows = sorted(tuple(r) for r in q.build(spark, SF_DIR).collect())
    orows = sorted(tuple(r) for r in oracle_con.execute(q.oracle).fetchall())
    assert srows == orows
