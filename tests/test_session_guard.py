"""get_session(hive=True) must fail loudly when it cannot deliver a hive
catalog (getOrCreate silently reuses any existing session, ignoring
enableHiveSupport — the silent-wrong-catalog failure mode)."""

from __future__ import annotations

import pytest

from apache_hive_1_2_2_src_spark.session import get_session


def test_hive_session_after_plain_session_raises(spark):
    # `spark` fixture guarantees a non-hive session already exists in-process
    assert spark.conf.get("spark.sql.catalogImplementation", "in-memory") != "hive"
    with pytest.raises(RuntimeError, match="FIRST session"):
        get_session(hive=True)
