"""PySpark-native analytics engine with the query surface of Apache Hive 1.2.2.

Reference: ``gangll/apache-hive-1.2.2-src`` (the Apache Hive 1.2.2 source
release). This package is NOT a port of Hive's Java operator runtime — it
re-expresses Hive's query semantics on Spark's Catalyst/Tungsten engine:

- Hive's row-at-a-time ``Operator`` pipeline (``ql/exec/Operator.java``) and
  its vectorized islands (``ql/exec/vector/``) collapse into Spark's
  whole-stage-codegen DataFrame runtime — we write zero execution-engine code.
- Hive's compiler (``ql/parse/SemanticAnalyzer.java``, ``ql/Driver.java``)
  collapses into Catalyst; this package is the thin layer Hive users need on
  top: a session factory pinning Hive-compatible semantics (`session`), a
  catalog/table layer (`tables`), the operator surface as composable
  DataFrame builders (`operators/`), Hive's function inventory with
  divergence shims (`functions/`), sources/sinks (`sources/`), streaming
  ingest parity (`streaming/`), and 100-TB-scale extension operators —
  dedup, similarity search, text analysis, multimodal (`extensions/`).

Layout mirrors SURVEY.md §2's inventory; every public operator cites the
Hive file it provides parity with.
"""

from apache_hive_1_2_2_src_spark.session import get_session  # noqa: F401
from apache_hive_1_2_2_src_spark.tables import TABLES, register_tables  # noqa: F401

__version__ = "0.1.0"
