"""Hive 1.2.2 scalar/table function inventory on Spark (SURVEY.md §2.8–2.9).

Hive's registry is ``ql/exec/FunctionRegistry.java`` (~1,900 LoC of static
registrations); implementations live in ``ql/udf/*.java`` (old-style) and
``ql/udf/generic/GenericUDF*.java``. Spark SQL deliberately kept Hive's
function names, so nearly all of this surface is the built-in, codegen'd
JVM path — each module here declares batch queries proving value parity
against a DuckDB oracle, plus shims for the few Hive-1.2 divergences.
"""
