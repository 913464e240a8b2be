"""Relational operator surface (SURVEY.md §2.1–2.7).

Hive's physical operators (``ql/src/java/org/apache/hadoop/hive/ql/exec/``)
map onto Catalyst plans; these modules declare each capability as a
DataFrame-first query with a DuckDB oracle.
"""
