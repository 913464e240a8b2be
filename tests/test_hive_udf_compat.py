"""Hive UDF binary-compatibility: CREATE TEMPORARY FUNCTION with REAL Hive
UDF/UDAF/UDTF classes (the exact ``ql/udf/**`` extensibility surface of the
reference) must execute on this engine — a reference user's custom-UDF jars
run unchanged.

The catalog implementation is a JVM-startup conf, so a Hive-enabled session
cannot coexist with the suite's in-memory-catalog session; the probe runs in
a subprocess with its own JVM.
"""

from __future__ import annotations

import subprocess
import sys

PROBE = r"""
import sys
sys.path.insert(0, ".")
from apache_hive_1_2_2_src_spark.session import get_session

spark = get_session("hive_udf_probe", shuffle_partitions=2, hive=True)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
# scalar UDF (old-style ql/udf/UDFAscii.java)
spark.sql("CREATE TEMPORARY FUNCTION hive_ascii AS "
          "'org.apache.hadoop.hive.ql.udf.UDFAscii'")
assert spark.sql("SELECT hive_ascii('A') AS a").collect()[0].a == 65
# GenericUDF (ql/udf/generic/GenericUDFInstr.java)
spark.sql("CREATE TEMPORARY FUNCTION hive_instr AS "
          "'org.apache.hadoop.hive.ql.udf.generic.GenericUDFInstr'")
assert spark.sql("SELECT hive_instr('hello', 'll') AS p").collect()[0].p == 3
# GenericUDAF (ql/udf/generic/GenericUDAFCollectSet.java)
spark.sql("CREATE TEMPORARY FUNCTION hive_cset AS "
          "'org.apache.hadoop.hive.ql.udf.generic.GenericUDAFCollectSet'")
got = spark.sql(
    "SELECT sort_array(hive_cset(x)) AS s FROM VALUES (1),(2),(1) t(x)"
).collect()[0].s
assert got == [1, 2]
# GenericUDTF (ql/udf/generic/GenericUDTFExplode.java)
spark.sql("CREATE TEMPORARY FUNCTION hive_expl AS "
          "'org.apache.hadoop.hive.ql.udf.generic.GenericUDTFExplode'")
assert [r.col for r in spark.sql("SELECT hive_expl(array(1,2))").collect()] == [1, 2]
# XML family (ql/udf/xml/GenericUDFXPath.java)
spark.sql("CREATE TEMPORARY FUNCTION hive_xpath AS "
          "'org.apache.hadoop.hive.ql.udf.xml.GenericUDFXPath'")
assert spark.sql(
    "SELECT hive_xpath('<a><b>1</b><b>2</b></a>', '//b/text()') AS v"
).collect()[0].v == ["1", "2"]
# old-style math (ql/udf/UDFConv.java — base conversion)
spark.sql("CREATE TEMPORARY FUNCTION hive_conv AS "
          "'org.apache.hadoop.hive.ql.udf.UDFConv'")
assert spark.sql("SELECT hive_conv('ff', 16, 10) AS v").collect()[0].v == "255"
# UDTF stack (ql/udf/generic/GenericUDTFStack.java)
spark.sql("CREATE TEMPORARY FUNCTION hive_stack AS "
          "'org.apache.hadoop.hive.ql.udf.generic.GenericUDTFStack'")
assert [r.col0 for r in spark.sql("SELECT hive_stack(2, 'a', 'b')").collect()] \
    == ["a", "b"]
# text tokenizer (ql/udf/generic/GenericUDFSentences.java)
spark.sql("CREATE TEMPORARY FUNCTION hive_sent AS "
          "'org.apache.hadoop.hive.ql.udf.generic.GenericUDFSentences'")
assert spark.sql("SELECT hive_sent('Hi there. Bye.') AS v").collect()[0].v \
    == [["Hi", "there"], ["Bye"]]
print("HIVE_UDF_COMPAT_OK")
"""


def test_hive_udf_udaf_udtf_classes_run_verbatim():
    out = subprocess.run(
        [sys.executable, "-c", PROBE],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=".",
    )
    assert "HIVE_UDF_COMPAT_OK" in out.stdout, out.stderr[-2000:]
