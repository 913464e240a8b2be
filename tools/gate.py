"""Pre-snapshot gate: run before ANY end-of-round snapshot commit.

The round-4 lesson: a "full sweep clean" claim went stale because the sweep
ran BEFORE the testdata regenerated, and three streaming queries shipped
broken. This gate makes the ritual mechanical — run it LAST, after every
code or environment change, and never snapshot on a red exit:

    python tools/gate.py                # fast: sf0.001 sweep + driver smoke
    python tools/gate.py --sf0.01      # driver-fidelity: sf0.01 sweep too

Checks, all fatal:
  1. Full-registry oracle sweep at sf0.001 via tools/check.py — every
     registered query BUILDS (analysis errors fatal), EXECUTES, and matches
     its DuckDB oracle.
  2. Driver-contract smoke mirroring the driver's t1: __spark_entry__
     imports, entry(spark) returns rows with a stable schema, queries() and
     oracle_sql() are consistent (every oracle key has a query).
Exit 0 = safe to snapshot; anything else = fix first.

Known blind spot (round-6 evidence): check.py compares via fetchall/Row,
where DATE columns agree, but the external driver compares PANDAS frames,
where DuckDB DATE materializes as Timestamp and Spark DATE as
datetime.date — str-divergent. tools/driver_sim.py is the harness with
driver-exact canonicalization: run it over the full registry after adding
any query that outputs date/timestamp-derived columns (the registry rule
is to cast dates to STRING, which sidesteps the class entirely).
"""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, ".")

FAST_SF = "/root/testdata/sf0.001"
DRIVER_SF = "/root/testdata/sf0.01"


def run_sweep(sf_dir: str) -> bool:
    print(f"[gate] oracle sweep at {sf_dir} ...", flush=True)
    r = subprocess.run([sys.executable, "tools/check.py", sf_dir])
    ok = r.returncode == 0
    print(f"[gate] sweep {'GREEN' if ok else 'RED'} at {sf_dir}", flush=True)
    return ok


def run_driver_smoke() -> bool:
    print("[gate] driver-contract smoke ...", flush=True)
    try:
        import __spark_entry__ as entrymod

        from apache_hive_1_2_2_src_spark.session import get_session

        spark = get_session()
        rows = entrymod.entry(spark)
        schema = [f.name for f in rows.schema.fields]
        collected = rows.collect()
        assert schema, "entry() returned a schemaless DataFrame"
        qs = entrymod.queries()
        oracles = entrymod.oracle_sql()
        missing = set(oracles) - set(qs)
        assert not missing, f"oracle_sql keys without queries(): {sorted(missing)}"
        print(
            f"[gate] smoke GREEN: entry {len(collected)} rows / cols {schema}; "
            f"{len(qs)} queries, {len(oracles)} oracles",
            flush=True,
        )
        return True
    except Exception as exc:  # noqa: BLE001 — gate reports, never hides
        print(f"[gate] smoke RED: {exc!r}", flush=True)
        return False


def main() -> int:
    ok = run_sweep(FAST_SF)
    if "--sf0.01" in sys.argv:
        ok = run_sweep(DRIVER_SF) and ok
    ok = run_driver_smoke() and ok
    print(f"[gate] {'PASS - safe to snapshot' if ok else 'FAIL - do NOT snapshot'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
