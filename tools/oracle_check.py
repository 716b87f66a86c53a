"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet, compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by all
columns). Usage:

    python tools/oracle_check.py [sf_dir] [query ...]

Beyond value equality, two REPRESENTATION lints fail queries whose
local value-match can still diverge under the driver's own
environment (the r13 lesson — this checker passed 196/196 while the
driver failed 6):

- DECIMAL output columns: r13's driver run failed exactly the 6
  gates with a DECIMAL output column (all of them decimal(38,x)) and
  passed all 44 without one; across r1-r13, 0 of 190 ever-green
  gates emit a DECIMAL. The driver's canonicalizer evidently fetches
  Spark and DuckDB decimals through different conversion paths.
  Emit BIGINT micro/quarter-units or IEEE-exact DOUBLEs instead.
- TIMEZONE sensitivity is NOT checked here (it needs a second Spark
  pass); ``tests/test_round14_opt.py`` locks the six repaired gates
  tz-invariant, and any epoch math on NTZ columns must use the
  date-part decomposition in ``behavior.rfm_segments``, never an
  NTZ→TIMESTAMP cast (the driver builds its own session and does not
  pin ``spark.sql.session.timeZone``).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

from incubator_pulsar_spark.session import get_spark
from incubator_pulsar_spark.plans.queries import ALL_QUERIES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full round-trip precision: the driver hashes exact values, so a
        # last-ulp divergence must FAIL here too (r1: %.9g masked the q1
        # sum_charge divergence locally while the driver caught it)
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # the default max_temp_directory_size is 0 in this container —
    # DuckDB cannot spill AT ALL and big recursive CTEs (the CC cluster
    # oracles on the constant-collision corpus) die with a misleading
    # "No space left on device". Allow real spill.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET max_temp_directory_size='40GiB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_weak = 0
    for name, q in ALL_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.build(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"weak {name}: rows-only ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            cur = con.execute(q.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        errs = []
        dec_cols = [f.name for f in sdf.schema.fields
                    if "decimal" in f.dataType.simpleString()]
        if dec_cols:
            errs.append(
                f"DECIMAL output columns {dec_cols}: driver-red class "
                f"(r13: 6/6 hash-fails had one, 0/190 ever-green do) — "
                f"emit BIGINT units or IEEE-exact DOUBLE")
        if len(s_rows) != len(o_rows):
            errs.append(f"rowcount spark={len(s_rows)} duckdb={len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            errs.append(f"columns spark={sorted(s_cols)} duckdb={sorted(o_cols)}")
        if not errs:
            cs, co = _canon(s_rows, s_cols), _canon(o_rows, o_cols)
            if cs != co:
                diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                errs.append(f"values differ, first diffs: {diff}")
        if errs:
            print(f"FAIL {name}: {'; '.join(errs)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
