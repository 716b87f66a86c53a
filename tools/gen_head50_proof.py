"""Generate the head-50 local-proof manifest (VERDICT r13 #8).

Rotation policy hardening: a query may only sit in the driver-gated
head-50 with a recorded LOCAL oracle proof at sf0.01 AND sf0.1. This
tool runs the head-50 against the DuckDB oracle at both SFs (the same
comparison as tools/oracle_check.py, including the decimal-output
lint) and writes ``plans/head50_proof.json``;
``tests/test_round14_opt.py::test_head50_entries_carry_local_proof``
asserts every current head entry is covered with both SFs green, so a
rotation that moves an unproven query into the head fails the suite
until this tool is re-run green.

Usage: python tools/gen_head50_proof.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from incubator_pulsar_spark.plans.queries import ALL_QUERIES
from incubator_pulsar_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "head50_proof.json")


def _norm_cell(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> None:
    spark = get_spark("head50-proof")
    spark.sparkContext.setLogLevel("ERROR")
    head = list(ALL_QUERIES)[:50]
    proof: dict[str, dict[str, bool]] = {n: {} for n in head}
    ok_all = True
    for sf_dir in SFS:
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        con.execute("SET max_temp_directory_size='40GiB'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        sf_key = os.path.basename(sf_dir.rstrip("/"))
        for name in head:
            q = ALL_QUERIES[name]
            t0 = time.time()
            try:
                sdf = q.build(spark, sf_dir)
                dec = [f.name for f in sdf.schema.fields
                       if "decimal" in f.dataType.simpleString()]
                s_rows, s_cols = sdf.collect(), sdf.columns
                cur = con.execute(q.oracle)
                o_cols = [d[0] for d in cur.description]
                o_rows = cur.fetchall()
                ok = (not dec and len(s_rows) == len(o_rows)
                      and sorted(s_cols) == sorted(o_cols)
                      and _canon(s_rows, s_cols) == _canon(o_rows, o_cols))
            except Exception as e:  # noqa: BLE001
                print(f"ERR {name} @ {sf_key}: {e}", file=sys.stderr)
                ok = False
            proof[name][sf_key] = bool(ok)
            ok_all &= ok
            print(f"{'PASS' if ok else 'FAIL'} {name} @ {sf_key} "
                  f"[{time.time()-t0:.1f}s]", file=sys.stderr)
        con.close()
    with open(OUT, "w") as f:
        json.dump({"head": head, "proof": proof}, f, indent=1,
                  sort_keys=True)
    print(f"wrote {OUT}; all green: {ok_all}")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
