#!/usr/bin/env python3
"""Prove bounded-oracle ≡ reference-oracle (VERDICT r9 item 2).

Seven sf1 oracle formulations were rewritten for tractability
(vectorized dot products, materialized CTEs, deletion-neighborhood
candidates, verified min-label closure). The REWRITE must not change
what is being verified: for every query that carries an
`oracleReference` (dumped by graft.Verify as oracle_sql_reference.json),
this tool runs BOTH formulations in DuckDB over the same testdata views
and asserts the result sets are identical (same normalization as
check_oracle.py: sorted columns, sorted rows, 17-significant-digit
floats). Run it at the SFs where the reference formulation still
completes (sf0.01 / sf0.1); the bounded formulation is then the one the
large-SF gates run.

Usage: check_oracle_equiv.py <sfDir> <verifyOutDir> [outJson]
Exits nonzero on any mismatch or error.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}"
    if v is None:
        return "NULL"
    return str(v)


def main(sf_dir, out_dir, out_json=None):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_tmp'")
    con.execute("SET max_temp_directory_size='40GiB'")
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        if t == "events":
            ts_t = con.execute(
                f"SELECT typeof(ts) FROM '{src}' LIMIT 1").fetchone()[0]
            if ts_t.upper().startswith(("BIGINT", "INT", "HUGEINT")):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * REPLACE ("
                    "make_timestamp(CASE WHEN ts >= 100000000000000000 "
                    "THEN ts // 1000 ELSE ts END) AS ts) "
                    f"FROM '{src}'")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    bounded = json.load(open(f"{out_dir}/oracle_sql.json"))
    reference = json.load(open(f"{out_dir}/oracle_sql_reference.json"))
    results, n_pass, n_fail = {}, 0, 0
    for name in sorted(reference):
        if name not in bounded:
            print(f"FAIL {name}: reference without a live oracle")
            results[name] = {"status": "fail",
                             "detail": "reference without live oracle"}
            n_fail += 1
            continue
        try:
            b = con.execute(bounded[name]).fetchdf()
            r = con.execute(reference[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: {str(ex)[:200]}")
            results[name] = {"status": "fail", "detail": str(ex)[:200]}
            n_fail += 1
            continue
        bc, rc = sorted(b.columns), sorted(r.columns)
        if bc != rc:
            print(f"FAIL {name}: columns {bc} vs {rc}")
            results[name] = {"status": "fail",
                             "detail": f"columns {bc} vs {rc}"}
            n_fail += 1
            continue
        bt = [tuple(norm(v) for v in row)
              for row in b[bc].itertuples(index=False)]
        rt = [tuple(norm(v) for v in row)
              for row in r[rc].itertuples(index=False)]
        bt.sort(), rt.sort()
        if bt != rt:
            diffs = [(x, y) for x, y in zip(bt, rt) if x != y][:3]
            print(f"FAIL {name}: {len(bt)} vs {len(rt)} rows; "
                  f"first diffs {str(diffs)[:300]}")
            results[name] = {"status": "fail",
                             "detail": f"rows {len(bt)} vs {len(rt)}; "
                             f"{str(diffs)[:300]}"}
            n_fail += 1
            continue
        print(f"PASS {name} ({len(bt)} rows identical)")
        results[name] = {"status": "pass", "rows": len(bt)}
        n_pass += 1
    print(f"\n== equiv: {n_pass} pass, {n_fail} fail ==")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail,
                       "queries": results}, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
