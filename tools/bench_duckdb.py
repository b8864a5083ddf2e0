#!/usr/bin/env python3
"""Time DuckDB executing registry queries' oracleSql over an SF dir —
the same-box comparison engine for the family-floor receipts
(bench_family_*_r13.json). Mirrors check_oracle.py's view setup; takes
the per-query MIN of N reps (connection + views rebuilt per rep so
nothing is answer-cached across reps).

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> <q1,q2,...> [reps=3] [outJson]
"""
import os, sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("SET temp_directory='/tmp/duckdb_bench_tmp'")
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
    return con


def main():
    sf_dir, oracle_path, qlist = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    out_json = sys.argv[5] if len(sys.argv) > 5 else None
    oracle = json.load(open(oracle_path))
    names = [q.strip() for q in qlist.split(",") if q.strip()]
    missing = [n for n in names if n not in oracle]
    if missing:
        sys.exit(f"not in oracle_sql.json: {missing}")
    mins, loads = {}, []
    for rep in range(reps):
        loads.append(open("/proc/loadavg").read().split()[0])
        for n in names:
            con = connect(sf_dir)
            t0 = time.time()
            con.execute(oracle[n]).fetchall()
            dt = time.time() - t0
            con.close()
            mins[n] = min(mins.get(n, 1e18), dt)
            print(f"[duck] rep {rep+1} {n}: {dt:.3f}s", file=sys.stderr)
    out = {"engine": "duckdb", "sf": sf_dir, "reps": reps,
           "load_per_rep": loads,
           "queries": {n: round(v, 3) for n, v in mins.items()}}
    print(json.dumps(out))
    if out_json:
        json.dump(out, open(out_json, "w"), indent=1)


if __name__ == "__main__":
    main()
