#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against DuckDB running the oracle SQL
on the same data — the local approximation of the driver's
BENCH-vs-BASELINE grading. Usage:
    python3 tools/bench_compare.py [bench.json] [sf_dir]
If bench.json is absent, only the DuckDB side runs.
"""
import duckdb, json, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf01.json"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_out"
    spark = json.load(open(bench_path))["queries"]
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    duck = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            duck[name] = time.time() - t0
        except Exception:
            duck[name] = None
    print(f"{'query':28s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    rows = [((spark[q] / duck[q]) if duck.get(q) else 0, q) for q in sorted(spark)]
    for r, q in sorted(rows, reverse=True):
        d = duck.get(q)
        print(f"{q:28s} {spark[q]:8.2f} "
              f"{'     n/a' if not d else format(d, '8.2f')} "
              f"{'' if not d else format(r, '7.1f')}")
    tot_s = sum(spark.values())
    tot_d = sum(v for v in duck.values() if v)
    print(f"\nTOTAL spark={tot_s:.1f}s duck={tot_d:.1f}s ratio={tot_s / tot_d:.2f}")

if __name__ == "__main__":
    main()
