#!/usr/bin/env python3
"""Local differential harness (SURVEY.md §5 adaptation): compare the
Spark results dumped by graft.Verify against the DuckDB oracle SQL,
mimicking the driver's compare (sort columns by name, sort rows, compare
values exactly). Usage:
    python3 tools/oracle_check.py [sf_dir] [verify_out]
"""
import duckdb, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            sdf = norm(con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf())
            ddf = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: cols spark={list(sdf.columns)} duck={list(ddf.columns)}")
            n_fail += 1; continue
        # dtype KIND mismatch (e.g. DuckDB sum(int) -> HUGEINT, which
        # lands as float64/object vs Spark int64) hashes differently
        # driver-side even when values compare equal here. Width-only
        # differences (int32 vs int64: row_number, length) hash equal
        # driver-side (round-1 evidence) — don't flag those.
        def kind(dt):
            s = str(dt)
            if s.startswith(("int", "uint", "Int", "UInt")): return "int"
            if s.startswith("float"): return "float"
            if s.startswith("bool"): return "bool"
            if s.startswith(("datetime", "timestamp")): return "ts"
            return s
        dt_bad = [(c, str(sdf[c].dtype), str(ddf[c].dtype))
                  for c in sdf.columns if kind(sdf[c].dtype) != kind(ddf[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtypes {dt_bad}")
            n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); n_fail += 1; continue
        bad = None
        for c in sdf.columns:
            a, b = sdf[c].tolist(), ddf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                xm = x is None or (isinstance(x, float) and math.isnan(x))
                ym = y is None or (isinstance(y, float) and math.isnan(y))
                if xm and ym:
                    continue
                if xm != ym or x != y:
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
