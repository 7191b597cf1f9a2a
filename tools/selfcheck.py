#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: read the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, sort
columns by name and rows by all values, and compare cell-by-cell (exact
for ints/strings/dates, tiny epsilon printout for floats so near-misses
are visible). This is a builder-side debugging tool only.
"""
import sys, os, json, math
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def table_of(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # scale corpora (ScaleGenV2) ship only documents/embeddings —
        # create views for the tables that exist; a query against a
        # missing one fails per-query, not at setup
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir-of-parts (scale corpora)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for q in qdirs:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{q}/*.parquet')")
        srows, scols = spark_rel.fetchall(), [c for c in spark_rel.columns]
        if q not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {q}: {len(srows)} rows "
                  f"{'OK' if len(srows) > 0 else '!! EMPTY'}")
            continue
        try:
            orel = con.sql(oracle[q])
            orows, ocols = orel.fetchall(), [c for c in orel.columns]
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {q}: oracle error: {e}")
            continue
        s_t, s_c = table_of(srows, scols)
        o_t, o_c = table_of(orows, ocols)
        if s_c != o_c:
            n_fail += 1
            print(f"  [FAIL-cols] {q}: spark={s_c} oracle={o_c}")
            continue
        if len(s_t) != len(o_t):
            n_fail += 1
            print(f"  [FAIL-rows] {q}: spark={len(s_t)} oracle={len(o_t)}")
            continue
        diffs = [(a, b) for a, b in zip(s_t, o_t) if a != b]
        if diffs:
            n_fail += 1
            print(f"  [FAIL-vals] {q}: {len(diffs)}/{len(s_t)} rows differ; first: "
                  f"spark={diffs[0][0]} oracle={diffs[0][1]} cols={s_c}")
        else:
            n_pass += 1
            print(f"  [pass     ] {q}: {len(s_t)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
