#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (spark parquet dirs, written by graft.Verify)
and <verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with the
testdata tables registered as views, and compares: row count, column names,
and exact cell values (columns sorted by name, rows sorted by all columns).
Strictly harsher than a hash compare — if this passes, the driver's should.
NOT part of the Scala engine; driver-side tooling only.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr: we EXPECT bit-identical doubles from both engines
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # queries that THREW in graft.Verify are recorded, not elided — a
    # broken query must show as an ERR row here, never as set shrinkage
    err_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(err_path):
        for name, msg in json.load(open(err_path)).items():
            results[name] = f"ERR {msg}"
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        parts = glob.glob(os.path.join(d, "*.parquet"))
        if not parts:
            results[name] = "EMPTY_OUTPUT"
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({parts!r})").fetch_arrow_table()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={got.num_rows}"
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_ERROR {e}"
            continue
        g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
        if g_cols != e_cols:
            results[name] = f"SCHEMA_MISMATCH got={g_cols} exp={e_cols}"
            continue
        if got.num_rows != exp.num_rows:
            results[name] = f"ROWCOUNT got={got.num_rows} exp={exp.num_rows}"
            continue
        g_rows = sorted(tuple(norm(r[c]) for c in g_cols) for r in got.to_pylist())
        e_rows = sorted(tuple(norm(r[c]) for c in e_cols) for r in exp.to_pylist())
        if g_rows != e_rows:
            diffs = [(a, b) for a, b in zip(g_rows, e_rows) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
            continue
        results[name] = f"OK rows={got.num_rows}"
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_acceptable = sum(1 for v in results.values()
                       if v.startswith("OK") or v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v[:500]}")
    print(f"== {n_ok}/{len(results)} exact-match OK")
    # rows-only (no-oracle) queries are expected; only real mismatches fail
    return 0 if n_acceptable == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
