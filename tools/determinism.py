#!/usr/bin/env python3
"""Determinism audit: two graft.Verify output dirs (different thread
counts) must be row-identical for EVERY query dir — DuckDB EXCEPT ALL
diffed in both directions.

Usage: determinism.py <outDirA> <outDirB>

Driver-side tooling only (not part of the Scala engine).
"""
import sys, os, glob
import duckdb


def main(a_dir, b_dir):
    con = duckdb.connect()
    names_a = {n for n in os.listdir(a_dir)
               if os.path.isdir(os.path.join(a_dir, n))}
    names_b = {n for n in os.listdir(b_dir)
               if os.path.isdir(os.path.join(b_dir, n))}
    if names_a != names_b:
        print(f"DIR MISMATCH: only in A: {sorted(names_a - names_b)}, "
              f"only in B: {sorted(names_b - names_a)}")
        return 1
    bad = 0
    for name in sorted(names_a):
        pa = glob.glob(os.path.join(a_dir, name, "*.parquet"))
        pb = glob.glob(os.path.join(b_dir, name, "*.parquet"))
        if not pa or not pb:
            print(f"{name:38s} EMPTY ({len(pa)} vs {len(pb)} files)")
            bad += 1
            continue
        qa = " UNION ALL ".join(f"SELECT * FROM '{p}'" for p in pa)
        qb = " UNION ALL ".join(f"SELECT * FROM '{p}'" for p in pb)
        d1 = con.sql(f"SELECT count(*) FROM (({qa}) EXCEPT ALL ({qb}))").fetchone()[0]
        d2 = con.sql(f"SELECT count(*) FROM (({qb}) EXCEPT ALL ({qa}))").fetchone()[0]
        if d1 or d2:
            print(f"{name:38s} DIFF a-b={d1} b-a={d2}")
            bad += 1
    print(f"== {len(names_a) - bad}/{len(names_a)} identical")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
