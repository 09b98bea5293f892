#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run graft.Verify
first, then compare each dumped parquet result against the DuckDB oracle
SQL on the same testdata. Usage: check.py <verifyOutDir> <sfDir> [name...]"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        if only and name not in only:
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({spark_rel.shape[0]} rows)")
            continue
        try:
            ora = con.sql(oracle[name])
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR {str(e)[:200]}")
            n_fail += 1
            continue
        s_cols, o_cols = sorted(spark_rel.columns), sorted(ora.columns)
        if s_cols != o_cols:
            print(f"  ✗ {name}: SCHEMA spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        key = lambda row: tuple((v is None, str(type(v)), v if v is not None else 0) for v in row)
        s_rows = sorted([tuple(norm(v) for v in r) for r in
                         spark_rel.select(*s_cols).fetchall()], key=key)
        o_rows = sorted([tuple(norm(v) for v in r) for r in
                         ora.select(*o_cols).fetchall()], key=key)
        if len(s_rows) != len(o_rows):
            print(f"  ✗ {name}: ROWS spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        if bad:
            print(f"  ✗ {name}: {len(bad)}/{len(s_rows)} differing rows; first: \n"
                  f"      spark : {bad[0][0]}\n      oracle: {bad[0][1]}")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(s_rows)} rows, cols={s_cols})")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
