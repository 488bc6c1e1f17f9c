#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs the DuckDB oracle.

Mimics the driver's t2 gate: read each Spark-written result parquet from
the Verify outDir, run the paired oracle SQL in DuckDB over the same
scale-factor tables, sort columns by name and rows by value, and compare
canonicalized cell values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)


def frame(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM "
                f"'{sf_dir}/{name}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no parquet written")
            n_fail += 1
            continue
        rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        s_cols, s_rows = frame(rel.fetchall(), rel.columns)
        if name not in oracles:
            print(f"[ROWS] {name}: rows={len(s_rows)} (no oracle)")
            continue
        try:
            orel = con.sql(oracles[name])
            o_cols, o_rows = frame(orel.fetchall(), orel.columns)
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_fail += 1
            continue
        if s_cols != o_cols:
            print(f"[COLS] {name}: spark={s_cols} oracle={o_cols}")
            n_fail += 1
        elif len(s_rows) != len(o_rows):
            print(f"[NROWS] {name}: spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
        elif s_rows != o_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows))
                       if a != b)
            print(f"[VALS] {name}: first diff at sorted row {bad}:\n"
                  f"   spark : {s_rows[bad]}\n   oracle: {o_rows[bad]}")
            n_fail += 1
        else:
            print(f"[OK]   {name}: {len(s_rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
