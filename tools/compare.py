#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [only]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
sfDir tables, and diffs: column names (sorted), row count, and a hash
of the value matrix with columns sorted by name and rows sorted.

`only` is the comma-separated prefix list passed to Verify as
SPARK_GRAFT_ONLY. A missing output directory is tolerated ONLY for
queries excluded by that list — on a full run, a query that crashed
engine-side and wrote nothing is a FAIL, not a skip.
"""
import json, sys, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def main(sf_dir, out_dir, only=None):
    import os
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    prefixes = [p for p in (only or "").split(",") if p]
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            n_skip += 1  # excluded by the SPARK_GRAFT_ONLY subset
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            # In-subset (or full-run) query with no output: Verify
            # crashed on it — that is a failure, not a skip.
            print(f"FAIL {name}: no output directory (engine-side crash?)")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = sorted(tuple(canon(v) for v in row)
                              for row in con.sql(
                f"SELECT {','.join(got_cols)} FROM '{out_dir}/{name}/*.parquet'").fetchall())
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = sorted(tuple(canon(v) for v in row)
                              for row in con.sql(
                f"SELECT {','.join(exp_cols)} FROM ({sql})").fetchall())
            if got_cols != exp_cols:
                print(f"FAIL {name}: cols got={got_cols} exp={exp_cols}"); n_fail += 1
            elif len(got_rows) != len(exp_rows):
                print(f"FAIL {name}: rows got={len(got_rows)} exp={len(exp_rows)}"); n_fail += 1
            elif got_rows != exp_rows:
                bad = next(i for i,(g,e) in enumerate(zip(got_rows, exp_rows)) if g != e)
                print(f"FAIL {name}: values differ at sorted-row {bad}:")
                print(f"  got={got_rows[bad]}")
                print(f"  exp={exp_rows[bad]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail =="
          + (f" ({n_skip} excluded by subset)" if n_skip else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
