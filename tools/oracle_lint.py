#!/usr/bin/env python3
"""Oracle output-type lint.

Usage: python3 tools/oracle_lint.py <sfDir> <oracle_sql.json>

Runs DESCRIBE over every oracle SQL in DuckDB (tables = views over the
sfDir parquet) and fails if any OUTPUT column's type falls outside the
canonical hash-stable set. Motivation: DuckDB silently promotes
sum(BIGINT) to HUGEINT (and integer division keeps it), and the
driver's hasher canonicalizes HUGEINT differently from BIGINT — rows
and schema match while the hash goes red. q50/t25 burned three rounds
on exactly this; the house fix is CAST(... AS BIGINT) on every
windowed/aggregated sum (see q49's oracle). This lint catches the
whole class (HUGEINT, DECIMAL, TINYINT drift, ...) at build time.

Exit 0 = all output columns canonical; 1 = violations (printed).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types the driver's hasher is known to canonicalize stably (the judge's
# round-6 scan: everything outside this set was exactly the red queries).
CANONICAL = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE",
             "TIMESTAMP", "BOOLEAN"}


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERROR {name}: DESCRIBE failed: {e}")
            n_bad += 1
            continue
        for row in desc:
            col, typ = row[0], row[1]
            if typ not in CANONICAL:
                print(f"FAIL {name}.{col}: {typ} (cast it in the oracle SQL)")
                n_bad += 1
    print(f"lint: {len(oracle)} oracles, {n_bad} violations")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
