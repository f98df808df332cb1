#!/usr/bin/env python3
"""Round-start data probe: dump the CURRENT testdata's physical parquet
schemas and content-edge profile, so type drift / adversarial content
in a regenerated instance is caught before any query is debugged.

Usage: python3 tools/probe.py [/root/testdata] > probe.txt
"""
import glob, os, sys
import duckdb
import pyarrow.parquet as pq


def main(root):
    con = duckdb.connect()
    for sf_dir in sorted(glob.glob(f"{root}/sf*")):
        print(f"== {os.path.basename(sf_dir)}")
        for f in sorted(glob.glob(f"{sf_dir}/*.parquet")):
            s = pq.read_schema(f)
            cols = ", ".join(f"{n}:{t}" for n, t in zip(s.names, s.types))
            print(f"  {os.path.basename(f)}: {cols}")
        d = f"{sf_dir}/documents.parquet"
        if os.path.exists(d):
            row = con.sql(f"""
              SELECT count(*) AS n, count(DISTINCT doc_id) AS distinct_ids,
                sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS null_text,
                sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS null_id,
                sum(CASE WHEN regexp_matches(text,'[^ -~]') THEN 1 ELSE 0 END)
                  AS docs_nonascii,
                sum(CASE WHEN regexp_matches(text,'[\t\n\r]') THEN 1 ELSE 0 END)
                  AS docs_ctl_ws,
                sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS empty_text,
                sum(CASE WHEN regexp_matches(text,'[A-Z]') THEN 1 ELSE 0 END)
                  AS docs_upper,
                sum(CASE WHEN n_chars <> len(text) THEN 1 ELSE 0 END)
                  AS n_chars_mismatch
              FROM '{d}'""").fetchone()
            names = ("n", "distinct_ids", "null_text", "null_id",
                     "docs_nonascii", "docs_ctl_ws", "empty_text",
                     "docs_upper", "n_chars_mismatch")
            print("  documents profile: " +
                  ", ".join(f"{k}={v}" for k, v in zip(names, row)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata")
