#!/usr/bin/env python3
"""Lint oracle SQL output types: the driver's gate renders DuckDB HUGEINT
(INT128, e.g. from SUM(BIGINT) or arithmetic inheriting it) differently from
Spark's BIGINT even when values match, so any HUGEINT/UHUGEINT output column
is a guaranteed driver hash-FAIL. Also flags other types outside the proven
set {BIGINT, INTEGER, SMALLINT, TINYINT, VARCHAR, DOUBLE, DECIMAL(...),
BOOLEAN, DATE, TIMESTAMP*, BLOB}. Usage: lint_oracle_types.py <sfDir> <oracle_sql.json> [query...]
Exit 1 if any HUGEINT column found."""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

OK_PREFIXES = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR",
               "DOUBLE", "DECIMAL", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB",
               "FLOAT")

def main():
    sfdir, ojson = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(ojson))
    n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
            continue
        bad = [(c, t) for c, t, *_ in desc
               if "HUGEINT" in t.upper() or not t.upper().startswith(OK_PREFIXES)]
        if bad:
            n_bad += 1
            print(f"BAD  {name}: " + ", ".join(f"{c}:{t}" for c, t in bad))
    if n_bad == 0:
        print(f"all {len(only) if only else len(oracle)} oracles type-clean")
    sys.exit(1 if n_bad else 0)

main()
