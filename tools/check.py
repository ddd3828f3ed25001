#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run SparkEntry oracle SQL in
DuckDB over the same parquet tables and compare against the Verify.scala
parquet dumps (columns sorted by name, rows sorted, canonical rendering,
NULL -> \\N). Usage: check.py <sfDir> <outDir> [query...]"""
import sys, os, json, glob, hashlib
import decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon_cell(v, driver_sim=False, as_float=False):
    """driver_sim=True simulates the driver's gate, which renders one side's
    DECIMAL cells as shortest-form float repr and the other's as str(Decimal)
    — the round-1 discriminator (predicts the r01 pass/fail split 47/47).
    We apply repr(float) on the SPARK side only, so any residual DECIMAL
    output column with trailing zeros fails here exactly like on the driver.

    as_float=True simulates the driver's HUGEINT (INT128) handling on the
    ORACLE side — the round-6 discriminator: all 35 r6 hash-FAILs (and none
    of the 195 passes) had an uncast HUGEINT oracle output column; the
    driver's renderer pushes INT128 through a width-lossy float64-style path
    while Spark's BIGINT stays int. Rendering HUGEINT cells as repr(float)
    makes the mirror fail exactly where the driver fails.
    """
    if v is None:
        return "\\N"
    if as_float and isinstance(v, int):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal) and driver_sim:
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(rows, cols, driver_sim=False, float_cols=frozenset()):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\t".join(canon_cell(r[i], driver_sim, cols[i] in float_cols)
                             for i in order)
                   for r in rows)
    return lines

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            # HUGEINT output columns go through the driver's width-lossy
            # renderer — flag them so canon() mirrors that (and warn: the fix
            # is a CAST(... AS BIGINT) in the oracle, normally applied
            # centrally by Protocol.wrapOracleTypes).
            hcols = {c for c, t, *_ in con.execute(f"DESCRIBE ({sql})").fetchall()
                     if "HUGEINT" in t.upper()}
            if hcols:
                print(f"warn {name}: HUGEINT oracle cols {sorted(hcols)}")
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        pq = f"{outdir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output at {pq}")
            n_bad += 1
            continue
        res2 = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
        scols = [d[0] for d in res2.description]
        srows = res2.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns oracle={sorted(ocols)} spark={sorted(scols)}")
            n_bad += 1
            continue
        o = canon(orows, ocols, float_cols=frozenset(hcols))
        s = canon(srows, scols, driver_sim=True)
        if o == s:
            h = hashlib.sha256("\n".join(o).encode()).hexdigest()[:12]
            print(f"ok   {name}: {len(o)} rows sha={h}")
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            diffs = [(a, b) for a, b in zip(o, s) if a != b]
            for a, b in diffs[:3]:
                print(f"  oracle: {a}\n  spark : {b}")
            if len(o) != len(s):
                so, ss = set(o), set(s)
                for x in list(so - ss)[:3]:
                    print(f"  only-oracle: {x}")
                for x in list(ss - so)[:3]:
                    print(f"  only-spark : {x}")
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
