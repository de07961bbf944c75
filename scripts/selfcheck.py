#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json against DuckDB views of
the sf tables, loads the Spark result parquet, canonicalizes both (columns
sorted by name, rows sorted by all columns) and compares cell-exact.

Usage: python3 scripts/selfcheck.py <sfdir> <outdir> [query ...]
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    return True
                return a == b
            return float(a) == float(b)
    except (TypeError, ValueError):
        pass
    if (a is None) != (b is None):
        # pandas NaN vs None
        av = a if a is not None else float("nan")
        bv = b if b is not None else float("nan")
        try:
            return (isinstance(av, float) and math.isnan(av)) and \
                   (isinstance(bv, float) and math.isnan(bv))
        except TypeError:
            return False
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:200]}")
            n_fail += 1
            continue
        exp.columns = [c.lower() for c in exp.columns]
        got.columns = [c.lower() for c in got.columns]
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
            n_fail += 1
            continue
        exp, got = canon(exp), canon(got)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        ev, gv = exp.values.tolist(), got.values.tolist()
        for i in range(len(ev)):
            for j in range(len(exp.columns)):
                if not cmp_cell(ev[i][j], gv[i][j]):
                    bad = (i, exp.columns[j], ev[i][j], gv[i][j])
                    break
            if bad:
                break
        if bad:
            i, c, e, g = bad
            print(f"FAIL {name}: row {i} col {c}: exp={e!r} got={g!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    # queries with no oracle: report row counts
    import os
    for nm in sorted(os.listdir(outdir)):
        if nm.endswith(".json") or nm in oracle:
            continue
        if only and nm not in only:
            continue
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{outdir}/{nm}/*.parquet')").fetchone()[0]
            print(f"INFO {nm}: rows-only, {n} rows")
        except Exception as e:
            print(f"WARN {nm}: unreadable: {str(e)[:120]}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
