#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage:
  python3 scripts/local_verify.py <sfDir> <verifyOutDir> [query ...]

<verifyOutDir> is the output of `sbt "runMain graft.Verify <sfDir> <outDir> [query ...]"`:
one parquet dir per query plus oracle_sql.json.

Replicates the driver's compare semantics as observed from CORRECTNESS_r*.json:
  - columns sorted by name before comparing
  - rows compared as an unordered multiset (sorted by all columns)
  - values hashed by their pandas string rendering, so an int64 Spark column
    vs a float64 DuckDB column (e.g. HUGEINT->float64) fails even when the
    numeric values coincide ("3" vs "3.0")

We approximate: per-column, if BOTH sides are float dtype -> numeric compare
with 1e-9 relative tolerance; if dtype *kinds* differ (int vs float, etc.)
-> report dtype_mismatch (a probable driver hash failure); else exact string
compare.

This is dev tooling only — not part of the graft library.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load_spark(outdir, name):
    return duckdb.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()


def normalize(df):
    # driver compare is case-insensitive on column names (DuckDB lowercases
    # unquoted identifiers; search_advanced's _docId passes the real gate)
    df = df.rename(columns={c: c.lower() for c in df.columns})
    df = df[sorted(df.columns)]
    # sort rows by the string form of every column for a stable multiset
    # order. Float columns go LAST in the key and render COARSER (6 sig
    # digits) than the 1e-9 compare tolerance, so near-equal values that
    # the value compare would accept can never land at different sorted
    # positions on the two sides (at 9 digits, values differing right at
    # the tolerance boundary could straddle a rendering step). Every
    # registered query orders/dedups on non-float keys, so the non-float
    # prefix of the key is already discriminating.
    if len(df) > 0:
        def col_key(s):
            if s.dtype.kind == "f":
                return s.map(lambda v: "nan" if pd.isna(v) else f"{v:.6g}")
            return s.astype(str)
        cols = sorted(df.columns, key=lambda c: df[c].dtype.kind == "f")
        key = pd.concat([col_key(df[c]) for c in cols], axis=1) \
            .apply(lambda r: "\x00".join(r), axis=1)
        df = df.iloc[np.argsort(key.values, kind="stable")].reset_index(drop=True)
    return df


def compare(spark_df, oracle_df):
    issues = []
    if len(spark_df) != len(oracle_df):
        issues.append(f"rows {len(spark_df)} vs {len(oracle_df)}")
        return issues
    s_cols = sorted(c.lower() for c in spark_df.columns)
    o_cols = sorted(c.lower() for c in oracle_df.columns)
    if s_cols != o_cols:
        issues.append(f"columns {s_cols} vs {o_cols}")
        return issues
    s, o = normalize(spark_df), normalize(oracle_df)
    for c in s_cols:
        sk, ok = s[c].dtype.kind, o[c].dtype.kind
        both_float = sk == "f" and ok == "f"
        # bool-vs-int etc. count as kind mismatch; object ('O') matches object
        if not both_float and sk != ok:
            issues.append(f"col {c}: dtype kind {s[c].dtype} vs {o[c].dtype}")
            continue
        if both_float:
            a, b = s[c].to_numpy(dtype=float), o[c].to_numpy(dtype=float)
            na_a, na_b = np.isnan(a), np.isnan(b)
            if not (na_a == na_b).all():
                issues.append(f"col {c}: NaN placement differs")
                continue
            m = ~na_a
            if not np.allclose(a[m], b[m], rtol=1e-9, atol=1e-12):
                bad = np.abs(a[m] - b[m]).max() if m.any() else 0
                issues.append(f"col {c}: float values differ (max abs diff {bad})")
        else:
            av, bv = s[c].astype(str).values, o[c].astype(str).values
            if not (av == bv).all():
                i = int(np.argmax(av != bv))
                issues.append(f"col {c}: value mismatch at sorted row {i}: {av[i]!r} vs {bv[i]!r}")
    return issues


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle_sql = json.load(f)
    unknown = only - set(oracle_sql)
    if unknown:
        # a typo'd selective run must not exit green with 0 checks
        print(f"ERROR: not in oracle_sql.json: {sorted(unknown)}")
        sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle_sql):
        if only and name not in only:
            continue
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"SKIP  {name}: no spark dump")
            n_skip += 1
            continue
        try:
            spark_df = load_spark(out_dir, name)
            oracle_df = con.execute(oracle_sql[name]).df()
            issues = compare(spark_df, oracle_df)
        except Exception as e:  # noqa: BLE001 - report and continue
            issues = [f"exception: {e}"]
        if issues:
            n_fail += 1
            print(f"FAIL  {name}")
            for i in issues[:5]:
                print(f"      {i}")
        else:
            n_pass += 1
            print(f"ok    {name}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip")
    # A FULL run (no selective names) with missing dumps means a query
    # crashed at runtime in graft.Verify or the outDir is stale — that
    # must not read as a green gate. Selective runs skip by design.
    if n_fail:
        sys.exit(1)
    if not only and n_skip:
        print(f"ERROR: {n_skip} queries have no spark dump in a full run")
        sys.exit(1)
    sys.exit(0)


if __name__ == "__main__":
    main()
