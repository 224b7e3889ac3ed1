#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/preverify.py <sf_dir> <verify_out_dir>

For each query result parquet in <verify_out_dir> (written by graft.Verify)
with an entry in oracle_sql.json, run the oracle SQL in DuckDB against the
same parquet tables, sort columns by name and rows by all values, and compare.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return repr(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failed = []
    # Belt-and-braces for the r9 artifact pollution: the driver sweeps
    # out_dir treating every subdirectory as a query result, so ANY dir
    # that is not an oracle-keyed dump or a known rows-only query (no
    # oracle by design) would become a bogus red row. Fail loudly here
    # before the driver ever sees it. Dot-prefixed entries are aux by
    # convention and must not appear either (Verify keeps aux state in a
    # temp dir outside out_dir entirely).
    ROWS_ONLY = {"knn_ivf_kmeans", "text_tokens_bpe"}
    for entry in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, entry)
        if not os.path.isdir(full):
            continue
        if entry not in oracles and entry not in ROWS_ONLY:
            print(f"EXTRA    {entry}: non-query directory in verify out_dir "
                  f"(driver would sweep it as a query)")
            failed.append(entry)
    for name in sorted(oracles):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"MISSING  {name} (no result parquet)")
            failed.append(name)
            continue
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        got_cols = [c.lower() for c in got.columns]
        got_rows = got.fetchall()
        try:
            # Materialize the oracle ONCE — relations are lazy, and the
            # dtype check below also needs the result; re-running the
            # heavy recursive/cross-join oracles would double wall time.
            con.execute(f"CREATE OR REPLACE TEMP TABLE _want AS {oracles[name]}")
            want = con.sql("SELECT * FROM _want")
            want_cols = [c.lower() for c in want.columns]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            failed.append(name)
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"COLS     {name}: spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            failed.append(name)
            continue
        # Mirror the driver's pandas canonicalization: value hashes are
        # computed over pandas frames, so (a) a dtype drift (e.g. DuckDB
        # HUGEINT -> float64 vs Spark int64) flips the hash even when
        # fetchall() values compare equal, and (b) array/list cells crash
        # the driver's sort_values with "unhashable type". Catch both here.
        try:
            gdf = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            wdf = con.sql("SELECT * FROM _want").df()
            # The driver's value hash survives width drift (int32 vs int64 —
            # r07 hashed those green) but not kind drift (int64 vs float64,
            # the DuckDB HUGEINT trap). Compare numpy kind, not exact dtype.
            kind = {"i": "int", "u": "int", "f": "float", "b": "bool",
                    "M": "datetime", "m": "timedelta"}
            def kinds(df):
                return {c.lower(): kind.get(t.kind, str(t)) for c, t in df.dtypes.items()}
            gdt, wdt = kinds(gdf), kinds(wdf)
            if gdt != wdt:
                drift = {c: (gdt[c], wdt[c]) for c in gdt if gdt[c] != wdt.get(c)}
                print(f"DTYPES   {name}: spark-vs-oracle pandas dtype drift {drift}")
                failed.append(name)
                continue
        except Exception as e:
            print(f"HARNESS  {name}: pandas dtype check failed ({type(e).__name__}: {e})")
            failed.append(name)
            continue
        # Mirror the driver's sort_values canonicalization per side so an
        # unhashable (array-typed) cell is caught and attributed.
        bad_side = None
        for df, side in ((gdf, "spark"), (wdf, "oracle")):
            try:
                if len(df):
                    df.sort_values(by=list(df.columns))
            except Exception as e:
                print(f"HARNESS  {name}: {side} result not canonicalizable "
                      f"({type(e).__name__}: {e})")
                bad_side = side
        if bad_side:
            failed.append(name)
            continue
        gk, wk = table_key(got_rows, got_cols), table_key(want_rows, want_cols)
        if len(gk) != len(wk):
            print(f"ROWS     {name}: spark={len(gk)} oracle={len(wk)}")
            failed.append(name)
        elif gk != wk:
            bad = next(i for i, (a, b) in enumerate(zip(gk, wk)) if a != b)
            print(f"VALUES   {name}: first diff at sorted row {bad}:")
            print(f"  spark : {gk[bad]}")
            print(f"  oracle: {wk[bad]}")
            failed.append(name)
        else:
            print(f"OK       {name} ({len(gk)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
