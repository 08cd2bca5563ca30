#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name>/ spark parquet result and compares against
the DuckDB result of oracle_sql.json[name] over <sfDir> tables:
columns sorted by name, rows sorted by all columns, cell-by-cell
string equality.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.astype(str)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: cols exp={sorted(exp.columns)} got={sorted(got.columns)}")
            n_fail += 1
            continue
        e_n, g_n = norm(exp), norm(got)
        if len(e_n) != len(g_n):
            print(f"FAIL {name}: rows exp={len(e_n)} got={len(g_n)}")
            n_fail += 1
            continue
        diff = (e_n != g_n)
        if diff.any().any():
            bad_cols = [c for c in e_n.columns if diff[c].any()]
            i = diff.any(axis=1).idxmax()
            print(f"FAIL {name}: {int(diff.any(axis=1).sum())} differing rows; cols={bad_cols}")
            print(f"  first diff row {i}:\n    exp={e_n.iloc[i].to_dict()}\n    got={g_n.iloc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(e_n)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
