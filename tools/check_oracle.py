#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views named
after the tables in <sfDir>, sorts columns by name + rows, and
compares cell-by-cell. Tooling only — never shipped in the library.
"""
import sys, os, json, glob, shutil, tempfile, atexit
import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for robust cross-engine compare (Decimal vs decimal128 etc.)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # Bound the oracle explicitly (r13): the r12 sweep lost graph_bfs to
    # a nondeterministic host-pressure OOM in an unbounded connection.
    # A fixed budget makes a pass/fail reproducible instead of a race
    # against whatever else the host is running.
    con.execute("SET memory_limit='8GB'")
    con.execute("SET threads=8")
    # a bounded connection spills; give it a per-invocation absolute temp
    # dir (the default cwd-relative .tmp races its own cleanup at exit,
    # and a shared /tmp path accumulates stale spill across concurrent runs)
    spill = tempfile.mkdtemp(prefix="duckdb_oracle_")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    expected = set(oracles)
    qpath = os.path.join(out_dir, "queries.json")
    if os.path.exists(qpath):
        with open(qpath) as f:
            expected |= set(json.load(f))
    failures = 0
    present = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(expected - present):
        print(f"[MISS ] {name}: op produced no output (run failed?)")
        failures += 1
    for name in sorted(present):
        d = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"[MISS ] {name}: no spark output")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        if name not in oracles:
            status = "ROWS" if len(got) > 0 else "EMPTY"
            print(f"[{status:5}] {name}: rows={len(got)} (rows-only check)")
            if len(got) == 0:
                failures += 1
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[ORAFL] {name}: oracle failed: {e}")
            failures += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"[SCHEM] {name}: spark={list(g.columns)} duck={list(w.columns)}")
            failures += 1
        elif len(g) != len(w):
            print(f"[ROWS ] {name}: spark={len(g)} duck={len(w)}")
            failures += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"[VALS ] {name}: {int(diff.sum())}/{len(g)} rows differ; first:")
            for i in idx:
                print(f"    spark: {g.loc[i].to_dict()}")
                print(f"    duck : {w.loc[i].to_dict()}")
            failures += 1
        else:
            print(f"[OK   ] {name}: rows={len(g)}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
