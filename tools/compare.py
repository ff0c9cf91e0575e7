#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> [sf_dir]

Reads each <out>/<name> parquet dir (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the sf tables,
and compares: column names (sorted), row count, and an order-insensitive
exact hash of values. Floats are compared exactly — the engine is built to
produce bit-identical reductions (see Exact.scala).

Deliberately pandas-based to match the driver harness semantics:
- results go through `fetchdf()`, so DuckDB HUGEINT (e.g. SUM(BIGINT))
  becomes float64 and hash-mismatches a Spark int64 column — oracles must
  CAST integer sums to BIGINT;
- rows are ordered via `DataFrame.sort_values(by=<all columns>)`, which
  raises `unhashable type` on array/struct cells — gate queries must emit
  scalar-stable projections.
"""
import sys, os, json, glob, math, hashlib
import duckdb
import numpy as np


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)  # full precision; ints sum'd to HUGEINT render '123.0'
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return str(v)


def df_hash(df):
    cols = sorted(df.columns)
    # driver-style: sort rows by every column — raises on unhashable cells
    sdf = df[cols].sort_values(by=cols) if len(df) else df[cols]
    h = hashlib.md5()
    for line in sorted(
        "|".join(norm_cell(c) for c in row) for row in sdf.itertuples(index=False)
    ):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"  {name:28s} NO-OUTPUT")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"  {name:28s} READ-ERROR: {str(e)[:120]}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"  {name:28s} rows={len(got):6d} (no oracle — rows-only)")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  {name:28s} ORACLE-ERROR: {str(e)[:120]}")
            n_fail += 1
            continue
        cols_ok = sorted(got.columns) == sorted(exp.columns)
        rows_ok = len(got) == len(exp)
        try:
            hash_ok = cols_ok and df_hash(got) == df_hash(exp)
            harness_err = None
        except Exception as e:
            hash_ok = False
            harness_err = str(e)[:120]
        if cols_ok and rows_ok and hash_ok:
            print(f"  {name:28s} OK rows={len(got)}")
            n_pass += 1
        else:
            print(f"  {name:28s} MISMATCH cols_ok={cols_ok} rows {len(got)} vs {len(exp)} hash_ok={hash_ok}"
                  + (f" harness_err={harness_err}" if harness_err else ""))
            if not cols_ok:
                print(f"    got  cols: {sorted(got.columns)}")
                print(f"    want cols: {sorted(exp.columns)}")
            elif not hash_ok and len(got) and len(exp) and not harness_err:
                gs = sorted("|".join(norm_cell(c) for c in r)
                            for r in got[sorted(got.columns)].itertuples(index=False))
                es = sorted("|".join(norm_cell(c) for c in r)
                            for r in exp[sorted(exp.columns)].itertuples(index=False))
                shown = 0
                for a, b in zip(gs, es):
                    if a != b and shown < 3:
                        print(f"    got : {a[:200]}")
                        print(f"    want: {b[:200]}")
                        shown += 1
            n_fail += 1
    print(f"PASS={n_pass} FAIL={n_fail} NO-ORACLE={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
