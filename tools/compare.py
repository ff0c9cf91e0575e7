#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> [sf_dir]

Reads each <out>/<name> parquet dir (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the sf tables,
and compares: column names (sorted), row count, and an order-insensitive
exact hash of values. Floats are compared exactly — the engine is built to
produce bit-identical reductions (see Exact.scala).
"""
import sys, os, json, glob, math, hashlib
import duckdb

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
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
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"  {name:28s} NO-OUTPUT")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            print(f"  {name:28s} rows={len(got_rows):6d} (no oracle — rows-only)")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"  {name:28s} ORACLE-ERROR: {str(e)[:120]}")
            n_fail += 1
            continue
        cols_ok = sorted(got_cols) == sorted(exp_cols)
        rows_ok = len(got_rows) == len(exp_rows)
        hash_ok = cols_ok and table_hash(got_cols, got_rows) == table_hash(exp_cols, exp_rows)
        if cols_ok and rows_ok and hash_ok:
            print(f"  {name:28s} OK rows={len(got_rows)}")
            n_pass += 1
        else:
            print(f"  {name:28s} MISMATCH cols_ok={cols_ok} rows {len(got_rows)} vs {len(exp_rows)} hash_ok={hash_ok}")
            if not cols_ok:
                print(f"    got  cols: {sorted(got_cols)}")
                print(f"    want cols: {sorted(exp_cols)}")
            elif not hash_ok and len(got_rows) and len(exp_rows):
                gs = sorted("|".join(norm_cell(c) for c in r) for r in got_rows)
                es = sorted("|".join(norm_cell(c) for c in r) for r in exp_rows)
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
