#!/usr/bin/env python3
"""Generate the postgres-derived TIMESTAMP vector file (SLT format).

Ports the reference's PostgresTimestampTests fixture — the 66-row
TIMESTAMP_TBL adapted from postgres src/test/regress/sql/timestamp.sql
(reference PostgresTimestampTests.java:70-160, ISO-converted literals,
including the deliberately invalid '1997-02-29 17:32:01' row that loads as
NULL through the Calcite front-end) — and the reference's query shapes
(comparisons vs '1997-01-02', EXTRACT fields, century, CAST to DATE,
interval arithmetic, date_part). Expected values are computed by DuckDB at
generation time; only constructs with identical Spark/DuckDB semantics are
emitted.

Usage: python3 tools/gen_pg_timestamp.py
"""
import re, os
import duckdb

HERE = os.path.dirname(__file__)
REF = "/root/reference/SQL-compiler/src/test/java/org/dbsp/sqlCompiler/compiler/postgres/PostgresTimestampTests.java"
OUT = (os.path.join(os.environ["SLT_OUT"], "pg_timestamp.test") if "SLT_OUT" in os.environ
       else os.path.join(HERE, "..", "src", "test", "resources", "slt", "pg_timestamp.test"))
THRESHOLD = 8

import sys
sys.path.insert(0, HERE)
from gen_slt import render, expected_block  # same SLT formatting contract


def fixture_values():
    vals = []
    for line in open(REF):
        m = re.match(r'\s*"INSERT INTO TIMESTAMP_TBL VALUES \(\'([^\']*)\'\);', line)
        if m:
            vals.append(m.group(1))
    assert len(vals) > 60, f"only {len(vals)} fixture rows found"
    return vals


def main():
    con = duckdb.connect()
    con.execute("CREATE TABLE timestamp_tbl (d1 TIMESTAMP)")
    out = [f"hash-threshold {THRESHOLD}", "",
           "statement ok", "CREATE TABLE timestamp_tbl (d1 TIMESTAMP)", ""]
    for v in fixture_values():
        try:
            con.execute(f"INSERT INTO timestamp_tbl VALUES ('{v}')")
        except Exception:
            con.execute("INSERT INTO timestamp_tbl VALUES (NULL)")
        # the .test keeps the original literal: the runner must map the
        # invalid date to NULL itself (Calcite front-end behavior)
        out += ["statement ok", f"INSERT INTO timestamp_tbl VALUES ('{v}')", ""]

    n = [0]

    def q(sql, fmt, order):
        rows = con.execute(sql).fetchall()
        lines = render(rows, fmt, order)
        out.extend([f"query {fmt} {order}", sql, "----"]
                   + expected_block(lines) + [""])
        n[0] += 1

    q("SELECT d1 FROM timestamp_tbl", "T", "rowsort")
    q("SELECT count(*) FROM timestamp_tbl", "I", "nosort")
    q("SELECT count(d1) FROM timestamp_tbl", "I", "nosort")
    for op in [">", "<", "=", "<>", "<=", ">="]:
        q(f"SELECT d1 FROM timestamp_tbl WHERE d1 {op} TIMESTAMP '1997-01-02 00:00:00'",
          "T", "rowsort")
        q(f"SELECT count(*) FROM timestamp_tbl WHERE d1 {op} TIMESTAMP '1997-01-02 00:00:00'",
          "I", "nosort")
    # DOW is excluded: Spark's EXTRACT(DOW) is Sunday=1-based while
    # postgres/DuckDB are Sunday=0-based; the parity mapping is covered by
    # the q42 oracle query instead.
    for f in ["YEAR", "QUARTER", "MONTH", "WEEK", "DAY", "DOY",
              "HOUR", "MINUTE"]:
        q(f"SELECT EXTRACT({f} FROM d1) FROM timestamp_tbl", "I", "valuesort")
    q("SELECT count(*) FROM timestamp_tbl WHERE EXTRACT(YEAR FROM d1) = 1997", "I", "nosort")
    q("SELECT count(*) FROM timestamp_tbl WHERE EXTRACT(QUARTER FROM d1) = 1", "I", "nosort")
    q("SELECT count(*) FROM timestamp_tbl WHERE EXTRACT(DAY FROM d1) = 10", "I", "nosort")
    # postgres century semantics (1997 -> 20, 2000 -> 20, 2001 -> 21)
    q("SELECT CAST(FLOOR((EXTRACT(YEAR FROM d1)+99)/100) AS INTEGER) FROM timestamp_tbl",
      "I", "valuesort")
    q("SELECT CAST(d1 AS DATE) FROM timestamp_tbl", "T", "rowsort")
    q("SELECT d1 FROM timestamp_tbl WHERE CAST(d1 AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'",
      "T", "rowsort")
    q("SELECT d1 + INTERVAL '1' DAY FROM timestamp_tbl", "T", "rowsort")
    q("SELECT d1 - INTERVAL '3' HOUR FROM timestamp_tbl", "T", "rowsort")
    q("SELECT d1 + INTERVAL '1' MONTH FROM timestamp_tbl WHERE EXTRACT(YEAR FROM d1) = 1997",
      "T", "rowsort")
    for f in ["quarter", "week", "day", "month"]:
        q(f"SELECT date_part('{f}', d1) FROM timestamp_tbl", "I", "valuesort")
    q("SELECT EXTRACT(YEAR FROM d1) AS y, count(*) FROM timestamp_tbl GROUP BY EXTRACT(YEAR FROM d1)",
      "II", "rowsort")
    q("SELECT CAST(d1 AS DATE) AS dd, count(*) FROM timestamp_tbl GROUP BY CAST(d1 AS DATE) HAVING count(*) > 1",
      "TI", "rowsort")
    q("SELECT min(d1), max(d1) FROM timestamp_tbl", "TT", "nosort")

    with open(OUT, "w") as f:
        f.write("\n".join(out).rstrip("\n") + "\n")
    print(f"{OUT}: {n[0]} queries")


if __name__ == "__main__":
    main()
