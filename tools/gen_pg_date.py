#!/usr/bin/env python3
"""Generate the postgres-derived DATE vector file (SLT format).

Ports the reference's PostgresDateTests fixture — the 16-row DATE_TBL
adapted from postgres src/test/regress/sql/date.sql (reference
PostgresDateTests.java:80-96, including '1997-02-29' which loads as NULL
through the Calcite front-end) — with the reference's query shapes:
comparisons, BETWEEN windows, EXTRACT fields, leap-year days, century,
date ± interval arithmetic, MIN/MAX, ordered scans. Expected values are
computed by DuckDB at generation time; shared-syntax constructs only
(DOW excluded: Spark is Sunday=1-based).

Usage: python3 tools/gen_pg_date.py
"""
import os
import duckdb

HERE = os.path.dirname(__file__)
OUT = (os.path.join(os.environ["SLT_OUT"], "pg_date.test") if "SLT_OUT" in os.environ
       else os.path.join(HERE, "..", "src", "test", "resources", "slt", "pg_date.test"))
THRESHOLD = 8

import sys
sys.path.insert(0, HERE)
from gen_slt import render, expected_block

FIXTURE = [
    "1957-04-09", "1957-06-13", "1996-02-28", "1996-02-29", "1996-03-01",
    "1996-03-02", "1997-02-28", "1997-02-29", "1997-03-01", "1997-03-02",
    "2000-04-01", "2000-04-02", "2000-04-03", "2038-04-08", "2039-04-09",
    "2040-04-10",
]


def main():
    con = duckdb.connect()
    con.execute("CREATE TABLE date_tbl (f1 DATE)")
    out = [f"hash-threshold {THRESHOLD}", "",
           "statement ok", "CREATE TABLE date_tbl (f1 DATE)", ""]
    for v in FIXTURE:
        try:
            con.execute(f"INSERT INTO date_tbl VALUES ('{v}')")
        except Exception:
            con.execute("INSERT INTO date_tbl VALUES (NULL)")
        out += ["statement ok", f"INSERT INTO date_tbl VALUES ('{v}')", ""]

    n = [0]

    def q(sql, fmt, order):
        rows = con.execute(sql).fetchall()
        out.extend([f"query {fmt} {order}", sql, "----"]
                   + expected_block(render(rows, fmt, order)) + [""])
        n[0] += 1

    q("SELECT f1 FROM date_tbl", "T", "rowsort")
    q("SELECT count(*), count(f1) FROM date_tbl", "II", "nosort")
    for op in [">", "<", "=", "<>", "<=", ">="]:
        q(f"SELECT f1 FROM date_tbl WHERE f1 {op} DATE '1997-01-01'", "T", "rowsort")
    q("SELECT f1 FROM date_tbl WHERE f1 BETWEEN DATE '2000-01-01' AND DATE '2001-01-01'",
      "T", "rowsort")
    q("SELECT f1 FROM date_tbl WHERE f1 NOT BETWEEN DATE '1990-01-01' AND DATE '2010-01-01' ORDER BY f1",
      "T", "nosort")
    for f in ["YEAR", "MONTH", "DAY", "QUARTER", "WEEK", "DOY"]:
        q(f"SELECT EXTRACT({f} FROM f1) FROM date_tbl", "I", "valuesort")
    # leap-year semantics: Feb 29 survives in 1996, becomes NULL for 1997
    q("SELECT count(*) FROM date_tbl WHERE EXTRACT(MONTH FROM f1) = 2 AND EXTRACT(DAY FROM f1) = 29",
      "I", "nosort")
    q("SELECT count(*) FROM date_tbl WHERE f1 IS NULL", "I", "nosort")
    # postgres century semantics via the shared floor formula
    q("SELECT CAST(FLOOR((EXTRACT(YEAR FROM f1)+99)/100) AS INTEGER) FROM date_tbl",
      "I", "valuesort")
    # date +/- interval is DATE in Spark but TIMESTAMP in DuckDB — CAST
    # pins the shared type (postgres date arithmetic also yields date)
    q("SELECT CAST(f1 + INTERVAL '1' DAY AS DATE) FROM date_tbl", "T", "rowsort")
    q("SELECT CAST(f1 - INTERVAL '1' MONTH AS DATE) FROM date_tbl WHERE EXTRACT(YEAR FROM f1) >= 2000",
      "T", "rowsort")
    q("SELECT CAST(f1 + INTERVAL '1' YEAR AS DATE) FROM date_tbl WHERE EXTRACT(DAY FROM f1) = 29",
      "T", "rowsort")  # Feb 29 + 1 year clamps to Feb 28 in both engines
    q("SELECT min(f1), max(f1) FROM date_tbl", "TT", "nosort")
    # NULL ordering defaults differ (Spark ASC is NULLS FIRST, DuckDB is
    # NULLS LAST) — ordered scans exclude the NULL row
    q("SELECT f1 FROM date_tbl WHERE f1 IS NOT NULL ORDER BY f1", "T", "nosort")
    q("SELECT f1 FROM date_tbl WHERE f1 IS NOT NULL ORDER BY f1 DESC", "T", "nosort")
    q("SELECT EXTRACT(YEAR FROM f1) AS y, count(*) FROM date_tbl GROUP BY EXTRACT(YEAR FROM f1)",
      "II", "rowsort")
    q("SELECT CAST(f1 AS TIMESTAMP) FROM date_tbl", "T", "rowsort")

    with open(OUT, "w") as f:
        f.write("\n".join(out).rstrip("\n") + "\n")
    print(f"{OUT}: {n[0]} queries")


if __name__ == "__main__":
    main()
