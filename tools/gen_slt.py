#!/usr/bin/env python3
"""Generate SqlLogicTest `.test` corpora for the SltRunner spec.

The container has no copy of the SQLite sqllogictest suite (the reference
downloads it at test time; this environment has no egress), so we generate
corpora in the same shape as select1/select2/select3 — a systematic
grammar of select-list x WHERE x ORDER BY over small integer tables, plus
aggregate/GROUP BY and join/set-op/subquery files — with expected results
computed independently by DuckDB at generation time and frozen into the
files. Formatting mirrors graft.testing.SltHash (itself mirroring
SqlLogicTest's md5 scheme): ints verbatim, reals %.3f, text with
non-printables as '@' and '' as '(empty)', NULL as 'NULL'; results above
the hash threshold collapse to 'N values hashing to <md5>'.

Only SQL constructs with identical semantics in DuckDB and Spark
(non-ANSI) are emitted — `/` is float division in both, `%` on positive
ints matches, EXCEPT/INTERSECT/UNION are distinct-semantics in both.

Usage: python3 tools/gen_slt.py  (writes src/test/resources/slt/*.test)
"""
import duckdb, hashlib, os, random
from decimal import Decimal, ROUND_HALF_UP

# SLT_OUT override: tools/check_slt.sh regenerates into a scratch dir and
# diffs against the frozen corpus, so frozen files cannot drift from the
# generator (the r12 selfjoin drift — a shared-rng shift re-froze a family
# whose generator hadn't changed).
OUT = os.environ.get(
    "SLT_OUT",
    os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "slt"))
THRESHOLD = 8

rng = random.Random(20260812)


def fmt_value(v, f):
    if v is None:
        return "NULL"
    if f == "I":
        if isinstance(v, float):
            return str(int(v))  # truncate toward zero (positive data)
        return str(int(v))
    if f == "R":
        # Java's %.3f (SltHash) rounds HALF_UP on the SHORTEST decimal
        # representation of the double (FloatingDecimal digits), NOT on its
        # exact binary expansion: 304.76249999999998... has shortest repr
        # '304.7625' and prints 304.763, while exact-binary HALF_UP would
        # give 304.762. Python's repr() is the same shortest-repr
        # algorithm, so Decimal(repr(v)) mirrors Java exactly (and still
        # rounds halfway cases up, away from C/Python printf's
        # half-to-even: 0.0625 -> 0.063).
        d = Decimal(repr(float(v))).quantize(Decimal("0.001"),
                                             rounding=ROUND_HALF_UP)
        return f"{d:.3f}"
    if f == "T":
        s = str(v)
        if s == "":
            return "(empty)"
        return "".join(ch if " " <= ch <= "~" else "@" for ch in s)
    raise ValueError(f)


def render(rows, fmt, order):
    formatted = [[fmt_value(v, f) for v, f in zip(row, fmt)] for row in rows]
    if order == "rowsort":
        formatted.sort()
        lines = [v for row in formatted for v in row]
    elif order == "valuesort":
        lines = sorted(v for row in formatted for v in row)
    else:
        lines = [v for row in formatted for v in row]
    return lines


def expected_block(lines):
    if len(lines) > THRESHOLD:
        digest = hashlib.md5(("".join(l + "\n" for l in lines)).encode()).hexdigest()
        return [f"{len(lines)} values hashing to {digest}"]
    return list(lines)


class File:
    def __init__(self, name):
        self.name = name
        self.con = duckdb.connect()
        self.out = [f"hash-threshold {THRESHOLD}", ""]
        self.n_queries = 0

    def statement(self, sql):
        self.con.execute(sql)
        self.out += ["statement ok", sql, ""]

    def query(self, sql, fmt, order):
        rows = self.con.execute(sql).fetchall()
        lines = render(rows, fmt, order)
        # a whitespace-only value line would read as a record separator
        assert all(l.strip() for l in lines), \
            f"whitespace-only result value breaks SLT framing: {sql!r}"
        header = f"query {fmt} {order}" if order != "nosort" else f"query {fmt} nosort"
        self.out += [header, sql, "----"] + expected_block(lines) + [""]
        self.n_queries += 1

    def query_oracle(self, sql, oracle_sql, fmt, order):
        """Emit `sql` into the .test file but freeze the expectation from
        `oracle_sql` — for constructs DuckDB can't bind verbatim (e.g.
        multi-column IN subqueries) where an equivalent spelled-out form
        defines the expected 3VL semantics."""
        rows = self.con.execute(oracle_sql).fetchall()
        lines = render(rows, fmt, order)
        assert all(l.strip() for l in lines), \
            f"whitespace-only result value breaks SLT framing: {sql!r}"
        header = f"query {fmt} {order}" if order != "nosort" else f"query {fmt} nosort"
        self.out += [header, sql, "----"] + expected_block(lines) + [""]
        self.n_queries += 1

    def statement_oracle(self, sql, oracle_sql):
        """Emit `sql` into the .test file but execute `oracle_sql` against
        the embedded DuckDB — for literals Spark's runner parses but DuckDB
        spells differently (e.g. a bare NaN double literal)."""
        self.con.execute(oracle_sql)
        self.out += ["statement ok", sql, ""]

    def write(self):
        os.makedirs(OUT, exist_ok=True)
        path = os.path.join(OUT, self.name)
        with open(path, "w") as f:
            f.write("\n".join(self.out).rstrip("\n") + "\n")
        print(f"{path}: {self.n_queries} queries")
        return self.n_queries


def maybe_null(v, k):
    return "NULL" if k == 0 else str(v)


def t1_statements(f):
    f.statement("CREATE TABLE t1(a INTEGER, b INTEGER, c INTEGER, d INTEGER, e INTEGER)")
    orders = ["(a,b,c,d,e)", "(e,c,b,d,a)", "(b,d,a,e,c)", "(d,a,e,b,c)"]
    for i in range(32):
        a = 100 + 7 * i
        vals = {"a": str(a)}
        for name in "bcde":
            v = 100 + rng.randrange(150)
            vals[name] = maybe_null(v, rng.randrange(13))
        cols = orders[i % len(orders)]
        names = cols.strip("()").split(",")
        f.statement(f"INSERT INTO t1{cols} VALUES({','.join(vals[n] for n in names)})")


def t3_statements(f):
    f.statement("CREATE TABLE t3(k INTEGER, v INTEGER)")
    for i in range(20):
        k = 100 + 7 * rng.randrange(40)  # overlaps about half of t1.a
        v = 200 + rng.randrange(99)
        f.statement(f"INSERT INTO t3 VALUES({k},{v})")


def t2_statements(f):
    f.statement("CREATE TABLE t2(i INTEGER, s TEXT)")
    words = ["alpha", "bravo charlie", "Delta", "echo-foxtrot", "", "golf",
             "HOTEL india", "juliet", "kilo.lima", "mike", "november",
             "oscar papa", "QUEBEC", "romeo", "sierra tango", "uniform"]
    for i, w in enumerate(words + words[:8]):
        f.statement(f"INSERT INTO t2 VALUES({i},'{w}')")


def gen_select1():
    f = File("select1.test")
    t1_statements(f)
    exprs = [
        "a", "a+b*2", "a+b*2+c*3", "a+b*2+c*3+d*4", "a+b*2+c*3+d*4+e*5",
        "abs(b-c)", "(a+b+c+d+e)/5", "a-b", "d-e", "coalesce(b,a)",
        "coalesce(e,d,c,b,a)",
        "case when a<b then a+1 else b-1 end",
        "case a%3 when 0 then a*2 when 1 then a+3 else a-4 end",
        "b*2-c", "coalesce(c,d,e)",
        "case when b is null then -1 else b end",
        "a%10", "(b+c)*(d-e)", "abs(a-b)+abs(c-d)",
        "case when a%2=0 then b else c end",
        "least(b,c)", "greatest(d,e)", "least(a,b,c,d,e)",
    ]
    wheres = [
        "", "a>b", "b>c and c>d", "c BETWEEN b-2 AND d+2",
        "e+d BETWEEN a+b-10 AND c+130", "a IS NOT NULL and b<c",
        "b IS NULL or c IS NULL", "a>b-2 and a<b+2",
        "d NOT BETWEEN 110 and 150", "b IN (SELECT c FROM t1)",
        "e IS NULL", "abs(a-d)<40", "c>d or e>d",
    ]
    sorts = [("", "rowsort"), (" ORDER BY a", "nosort"), (" ORDER BY a DESC", "nosort")]
    for e in exprs:
        for w in wheres:
            for osql, omode in sorts:
                wsql = f" WHERE {w}" if w else ""
                f.query(f"SELECT {e} FROM t1{wsql}{osql}", "I", omode)
    # multi-column select lists
    for i in range(len(exprs)):
        e2 = f"{exprs[i]}, {exprs[(i + 3) % len(exprs)]}, {exprs[(i + 7) % len(exprs)]}"
        for w in wheres:
            wsql = f" WHERE {w}" if w else ""
            f.query(f"SELECT {e2} FROM t1{wsql} ORDER BY a", "III", "nosort")
    # interleaved statements: late inserts must be visible to later queries
    f.statement("INSERT INTO t1(a,b,c,d,e) VALUES(400,150,NULL,120,130)")
    f.statement("INSERT INTO t1(a,b,c,d,e) VALUES(407,NULL,160,121,131)")
    for e in exprs[:6]:
        for w in wheres[:5]:
            wsql = f" WHERE {w}" if w else ""
            f.query(f"SELECT {e} FROM t1{wsql} ORDER BY a", "I", "nosort")
    return f


def gen_select2():
    f = File("select2.test")
    t1_statements(f)
    aggs = ["count(*)", "count(b)", "sum(a)", "sum(b)", "min(c)", "max(d)",
            "sum(a+b)", "min(b-c)", "max(a+e)", "count(distinct b)"]
    wheres = ["", "a>b", "b>c and c>d", "c BETWEEN b-2 AND d+2",
              "e+d BETWEEN a+b-10 AND c+130", "a IS NOT NULL and b<c",
              "b IS NULL or c IS NULL", "a>b-2 and a<b+2",
              "d NOT BETWEEN 110 and 150", "b IN (SELECT c FROM t1)"]
    for agg in aggs:
        for w in wheres:
            wsql = f" WHERE {w}" if w else ""
            f.query(f"SELECT {agg} FROM t1{wsql}", "I", "nosort")
    pairs = [(aggs[i], aggs[(i + 4) % len(aggs)]) for i in range(len(aggs))]
    for g1, g2 in pairs:
        for w in wheres[:6]:
            wsql = f" WHERE {w}" if w else ""
            f.query(f"SELECT {g1}, {g2} FROM t1{wsql}", "II", "nosort")
    groups = ["b%5", "c%4", "d%3", "e%2"]
    havings = ["", " HAVING count(*)>1", " HAVING sum(a)>500"]
    for g in groups:
        for agg in aggs:
            for h in havings:
                f.query(
                    f"SELECT {g} AS grp, {agg} FROM t1 GROUP BY {g}{h}",
                    "II", "rowsort")
    # aggregates over an expression subquery
    for agg in aggs[:5]:
        f.query(
            f"SELECT {agg} FROM (SELECT * FROM t1 WHERE a IS NOT NULL AND b IS NOT NULL) sub",
            "I", "nosort")
    return f


def gen_select3():
    f = File("select3.test")
    t1_statements(f)
    t3_statements(f)
    t2_statements(f)
    # equi joins
    jexprs = [("a, v", "II"), ("a, k, v", "III"), ("b+v, a", "II"),
              ("a, v, b", "III"),
              ("case when b<v then b else v end, a", "II"),
              ("a+k, v*2", "II"), ("coalesce(b,v), a", "II"),
              ("abs(b-v), a, k", "III")]
    jwheres = ["", "b>c", "v>250", "b IS NULL", "a>150 and v<280"]
    for je, nfmt in jexprs:
        for jw in jwheres:
            wsql = f" WHERE {jw}" if jw else ""
            f.query(f"SELECT {je} FROM t1 JOIN t3 ON a=k{wsql}", nfmt, "rowsort")
            f.query(f"SELECT {je} FROM t1 JOIN t3 ON a=k{wsql} ORDER BY a, v", nfmt, "nosort")
    # left joins (NULL padding)
    for jw in jwheres[:3]:
        wsql = f" WHERE {jw}" if jw else ""
        f.query(f"SELECT a, v FROM t1 LEFT JOIN t3 ON a=k{wsql}", "II", "rowsort")
        f.query(f"SELECT count(*), count(v) FROM t1 LEFT JOIN t3 ON a=k{wsql}", "II", "nosort")
    # set operations (distinct semantics in both engines)
    setops = ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]
    sides = [("SELECT b FROM t1", "SELECT v FROM t3"),
             ("SELECT c FROM t1 WHERE c IS NOT NULL", "SELECT v-100 FROM t3"),
             ("SELECT a FROM t1", "SELECT k FROM t3"),
             ("SELECT d FROM t1 WHERE d>120", "SELECT e FROM t1 WHERE e<200")]
    for op in setops:
        for l, r in sides:
            f.query(f"{l} {op} {r}", "I", "rowsort")
    # scalar + IN subqueries
    subs = [
        ("SELECT a, (SELECT max(v) FROM t3) FROM t1 ORDER BY a", "II", "nosort"),
        ("SELECT a, (SELECT count(*) FROM t3 WHERE k=a) FROM t1 ORDER BY a", "II", "nosort"),
        ("SELECT a FROM t1 WHERE a IN (SELECT k FROM t3) ORDER BY a", "I", "nosort"),
        ("SELECT a FROM t1 WHERE a NOT IN (SELECT k FROM t3) ORDER BY a", "I", "nosort"),
        ("SELECT k FROM t3 WHERE EXISTS (SELECT 1 FROM t1 WHERE a=k)", "I", "rowsort"),
        ("SELECT k FROM t3 WHERE NOT EXISTS (SELECT 1 FROM t1 WHERE a=k)", "I", "rowsort"),
        ("SELECT a, b FROM t1 WHERE b = (SELECT min(v) FROM t3)", "II", "rowsort"),
    ]
    for q, fmt, om in subs:
        f.query(q, fmt, om)
    # string expressions over t2
    sexprs = [("s", "T"), ("upper(s)", "T"), ("lower(s)", "T"),
              ("substr(s,2,3)", "T"), ("s || '_' || s", "T"), ("length(s)", "I")]
    swheres = ["", "i%2=0", "length(s)>5", "s LIKE '%o%'", "upper(s)=s"]
    for se, sf in sexprs:
        for sw in swheres:
            wsql = f" WHERE {sw}" if sw else ""
            f.query(f"SELECT {se} FROM t2{wsql}", sf, "valuesort")
            f.query(f"SELECT i, {se} FROM t2{wsql} ORDER BY i", "I" + sf, "nosort")
    # late inserts then re-query
    f.statement("INSERT INTO t3 VALUES(100,299)")
    f.statement("INSERT INTO t2 VALUES(99,'zulu')")
    for q, fmt, om in subs[:4]:
        f.query(q, fmt, om)
    return f


def t4_statements(f):
    f.statement("CREATE TABLE t4(w INTEGER, x INTEGER, y INTEGER, z INTEGER)")
    for i in range(40):
        w = 100 + 3 * i
        x = maybe_null(100 + rng.randrange(120), rng.randrange(11))
        y = maybe_null(100 + rng.randrange(120), rng.randrange(11))
        zz = maybe_null(100 + rng.randrange(120), rng.randrange(11))
        f.statement(f"INSERT INTO t4 VALUES({w},{x},{y},{zz})")


def t5_statements(f):
    f.statement("CREATE TABLE t5(k INTEGER, g INTEGER, v INTEGER)")
    for i in range(60):
        k = 100 + 3 * rng.randrange(55)  # overlaps most of t4.w
        g = rng.randrange(6)
        v = 300 + rng.randrange(200)
        f.statement(f"INSERT INTO t5 VALUES({k},{g},{v})")


def gen_select4():
    """Compound set-operation grammar (the select4 family shape): chains of
    subselects under UNION / UNION ALL / INTERSECT / EXCEPT, parenthesized
    explicitly so both engines associate identically."""
    f = File("select4.test")
    t4_statements(f)
    branches = [
        "SELECT x FROM t4 WHERE w>120",
        "SELECT y FROM t4 WHERE x<y",
        "SELECT z FROM t4 WHERE y BETWEEN 110 AND 180",
        "SELECT x+1 FROM t4 WHERE z IS NOT NULL",
        "SELECT w-100 FROM t4",
        "SELECT abs(y-z) FROM t4 WHERE y IS NOT NULL AND z IS NOT NULL",
        "SELECT x FROM t4 WHERE x IS NULL",
        "SELECT case when x>y then x else y end FROM t4",
        "SELECT z FROM t4 WHERE w%2=0",
        "SELECT y FROM t4 WHERE y>x AND y>z",
        "SELECT x-y FROM t4 WHERE x>=y",
        "SELECT w%7 FROM t4 WHERE z<160",
    ]
    ops = ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]
    for l in branches:
        for r in branches:
            for op in ops:
                f.query(f"({l}) {op} ({r})", "I", "rowsort")
    # three-branch chains, both association orders
    for i in range(len(branches)):
        for d1, d2 in [(1, 2), (3, 5), (2, 7), (5, 1)]:
            a = branches[i]
            b = branches[(i + d1) % len(branches)]
            c = branches[(i + d2) % len(branches)]
            for o1 in ops:
                for o2 in ops:
                    f.query(f"(({a}) {o1} ({b})) {o2} ({c})", "I", "rowsort")
    for i in range(len(branches)):
        for d1, d2, d3 in [(1, 4, 7), (2, 5, 9), (3, 6, 10), (5, 8, 11)]:
            a = branches[i]
            b = branches[(i + d1) % len(branches)]
            c = branches[(i + d2) % len(branches)]
            dd = branches[(i + d3) % len(branches)]
            for o1 in ops:
                for o2 in ops[:2]:
                    f.query(f"((({a}) {o1} ({b})) {o2} ({c})) UNION ({dd})",
                            "I", "rowsort")
    return f


def gen_select5():
    """Join + GROUP BY grammar (the select5 family shape): equi joins of
    t4×t5 under grouped aggregates with HAVING and ORDER BY."""
    f = File("select5.test")
    t4_statements(f)
    t5_statements(f)
    joins = ["t4 JOIN t5 ON w=k", "t4 LEFT JOIN t5 ON w=k",
             "t4 JOIN t5 ON x=k", "t4 JOIN t5 ON w=k AND v>320"]
    groups = ["g", "w%5", "g, w%2", "v%3, g"]
    aggs = ["count(*)", "count(x)", "sum(v)", "min(v)", "max(x)",
            "sum(x+v)", "max(v-y)", "count(distinct v)"]
    wheres = ["", "x IS NOT NULL", "v>350", "y>x", "w BETWEEN 110 AND 220"]
    havings = ["", " HAVING count(*)>1", " HAVING min(v)>310"]
    for j in joins:
        for grp in groups:
            ncols = grp.count(",") + 2
            for agg in aggs:
                for w in wheres:
                    wsql = f" WHERE {w}" if w else ""
                    f.query(f"SELECT {grp}, {agg} FROM {j}{wsql} GROUP BY {grp}",
                            "I" * ncols, "rowsort")
            for agg in aggs[:6]:
                for h in havings[1:]:
                    f.query(f"SELECT {grp}, {agg} FROM {j} GROUP BY {grp}{h}",
                            "I" * ncols, "rowsort")
    for j in joins:
        for grp in groups:
            ncols = grp.count(",") + 3
            for i in range(len(aggs)):
                a1 = aggs[i]; a2 = aggs[(i + 3) % len(aggs)]
                f.query(f"SELECT {grp}, {a1}, {a2} FROM {j} GROUP BY {grp}",
                        "I" * ncols, "rowsort")
    # ungrouped join aggregates + ORDER BY count
    for j in joins:
        for agg in aggs:
            for w in wheres:
                wsql = f" WHERE {w}" if w else ""
                f.query(f"SELECT {agg} FROM {j}{wsql}", "I", "nosort")
    for j in joins[:2]:
        for grp in groups[:2]:
            f.query(
                f"SELECT {grp}, count(*) FROM {j} GROUP BY {grp} "
                f"ORDER BY count(*) DESC, {grp} NULLS FIRST",
                "I" * (grp.count(",") + 2), "nosort")
    return f


def gen_aggregate():
    """Aggregate-family grammar over t1: expression aggregates, DISTINCT,
    multi-key GROUP BY, HAVING over a different aggregate, CASE inside
    aggregates, aggregates over subqueries."""
    f = File("aggregate.test")
    t1_statements(f)
    aggs = ["count(*)", "count(b)", "count(distinct b)", "count(distinct c%10)",
            "sum(a)", "sum(b+c)", "sum(case when b>c then 1 else 0 end)",
            "min(b)", "max(b)", "min(b+c)", "max(a-e)",
            "sum(abs(b-c))", "min(coalesce(b,a))", "max(case when e IS NULL then 0 else e end)"]
    wheres = ["", "a>120", "b IS NOT NULL", "b>c or c>d", "e IS NULL",
              "a%2=0", "c BETWEEN 120 AND 220", "abs(b-d)<50"]
    for agg in aggs:
        for w in wheres:
            wsql = f" WHERE {w}" if w else ""
            f.query(f"SELECT {agg} FROM t1{wsql}", "I", "nosort")
    # aggregate pairs and triples
    for i in range(len(aggs)):
        a1 = aggs[i]; a2 = aggs[(i + 5) % len(aggs)]; a3 = aggs[(i + 9) % len(aggs)]
        for w in wheres:
            wsql = f" WHERE {w}" if w else ""
            f.query(f"SELECT {a1}, {a2} FROM t1{wsql}", "II", "nosort")
            f.query(f"SELECT {a1}, {a2}, {a3} FROM t1{wsql}", "III", "nosort")
    # single- and multi-key GROUP BY with HAVING over a different aggregate
    groups = ["a%4", "b%3", "c%5", "a%2, d%3", "b%2, e%2"]
    havings = ["", " HAVING count(*)>2", " HAVING max(a)>150", " HAVING min(a)<180"]
    for grp in groups:
        ncols = grp.count(",") + 1
        for agg in aggs:
            for h in havings[:3]:
                f.query(f"SELECT {grp}, {agg} FROM t1 GROUP BY {grp}{h}",
                        "I" * (ncols + 1), "rowsort")
        for h in havings[2:]:
            f.query(f"SELECT {grp}, count(*) FROM t1 GROUP BY {grp}{h}",
                    "I" * (ncols + 1), "rowsort")
    for grp in groups:
        ncols = grp.count(",") + 2
        for agg in aggs:
            gkeys = ", ".join(f"{k.strip()} NULLS FIRST" for k in grp.split(","))
            f.query(f"SELECT {grp}, {agg} FROM t1 GROUP BY {grp} "
                    f"ORDER BY {agg} NULLS FIRST, {gkeys}",
                    "I" * ncols, "nosort")
    # aggregates over subqueries and grouped subqueries
    for agg in aggs[:8]:
        f.query(f"SELECT {agg} FROM (SELECT * FROM t1 WHERE b IS NOT NULL) s",
                "I", "nosort")
        f.query(
            f"SELECT max(n) FROM (SELECT a%5 AS grp, count(*) AS n FROM t1 GROUP BY a%5) s",
            "I", "nosort")
    return f


def t6_statements(f):
    f.statement("CREATE TABLE t6(a INTEGER, b INTEGER, c INTEGER, d INTEGER, e INTEGER)")
    f.statement("CREATE INDEX t6i1 ON t6(a)")
    f.statement("CREATE INDEX t6i2 ON t6(b,c)")
    f.statement("CREATE UNIQUE INDEX t6i3 ON t6(a,e)")
    for i in range(48):
        a = 100 + 3 * i
        vals = [str(a)]
        for _ in range(3):
            vals.append(maybe_null(100 + rng.randrange(200), rng.randrange(11)))
        vals.append(str(1000 + i))  # e unique, non-null
        f.statement(f"INSERT INTO t6 VALUES({','.join(vals)})")


def gen_index():
    """Index-family grammar (the SQLite index/between, index/commute,
    index/in, index/orderby, index/delete, index/view shapes): predicate
    batteries re-run after CREATE INDEX (a planner no-op for Spark) and
    after DELETE waves, commuted comparison forms, IN lists/subqueries,
    multi-column ORDER BY, and queries through CREATE VIEW — including
    after the base table changes underneath the view."""
    f = File("index.test")
    t6_statements(f)

    preds = [
        "b BETWEEN 150 AND 200", "b NOT BETWEEN 120 AND 220",
        "b+c BETWEEN 250 AND 400", "c BETWEEN b-20 AND b+20",
        "a BETWEEN 110 AND 150 AND b IS NOT NULL",
        "b=c", "b<c", "b>=c", "b<>c",
        "a%2=0", "a%3=1 AND c IS NOT NULL", "d IS NULL", "d IS NOT NULL",
        "b IN (101,137,168,190,205,244)", "c NOT IN (111,140,170) AND c IS NOT NULL",
        "a IN (SELECT a FROM t6 WHERE b>180)",
        "e IN (SELECT e FROM t6 WHERE d IS NULL)",
        "b>150 OR c<140", "b>150 AND c<240 AND d>=100",
        "abs(b-c)<25", "case when b>c then 1 else 0 end=1",
        "(a-100)%9 IN (0,2,5)", "b IS NULL OR b>230",
    ]
    projs = ["a", "a,b", "a,b,c", "count(*)", "a,b+c"]
    fmts = {"a": "I", "a,b": "II", "a,b,c": "III", "count(*)": "I", "a,b+c": "II"}

    def battery(tag):
        for p in preds:
            for proj in projs:
                f.query(f"SELECT {proj} FROM t6 WHERE {p}", fmts[proj], "rowsort")
        # ORDER BY over filtered scans (nosort pins full output order);
        # NULL placement is explicit because the engines' ASC defaults
        # differ (Spark NULLS FIRST, DuckDB NULLS LAST)
        for p in preds[:12]:
            for ob in ["a", "a DESC", "b NULLS FIRST,a",
                       "b DESC NULLS LAST,a",
                       "c NULLS LAST,b NULLS FIRST,a", "e DESC"]:
                f.query(
                    f"SELECT a,b,c FROM t6 WHERE {p} ORDER BY {ob},a,e",
                    "III", "nosort")

    battery("initial")

    # commuted comparison forms must agree pairwise (index/commute shape)
    commuted = [
        ("a=127", "127=a"), ("b<c", "c>b"), ("b<=c", "c>=b"),
        ("a>120 AND a<150", "150>a AND 120<a"),
        ("b=168 OR 190=b", "168=b OR b=190"),
        ("c BETWEEN 150 AND 200", "150<=c AND c<=200"),
    ]
    for l, r in commuted:
        for q in (l, r):
            f.query(f"SELECT a,b,c FROM t6 WHERE {q}", "III", "rowsort")

    # view battery, re-queried after the table changes underneath
    f.statement("CREATE VIEW v6 AS SELECT a, b, b+c AS s FROM t6 WHERE b IS NOT NULL")
    def view_battery():
        for p in ["s>300", "s BETWEEN 250 AND 380", "b IN (137,168,190)",
                  "a%2=0 AND s IS NOT NULL", "s IS NULL"]:
            f.query(f"SELECT a,s FROM v6 WHERE {p}", "II", "rowsort")
            f.query(f"SELECT count(*) FROM v6 WHERE {p}", "I", "nosort")
    view_battery()

    # delete waves (index/delete shape): re-run the batteries on the
    # shrunken table — NULL predicates must NOT delete (3VL)
    for wave, cond in enumerate([
        "a%5=0", "b<130", "c BETWEEN 140 AND 165 AND d IS NOT NULL"]):
        f.statement(f"DELETE FROM t6 WHERE {cond}")
        f.query("SELECT count(*) FROM t6", "I", "nosort")
        battery(f"after-delete-{wave}")
        view_battery()

    f.statement("DROP VIEW v6")
    f.statement("DELETE FROM t6")
    f.query("SELECT count(*) FROM t6", "I", "nosort")
    return f


def gen_evidence():
    """Evidence-family grammar (the SQLite evidence/* shape): scalar
    function semantics — COALESCE/NULLIF/CASE chains, string functions,
    CAST, HAVING without GROUP BY, EXISTS/NOT EXISTS, quantified
    subqueries — restricted to constructs with identical Spark/DuckDB
    semantics."""
    f = File("evidence.test")
    t1_statements(f)
    t2_statements(f)

    scalar_exprs = [
        ("coalesce(b, c, 0)", "I"), ("coalesce(d, e, b, -1)", "I"),
        ("nullif(b, c)", "I"), ("nullif(a, 100)", "I"),
        ("coalesce(nullif(b, c), -5)", "I"),
        ("abs(b - c)", "I"), ("greatest(a, b, c)", "I"),
        ("least(a, coalesce(b, 999), coalesce(c, 999))", "I"),
        ("CASE WHEN b IS NULL THEN -1 WHEN b < 150 THEN 0 ELSE 1 END", "I"),
        ("CASE b % 3 WHEN 0 THEN 'z' WHEN 1 THEN 'o' ELSE 'x' END", "T"),
        ("CAST(b AS BIGINT) * 2", "I"), ("CAST(a % 7 AS STRING)", "T"),
        ("b * 10 + c % 10", "I"),
    ]
    for e, fmt in scalar_exprs:
        f.query(f"SELECT a, {e} FROM t1 ORDER BY a", f"I{fmt}", "nosort")
        f.query(f"SELECT {e} FROM t1 WHERE b IS NOT NULL AND c IS NOT NULL",
                fmt, "valuesort")
        f.query(f"SELECT count({e}) FROM t1", "I", "nosort")

    string_exprs = [
        ("length(s)", "I"), ("upper(s)", "T"), ("lower(s)", "T"),
        ("trim(s)", "T"), ("substr(s, 1, 3)", "T"), ("substr(s, 2)", "T"),
        ("replace(s, 'a', '_')", "T"), ("s || '!'", "T"),
        ("coalesce(nullif(s, ''), '(none)')", "T"),
        ("CASE WHEN length(s) > 5 THEN 'long' ELSE 'short' END", "T"),
    ]
    for e, fmt in string_exprs:
        f.query(f"SELECT i, {e} FROM t2 ORDER BY i", f"I{fmt}", "nosort")
        f.query(f"SELECT count(*) FROM t2 WHERE {e} IS NOT NULL", "I", "nosort")

    # HAVING without GROUP BY (global-aggregate predicate); identical in both
    for h in ["count(*) > 10", "sum(a) > 3000", "min(a) = 100",
              "max(coalesce(b, 0)) >= 200", "count(d) < count(*)"]:
        f.query(f"SELECT count(*), min(a), max(a) FROM t1 HAVING {h}",
                "III", "nosort")

    # EXISTS / NOT EXISTS / quantified subqueries over t1×t3
    t3_statements(f)
    subs = [
        "EXISTS (SELECT 1 FROM t3 WHERE t3.k = t1.a)",
        "NOT EXISTS (SELECT 1 FROM t3 WHERE t3.k = t1.a)",
        "EXISTS (SELECT 1 FROM t3 WHERE t3.k = t1.a AND t3.v > 250)",
        "a IN (SELECT k FROM t3)",
        "a NOT IN (SELECT k FROM t3)",
        "b < (SELECT max(v) FROM t3)",
        "coalesce(c, 0) < (SELECT avg(v) FROM t3)",
    ]
    for p in subs:
        for proj in ["a", "a,b", "count(*)"]:
            fmt = {"a": "I", "a,b": "II", "count(*)": "I"}[proj]
            f.query(f"SELECT {proj} FROM t1 WHERE {p}", fmt, "rowsort")

    # three-valued logic truth tables over data
    for p in ["b = c", "b <> c", "b < c OR b > c", "NOT (b = c)",
              "b = c OR d IS NULL", "(b = c) IS NULL"]:
        f.query(f"SELECT count(*) FROM t1 WHERE {p}", "I", "nosort")
        f.query(f"SELECT count(*) FROM t1 WHERE NOT ({p})", "I", "nosort")
        f.query(f"SELECT count(*) FROM t1 WHERE ({p}) IS NULL", "I", "nosort")
    return f


def gen_select6():
    """Correlated-subquery grammar (the select6/select7 family shape):
    correlated scalar subqueries in select lists and WHERE (equality AND
    non-equality correlation, the COUNT-over-empty "COUNT bug" shape
    included), correlated [NOT] EXISTS, and [NOT] IN with a correlated
    inner predicate — all shapes verified supported by Spark's
    DecorrelateInnerQuery. Expected values come from DuckDB, so the
    decorrelation rewrite itself is what's under test."""
    f = File("select6.test")
    t1_statements(f)
    t3_statements(f)
    t5_statements(f)

    # (correlation predicate, inner table) pairs; `a`/`b` are outer t1 cols.
    corrs3 = ["k = a", "k < a", "k <= a", "k > a", "k >= a",
              "k = a AND v > 250", "k BETWEEN a - 10 AND a + 10",
              "k <= a + 5 AND v % 2 = 0", "k = a AND v > b",
              "k < a AND v < b + 150"]
    corrs5 = ["k = a", "k < a AND g = 2", "k >= a AND g < 3",
              "k = a AND v > b", "k BETWEEN a - 6 AND a + 6 AND g <> 1"]
    aggs = ["max(v)", "min(v)", "count(*)", "sum(v)", "count(v)"]
    outer_wheres = ["", "a > 150", "b IS NOT NULL", "a % 2 = 0"]

    # scalar subquery in the select list (NULL over empty for max/min/sum,
    # 0 for count — the COUNT-bug shape a naive join rewrite gets wrong)
    for tbl, corrs in [("t3", corrs3), ("t5", corrs5)]:
        for agg in aggs:
            for c in corrs:
                for w in outer_wheres:
                    wsql = f" WHERE {w}" if w else ""
                    f.query(
                        f"SELECT a, (SELECT {agg} FROM {tbl} WHERE {c}) "
                        f"FROM t1{wsql} ORDER BY a", "II", "nosort")

    # scalar subquery used inside an outer expression
    for agg in aggs[:3]:
        for c in corrs3[:6]:
            f.query(
                f"SELECT a, b + coalesce((SELECT {agg} FROM t3 WHERE {c}), 0) "
                f"FROM t1 ORDER BY a", "II", "nosort")
            f.query(
                f"SELECT a, CASE WHEN (SELECT {agg} FROM t3 WHERE {c}) IS NULL "
                f"THEN -1 ELSE 1 END FROM t1 ORDER BY a", "II", "nosort")

    # scalar subquery in WHERE comparisons
    cmps = ["b < (SUB)", "b >= (SUB)", "coalesce(b, 0) + 100 > (SUB)",
            "(SUB) > 250", "(SUB) IS NULL", "(SUB) BETWEEN 200 AND 290"]
    for agg in aggs:
        for c in corrs3:
            sub = f"(SELECT {agg} FROM t3 WHERE {c})"
            for cmp in cmps:
                f.query(
                    f"SELECT a FROM t1 WHERE {cmp.replace('(SUB)', sub)} "
                    f"ORDER BY a", "I", "nosort")

    # correlated [NOT] EXISTS
    for neg in ["", "NOT "]:
        for tbl, corrs in [("t3", corrs3), ("t5", corrs5)]:
            for c in corrs:
                for w in outer_wheres:
                    extra = f" AND {w}" if w else ""
                    f.query(
                        f"SELECT a FROM t1 WHERE {neg}EXISTS "
                        f"(SELECT 1 FROM {tbl} WHERE {c}){extra} ORDER BY a",
                        "I", "nosort")

    # [NOT] IN with a correlated inner predicate (3VL NOT IN included: the
    # inner select can produce NULLs via nullif)
    in_shapes = [
        ("a", "SELECT k FROM t3 WHERE v > b"),
        ("a", "SELECT k FROM t3 WHERE v < b + 160"),
        ("b", "SELECT v - 100 FROM t3 WHERE k <= a"),
        ("a", "SELECT k FROM t5 WHERE g = a % 6"),
        ("a", "SELECT nullif(k, 107) FROM t3 WHERE v > b"),
        ("coalesce(b, 0)", "SELECT v - 150 FROM t3 WHERE k >= a"),
    ]
    for probe, inner in in_shapes:
        for neg in ["IN", "NOT IN"]:
            for w in outer_wheres:
                extra = f" AND {w}" if w else ""
                f.query(
                    f"SELECT a FROM t1 WHERE {probe} {neg} ({inner}){extra} "
                    f"ORDER BY a", "I", "nosort")

    # correlated scalar under an outer aggregate
    for agg in aggs[:4]:
        for c in corrs3[:8]:
            f.query(
                f"SELECT sum(coalesce((SELECT {agg} FROM t3 WHERE {c}), 0)) "
                f"FROM t1", "I", "nosort")
            f.query(
                f"SELECT count(*) FROM t1 WHERE "
                f"(SELECT {agg} FROM t3 WHERE {c}) IS NOT NULL", "I", "nosort")

    # late mutation, then re-run a slice (state visibility)
    f.statement("INSERT INTO t3 VALUES(130,260)")
    f.statement("INSERT INTO t1(a,b,c,d,e) VALUES(413,170,150,NULL,140)")
    for agg in aggs[:3]:
        for c in corrs3[:4]:
            f.query(
                f"SELECT a, (SELECT {agg} FROM t3 WHERE {c}) FROM t1 "
                f"ORDER BY a", "II", "nosort")
    return f


def gen_select7():
    """Deep-expression-nesting grammar: randomly generated integer
    expression trees (depth ≤ 4) over nullable columns — nested CASE,
    coalesce/nullif, least/greatest, abs, bounded literal multipliers (no
    col*col, so no int32 overflow divergence) — in select lists, WHERE
    predicates, and under aggregates. Division is excluded (float in both
    engines but rounding-sensitive); %% only over abs() with a literal."""
    f = File("select7.test")
    t1_statements(f)

    cols = ["a", "b", "c", "d", "e"]

    def leaf():
        r = rng.randrange(7)
        if r < 5:
            return cols[rng.randrange(5)]
        return str(rng.randrange(1, 200))

    def cond(depth):
        r = rng.randrange(8)
        e1, e2 = expr(depth - 1), expr(depth - 1)
        if r == 0:
            return f"{cols[rng.randrange(5)]} IS NULL"
        if r == 1:
            return f"{cols[rng.randrange(5)]} IS NOT NULL"
        if r == 2 and depth > 1:
            return f"({cond(depth - 1)} AND {cond(depth - 1)})"
        if r == 3 and depth > 1:
            return f"({cond(depth - 1)} OR {cond(depth - 1)})"
        op = ["<", "<=", ">", ">=", "=", "<>"][rng.randrange(6)]
        return f"{e1} {op} {e2}"

    def expr(depth):
        if depth <= 0:
            return leaf()
        r = rng.randrange(10)
        e1, e2 = expr(depth - 1), expr(depth - 1)
        if r == 0:
            return f"({e1} + {e2})"
        if r == 1:
            return f"({e1} - {e2})"
        if r == 2:
            return f"{rng.randrange(2, 4)} * {e1}"
        if r == 3:
            return f"abs({e1} - {e2})"
        if r == 4:
            return f"least({e1}, {e2})"
        if r == 5:
            return f"greatest({e1}, {e2})"
        if r == 6:
            return f"coalesce({e1}, {e2})"
        if r == 7:
            return f"nullif({e1}, {e2})"
        if r == 8:
            return f"(abs({e1}) % {rng.randrange(2, 10)})"
        return f"CASE WHEN {cond(depth - 1)} THEN {e1} ELSE {e2} END"

    # single nested expression, plain / filtered / ordered
    for i in range(760):
        e = expr(2 + i % 3)
        if i % 3 == 0:
            f.query(f"SELECT {e} FROM t1 ORDER BY a", "I", "nosort")
        elif i % 3 == 1:
            f.query(f"SELECT {e} FROM t1 WHERE {cond(2)} ORDER BY a",
                    "I", "nosort")
        else:
            f.query(f"SELECT {e} FROM t1", "I", "valuesort")

    # expression pairs
    for i in range(300):
        f.query(f"SELECT {expr(2)}, {expr(3)} FROM t1 ORDER BY a",
                "II", "nosort")

    # nested boolean WHERE over a simple projection (the predicate is the
    # test subject; the select list keeps expected values small)
    for i in range(420):
        f.query(f"SELECT a FROM t1 WHERE {cond(3)} ORDER BY a", "I", "nosort")

    # nested expressions under aggregates and GROUP BY keys
    for i in range(320):
        e = expr(2 + i % 2)
        agg = ["sum", "min", "max", "count"][i % 4]
        f.query(f"SELECT {agg}({e}) FROM t1", "I", "nosort")
    for i in range(160):
        key = f"abs({expr(1)}) % 4"
        f.query(
            f"SELECT {key}, sum({expr(2)}) FROM t1 GROUP BY {key}",
            "II", "rowsort")

    # nested expressions in ORDER BY with LIMIT-free deterministic order
    for i in range(120):
        f.query(
            f"SELECT a, {expr(2)} FROM t1 ORDER BY {expr(1)} NULLS FIRST, a",
            "II", "nosort")
    return f


def gen_window():
    """Window-function grammar: ranking (row_number/rank/dense_rank/ntile/
    percent_rank/cume_dist), offset (lag/lead with defaults), frame-bounded
    aggregates (ROWS and single-key numeric RANGE), and first/last_value
    with explicit frames — over partition x order x frame combos. Every
    OVER(ORDER BY ...) spells NULLS FIRST/LAST explicitly because Spark's
    ASC default is NULLS FIRST while DuckDB's is NULLS LAST; row_number and
    ROWS frames always carry the unique column `a` as a tiebreaker so both
    engines see a total order."""
    f = File("window.test")
    t1_statements(f)
    t5_statements(f)

    parts = ["", "a % 4", "e % 3", "b IS NULL"]
    # (total order spec, tied prefix usable alone with rank/dense_rank)
    orders = [
        ("a", "a NULLS FIRST"),
        ("b NULLS FIRST, a", "b NULLS FIRST"),
        ("c DESC NULLS LAST, a", "c DESC NULLS LAST"),
        ("coalesce(d, 0) NULLS FIRST, a", "coalesce(d, 0) NULLS FIRST"),
    ]

    def over(p, o, frame=""):
        bits = []
        if p:
            bits.append(f"PARTITION BY {p}")
        if o:
            bits.append(f"ORDER BY {o}")
        if frame:
            bits.append(frame)
        return "OVER (" + " ".join(bits) + ")"

    # ranking functions: rank/dense_rank on tied keys, row_number/ntile on
    # total orders; percent_rank/cume_dist formatted as R
    for p in parts:
        for o, tied in orders:
            for fn, fmt in [("row_number()", "I"), ("rank()", "I"),
                            ("dense_rank()", "I"), ("ntile(3)", "I"),
                            ("percent_rank()", "R"), ("cume_dist()", "R")]:
                f.query(
                    f"SELECT a, {fn} {over(p, o)} FROM t1 ORDER BY a",
                    "I" + fmt, "nosort")
            # tied order key: only tie-stable functions
            for fn in ["rank()", "dense_rank()"]:
                f.query(
                    f"SELECT a, {fn} {over(p, tied)} FROM t1 ORDER BY a",
                    "II", "nosort")

    # offset functions
    for p in parts:
        for o, _ in orders[:3]:
            for fn in ["lag(b, 1) ", "lag(b, 2, -1) ", "lead(b, 1) ",
                       "lead(c, 2, 0) ", "lag(b + c, 1) "]:
                f.query(
                    f"SELECT a, {fn}{over(p, o)} FROM t1 ORDER BY a",
                    "II", "nosort")

    # frame-bounded aggregates (ROWS over total orders; RANGE over `a`)
    rows_frames = [
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        "ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING",
    ]
    range_frames = [
        "RANGE BETWEEN 20 PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN 14 PRECEDING AND 14 FOLLOWING",
        "RANGE BETWEEN CURRENT ROW AND 21 FOLLOWING",
    ]
    aggs = [("sum(b)", "I"), ("min(c)", "I"), ("max(b)", "I"),
            ("count(d)", "I"), ("count(*)", "I"), ("avg(b)", "R"),
            ("sum(b + c)", "I")]
    for p in parts:
        for o, _ in orders:
            for fr in rows_frames:
                ag, fmt = aggs[(len(p) + len(o) + len(fr)) % len(aggs)]
                f.query(
                    f"SELECT a, {ag} {over(p, o, fr)} FROM t1 ORDER BY a",
                    "I" + fmt, "nosort")
        for fr in range_frames:
            for ag, fmt in aggs:
                f.query(
                    f"SELECT a, {ag} {over(p, 'a', fr)} FROM t1 ORDER BY a",
                    "I" + fmt, "nosort")

    # default frame (RANGE UNBOUNDED..CURRENT with peers) on tied keys —
    # deterministic because peers share values
    for p in parts:
        for key in ["e % 3", "b IS NULL"]:
            f.query(
                f"SELECT a, count(*) {over(p, key + ' NULLS FIRST')} "
                f"FROM t1 ORDER BY a", "II", "nosort")

    # first/last_value with explicit frames
    for p in parts:
        for o, _ in orders[:2]:
            for fn in ["first_value(b)", "last_value(b)", "first_value(c)"]:
                for fr in ["ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
                           "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"]:
                    f.query(
                        f"SELECT a, {fn} {over(p, o, fr)} FROM t1 "
                        f"ORDER BY a", "II", "nosort")

    # windows over grouped aggregates (window input = GROUP BY output)
    for ag in ["sum(v)", "max(v)", "count(*)"]:
        for wfn in ["row_number()", "rank()", "sum({}) "]:
            inner = wfn.format(ag) if "{}" in wfn else wfn
            f.query(
                f"SELECT g, {ag}, {inner} OVER (ORDER BY {ag} DESC NULLS LAST, g) "
                f"FROM t5 GROUP BY g ORDER BY g", "III", "nosort")

    # multiple windows sharing / differing specs in one select
    for p in parts[:3]:
        f.query(
            f"SELECT a, row_number() {over(p, 'a')}, "
            f"sum(b) {over(p, 'a', rows_frames[0])}, "
            f"rank() {over(p, 'b NULLS FIRST, a')} FROM t1 ORDER BY a",
            "IIII", "nosort")

    # window results consumed by an outer query
    for p in parts[:3]:
        f.query(
            "SELECT a FROM (SELECT a, row_number() "
            f"{over(p, 'b NULLS LAST, a')} AS rn FROM t1) WHERE rn <= 3 "
            "ORDER BY a", "I", "nosort")
        f.query(
            "SELECT rn, count(*) FROM (SELECT ntile(4) "
            f"{over(p, 'a')} AS rn FROM t1) GROUP BY rn ORDER BY rn",
            "II", "nosort")
    return f


def gen_join():
    """Multi-way-join grammar (the select-join shapes the r6 verdict flagged
    as missing): 2-way joins across INNER/LEFT/RIGHT/FULL with equality,
    equality+residual, and pure-inequality conditions; CROSS JOIN +
    filter; self-joins; 3-way chains mixing all four join types; outer-join
    x aggregate mixes (count(col) vs count(*) over padded rows, HAVING,
    multi-aggregate); joins over derived aggregate tables; USING joins;
    set-ops over join results; EXISTS/IN mixed with joins; and a 4-way
    chain. NULL-padded outputs always go through rowsort (NULL ordering
    differs between engines); no division anywhere."""
    f = File("join.test")
    t1_statements(f)
    t3_statements(f)
    t4_statements(f)
    t5_statements(f)

    jtypes = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]

    # -- 2-way t1 x t3 ------------------------------------------------------
    conds13 = ["r.k = a", "r.k = a AND r.v > 250", "r.k = a AND b IS NOT NULL",
               "r.k = c", "r.k = b", "r.k < a - 170",
               "r.k = a AND r.v < b + 200"]
    projs13 = [("a, r.v", "II"), ("a, b, r.k", "III"), ("a, r.k, r.v", "III")]
    wheres13 = ["", "a > 150", "r.v IS NULL", "r.v IS NOT NULL", "a % 2 = 0",
                "b IS NULL AND r.v IS NOT NULL"]
    for jt in jtypes:
        for cnd in conds13:
            for p, fmt in projs13:
                for w in wheres13:
                    wsql = f" WHERE {w}" if w else ""
                    f.query(f"SELECT {p} FROM t1 {jt} t3 r ON {cnd}{wsql}",
                            fmt, "rowsort")

    # -- 2-way t4 x t5 ------------------------------------------------------
    conds45 = ["s.k = w", "s.k = w AND s.g >= 2", "s.k = x",
               "s.k = w AND s.v > y + 250", "s.k > w + 140"]
    projs45 = [("w, s.v", "II"), ("w, x, s.g", "III"), ("s.k, s.g, y", "III")]
    wheres45 = ["", "w > 140", "s.v IS NULL", "x IS NOT NULL AND s.g = 1"]
    for jt in jtypes:
        for cnd in conds45:
            for p, fmt in projs45:
                for w in wheres45:
                    wsql = f" WHERE {w}" if w else ""
                    f.query(f"SELECT {p} FROM t4 {jt} t5 s ON {cnd}{wsql}",
                            fmt, "rowsort")

    # -- CROSS JOIN + filter (the unit-key shape) ---------------------------
    for w in ["a = r.k", "a < r.k AND r.v > 280", "a % 7 = r.k % 7 AND a > 220",
              "r.v - a BETWEEN 80 AND 95", "b = r.v - 100"]:
        for p, fmt in [("a, r.k", "II"), ("a, r.k, r.v", "III")]:
            f.query(f"SELECT {p} FROM t1 CROSS JOIN t3 r WHERE {w}",
                    fmt, "rowsort")
    f.query("SELECT count(*) FROM t1 CROSS JOIN t3 r", "I", "nosort")
    f.query("SELECT count(*), sum(a + r.v) FROM t1 CROSS JOIN t3 r",
            "II", "nosort")

    # -- self-joins ---------------------------------------------------------
    selfconds = ["u.a = w.b", "u.a = w.a + 7", "u.b = w.c", "u.a + 14 = w.a",
                 "u.a = w.a AND u.b < w.c", "u.c = w.d"]
    selfwheres = ["", "u.a > 160", "w.b IS NULL"]
    for jt in jtypes:
        for cnd in selfconds:
            for p, fmt in [("u.a, w.a", "II"), ("u.a, w.a, w.b", "III")]:
                for wh in selfwheres:
                    wsql = f" WHERE {wh}" if wh else ""
                    f.query(f"SELECT {p} FROM t1 u {jt} t1 w ON {cnd}{wsql}",
                            fmt, "rowsort")

    # -- 3-way chains mixing join types ------------------------------------
    on1s = ["r.k = a", "r.k = a AND r.v > 240", "r.k = b"]
    on2s = ["s.k = a", "s.k = r.k", "s.k = a AND s.g < 4"]
    projs3 = [("a, r.v, s.v", "III"), ("a, r.k, s.g", "III"),
              ("b, r.v, s.k", "III")]
    wheres3 = ["", "a > 160", "r.v IS NOT NULL", "s.g = 2", "b IS NULL",
               "s.v IS NULL"]
    for j1 in jtypes:
        for j2 in jtypes:
            for o1 in on1s:
                for o2 in on2s:
                    for p, fmt in projs3:
                        for w in wheres3:
                            wsql = f" WHERE {w}" if w else ""
                            f.query(
                                f"SELECT {p} FROM t1 {j1} t3 r ON {o1} "
                                f"{j2} t5 s ON {o2}{wsql}", fmt, "rowsort")

    # -- outer-join x aggregate mixes --------------------------------------
    grps = ["a % 5", "r.k % 7", "r.v IS NULL", "a % 3, r.k % 2"]
    jaggs = ["count(*)", "count(r.v)", "sum(r.v)", "min(r.v)", "max(b)",
             "count(distinct r.k)", "sum(a + coalesce(r.v, 0))",
             "max(r.v - a)"]
    for jt in jtypes:
        for cnd in conds13[:5]:
            for grp in grps:
                ncols = grp.count(",") + 2
                for agg in jaggs:
                    f.query(
                        f"SELECT {grp}, {agg} FROM t1 {jt} t3 r ON {cnd} "
                        f"GROUP BY {grp}", "I" * ncols, "rowsort")
                for h in [" HAVING count(*) > 2", " HAVING count(r.v) = 0",
                          " HAVING min(r.v) > 240"]:
                    f.query(
                        f"SELECT {grp}, count(*), count(r.v) FROM t1 {jt} "
                        f"t3 r ON {cnd} GROUP BY {grp}{h}",
                        "I" * (grp.count(",") + 3), "rowsort")
    # ungrouped aggregates over outer joins (padding feeds the aggregate)
    for jt in jtypes:
        for cnd in conds13:
            for agg in ["count(*)", "count(r.v)", "sum(r.v)",
                        "count(*) - count(r.k)", "min(coalesce(r.v, 999))"]:
                f.query(f"SELECT {agg} FROM t1 {jt} t3 r ON {cnd}",
                        "I", "nosort")

    # -- aggregates over 3-way joins ---------------------------------------
    grps3 = ["s.g", "a % 4", "s.g, r.k % 2"]
    aggs3 = ["count(*)", "count(r.v)", "sum(s.v)", "max(coalesce(r.v, 0) + s.g)"]
    for j1 in jtypes:
        for j2 in jtypes:
            for o1, o2 in [("r.k = a", "s.k = a"), ("r.k = a", "s.k = r.k")]:
                for grp in grps3:
                    ncols = grp.count(",") + 2
                    for agg in aggs3:
                        f.query(
                            f"SELECT {grp}, {agg} FROM t1 {j1} t3 r ON {o1} "
                            f"{j2} t5 s ON {o2} GROUP BY {grp}",
                            "I" * ncols, "rowsort")

    # -- joins over derived aggregate tables -------------------------------
    deriveds = [
        "(SELECT k, count(*) AS n, sum(v) AS sv FROM t3 GROUP BY k)",
        "(SELECT k, max(v) AS mv FROM t3 WHERE v > 220 GROUP BY k)",
        "(SELECT g, count(*) AS n, min(v) AS mv FROM t5 GROUP BY g)",
    ]
    for jt in jtypes:
        for i, d in enumerate(deriveds):
            key = "r.g = a % 6" if i == 2 else "r.k = a"
            cols = "a, r.n, r.mv" if i == 2 else \
                ("a, r.n, r.sv" if i == 0 else "a, r.mv, b")
            for w in ["", "a > 150", "a % 2 = 1"]:
                wsql = f" WHERE {w}" if w else ""
                f.query(f"SELECT {cols} FROM t1 {jt} {d} r ON {key}{wsql}",
                        "III", "rowsort")
    # derived x derived
    for jt in jtypes:
        f.query(
            "SELECT l.g, l.n, r.n FROM "
            "(SELECT g, count(*) AS n FROM t5 GROUP BY g) l "
            f"{jt} (SELECT v % 6 AS g, count(*) AS n FROM t3 GROUP BY v % 6) r "
            "ON l.g = r.g", "III", "rowsort")
        f.query(
            "SELECT l.kk, l.sv, r.n FROM "
            "(SELECT k % 21 AS kk, sum(v) AS sv FROM t3 GROUP BY k % 21) l "
            f"{jt} (SELECT k % 21 AS kk, count(*) AS n FROM t5 GROUP BY k % 21) r "
            "ON l.kk = r.kk", "III", "rowsort")

    # -- USING joins (t3 and t5 share k) -----------------------------------
    for jt in jtypes:
        for w in ["", "t3.v > 240", "t5.g = 3"]:
            wsql = f" WHERE {w}" if w else ""
            f.query(f"SELECT k, t3.v, t5.g FROM t3 {jt} t5 USING (k){wsql}",
                    "III", "rowsort")

    # -- set-ops over join results -----------------------------------------
    joinsel = [
        "SELECT a FROM t1 JOIN t3 r ON r.k = a",
        "SELECT a FROM t1 LEFT JOIN t3 r ON r.k = a WHERE r.k IS NULL",
        "SELECT a FROM t1 JOIN t5 s ON s.k = a",
        "SELECT r.k FROM t1 RIGHT JOIN t3 r ON r.k = a",
    ]
    for op in ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]:
        for i in range(len(joinsel)):
            for j in range(len(joinsel)):
                if i != j:
                    f.query(f"({joinsel[i]}) {op} ({joinsel[j]})",
                            "I", "rowsort")

    # -- EXISTS / IN mixed with joins --------------------------------------
    for jt in jtypes:
        for shape in [
            "EXISTS (SELECT 1 FROM t5 s WHERE s.k = r.k)",
            "NOT EXISTS (SELECT 1 FROM t5 s WHERE s.k = a)",
            "a IN (SELECT k FROM t5 WHERE g < 3)",
            "coalesce(r.v, 0) NOT IN (SELECT v FROM t5 WHERE g = 1)",
        ]:
            for w in ["", "a > 140", "b IS NOT NULL"]:
                extra = f" AND {w}" if w else ""
                f.query(
                    f"SELECT a, r.k FROM t1 {jt} t3 r ON r.k = a "
                    f"WHERE {shape}{extra}", "II", "rowsort")

    # -- LEFT-join anti/semi idioms ----------------------------------------
    for tbl, key, col in [("t3 r", "r.k = a", "r.k"), ("t5 s", "s.k = a", "s.k")]:
        f.query(f"SELECT a FROM t1 LEFT JOIN {tbl} ON {key} "
                f"WHERE {col} IS NULL", "I", "rowsort")
        f.query(f"SELECT DISTINCT a FROM t1 JOIN {tbl} ON {key}",
                "I", "rowsort")

    # -- FULL-join COALESCE key merge --------------------------------------
    for w in ["", "WHERE a IS NULL OR r.k IS NULL",
              "WHERE coalesce(a, r.k) % 2 = 0"]:
        f.query(
            "SELECT coalesce(a, r.k), a IS NULL, r.k IS NULL "
            f"FROM t1 FULL JOIN t3 r ON r.k = a {w}", "III", "rowsort")

    # -- 4-way chain --------------------------------------------------------
    for j1 in ["JOIN", "LEFT JOIN", "FULL JOIN"]:
        for j2 in jtypes:
            for j3 in ["JOIN", "LEFT JOIN", "FULL JOIN"]:
                for w in ["", "a > 155", "s.g IS NULL OR s.g = 2",
                          "q.x IS NOT NULL"]:
                    wsql = f" WHERE {w}" if w else ""
                    f.query(
                        f"SELECT a, r.k, s.g, q.x FROM t1 {j1} t3 r ON r.k = a "
                        f"{j2} t5 s ON s.k = a {j3} t4 q ON q.w = s.k{wsql}",
                        "IIII", "rowsort")

    # -- late mutation, then re-run a slice (join state visibility) --------
    f.statement("INSERT INTO t3 VALUES(114,275)")
    f.statement("DELETE FROM t5 WHERE g = 5")
    for jt in jtypes:
        f.query(f"SELECT a, r.v FROM t1 {jt} t3 r ON r.k = a", "II", "rowsort")
        f.query(f"SELECT a, s.v FROM t1 {jt} t5 s ON s.k = a", "II", "rowsort")
        f.query(
            f"SELECT a % 5, count(*), count(r.v) FROM t1 {jt} t3 r ON r.k = a "
            "GROUP BY a % 5", "III", "rowsort")

    # ======================================================================
    # Round-13 depth: name-colliding derived sides, 3/4-way mixed-outer
    # chains, USING merges, null-safe ON keys. NO rng draws below this
    # line and no new table statements — additions must not shift the
    # shared generator stream for families generated after this one
    # (frozen-corpus drift, r12 advice item 4). Queries run against the
    # post-mutation table state above; DuckDB freezes the same state the
    # runner replays.
    # ======================================================================

    # -- name-colliding derived sides: BOTH sides expose columns (a, b);
    #    disambiguation is purely by qualifier through the join (the
    #    selfjoin family's collision axis, over derived tables and all
    #    four outer kinds) ---------------------------------------------
    du = "(SELECT a, b FROM t1)"
    dw = "(SELECT k AS a, v AS b FROM t3)"
    dx = "(SELECT k AS a, g AS b FROM t5)"
    colconds = ["u.a = w.a", "u.a = w.a AND w.b > 250", "u.b = w.b - 100",
                "u.a = w.b - 175", "u.a IS NOT DISTINCT FROM w.a",
                "u.a = w.a AND u.b IS NOT DISTINCT FROM w.b - 120"]
    colprojs = [("u.a, w.a", "II"), ("u.a, w.b, u.b", "III"),
                ("u.b, w.b", "II"), ("u.a, w.a, u.b, w.b", "IIII")]
    colwheres = ["", "u.a > 150", "w.b IS NULL",
                 "u.b IS NOT NULL AND w.a % 2 = 0", "u.a IS NULL"]
    for jt in jtypes:
        for cnd in colconds:
            for p, fmt in colprojs:
                for wh in colwheres:
                    wsql = f" WHERE {wh}" if wh else ""
                    f.query(
                        f"SELECT {p} FROM {du} u {jt} {dw} w ON {cnd}{wsql}",
                        fmt, "rowsort")

    # -- 3-way chains where EVERY side exposes (a, b) --------------------
    on2s_c = ["x.a = u.a", "x.a = w.a", "x.b = u.a % 5",
              "x.a = u.a AND x.b < 4"]
    projs_c = [("u.a, w.a, x.a", "III"), ("u.b, w.b, x.b", "III"),
               ("u.a, w.b, x.a, x.b", "IIII")]
    wheres_c = ["", "u.a > 160", "w.a IS NULL", "x.b IS NOT NULL",
                "u.b IS NULL AND x.a IS NOT NULL"]
    for j1 in jtypes:
        for j2 in jtypes:
            for o2 in on2s_c:
                for p, fmt in projs_c:
                    for wh in wheres_c:
                        wsql = f" WHERE {wh}" if wh else ""
                        f.query(
                            f"SELECT {p} FROM {du} u {j1} {dw} w "
                            f"ON u.a = w.a {j2} {dx} x ON {o2}{wsql}",
                            fmt, "rowsort")

    # -- the SAME derived table joined three times (copy-collision chain,
    #    the double-LATERAL rename-registry shape in plain-join form) ----
    for j1 in jtypes:
        for j2 in jtypes:
            for p, fmt in [("u.a, w.a, x.a", "III"),
                           ("u.b, w.b, x.b", "III")]:
                for wh in ["", "w.a IS NULL", "x.a IS NULL AND u.a > 140",
                           "u.b < x.b"]:
                    wsql = f" WHERE {wh}" if wh else ""
                    f.query(
                        f"SELECT {p} FROM {dw} u {j1} {dw} w ON u.a = w.a "
                        f"{j2} {dw} x ON x.a = w.a AND x.b > u.b{wsql}",
                        fmt, "rowsort")

    # -- 4-way mixed-outer chains with residuals on each ON ---------------
    ons4 = [
        ("r.k = a", "s.k = a", "q.w = s.k"),
        ("r.k = a AND r.v > 230", "s.k = r.k",
         "q.w = a AND q.x IS NOT NULL"),
        ("r.k = b", "s.k = a AND s.g < 4", "q.w = s.k AND q.y > 120"),
    ]
    projs4 = [("a, r.v, s.g, q.x", "IIII"), ("b, r.k, s.v, q.w", "IIII")]
    wheres4 = ["", "a % 2 = 0", "r.v IS NULL AND s.g IS NOT NULL",
               "q.w IS NULL"]
    for j1 in jtypes:
        for j2 in jtypes:
            for j3 in jtypes:
                for oi, (o1, o2, o3) in enumerate(ons4):
                    p, fmt = projs4[(len(j1) + len(j2) + oi) % 2]
                    for wh in wheres4:
                        wsql = f" WHERE {wh}" if wh else ""
                        f.query(
                            f"SELECT {p} FROM t1 {j1} t3 r ON {o1} "
                            f"{j2} t5 s ON {o2} {j3} t4 q ON {o3}{wsql}",
                            fmt, "rowsort")

    # -- USING joins with colliding non-key columns (merged key column is
    #    unqualified: LEFT/RIGHT take the preserved side, FULL coalesces —
    #    identical in both engines; b stays qualified on both sides) -----
    for jt in jtypes:
        for p, fmt in [("a", "I"), ("a, u.b, w.b", "III"), ("a, w.b", "II")]:
            for wh in ["", "a > 150", "u.b IS NULL OR w.b IS NULL",
                       "w.b > 240"]:
                wsql = f" WHERE {wh}" if wh else ""
                f.query(
                    f"SELECT {p} FROM (SELECT a, b FROM t1) u {jt} "
                    f"(SELECT k AS a, v AS b FROM t3) w USING (a){wsql}",
                    fmt, "rowsort")

    # -- null-safe ON keys over genuinely nullable columns ----------------
    nsconds = ["u.b IS NOT DISTINCT FROM w.x",
               "u.c IS NOT DISTINCT FROM w.y",
               "u.b IS NOT DISTINCT FROM w.x AND u.a < w.w + 60"]
    for jt in jtypes:
        for cnd in nsconds:
            for p, fmt in [("u.a, w.w", "II"), ("u.b, w.x, w.w", "III")]:
                for wh in ["", "u.b IS NULL", "w.x IS NOT NULL",
                           "u.a % 2 = 1"]:
                    wsql = f" WHERE {wh}" if wh else ""
                    f.query(
                        f"SELECT {p} FROM t1 u {jt} t4 w ON {cnd}{wsql}",
                        fmt, "rowsort")

    # -- aggregates over the colliding 3-way chains ------------------------
    aggs_c = ["count(*)", "count(w.a)", "count(x.b)", "sum(x.b)",
              "min(w.b)", "max(coalesce(w.b, 0) - coalesce(u.b, 0))"]
    for j1 in jtypes:
        for j2 in jtypes:
            for grp in ["u.a % 4", "x.b", "w.a IS NULL"]:
                for ai, agg in enumerate(aggs_c):
                    if (ai + len(j1)) % 2 == 0:
                        continue
                    f.query(
                        f"SELECT {grp}, {agg} FROM {du} u {j1} {dw} w "
                        f"ON u.a = w.a {j2} {dx} x ON x.a = u.a "
                        f"GROUP BY {grp}", "II", "rowsort")
    return f


def gen_subquery():
    """Subquery grammar complementing select6 (which owns correlated
    scalar/EXISTS/IN): multi-column [NOT] IN tuples (3VL row-wise, a shape
    Spark lowers without the single-column null-aware hash join),
    uncorrelated scalar comparison grids, scalar-vs-scalar comparisons,
    nested subqueries (IN inside EXISTS inside IN), set-op and
    derived-aggregate inner queries, GROUP BY/HAVING gated by scalar
    subqueries, aggregates over subquery-filtered rows, and several
    subqueries per query. All shapes probe-verified supported by Spark's
    subquery planning; expectations frozen from DuckDB."""
    f = File("subquery.test")
    t1_statements(f)
    t3_statements(f)
    t4_statements(f)
    t5_statements(f)

    outer_wheres = ["", "a > 150", "b IS NOT NULL", "a % 2 = 1"]

    # -- uncorrelated scalar comparison grid -------------------------------
    lhss = ["a", "b", "c", "b + c", "d - 7"]
    ops = ["<", "<=", ">", ">=", "=", "<>"]
    scalars = [
        "(SELECT min(v) FROM t3) - 150",
        "(SELECT max(k) FROM t3) - 120",
        "(SELECT count(*) FROM t5) + 100",
        "(SELECT min(x) FROM t4)",          # over nullable col, still a value
        "(SELECT max(v) FROM t5 WHERE g = 2) - 250",
        "(SELECT sum(g) FROM t5) - 20",
    ]
    for lhs in lhss:
        for op in ops:
            for sc in scalars:
                for w in outer_wheres[:3]:
                    wsql = f" AND {w}" if w else ""
                    f.query(f"SELECT a FROM t1 WHERE {lhs} {op} {sc}{wsql}",
                            "I", "rowsort")

    # -- scalar vs scalar --------------------------------------------------
    for op in ops:
        for l, r in [("(SELECT max(k) FROM t3)", "(SELECT min(k) FROM t5) + 110"),
                     ("(SELECT count(*) FROM t3)", "(SELECT count(*) FROM t5) - 40"),
                     ("(SELECT min(v) FROM t3)", "(SELECT max(v) FROM t5) - 260")]:
            f.query(f"SELECT count(*) FROM t1 WHERE {l} {op} {r}", "I", "nosort")

    # -- single-column [NOT] IN over varied inner shapes -------------------
    probes = ["a", "b", "c", "a + 7", "coalesce(b, 0)"]
    inners = [
        "SELECT k FROM t3",
        "SELECT k FROM t3 WHERE v > 240",
        "SELECT v - 150 FROM t5 WHERE g < 3",
        "SELECT x FROM t4",                          # nullable: NOT IN -> empty
        "SELECT k FROM t3 UNION SELECT k FROM t5",
        "SELECT k FROM t3 INTERSECT SELECT k FROM t5",
        "SELECT k FROM t3 EXCEPT SELECT k FROM t5 WHERE g = 1",
        "SELECT k FROM t3 GROUP BY k HAVING count(*) > 1",
        "SELECT k + g FROM t5 WHERE v > 350",
    ]
    for p in probes:
        for neg in ["IN", "NOT IN"]:
            for inner in inners:
                for w in outer_wheres[:3]:
                    wsql = f" AND {w}" if w else ""
                    f.query(
                        f"SELECT a FROM t1 WHERE {p} {neg} ({inner}){wsql}",
                        "I", "rowsort")

    # -- multi-column [NOT] IN (row-wise 3VL) ------------------------------
    # DuckDB can't bind `(a, b) IN (SELECT k, v ...)`, so expectations come
    # from the defining 3VL expansion: IN is TRUE iff a strict all-equal row
    # exists; NOT IN passes (TRUE) iff NO row null-matches (each column
    # equal or either side NULL) — anything else is FALSE/UNKNOWN, filtered.
    tuples = [([("a", "k"), ("b", "v - 100")], "t3", ""),
              ([("a", "w"), ("b", "x")], "t4", ""),
              ([("a", "k"), ("c", "v - 250 + g")], "t5", "g < 4"),
              ([("a", "w"), ("d", "y")], "t4", "z IS NOT NULL"),
              ([("a % 6", "g"), ("b", "v - 200")], "t5", ""),
              ([("a", "w"), ("b", "x"), ("c", "y")], "t4", "")]

    def tuple_sqls(cols, tbl, iflt, neg):
        lhs = "(" + ", ".join(o for o, _ in cols) + ")"
        sel = ", ".join(i for _, i in cols)
        fsql = f" WHERE {iflt}" if iflt else ""
        spark = f"{lhs} {neg} (SELECT {sel} FROM {tbl}{fsql})"
        fand = f" AND ({iflt})" if iflt else ""
        if neg == "IN":
            cond = " AND ".join(f"({i}) = ({o})" for o, i in cols)
            oracle = f"EXISTS (SELECT 1 FROM {tbl} WHERE {cond}{fand})"
        else:
            cond = " AND ".join(
                f"(({i}) = ({o}) OR ({i}) IS NULL OR ({o}) IS NULL)"
                for o, i in cols)
            oracle = f"NOT EXISTS (SELECT 1 FROM {tbl} WHERE {cond}{fand})"
        return spark, oracle

    for cols, tbl, iflt in tuples:
        for neg in ["IN", "NOT IN"]:
            for w in outer_wheres:
                wsql = f" AND {w}" if w else ""
                sp, orc = tuple_sqls(cols, tbl, iflt, neg)
                f.query_oracle(f"SELECT a FROM t1 WHERE {sp}{wsql}",
                               f"SELECT a FROM t1 WHERE {orc}{wsql}",
                               "I", "rowsort")
                f.query_oracle(
                    f"SELECT count(*) FROM t1 WHERE {sp}{wsql}",
                    f"SELECT count(*) FROM t1 WHERE {orc}{wsql}",
                    "I", "nosort")

    # -- nested subqueries -------------------------------------------------
    nested = [
        ("a IN (SELECT k FROM t3 WHERE EXISTS "
         "(SELECT 1 FROM t5 WHERE t5.k = t3.k))"),
        ("a IN (SELECT k FROM t3 WHERE k IN (SELECT k FROM t5 WHERE g < 3))"),
        ("a IN (SELECT k FROM t5 WHERE v > "
         "(SELECT min(v) FROM t3 WHERE t3.k = t5.k))"),
        ("EXISTS (SELECT 1 FROM t3 WHERE k = a AND v IN "
         "(SELECT v FROM t5 WHERE g = 2))"),
        ("EXISTS (SELECT 1 FROM t5 WHERE k = a AND NOT EXISTS "
         "(SELECT 1 FROM t3 WHERE t3.k = t5.k))"),
        ("NOT EXISTS (SELECT 1 FROM t3 WHERE k = a AND k IN "
         "(SELECT k FROM t5 WHERE g >= 4))"),
        ("a NOT IN (SELECT k FROM t3 WHERE v NOT IN "
         "(SELECT v FROM t5 WHERE v IS NOT NULL))"),
        ("EXISTS (SELECT 1 FROM t3 WHERE k = a AND EXISTS "
         "(SELECT 1 FROM t4 WHERE w = t3.k))"),
        ("a IN (SELECT w FROM t4 WHERE x > (SELECT min(g) FROM t5) + 100)"),
        ("b IN (SELECT v - 100 FROM t3 WHERE k <= "
         "(SELECT max(w) FROM t4) - 100)"),
    ]
    for shape in nested:
        for w in outer_wheres:
            wsql = f" AND {w}" if w else ""
            for p, fmt in [("a", "I"), ("a, b", "II")]:
                f.query(f"SELECT {p} FROM t1 WHERE {shape}{wsql}",
                        fmt, "rowsort")

    # -- GROUP BY / HAVING gated by scalar subqueries ----------------------
    grps = ["a % 5", "a % 3", "b IS NULL"]
    aggsets = [("count(*)", "I"), ("count(*), sum(a)", "II"),
               ("min(a), max(c)", "II")]
    havings = [
        "count(*) > (SELECT count(*) FROM t3) - 16",
        "min(a) < (SELECT min(k) FROM t5) + 30",
        "max(a) >= (SELECT max(w) FROM t4) + 80",
        "sum(a) <> (SELECT sum(k) FROM t3)",
    ]
    for grp in grps:
        for aggs, fmt in aggsets:
            for h in havings:
                f.query(
                    f"SELECT {grp}, {aggs} FROM t1 GROUP BY {grp} HAVING {h}",
                    "I" + fmt, "rowsort")
    # WHERE-subquery before grouping
    for grp in grps:
        for aggs, fmt in aggsets:
            for flt in ["a IN (SELECT k FROM t3)",
                        "a NOT IN (SELECT k FROM t5 WHERE g = 0)",
                        "EXISTS (SELECT 1 FROM t5 WHERE k = a)",
                        "c > (SELECT min(v) FROM t3) - 160"]:
                f.query(
                    f"SELECT {grp}, {aggs} FROM t1 WHERE {flt} GROUP BY {grp}",
                    "I" + fmt, "rowsort")

    # -- aggregates over subquery-filtered rows ----------------------------
    for inner in inners:
        for aggs in ["count(*)", "count(*), sum(a)", "min(a), max(a), count(b)"]:
            fmt = "I" * (aggs.count(",") + 1)
            f.query(f"SELECT {aggs} FROM t1 WHERE a IN ({inner})",
                    fmt, "nosort")

    # -- several subqueries in one query -----------------------------------
    multi = [
        ("SELECT a FROM t1 WHERE a IN (SELECT k FROM t3) "
         "AND a NOT IN (SELECT k FROM t5 WHERE g = 5)"),
        ("SELECT a FROM t1 WHERE EXISTS (SELECT 1 FROM t3 WHERE k = a) "
         "AND b > (SELECT min(v) FROM t3) - 160"),
        ("SELECT a FROM t1 WHERE a IN (SELECT k FROM t3) "
         "OR a IN (SELECT k FROM t5 WHERE g = 2)"),
        ("SELECT a FROM t1 WHERE (a IN (SELECT k FROM t3) "
         "AND b IS NOT NULL) OR EXISTS (SELECT 1 FROM t4 WHERE w = a AND "
         "x IS NULL)"),
        ("SELECT a FROM t1 WHERE a IN (SELECT k FROM t3 WHERE v > 240) "
         "AND EXISTS (SELECT 1 FROM t5 WHERE k = a) "
         "AND c < (SELECT max(v) FROM t5)"),
        ("SELECT a, b FROM t1 WHERE coalesce(b, 0) < (SELECT avg(v) FROM t3) "
         "AND a NOT IN (SELECT w FROM t4 WHERE z IS NULL)"),
    ]
    for q in multi:
        for w in outer_wheres:
            wsql = f" AND {w}" if w else ""
            fmt = "II" if q.startswith("SELECT a, b") else "I"
            f.query(q + wsql, fmt, "rowsort")

    # -- subquery in FROM joined against subquery in WHERE -----------------
    for w in ["", "WHERE s.n > 1", "WHERE s.mx > 250"]:
        f.query(
            "SELECT s.k, s.n FROM (SELECT k, count(*) AS n, max(v) AS mx "
            "FROM t3 GROUP BY k) s "
            f"{w}{' AND' if w else 'WHERE'} s.k IN (SELECT k FROM t5)",
            "II", "rowsort")

    # -- late mutation, then re-run a slice --------------------------------
    f.statement("INSERT INTO t3 VALUES(128,291)")
    f.statement("INSERT INTO t4 VALUES(128,NULL,205,130)")
    f.statement("DELETE FROM t5 WHERE g = 4")
    for p in probes[:3]:
        for neg in ["IN", "NOT IN"]:
            for inner in inners[:4]:
                f.query(f"SELECT a FROM t1 WHERE {p} {neg} ({inner})",
                        "I", "rowsort")
    for cols, tbl, iflt in tuples[:3]:
        for neg in ["IN", "NOT IN"]:
            sp, orc = tuple_sqls(cols, tbl, iflt, neg)
            f.query_oracle(f"SELECT a FROM t1 WHERE {sp}",
                           f"SELECT a FROM t1 WHERE {orc}",
                           "I", "rowsort")
    return f


def gen_grouping():
    """GROUPING SETS / ROLLUP / CUBE grammar (multi-dimensional aggregates
    — absent from every other family): ROLLUP/CUBE over expression keys
    (projected in a derived table — DuckDB's binder requires grouping()
    arguments to be plain grouping columns), grouping() disambiguation
    bits (placeholder NULL vs a truly NULL key), explicit GROUPING SETS
    shapes, 3-column rollups, HAVING over aggregates and grouping bits,
    WHERE before grouping, and a late-mutation re-run. Probe-verified
    identical between Spark and DuckDB."""
    f = File("grouping.test")
    t1_statements(f)
    t5_statements(f)

    def src1(g1, g2, w):
        wsql = f" WHERE {w}" if w else ""
        return (f"(SELECT *, {g1} AS g1, {g2} AS g2 FROM t1{wsql}) s")

    def src5(g1, g2, w):
        wsql = f" WHERE {w}" if w else ""
        return (f"(SELECT *, {g1} AS g1, {g2} AS g2 FROM t5{wsql}) s")

    aggs1 = ["count(*)", "sum(a)", "min(a)", "max(c)", "count(b)",
             "sum(coalesce(b, 0))", "max(a) - min(a)"]
    pairs1 = [("a % 5", "c % 2"), ("a % 3", "b % 2"),
              ("b % 3", "d % 2"), ("a % 4", "e % 3"),
              ("a % 6", "d % 2"), ("c % 3", "e % 2")]
    wheres1 = ["", "a > 150", "b IS NOT NULL", "a % 2 = 0", "c < 200"]
    for g1, g2 in pairs1:
        for op in ["ROLLUP", "CUBE"]:
            for agg in aggs1:
                for w in wheres1:
                    f.query(
                        f"SELECT g1, g2, grouping(g1), grouping(g2), {agg} "
                        f"FROM {src1(g1, g2, w)} GROUP BY {op}(g1, g2)",
                        "IIIII", "rowsort")

    aggs5 = ["count(*)", "sum(v)", "min(v)", "max(v + g)", "sum(v - 300)"]
    pairs5 = [("k % 7", "g % 6"), ("g % 6", "v % 3"), ("k % 5", "g % 2"),
              ("k % 4", "v % 2"), ("g % 3", "k % 6")]
    for g1, g2 in pairs5:
        for op in ["ROLLUP", "CUBE"]:
            for agg in aggs5:
                for w in ["", "v > 330", "g <> 2"]:
                    f.query(
                        f"SELECT g1, g2, grouping(g1), grouping(g2), {agg} "
                        f"FROM {src5(g1, g2, w)} GROUP BY {op}(g1, g2)",
                        "IIIII", "rowsort")

    # explicit GROUPING SETS shapes (grouping()/projection restricted to
    # columns that appear in at least one set — both engines require it)
    gs_shapes = [("((g1), (g2))", True), ("((g1, g2), ())", True),
                 ("((g1), ())", False), ("((g1, g2), (g1), ())", True),
                 ("((g1), (g2), (g1, g2))", True)]
    for g1, g2 in pairs1[:3]:
        for shape, both in gs_shapes:
            for agg in aggs1[:3]:
                if both:
                    f.query(
                        f"SELECT g1, g2, grouping(g1), grouping(g2), {agg} "
                        f"FROM {src1(g1, g2, '')} GROUP BY GROUPING SETS {shape}",
                        "IIIII", "rowsort")
                else:
                    f.query(
                        f"SELECT g1, grouping(g1), {agg} "
                        f"FROM {src1(g1, g2, '')} GROUP BY GROUPING SETS {shape}",
                        "III", "rowsort")

    # 3-column rollups/cubes
    triples = [("a % 3", "c % 2", "e % 2"), ("a % 2", "b % 2", "d % 3")]
    for g1, g2, g3 in triples:
        for op in ["ROLLUP", "CUBE"]:
            for agg in aggs1:
                for w in ["", "a > 160"]:
                    wsql = f" WHERE {w}" if w else ""
                    f.query(
                        f"SELECT g1, g2, g3, grouping(g1), grouping(g2), "
                        f"grouping(g3), {agg} FROM (SELECT *, {g1} AS g1, "
                        f"{g2} AS g2, {g3} AS g3 FROM t1{wsql}) s "
                        f"GROUP BY {op}(g1, g2, g3)",
                        "IIIIIII", "rowsort")

    # HAVING over aggregates and grouping bits
    havings = ["count(*) > 3", "grouping(g1) = 0", "grouping(g2) = 1",
               "grouping(g1) = 0 AND count(*) > 2",
               "grouping(g1) + grouping(g2) = 1", "min(a) < 200"]
    for g1, g2 in pairs1[:2]:
        for op in ["ROLLUP", "CUBE"]:
            for h in havings:
                f.query(
                    f"SELECT g1, g2, count(*) FROM {src1(g1, g2, '')} "
                    f"GROUP BY {op}(g1, g2) HAVING {h}",
                    "III", "rowsort")

    # single-key rollup (per-group rows + the grand total)
    for g in ["a % 7", "b % 4", "e % 5"]:
        for agg in aggs1:
            f.query(
                f"SELECT g1, grouping(g1), {agg} FROM "
                f"(SELECT *, {g} AS g1 FROM t1) s GROUP BY ROLLUP(g1)",
                "III", "rowsort")

    # late mutation, then re-run a slice
    f.statement("INSERT INTO t1(a,b,c,d,e) VALUES(420,NULL,150,160,170)")
    f.statement("DELETE FROM t5 WHERE g = 3")
    for g1, g2 in pairs1[:2]:
        for op in ["ROLLUP", "CUBE"]:
            f.query(
                f"SELECT g1, g2, grouping(g1), grouping(g2), count(*) "
                f"FROM {src1(g1, g2, '')} GROUP BY {op}(g1, g2)",
                "IIIII", "rowsort")
    for g1, g2 in pairs5[:2]:
        f.query(
            f"SELECT g1, g2, grouping(g1), grouping(g2), sum(v) "
            f"FROM {src5(g1, g2, '')} GROUP BY CUBE(g1, g2)",
            "IIIII", "rowsort")
    return f


def gen_string():
    """String-function grammar over the probe-verified Spark ≡ DuckDB
    subset: upper/lower/trim family/reverse/repeat/replace/translate/
    substr (incl. negative starts)/left/right/lpad/rpad/length/ascii/
    chr/md5/position/instr/contains, `||` concatenation (NULL-propagating
    in both), LIKE/NOT LIKE, nested compositions, string aggregates
    (binary collation min/max), CASE over string predicates, and a
    NULL-bearing table. Excluded as divergent: concat() over NULL
    (DuckDB treats NULL as ''), split_part on NULL, strpos/initcap/
    starts_with (missing on one side)."""
    f = File("string.test")
    t2_statements(f)
    f.statement("CREATE TABLE t6(i INTEGER, s TEXT)")
    nulls = [(0, "'whiskey xray'"), (1, "NULL"), (2, "''"), (3, "'zu lu golf'"),
             (4, "'YANKEE'"), (5, "NULL"), (6, "'a.b.c'"), (7, "'mike-mike'")]
    for i, s in nulls:
        f.statement(f"INSERT INTO t6 VALUES({i},{s})")

    exprs = [
        ("upper(s)", "T"), ("lower(s)", "T"), ("trim(s)", "T"),
        ("ltrim(s)", "T"), ("rtrim(s)", "T"), ("reverse(s)", "T"),
        ("length(s)", "I"), ("ascii(s)", "I"), ("md5(s)", "T"),
        ("translate(s, 'aeo', 'XYZ')", "T"), ("repeat(s, 2)", "T"),
        ("replace(s, 'a', '@')", "T"), ("substr(s, 2, 3)", "T"),
        ("substr(s, -3)", "T"), ("substr(s, 1, 4)", "T"),
        ("left(s, 3)", "T"), ("right(s, 3)", "T"),
        ("lpad(s, 8, '*')", "T"), ("rpad(s, 8, '.')", "T"),
        ("position('a' IN s)", "I"), ("instr(s, 'l')", "I"),
        ("s || '_x'", "T"), ("'p_' || s || '_q'", "T"),
        ("substring(s FROM 2 FOR 3)", "T"), ("chr(65 + i % 26)", "T"),
    ]
    wheres = ["", "i % 2 = 0", "length(s) > 5", "s LIKE '%a%'", "i > 7"]
    for tbl in ["t2", "t6"]:
        for e, fmt in exprs:
            for w in wheres:
                wsql = f" WHERE {w}" if w else ""
                f.query(f"SELECT i, {e} FROM {tbl}{wsql}", "I" + fmt, "rowsort")

    # nested compositions
    nested = [
        ("upper(substr(s, 2, 4))", "T"),
        ("replace(lower(s), ' ', '_')", "T"),
        ("reverse(trim(s))", "T"),
        ("length(replace(s, ' ', ''))", "I"),
        ("lpad(upper(left(s, 3)), 6, '.')", "T"),
        ("substr(reverse(s), 1, 3)", "T"),
        ("length(s) - length(replace(s, 'a', ''))", "I"),
        ("upper(s) || '/' || lower(s)", "T"),
        ("repeat(left(s, 2), 3)", "T"),
        ("translate(upper(s), 'AEO', 'aeo')", "T"),
        ("md5(upper(trim(s)))", "T"),
        ("position('l' IN lower(s)) + instr(s, 'o')", "I"),
    ]
    for tbl in ["t2", "t6"]:
        for e, fmt in nested:
            for w in wheres[:4]:
                wsql = f" WHERE {w}" if w else ""
                f.query(f"SELECT i, {e} FROM {tbl}{wsql}", "I" + fmt, "rowsort")

    # LIKE / NOT LIKE predicate grid
    pats = ["%a%", "_elta", "%o", "k%", "% %", "%.%", "%-%", "%a%a%"]
    for tbl in ["t2", "t6"]:
        for p in pats:
            for neg in ["LIKE", "NOT LIKE"]:
                f.query(f"SELECT i FROM {tbl} WHERE s {neg} '{p}'",
                        "I", "rowsort")
                f.query(
                    f"SELECT i, upper(s) FROM {tbl} WHERE s {neg} '{p}'",
                    "IT", "rowsort")

    # other string predicates
    preds = ["length(s) BETWEEN 4 AND 8", "contains(s, 'il')",
             "position('a' IN s) > 0", "s = lower(s)", "s < 'k'",
             "trim(s) = s", "s || 'x' > 'ax'"]
    for tbl in ["t2", "t6"]:
        for p in preds:
            f.query(f"SELECT i FROM {tbl} WHERE {p}", "I", "rowsort")

    # aggregates over string expressions (binary collation both engines)
    for tbl in ["t2", "t6"]:
        for grp in ["upper(left(s, 1))", "length(s) % 4", "contains(s, 'a')"]:
            for agg, afmt in [("count(*)", "I"), ("min(s)", "T"),
                              ("max(upper(s))", "T"),
                              ("count(distinct s)", "I")]:
                f.query(
                    f"SELECT {grp}, {agg} FROM {tbl} GROUP BY {grp}",
                    ("T" if grp.startswith("upper") else "I") + afmt,
                    "rowsort")

    # CASE over string predicates
    cases = [
        "CASE WHEN s LIKE '%a%' THEN upper(s) ELSE lower(s) END",
        "CASE WHEN length(s) > 6 THEN left(s, 3) WHEN length(s) > 3 "
        "THEN right(s, 2) ELSE s END",
        "CASE lower(left(s, 1)) WHEN 'a' THEN 'vowel' WHEN 'e' THEN 'vowel' "
        "ELSE 'other' END",
    ]
    for tbl in ["t2", "t6"]:
        for e in cases:
            for w in wheres[:3]:
                wsql = f" WHERE {w}" if w else ""
                f.query(f"SELECT i, {e} FROM {tbl}{wsql}", "IT", "rowsort")

    # late mutation, then re-run a slice
    f.statement("INSERT INTO t2 VALUES(99,'zephyr quay')")
    f.statement("DELETE FROM t6 WHERE i = 2")
    f.statement("INSERT INTO t6 VALUES(2,'patched')")
    for tbl in ["t2", "t6"]:
        for e, fmt in exprs[:8]:
            f.query(f"SELECT i, {e} FROM {tbl}", "I" + fmt, "rowsort")
    return f


def gen_select8():
    """Deep expressions OVER JOINED ROWS — select7's expression grammar
    (nested CASE/coalesce/nullif/least/greatest/abs/%-over-abs, no
    division, no col*col) re-rooted on a two-table join so the leaves mix
    both sides' columns, including outer-join NULL padding feeding the
    3VL-sensitive nodes (coalesce/nullif/CASE). INNER joins exercise
    expression pushdown through join conditions; LEFT joins make r.k/r.v
    NULL for unmatched rows, so every nullable node is stressed with
    correlated (pad-induced) NULLs rather than independent column NULLs."""
    f = File("select8.test")
    t1_statements(f)
    t3_statements(f)

    cols = ["a", "b", "c", "d", "e", "r.k", "r.v"]

    def leaf():
        r = rng.randrange(9)
        if r < 7:
            return cols[rng.randrange(len(cols))]
        return str(rng.randrange(1, 200))

    def cond(depth):
        r = rng.randrange(8)
        e1, e2 = expr(depth - 1), expr(depth - 1)
        if r == 0:
            return f"{cols[rng.randrange(len(cols))]} IS NULL"
        if r == 1:
            return f"{cols[rng.randrange(len(cols))]} IS NOT NULL"
        if r == 2 and depth > 1:
            return f"({cond(depth - 1)} AND {cond(depth - 1)})"
        if r == 3 and depth > 1:
            return f"({cond(depth - 1)} OR {cond(depth - 1)})"
        op = ["<", "<=", ">", ">=", "=", "<>"][rng.randrange(6)]
        return f"{e1} {op} {e2}"

    def expr(depth):
        if depth <= 0:
            return leaf()
        r = rng.randrange(10)
        e1, e2 = expr(depth - 1), expr(depth - 1)
        if r == 0:
            return f"({e1} + {e2})"
        if r == 1:
            return f"({e1} - {e2})"
        if r == 2:
            return f"{rng.randrange(2, 4)} * {e1}"
        if r == 3:
            return f"abs({e1} - {e2})"
        if r == 4:
            return f"least({e1}, {e2})"
        if r == 5:
            return f"greatest({e1}, {e2})"
        if r == 6:
            return f"coalesce({e1}, {e2})"
        if r == 7:
            return f"nullif({e1}, {e2})"
        if r == 8:
            return f"(abs({e1}) % {rng.randrange(2, 10)})"
        return f"CASE WHEN {cond(depth - 1)} THEN {e1} ELSE {e2} END"

    joins = ["JOIN t3 r ON r.k = a", "LEFT JOIN t3 r ON r.k = a",
             "LEFT JOIN t3 r ON r.k = c", "JOIN t3 r ON r.k < a - 150"]

    # single deep expression over each join shape (rowsort: join fan-out
    # makes per-row order engine-dependent)
    for i in range(900):
        e = expr(2 + i % 3)
        j = joins[i % len(joins)]
        f.query(f"SELECT a, {e} FROM t1 {j}", "II", "rowsort")

    # deep boolean predicates over the join
    for i in range(540):
        j = joins[i % len(joins)]
        f.query(f"SELECT a, r.k FROM t1 {j} WHERE {cond(3)}",
                "II", "rowsort")

    # expression pairs mixing both sides
    for i in range(360):
        j = joins[i % 2]
        f.query(f"SELECT {expr(2)}, {expr(2)} FROM t1 {j}", "II", "rowsort")

    # deep expressions under aggregates over the join
    for i in range(420):
        e = expr(2 + i % 2)
        agg = ["sum", "min", "max", "count"][i % 4]
        j = joins[i % len(joins)]
        f.query(f"SELECT {agg}({e}) FROM t1 {j}", "I", "nosort")
    for i in range(240):
        key = f"abs({expr(1)}) % 4"
        j = joins[i % 2]
        f.query(f"SELECT {key}, sum({expr(2)}), count({expr(1)}) "
                f"FROM t1 {j} GROUP BY {key}", "III", "rowsort")

    # deep HAVING over joined aggregates
    for i in range(180):
        j = joins[i % 2]
        f.query(
            f"SELECT a % 5, count(*) FROM t1 {j} GROUP BY a % 5 "
            f"HAVING sum(abs({expr(1)})) > {rng.randrange(100, 4000)}",
            "II", "rowsort")
    return f


def t7_statements(f):
    """Join partner for the winjoin family: k overlaps t1.a (with dup keys),
    v nullable, u a unique non-null row id — (a, u) is then a total key of
    every t1-t7 join result, so window ORDER BYs can always be made total."""
    f.statement("CREATE TABLE t7(k INTEGER, v INTEGER, u INTEGER)")
    for i in range(24):
        k = 100 + 7 * rng.randrange(40)
        v = maybe_null(200 + rng.randrange(150), rng.randrange(9))
        f.statement(f"INSERT INTO t7 VALUES({k},{v},{i + 1})")


def gen_winjoin():
    """Window functions computed OVER JOIN RESULTS — the structural mix the
    window and join families each cover alone: ranking/offset/frame
    aggregates where the window input carries outer-join padding NULLs
    (flowing into PARTITION BY keys, ORDER BY keys, and frame aggregates),
    plus windows over grouped joins and rn-filtered derived tables. Every
    in-window ORDER BY ends with the (a, u) total key and spells NULLS
    FIRST (Spark's ASC default; DuckDB's is NULLS LAST); RANGE frames stay
    on joins whose order key cannot be NULL-padded."""
    f = File("winjoin.test")
    t1_statements(f)
    t7_statements(f)

    # (join sql, a-side nullable?, u-side nullable?)
    joins = [
        ("t1 JOIN t7 ON a = k", False, False),
        ("t1 LEFT JOIN t7 ON a = k", False, True),
        ("t1 RIGHT JOIN t7 ON a = k", True, False),
        ("t1 FULL JOIN t7 ON a = k", True, True),
        ("t1 JOIN t7 ON a < k - 60", False, False),
        ("t1 LEFT JOIN t7 ON a = k AND v > 230", False, True),
    ]
    TIE = "a NULLS FIRST, u NULLS FIRST"
    parts = ["", "a % 4", "v IS NULL", "u IS NULL"]
    # (order prefix over join columns, rank/dense_rank-safe tied form)
    orders = [
        (TIE, "a NULLS FIRST"),
        (f"v NULLS FIRST, {TIE}", "v NULLS FIRST"),
        (f"b DESC NULLS LAST, {TIE}", "b DESC NULLS LAST"),
        (f"coalesce(v, 0) - coalesce(b, 0) NULLS FIRST, {TIE}", None),
    ]

    def over(p, o, frame=""):
        bits = []
        if p:
            bits.append(f"PARTITION BY {p}")
        if o:
            bits.append(f"ORDER BY {o}")
        if frame:
            bits.append(frame)
        return "OVER (" + " ".join(bits) + ")"

    outer = f"ORDER BY {TIE}"

    # ranking over joins: padded NULLs inside partitions and order keys
    for jsql, _, _ in joins:
        for p in parts:
            for o, tied in orders[:3]:
                for fn, fmt in [("row_number()", "I"), ("rank()", "I"),
                                ("dense_rank()", "I"), ("ntile(4)", "I")]:
                    f.query(
                        f"SELECT a, u, {fn} {over(p, o)} FROM {jsql} {outer}",
                        "II" + fmt, "nosort")
                if tied:
                    for fn in ["rank()", "dense_rank()"]:
                        f.query(
                            f"SELECT a, u, {fn} {over(p, tied)} "
                            f"FROM {jsql} {outer}", "III", "nosort")

    # offset functions reaching across padded rows
    for jsql, _, _ in joins:
        for p in parts[:3]:
            for o, _ in orders[:3]:
                for fn in ["lag(v, 1) ", "lag(v, 2, -1) ", "lead(b, 1) ",
                           "lead(v, 1, 0) ", "lag(b + v, 1) "]:
                    f.query(
                        f"SELECT a, u, {fn}{over(p, o)} FROM {jsql} {outer}",
                        "III", "nosort")

    # ROWS-frame aggregates over join outputs (count(v) vs count(*) sees
    # the padding; avg formatted R)
    rows_frames = [
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        "ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING",
    ]
    aggs = [("sum(v)", "I"), ("min(v)", "I"), ("max(b)", "I"),
            ("count(v)", "I"), ("count(*)", "I"), ("avg(v)", "R"),
            ("sum(b + v)", "I")]
    for jsql, _, _ in joins:
        for p in parts:
            for o, _ in orders:
                for fr in rows_frames:
                    ag, fmt = aggs[(len(jsql) + len(p) + len(o) + len(fr))
                                   % len(aggs)]
                    f.query(
                        f"SELECT a, u, {ag} {over(p, o, fr)} "
                        f"FROM {jsql} {outer}", "II" + fmt, "nosort")

    # RANGE frames: order key `a` is never NULL on a-side-preserving joins
    range_frames = [
        "RANGE BETWEEN 20 PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN 14 PRECEDING AND 14 FOLLOWING",
        "RANGE BETWEEN CURRENT ROW AND 21 FOLLOWING",
    ]
    for jsql, a_nullable, _ in joins:
        if a_nullable:
            continue
        for p in parts[:3]:
            for fr in range_frames:
                for ag, fmt in [("sum(v)", "I"), ("count(v)", "I"),
                                ("count(*)", "I"), ("avg(v)", "R")]:
                    f.query(
                        f"SELECT a, u, {ag} {over(p, 'a NULLS FIRST', fr)} "
                        f"FROM {jsql} {outer}", "II" + fmt, "nosort")

    # first/last_value over padded columns with explicit frames
    for jsql, _, _ in joins:
        for p in parts[:3]:
            for o, _ in orders[:2]:
                for fn in ["first_value(v)", "last_value(v)",
                           "first_value(b)"]:
                    for fr in ["ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
                               "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"]:
                        f.query(
                            f"SELECT a, u, {fn} {over(p, o, fr)} "
                            f"FROM {jsql} {outer}", "III", "nosort")

    # windows over GROUPED joins (window input = join + GROUP BY output).
    # The group key and aggregate are aliased in a derived table: Spark
    # cannot re-resolve the raw expression `a % 4` inside a window ORDER BY
    # above a GROUP BY on that expression (only the aggregated output
    # column resolves), while the aliased form binds in both engines.
    for jsql, _, _ in joins[:4]:
        for ag in ["sum(v)", "count(v)", "max(v)"]:
            for wfn in ["row_number()", "rank()", "sum(ag)"]:
                f.query(
                    f"SELECT g, ag, {wfn} "
                    f"OVER (ORDER BY ag DESC NULLS LAST, g NULLS FIRST) "
                    f"FROM (SELECT a % 4 AS g, {ag} AS ag "
                    f"FROM {jsql} GROUP BY a % 4) "
                    f"ORDER BY g NULLS FIRST", "III", "nosort")

    # rn-filtered derived tables: top-3 per partition of a join
    for jsql, _, _ in joins:
        for p in ["a % 4", "v IS NULL"]:
            f.query(
                "SELECT a, u FROM (SELECT a, u, row_number() "
                f"{over(p, f'v NULLS LAST, {TIE}')} AS rn FROM {jsql}) "
                f"WHERE rn <= 3 {outer}", "II", "nosort")
            f.query(
                "SELECT rn, count(*) FROM (SELECT ntile(3) "
                f"{over(p, TIE)} AS rn FROM {jsql}) "
                "GROUP BY rn ORDER BY rn", "II", "nosort")

    # multiple window specs in one select over a join
    for jsql, a_nullable, _ in joins:
        if a_nullable:
            continue
        for p in parts[:3]:
            f.query(
                f"SELECT a, u, row_number() {over(p, TIE)}, "
                f"sum(v) {over(p, TIE, rows_frames[0])}, "
                f"rank() {over(p, f'v NULLS FIRST, {TIE}')} "
                f"FROM {jsql} {outer}", "IIIII", "nosort")

    # ======================================================================
    # Round-13 depth: windows over 3-way mixed-outer chains and over
    # name-colliding derived joins. NO rng draws and no new table
    # statements below this line (shared-generator-stream drift, r12
    # advice item 4) — the third side is t1 re-derived under renamed
    # columns, so padding NULLs arrive from TWO independent outer joins.
    # (a, u, a2) is a total key of every chain result: a unique in t1, u
    # unique in t7, a2 unique in the derived side, each pad-unique.
    # ======================================================================
    d2 = "(SELECT a AS a2, b AS b2 FROM t1)"
    jtypes = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]
    TIE3 = "a NULLS FIRST, u NULLS FIRST, a2 NULLS FIRST"
    chains = [f"t1 {j1} t7 ON a = k {j2} {d2} d ON a2 = k"
              for j1 in jtypes for j2 in jtypes]
    parts3 = ["", "a % 4", "a2 IS NULL", "v IS NULL, a2 IS NULL"]
    orders3 = [TIE3, f"v NULLS FIRST, {TIE3}",
               f"b2 DESC NULLS LAST, {TIE3}"]
    outer3 = f"ORDER BY {TIE3}"

    # ranking over double-padded chains
    rankfns = ["row_number()", "rank()", "dense_rank()", "ntile(3)"]
    for ci, ch in enumerate(chains):
        for p in parts3:
            for oi, o in enumerate(orders3):
                for fi, fn in enumerate(rankfns):
                    if (ci + oi + fi) % 2 == 0:
                        continue
                    f.query(
                        f"SELECT a, u, a2, {fn} {over(p, o)} FROM {ch} "
                        f"{outer3}", "IIII", "nosort")

    # ROWS-frame aggregates where the frame crosses two padding layers
    aggs3 = [("sum(b2)", "I"), ("count(b2)", "I"), ("count(*)", "I"),
             ("min(v)", "I"), ("max(coalesce(v, 0) + coalesce(b2, 0))", "I"),
             ("avg(b2)", "R")]
    for ci, ch in enumerate(chains):
        for pi, p in enumerate(parts3[:3]):
            for oi, o in enumerate(orders3):
                fr = rows_frames[(ci + pi + oi) % len(rows_frames)]
                ag, fmt = aggs3[(ci + oi) % len(aggs3)]
                f.query(
                    f"SELECT a, u, a2, {ag} {over(p, o, fr)} FROM {ch} "
                    f"{outer3}", "III" + fmt, "nosort")

    # offsets reaching across rows padded by DIFFERENT joins
    for ci, ch in enumerate(chains):
        for p in parts3[:3]:
            for oi, o in enumerate(orders3[:2]):
                fn = ["lag(b2, 1) ", "lead(b2, 1) ", "lag(v, 1, -1) ",
                      "lead(coalesce(v, 0) + coalesce(b2, 0), 1) "][
                          (ci + oi) % 4]
                f.query(
                    f"SELECT a, u, a2, {fn}{over(p, o)} FROM {ch} {outer3}",
                    "IIII", "nosort")

    # rn-filtered chains (top-2 per partition of a double-padded join)
    for ci, ch in enumerate(chains):
        p = ["a % 4", "a2 IS NULL"][ci % 2]
        f.query(
            "SELECT a, u, a2 FROM (SELECT a, u, a2, row_number() "
            f"{over(p, f'v NULLS LAST, {TIE3}')} AS rn FROM {ch}) "
            f"WHERE rn <= 2 {outer3}", "III", "nosort")

    # -- windows over name-colliding derived joins: both sides expose
    #    (a, b); qualifiers must survive INTO the window spec. The w side
    #    keeps t7's unique row id as c, so (u.a, w.c) is a total key
    #    (u.a unique left, w.c unique right, each pad-unique). ------------
    cu = "(SELECT a, b FROM t1)"
    cw = "(SELECT k AS a, v AS b, u AS c FROM t7)"
    CTIE = "u.a NULLS FIRST, w.c NULLS FIRST"
    caggs = [("sum(w.b)", "I"), ("min(w.b)", "I"), ("max(u.b)", "I"),
             ("count(w.b)", "I"), ("count(*)", "I"), ("avg(w.b)", "R"),
             ("sum(coalesce(u.b, 0) + coalesce(w.b, 0))", "I")]
    for ji, jt in enumerate(jtypes):
        for pi, p in enumerate(["", "u.a % 3", "w.b IS NULL"]):
            for oi, o in enumerate([CTIE, f"w.b NULLS FIRST, {CTIE}",
                                    f"u.b DESC NULLS LAST, {CTIE}"]):
                fn = rankfns[(ji + pi + oi) % len(rankfns)]
                f.query(
                    f"SELECT u.a, w.a, {fn} {over(p, o)} "
                    f"FROM {cu} u {jt} {cw} w ON u.a = w.a "
                    f"ORDER BY {CTIE}", "III", "nosort")
                ag, fmt = caggs[(ji + pi + oi) % len(caggs)]
                fr = rows_frames[(ji + oi) % len(rows_frames)]
                f.query(
                    f"SELECT u.a, w.a, {ag} {over(p, o, fr)} "
                    f"FROM {cu} u {jt} {cw} w ON u.a = w.a "
                    f"ORDER BY {CTIE}", "II" + fmt, "nosort")
    return f


def gen_orderlimit():
    """ORDER BY + LIMIT [OFFSET] grammar — the presentation clauses the
    other families leave to rowsort: multi-column total orders (NULLS
    spelled explicitly: Spark ASC defaults NULLS FIRST, DuckDB NULLS
    LAST), expression order keys, LIMIT/OFFSET pagination windows over
    tables, joins, and aggregates, all compared in nosort (exact row
    order) mode. Every ORDER BY ends in a unique-key tiebreak so the
    emitted order is total."""
    f = File("orderlimit.test")
    t1_statements(f)
    t7_statements(f)

    orders = [
        "a NULLS FIRST",
        "a DESC NULLS LAST",
        "b NULLS FIRST, a NULLS FIRST",
        "c DESC NULLS LAST, a NULLS FIRST",
        "coalesce(d, 0) NULLS FIRST, a DESC NULLS LAST",
        "b IS NULL NULLS FIRST, e NULLS LAST, a NULLS FIRST",
        "a % 5 NULLS FIRST, a NULLS FIRST",
    ]
    projs = [("a", "I"), ("a, b", "II"), ("a, b, c", "III")]
    limits = [1, 3, 7, 13, 100]
    offsets = [0, 2, 5, 30]

    # single-table pagination windows
    for o in orders:
        for p, fmt in projs:
            for lim in limits:
                for off in offsets:
                    osql = f" OFFSET {off}" if off else ""
                    f.query(
                        f"SELECT {p} FROM t1 ORDER BY {o} LIMIT {lim}{osql}",
                        fmt, "nosort")

    # over joins: the order key pair (a, u) is total on every join shape
    jshapes = ["t1 JOIN t7 ON a = k", "t1 LEFT JOIN t7 ON a = k",
               "t1 JOIN t7 ON a < k - 60"]
    for jsql in jshapes:
        for o in ["a NULLS FIRST, u NULLS FIRST",
                  "v DESC NULLS LAST, a NULLS FIRST, u NULLS FIRST"]:
            for lim in limits[:4]:
                for off in offsets:
                    osql = f" OFFSET {off}" if off else ""
                    f.query(
                        f"SELECT a, u FROM {jsql} ORDER BY {o} "
                        f"LIMIT {lim}{osql}", "II", "nosort")

    # over aggregates (top-k groups + pagination deeper in)
    for ag in ["count(*)", "sum(b)", "max(c)", "count(d)"]:
        for lim in limits[:4]:
            for off in offsets[:3]:
                osql = f" OFFSET {off}" if off else ""
                f.query(
                    f"SELECT a % 4, {ag} FROM t1 GROUP BY a % 4 "
                    f"ORDER BY {ag} DESC NULLS LAST, a % 4 NULLS FIRST "
                    f"LIMIT {lim}{osql}", "II", "nosort")

    # LIMIT past the end / OFFSET past the end (clamped, not an error)
    for p, fmt in projs[:2]:
        f.query(f"SELECT {p} FROM t1 ORDER BY a NULLS FIRST LIMIT 500",
                fmt, "nosort")
        f.query(f"SELECT {p} FROM t1 ORDER BY a NULLS FIRST "
                f"LIMIT 10 OFFSET 31", fmt, "nosort")

    # ORDER BY in a derived table consumed by an outer aggregate (the
    # order is semantically erased; the aggregate must not care)
    for ag in ["count(*)", "sum(a)"]:
        f.query(
            f"SELECT {ag} FROM (SELECT a FROM t1 "
            f"ORDER BY b NULLS FIRST, a NULLS FIRST LIMIT 10)",
            "I", "nosort")
    return f


def gen_recursive():
    """WITH RECURSIVE grammar — the one construct family the corpus
    lacked (the engine supports it four ways: q58/q59 native, q85/q86
    fixpoint/standing). Counting sequences, pair-state recursion,
    hierarchy walks over a two-root forest, and path enumeration /
    reachability over a layered DAG. Only UNION ALL recursion is emitted:
    Spark has no UNION-distinct recursion yet
    (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), and every shape here is
    acyclic/depth-bounded, so UNION ALL terminates in both engines;
    set-collapse is exercised through outer DISTINCT/GROUP BY instead."""
    f = File("recursive.test")

    # employee forest: two roots, three levels, deterministic salaries
    f.statement("CREATE TABLE emp(id INTEGER, mgr INTEGER, sal INTEGER)")
    emps = []
    nid = 1
    for _root in range(2):
        rid = nid; nid += 1
        emps.append((rid, "NULL", 100 + 13 * rid))
        for c in range(3):
            cid = nid; nid += 1
            emps.append((cid, rid, 100 + 13 * cid))
            for _g in range(2 + (c % 2)):
                gid = nid; nid += 1
                emps.append((gid, cid, 100 + 13 * gid))
    for (i, m, s) in emps:
        f.statement(f"INSERT INTO emp VALUES({i},{m},{s})")
    roots = [i for (i, m, _s) in emps if m == "NULL"]

    # layered DAG (5 layers x 4 nodes, edges only forward one layer):
    # path counts stay bounded, UNION ALL recursion terminates
    f.statement("CREATE TABLE dag(src INTEGER, dst INTEGER, w INTEGER)")
    layers, per = 5, 4
    def node(l, i):
        return 10 * l + i
    for l in range(layers - 1):
        for i in range(per):
            outs = (i, (i + 1) % per) if (i + l) % 2 == 0 else (i,)
            for j in outs:
                f.statement(
                    f"INSERT INTO dag VALUES({node(l, i)},{node(l + 1, j)},"
                    f"{1 + (i + j + l) % 5})")

    # 1) counting sequences: starts x steps x stops, three query forms
    for start in (0, 1, 5):
        for step in (1, 2, 3):
            for stop in (10, 25, 60):
                rec = (f"WITH RECURSIVE r(n) AS (SELECT {start} UNION ALL "
                       f"SELECT n+{step} FROM r WHERE n+{step} <= {stop}) ")
                f.query(rec + "SELECT n FROM r ORDER BY n", "I", "nosort")
                f.query(rec + "SELECT count(*), sum(n), min(n), max(n) FROM r",
                        "IIII", "nosort")
                f.query(rec + f"SELECT n, n*n, n % 7 FROM r "
                        f"WHERE n % 2 = {start % 2} ORDER BY n",
                        "III", "nosort")

    # 2) pair-state recursion (fibonacci mod m, running products mod m)
    for mod in (97, 31, 10):
        f.query(
            f"WITH RECURSIVE fib(i,a,b) AS (SELECT 1, 0, 1 UNION ALL "
            f"SELECT i+1, b, (a+b) % {mod} FROM fib WHERE i < 15) "
            f"SELECT i, a FROM fib ORDER BY i", "II", "nosort")
        f.query(
            f"WITH RECURSIVE pw(i,p) AS (SELECT 1, 2 UNION ALL "
            f"SELECT i+1, (p*3) % {mod} FROM pw WHERE i < 12) "
            f"SELECT i, p FROM pw ORDER BY i", "II", "nosort")

    # 3) hierarchy walks: subtree of each root under a depth cap
    for root in roots:
        for cap in (1, 2, 3):
            rec = (f"WITH RECURSIVE sub(id, sal, depth) AS ("
                   f"SELECT id, sal, 0 FROM emp WHERE id = {root} "
                   f"UNION ALL SELECT e.id, e.sal, s.depth+1 FROM emp e "
                   f"JOIN sub s ON e.mgr = s.id WHERE s.depth < {cap}) ")
            f.query(rec + "SELECT id, sal, depth FROM sub ORDER BY depth, id",
                    "III", "nosort")
            f.query(rec + "SELECT depth, count(*), sum(sal) FROM sub "
                    "GROUP BY depth ORDER BY depth", "III", "nosort")
            f.query(rec + "SELECT count(*), sum(sal) FROM sub "
                    "WHERE sal % 2 = 0", "II", "nosort")
    # chain-to-root length per employee (whole forest at once)
    f.query(
        "WITH RECURSIVE up(id, anc, depth) AS ("
        "SELECT id, mgr, 1 FROM emp WHERE mgr IS NOT NULL "
        "UNION ALL SELECT u.id, e.mgr, u.depth+1 FROM up u "
        "JOIN emp e ON u.anc = e.id WHERE e.mgr IS NOT NULL) "
        "SELECT id, max(depth) FROM up GROUP BY id ORDER BY id",
        "II", "nosort")
    # ancestors-with-salary filter threaded through the recursion
    for thr in (150, 250, 350):
        f.query(
            f"WITH RECURSIVE sub(id, sal) AS ("
            f"SELECT id, sal FROM emp WHERE mgr IS NULL "
            f"UNION ALL SELECT e.id, e.sal FROM emp e "
            f"JOIN sub s ON e.mgr = s.id WHERE e.sal > {thr}) "
            f"SELECT id, sal FROM sub ORDER BY id", "II", "nosort")

    # 4) DAG path enumeration from each source-layer node
    for i in range(per):
        st = node(0, i)
        rec = (f"WITH RECURSIVE p(s,d,len,cost) AS ("
               f"SELECT src, dst, 1, w FROM dag WHERE src = {st} "
               f"UNION ALL SELECT p.s, e.dst, p.len+1, p.cost+e.w "
               f"FROM p JOIN dag e ON p.d = e.src) ")
        f.query(rec + "SELECT d, len, cost FROM p ORDER BY d, len, cost",
                "III", "nosort")
        f.query(rec + "SELECT d, count(*), min(cost), max(cost) FROM p "
                "GROUP BY d ORDER BY d", "IIII", "nosort")
        f.query(rec + "SELECT DISTINCT d FROM p WHERE len >= 3 ORDER BY d",
                "I", "nosort")
        # cost-bounded recursion (the WHERE prunes inside the fixpoint)
        f.query(
            f"WITH RECURSIVE p(s,d,cost) AS ("
            f"SELECT src, dst, w FROM dag WHERE src = {st} "
            f"UNION ALL SELECT p.s, e.dst, p.cost+e.w "
            f"FROM p JOIN dag e ON p.d = e.src WHERE p.cost + e.w <= 9) "
            f"SELECT d, cost FROM p ORDER BY d, cost", "II", "nosort")
    # whole-graph closure, set-collapsed by the outer aggregate
    f.query(
        "WITH RECURSIVE p(s,d) AS (SELECT src, dst FROM dag UNION ALL "
        "SELECT p.s, e.dst FROM p JOIN dag e ON p.d = e.src) "
        "SELECT s, count(DISTINCT d) FROM p GROUP BY s ORDER BY s",
        "II", "nosort")
    f.query(
        "WITH RECURSIVE p(s,d,len) AS (SELECT src, dst, 1 FROM dag "
        "UNION ALL SELECT p.s, e.dst, p.len+1 FROM p JOIN dag e ON p.d = e.src) "
        "SELECT len, count(*) FROM p GROUP BY len ORDER BY len",
        "II", "nosort")
    # recursive result joined back to a base table
    f.query(
        "WITH RECURSIVE p(s,d) AS (SELECT src, dst FROM dag UNION ALL "
        "SELECT p.s, e.dst FROM p JOIN dag e ON p.d = e.src) "
        "SELECT p.s, sum(g.w) FROM (SELECT DISTINCT s, d FROM p) p "
        "JOIN dag g ON p.d = g.src GROUP BY p.s ORDER BY p.s",
        "II", "nosort")
    return f


def gen_bagset():
    """Bag-semantics set operations — EXCEPT ALL / INTERSECT ALL (and
    mixes with UNION ALL and the distinct forms), which select4's
    distinct-semantics chains deliberately excluded. Duplicate-heavy
    tables with NULL keys: bag subtraction must cancel multiplicities
    one-for-one and NULLs compare as values. Every chain is explicitly
    parenthesized (the two engines agree on INTERSECT precedence, but
    frozen expectations should not depend on it)."""
    f = File("bagset.test")
    f.statement("CREATE TABLE b1(k INTEGER, v INTEGER)")
    f.statement("CREATE TABLE b2(k INTEGER, v INTEGER)")
    for i in range(36):
        k = maybe_null(i % 6, i % 9)           # k NULL every 9th row
        v = maybe_null(100 + (i % 4) * 10, (i + 5) % 11)
        f.statement(f"INSERT INTO b1 VALUES({k},{v})")
    for i in range(28):
        k = maybe_null(i % 7, i % 8)
        v = maybe_null(100 + (i % 5) * 10, (i + 3) % 10)
        f.statement(f"INSERT INTO b2 VALUES({k},{v})")
    srcs = ["SELECT k, v FROM b1", "SELECT k, v FROM b2",
            "SELECT k, v FROM b1 WHERE v >= 110",
            "SELECT k, v FROM b2 WHERE k IS NOT NULL",
            "SELECT v, k FROM b1 WHERE k < 4"]
    ops = ["UNION ALL", "EXCEPT ALL", "INTERSECT ALL", "EXCEPT", "INTERSECT"]
    # two-term forms: every op over every source pair
    for a in srcs:
        for b in srcs:
            for op in ops[1:3]:
                f.query(f"({a}) {op} ({b})", "II", "rowsort")
    # three-term explicit chains: bag ops composed both ways
    for a, b, c in [(srcs[0], srcs[1], srcs[2]), (srcs[1], srcs[0], srcs[3]),
                    (srcs[2], srcs[3], srcs[0]), (srcs[3], srcs[2], srcs[1])]:
        for o1 in ops:
            for o2 in ops:
                f.query(f"(({a}) {o1} ({b})) {o2} ({c})", "II", "rowsort")
                f.query(f"({a}) {o1} (({b}) {o2} ({c}))", "II", "rowsort")
    # aggregates over bag-op results (multiplicities must survive into
    # the aggregate — the place EXCEPT vs EXCEPT ALL differ loudest)
    for a, b in [(srcs[0], srcs[1]), (srcs[1], srcs[2]), (srcs[0], srcs[3])]:
        for op in ["EXCEPT ALL", "INTERSECT ALL"]:
            f.query(f"SELECT count(*), count(k), count(v) FROM "
                    f"(({a}) {op} ({b}))", "III", "nosort")
            f.query(f"SELECT k, count(*) FROM (({a}) {op} ({b})) "
                    f"GROUP BY k ORDER BY k NULLS FIRST", "II", "nosort")
    return f


def gen_lateral():
    """Correlated LATERAL derived tables — the decorrelation grammar the
    corpus lacked. Only engine-agreed shapes are emitted (each class
    hand-verified Spark-vs-DuckDB): comma-LATERAL correlated filters and
    projections, ORDER BY + LIMIT laterals (explicit NULLS placement and
    full tiebreaks), LEFT JOIN LATERAL with aggregates (the empty-group
    row padding both engines agree on — comma-LATERAL over sum/max of an
    empty group is NOT agreed and not emitted), chained laterals, and
    windows inside laterals."""
    f = File("lateral.test")
    f.statement("CREATE TABLE L1(a INTEGER, b INTEGER)")
    f.statement("CREATE TABLE L2(a INTEGER, b INTEGER)")
    for i in range(22):
        a = maybe_null(i % 6, (i + 2) % 9)
        b = maybe_null(100 + 7 * (i % 8), i % 7)
        f.statement(f"INSERT INTO L1 VALUES({a},{b})")
    for i in range(30):
        a = maybe_null(i % 8, (i + 4) % 10)
        b = maybe_null(100 + 5 * (i % 11), (i + 1) % 8)
        f.statement(f"INSERT INTO L2 VALUES({a},{b})")
    corr = ["L2.a = x.a", "L2.a >= x.a", "L2.a < x.a",
            "L2.b > x.b", "L2.a = x.a AND L2.b >= x.b"]
    # correlated filter + projection laterals
    for c in corr:
        for proj in ["L2.b AS yb", "L2.b + x.a AS yb", "L2.a * 10 + L2.b % 10 AS yb"]:
            f.query(f"SELECT x.a, x.b, y.yb FROM L1 x, "
                    f"LATERAL (SELECT {proj} FROM L2 WHERE {c}) y",
                    "III", "rowsort")
    # top-k-per-row laterals (explicit NULLS placement + full tiebreak)
    for c in corr[:4]:
        for lim in (1, 2):
            for d in ("DESC NULLS LAST", "ASC NULLS FIRST"):
                f.query(
                    f"SELECT x.a, y.b FROM L1 x, LATERAL ("
                    f"SELECT b FROM L2 WHERE {c} "
                    f"ORDER BY b {d}, a NULLS FIRST LIMIT {lim}) y",
                    "II", "rowsort")
    # LEFT JOIN LATERAL aggregates: empty groups pad with NULLs
    for c in corr:
        for ag in ["sum(L2.b) AS s", "max(L2.b) AS s", "count(*) AS s",
                   "count(L2.b) AS s", "min(L2.a) + count(*) AS s"]:
            f.query(f"SELECT x.a, x.b, y.s FROM L1 x LEFT JOIN LATERAL ("
                    f"SELECT {ag} FROM L2 WHERE {c}) y ON true",
                    "III", "rowsort")
    # count(*) comma-laterals (always one row — engine-agreed)
    for c in corr:
        f.query(f"SELECT x.a, y.c FROM L1 x, LATERAL ("
                f"SELECT count(*) AS c FROM L2 WHERE {c}) y",
                "II", "rowsort")
    # chained laterals: second lateral consumes the first
    for c in corr[:3]:
        f.query(f"SELECT x.a, z.w FROM L1 x, "
                f"LATERAL (SELECT b FROM L2 WHERE {c}) y, "
                f"LATERAL (SELECT y.b - x.a AS w) z",
                "II", "rowsort")
    # windows inside laterals (fully ordered, deterministic)
    for c in corr[:3]:
        f.query(f"SELECT x.a, y.r, y.b FROM L1 x, LATERAL ("
                f"SELECT b, row_number() OVER (ORDER BY b NULLS FIRST, a "
                f"NULLS FIRST) AS r FROM L2 WHERE {c}) y",
                "III", "rowsort")
    # laterals under outer aggregation
    for c in corr[:3]:
        f.query(f"SELECT x.a, count(*), sum(y.yb) FROM L1 x, LATERAL ("
                f"SELECT L2.b AS yb FROM L2 WHERE {c}) y "
                f"GROUP BY x.a ORDER BY x.a NULLS FIRST",
                "III", "nosort")
    return f


def gen_temporal():
    """DATE/TIMESTAMP grammar — the corpus had only the 27+44 fixed
    pg_date/pg_timestamp vectors; this generates a systematic temporal
    grammar. Only engine-agreed spellings are emitted (each class probed
    Spark-vs-DuckDB): EXTRACT over the agreed unit set, date_trunc
    re-cast to DATE (DuckDB keeps DATE, Spark promotes to TIMESTAMP —
    the cast unifies), date ± INTERVAL re-cast to DATE (DuckDB promotes
    to TIMESTAMP), month-arithmetic end-of-month clamping, last_day /
    make_date, temporal CASE/GREATEST/LEAST/COALESCE, windows ordered
    by date, and month-key joins. NOT emitted (probed disagreements):
    EXTRACT(DOW) (origin differs), bare date+interval, bare
    EXTRACT(SECOND) (Spark returns DECIMAL), date subtraction."""
    f = File("temporal.test")
    f.statement("CREATE TABLE td(id INTEGER, d DATE, ts TIMESTAMP, g INTEGER, v INTEGER)")
    # deterministic variety: year/quarter boundaries, the 2024 leap day,
    # end-of-month days (clamping), NULLs on a 9-cycle
    base = ["2023-12-31", "2024-01-01", "2024-02-29", "2024-01-31",
            "2021-06-15", "2020-01-01", "2024-07-04", "2022-09-30",
            "2024-03-31", "2019-11-17", "2024-12-31", "2023-01-01"]
    times = ["00:00:00", "23:59:59", "12:30:45", "06:07:08", "18:00:00"]
    for i in range(40):
        if i % 9 == 4:
            d, ts = "NULL", "NULL"
        else:
            d = f"'{base[i % len(base)]}'"
            ts = f"'{base[(i * 7 + 3) % len(base)]} {times[i % len(times)]}'"
        f.statement(f"INSERT INTO td VALUES({i},{d},{ts},{i % 5},{100 + i * 7})")
    f.statement("CREATE TABLE th(hd DATE, hv INTEGER)")
    for i in range(14):
        d = "NULL" if i % 11 == 7 else f"'{base[(i * 5 + 1) % len(base)]}'"
        f.statement(f"INSERT INTO th VALUES({d},{1000 + i * 13})")

    d_units = ["YEAR", "MONTH", "DAY", "QUARTER", "WEEK", "DOY"]
    ts_units = ["YEAR", "MONTH", "DAY", "HOUR", "MINUTE"]
    wheres = ["", " WHERE d IS NOT NULL", " WHERE v % 2 = 0",
              " WHERE d >= DATE '2023-01-01'",
              " WHERE d BETWEEN DATE '2021-01-01' AND DATE '2024-02-29'"]
    # EXTRACT matrix over date and timestamp columns
    for u in d_units:
        for w in wheres:
            f.query(f"SELECT id, EXTRACT({u} FROM d) FROM td{w}", "II", "rowsort")
    for u in ts_units:
        for w in wheres[:3]:
            f.query(f"SELECT id, EXTRACT({u} FROM ts) FROM td{w}", "II", "rowsort")
    f.query("SELECT id, CAST(EXTRACT(SECOND FROM ts) AS BIGINT) FROM td", "II", "rowsort")
    # date_trunc (re-cast to DATE where DuckDB stays DATE)
    for u in ["year", "quarter", "month", "week"]:
        for w in wheres[:3]:
            f.query(f"SELECT id, CAST(date_trunc('{u}', d) AS DATE) FROM td{w}",
                    "IT", "rowsort")
    f.query("SELECT id, CAST(date_trunc('day', ts) AS DATE) FROM td", "IT", "rowsort")
    for u in ["hour", "minute"]:
        f.query(f"SELECT id, date_trunc('{u}', ts) FROM td", "IT", "rowsort")
    # interval arithmetic incl. end-of-month clamping (re-cast: DuckDB
    # promotes date+interval to TIMESTAMP, Spark keeps DATE)
    for n, unit in [(1, "DAY"), (3, "DAY"), (45, "DAY"), (1, "MONTH"),
                    (13, "MONTH"), (2, "MONTH"), (1, "YEAR"), (2, "YEAR")]:
        for op in ["+", "-"]:
            f.query(f"SELECT id, CAST(d {op} INTERVAL {n} {unit} AS DATE) FROM td",
                    "IT", "rowsort")
    for n, unit in [(90, "MINUTE"), (36, "HOUR"), (1, "DAY")]:
        for op in ["+", "-"]:
            f.query(f"SELECT id, ts {op} INTERVAL {n} {unit} FROM td", "IT", "rowsort")
    # last_day / make_date / casts
    f.query("SELECT id, last_day(d) FROM td", "IT", "rowsort")
    f.query("SELECT id, last_day(CAST(ts AS DATE)) FROM td", "IT", "rowsort")
    f.query("SELECT id, make_date(2020 + g, g + 1, 2 * g + 1) FROM td", "IT", "rowsort")
    f.query("SELECT id, CAST(ts AS DATE) FROM td", "IT", "rowsort")
    f.query("SELECT id, CAST(d AS TIMESTAMP) FROM td", "IT", "rowsort")
    f.query("SELECT id, CAST(d AS VARCHAR(30)) FROM td", "IT", "rowsort")
    # temporal predicates projected as I (3VL: NULL dates stay NULL)
    preds = ["d > DATE '2023-06-01'", "d = DATE '2024-02-29'",
             "d BETWEEN DATE '2021-01-01' AND DATE '2024-02-29'",
             "ts >= TIMESTAMP '2024-01-01 00:00:00'",
             "d < CAST(ts AS DATE)"]
    for p in preds:
        f.query(f"SELECT id, {p} FROM td", "II", "rowsort")
        f.query(f"SELECT count(*) FROM td WHERE {p}", "I", "nosort")
    # temporal CASE / GREATEST / LEAST / COALESCE
    for e in ["CASE WHEN v % 2 = 0 THEN d ELSE last_day(d) END",
              "CASE g WHEN 0 THEN d WHEN 2 THEN DATE '1999-12-31' ELSE CAST(ts AS DATE) END",
              "GREATEST(d, DATE '2023-01-01')", "LEAST(d, DATE '2023-01-01')",
              "GREATEST(d, CAST(ts AS DATE))", "COALESCE(d, DATE '1970-01-01')",
              "COALESCE(d, CAST(ts AS DATE), DATE '1970-01-01')",
              "NULLIF(d, DATE '2024-02-29')"]:
        f.query(f"SELECT id, {e} FROM td", "IT", "rowsort")
    # grouped temporal aggregates (month/year buckets, min/max dates)
    for key in ["EXTRACT(YEAR FROM d)", "EXTRACT(MONTH FROM d)",
                "EXTRACT(QUARTER FROM d)",
                "CAST(date_trunc('month', d) AS DATE)"]:
        kf = "T" if "date_trunc" in key else "I"
        f.query(f"SELECT {key} AS k, count(*), count(d) FROM td GROUP BY k",
                f"{kf}II", "rowsort")
        f.query(f"SELECT {key} AS k, min(d), max(d) FROM td GROUP BY k",
                f"{kf}TT", "rowsort")
        f.query(f"SELECT {key} AS k, sum(v) FROM td GROUP BY k "
                f"HAVING count(*) > 2", f"{kf}I", "rowsort")
    f.query("SELECT min(d), max(d), count(d), count(*) FROM td", "TTII", "nosort")
    f.query("SELECT min(ts), max(ts) FROM td", "TT", "nosort")
    # windows ordered by date (id tiebreak keeps them deterministic)
    for e in ["row_number() OVER (ORDER BY d NULLS FIRST, id)",
              "lag(d, 1) OVER (ORDER BY id)",
              "lead(d, 2) OVER (ORDER BY id)",
              "min(d) OVER (ORDER BY id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
              "max(d) OVER (PARTITION BY g ORDER BY id ROWS UNBOUNDED PRECEDING)",
              "count(d) OVER (PARTITION BY g)"]:
        fmt = "II" if e.startswith(("row_number", "count")) else "IT"
        f.query(f"SELECT id, {e} FROM td", fmt, "rowsort")
    # ORDER BY dates with explicit NULL placement + pagination
    for dir_ in ["ASC NULLS FIRST", "DESC NULLS LAST"]:
        for lim in ["", " LIMIT 7", " LIMIT 5 OFFSET 3"]:
            f.query(f"SELECT id, d FROM td ORDER BY d {dir_}, id{lim}",
                    "IT", "nosort")
    # month-key join between the two date tables
    for jt in ["JOIN", "LEFT JOIN"]:
        f.query("SELECT td.id, th.hv FROM td "
                f"{jt} th ON date_trunc('month', td.d) = date_trunc('month', th.hd)",
                "II", "rowsort")
        f.query("SELECT td.id, th.hv FROM td "
                f"{jt} th ON EXTRACT(YEAR FROM td.d) = EXTRACT(YEAR FROM th.hd) "
                "AND td.v < th.hv", "II", "rowsort")
    # date filters driving aggregates over the join
    f.query("SELECT EXTRACT(YEAR FROM td.d) AS y, count(*) FROM td "
            "JOIN th ON td.d >= th.hd GROUP BY y", "II", "rowsort")
    # --- volume tier: systematic cross-products over the same grammar ---
    # nested extract-over-shift (clamping visible through the unit matrix)
    for u in ["MONTH", "DAY", "QUARTER", "DOY"]:
        for n, iu in [(1, "DAY"), (45, "DAY"), (1, "MONTH"), (13, "MONTH"),
                      (2, "YEAR")]:
            for op in ["+", "-"]:
                f.query(f"SELECT id, EXTRACT({u} FROM CAST(d {op} INTERVAL "
                        f"{n} {iu} AS DATE)) FROM td", "II", "rowsort")
    # predicate × projection cross: every temporal predicate under every
    # WHERE (projection keeps 3VL visible, the filter pins TRUE-only rows)
    for p in preds:
        for w in wheres[1:]:
            f.query(f"SELECT id, {p} FROM td{w}", "II", "rowsort")
            f.query(f"SELECT count(*), count(d) FROM td{w} AND ({p})"
                    if w else f"SELECT count(*), count(d) FROM td WHERE {p}",
                    "II", "nosort")
    # interval arithmetic under filters and grouped
    for n, unit in [(7, "DAY"), (30, "DAY"), (3, "MONTH"), (11, "MONTH")]:
        for w in wheres[:4]:
            f.query(f"SELECT id, CAST(d + INTERVAL {n} {unit} AS DATE), "
                    f"CAST(d - INTERVAL {n} {unit} AS DATE) FROM td{w}",
                    "ITT", "rowsort")
        f.query(f"SELECT EXTRACT(YEAR FROM CAST(d + INTERVAL {n} {unit} AS DATE)) AS y, "
                f"count(*), min(d), max(d) FROM td GROUP BY y", "IITT", "rowsort")
    # extract-key aggregates × having thresholds
    for key in ["EXTRACT(YEAR FROM d)", "EXTRACT(MONTH FROM d)",
                "EXTRACT(QUARTER FROM d)", "EXTRACT(DOY FROM d) % 10"]:
        for hv in [1, 2, 4]:
            f.query(f"SELECT {key} AS k, count(*), sum(v) FROM td "
                    f"GROUP BY k HAVING count(*) >= {hv}", "III", "rowsort")
        f.query(f"SELECT {key} AS k, g, count(*) FROM td GROUP BY k, g",
                "III", "rowsort")
    # CASE/coalesce over dates × filters
    for e in ["CASE WHEN v % 3 = 0 THEN d WHEN v % 3 = 1 THEN last_day(d) END",
              "COALESCE(NULLIF(d, DATE '2024-01-31'), DATE '1970-01-01')",
              "LEAST(GREATEST(d, DATE '2021-01-01'), DATE '2024-06-30')"]:
        for w in wheres:
            f.query(f"SELECT id, {e} FROM td{w}", "IT", "rowsort")
    # window matrix over dates: function × partitioning
    for e, fmt in [("row_number() OVER ({})", "II"),
                   ("rank() OVER ({})", "II"),
                   ("lag(d, 1) OVER ({})", "IT"),
                   ("lead(d, 1) OVER ({})", "IT"),
                   ("min(d) OVER ({} ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)", "IT"),
                   ("count(d) OVER ({} ROWS UNBOUNDED PRECEDING)", "II")]:
        for part in ["ORDER BY d NULLS FIRST, id", "PARTITION BY g ORDER BY d NULLS FIRST, id",
                     "PARTITION BY EXTRACT(YEAR FROM d) ORDER BY id"]:
            f.query(f"SELECT id, {e.format(part)} FROM td", fmt, "rowsort")
    # join grammar × date keys (equi on derived units, theta on raw dates)
    for on in ["EXTRACT(MONTH FROM td.d) = EXTRACT(MONTH FROM th.hd)",
               "EXTRACT(QUARTER FROM td.d) = EXTRACT(QUARTER FROM th.hd) "
               "AND EXTRACT(YEAR FROM td.d) = EXTRACT(YEAR FROM th.hd)",
               "td.d = th.hd", "td.d < th.hd AND td.v % 3 = 0",
               "last_day(td.d) = last_day(th.hd)"]:
        for jt in ["JOIN", "LEFT JOIN"]:
            f.query(f"SELECT td.id, th.hv FROM td {jt} th ON {on}", "II", "rowsort")
            f.query(f"SELECT count(*), count(th.hv) FROM td {jt} th ON {on}",
                    "II", "nosort")
    # pagination over derived temporal orderings
    for key in ["last_day(d)", "CAST(d + INTERVAL 1 MONTH AS DATE)",
                "EXTRACT(DOY FROM d)"]:
        for lim, off in [(6, 0), (5, 4), (8, 10)]:
            kf = "I" if key.startswith("EXTRACT") else "T"
            f.query(f"SELECT id, {key} FROM td ORDER BY {key} ASC NULLS FIRST, "
                    f"id LIMIT {lim} OFFSET {off}", f"I{kf}", "nosort")
    return f


def gen_scalarexpr():
    """Scalar-expression grammar — CASE (both forms, nested), NULLIF /
    COALESCE chains, IN / NOT IN value lists WITH NULLs (3VL), BETWEEN,
    arithmetic with NULL propagation, bitwise AND/OR, GREATEST/LEAST
    (both engines skip NULLs), and three-valued boolean combinations
    projected as I columns (bool→1/0, NULL stays NULL). Every predicate
    also runs as a WHERE filter (TRUE-only semantics) so the projection
    and filter views of the same 3VL expression are both pinned.
    NOT emitted (probed disagreements): `^` (DuckDB power), `//`
    (DuckDB-only), bare sign() (Spark DOUBLE), CAST(double AS INT)
    (round vs trunc)."""
    f = File("scalarexpr.test")
    f.statement("CREATE TABLE sx(id INTEGER, a INTEGER, b INTEGER, c INTEGER)")
    for i in range(48):
        a = maybe_null((i * 7) % 23 - 11, (i + 2) % 9)
        b = maybe_null((i * 5) % 17 - 8, (i + 5) % 11)
        c = maybe_null(i % 6, (i + 3) % 13)
        f.statement(f"INSERT INTO sx VALUES({i},{a},{b},{c})")

    # CASE — searched, simple, nested, with NULL branches
    cases = [
        "CASE WHEN a > b THEN a ELSE b END",
        "CASE WHEN a > b THEN 'gt' WHEN a = b THEN 'eq' ELSE 'other' END",
        "CASE WHEN a IS NULL THEN -99 WHEN a > 0 THEN a ELSE -a END",
        "CASE c WHEN 0 THEN 'zero' WHEN 3 THEN 'three' ELSE 'rest' END",
        "CASE c WHEN 0 THEN a WHEN 1 THEN b END",
        "CASE WHEN a > 0 THEN CASE WHEN b > 0 THEN 'pp' ELSE 'p-' END "
        "ELSE CASE WHEN b > 0 THEN '-p' ELSE '--' END END",
        "CASE WHEN a + b > 0 THEN a + b END",
    ]
    for e in cases:
        fmt = "IT" if "'" in e else "II"
        f.query(f"SELECT id, {e} FROM sx", fmt, "rowsort")
    # NULLIF / COALESCE chains
    for e in ["NULLIF(a, b)", "NULLIF(c, 0)", "COALESCE(a, b, c)",
              "COALESCE(a, -1)", "COALESCE(NULLIF(a, b), c, -7)",
              "NULLIF(COALESCE(a, 0), COALESCE(b, 0))"]:
        f.query(f"SELECT id, {e} FROM sx", "II", "rowsort")
    # GREATEST / LEAST (both engines skip NULL arguments)
    for e in ["GREATEST(a, b)", "LEAST(a, b)", "GREATEST(a, b, c)",
              "LEAST(a, b, 0)", "GREATEST(a, b, NULL)"]:
        f.query(f"SELECT id, {e} FROM sx", "II", "rowsort")
    # arithmetic with NULL propagation (+ - * % mod abs floor-div image)
    for e in ["a + b", "a - b", "a * b - c", "a % (abs(b) + 1)",
              "mod(a, (abs(b) + 1))", "abs(a - b)",
              "CAST(sign(a) AS BIGINT)", "CAST(floor(a / 4) AS BIGINT)",
              "a & b", "a | b", "(a & 15) | (b & 3)",
              "a * 1000 + COALESCE(b, 0)"]:
        f.query(f"SELECT id, {e} FROM sx", "II", "rowsort")
    # predicates: projected as I (3VL visible) AND as WHERE (TRUE-only)
    preds = [
        "a > b", "a = b", "a <> b", "a >= 0 AND b < 0",
        "a > 0 OR b > 0", "NOT (a > b)",
        "a IN (1, 3, 5, 7, 11)", "a IN (1, 3, NULL)",
        "a NOT IN (1, 3, 5)", "a NOT IN (1, 3, NULL)",
        "a BETWEEN b AND c", "a BETWEEN -5 AND 5",
        "a NOT BETWEEN 0 AND 10",
        "a IS NULL", "a IS NOT NULL",
        "(a > b) = (b > c)",
        "(a > 0 AND b > 0) OR (a IS NULL AND c > 2)",
        "a IS DISTINCT FROM b", "a IS NOT DISTINCT FROM b",
    ]
    for p in preds:
        f.query(f"SELECT id, {p} FROM sx", "II", "rowsort")
        f.query(f"SELECT count(*) FROM sx WHERE {p}", "I", "nosort")
    # 3VL through aggregation: CASE and predicates inside SUM/COUNT
    for e in ["sum(CASE WHEN a > b THEN 1 ELSE 0 END)",
              "count(CASE WHEN a > 0 THEN 1 END)",
              "sum(CASE WHEN a IS NULL THEN c END)",
              "count(NULLIF(c, 0))", "sum(COALESCE(a, 0) - COALESCE(b, 0))"]:
        f.query(f"SELECT {e} FROM sx", "I", "nosort")
        f.query(f"SELECT c, {e} FROM sx GROUP BY c", "II", "rowsort")
    # expression composition: predicates × scalar wrappers in one list
    wraps = ["abs({})", "COALESCE({}, -1)", "{} + c", "CASE WHEN {} > 0 THEN {} END"]
    bases = ["a + b", "a - 2 * b", "GREATEST(a, b)", "NULLIF(a, c)"]
    for wb in wraps:
        for base_e in bases:
            e = wb.replace("{}", f"({base_e})")
            f.query(f"SELECT id, {e} FROM sx", "II", "rowsort")
    # scalar expressions as join predicates / keys
    f.statement("CREATE TABLE sy(k INTEGER, w INTEGER)")
    for i in range(20):
        k = maybe_null(i % 7 - 3, (i + 1) % 8)
        w = maybe_null(i * 11 % 19, i % 10)
        f.statement(f"INSERT INTO sy VALUES({k},{w})")
    for on in ["COALESCE(sx.a, 0) = sy.k", "abs(sx.a % 7) = abs(sy.k)",
               "CASE WHEN sx.a > 0 THEN sx.c ELSE -sx.c END = sy.k"]:
        f.query(f"SELECT sx.id, sy.w FROM sx JOIN sy ON {on}", "II", "rowsort")
        f.query(f"SELECT sx.id, sy.w FROM sx LEFT JOIN sy ON {on}", "II", "rowsort")
    # --- volume tier: systematic cross-products over the same grammar ---
    # every predicate × scalar filter (projection under filter: both 3VL
    # views at once), plus the grouped count per filter
    sfilters = ["c IS NOT NULL", "id % 2 = 0", "a > -5", "b BETWEEN -4 AND 8"]
    for p in preds:
        for sf_ in sfilters:
            f.query(f"SELECT id, {p} FROM sx WHERE {sf_}", "II", "rowsort")
            f.query(f"SELECT count(*) FROM sx WHERE ({sf_}) AND ({p})",
                    "I", "nosort")
    # every CASE form under every filter and grouped by c
    for e in cases:
        fmt = "IT" if "'" in e else "II"
        for sf_ in sfilters:
            f.query(f"SELECT id, {e} FROM sx WHERE {sf_}", fmt, "rowsort")
        if "'" not in e:
            f.query(f"SELECT c, count(*), sum({e}) FROM sx GROUP BY c",
                    "III", "rowsort")
            f.query(f"SELECT c, min({e}), max({e}) FROM sx GROUP BY c "
                    "HAVING count(*) > 2", "III", "rowsort")
    # arithmetic matrix × filters, and as ORDER keys with pagination
    ariths = ["a + b - c", "a * c % 13", "abs(a) - abs(b)",
              "(a & 7) * 4 + (b & 3)", "COALESCE(a, 0) * COALESCE(b, 1)",
              "mod(a * a, 11)"]
    for e in ariths:
        for sf_ in sfilters:
            f.query(f"SELECT id, {e} FROM sx WHERE {sf_}", "II", "rowsort")
        f.query(f"SELECT id, {e} FROM sx ORDER BY {e} ASC NULLS FIRST, id "
                "LIMIT 9 OFFSET 5", "II", "nosort")
        f.query(f"SELECT {e} AS k, count(*) FROM sx GROUP BY k", "II", "rowsort")
    # IN-list size/content matrix (NULL membership × NOT × composition)
    for lst in ["(0)", "(1, 2)", "(1, 2, NULL)", "(-11, -4, 3, 10)",
                "(1, 3, 5, 7, 9, 11)", "(NULL)"]:
        for neg in ["IN", "NOT IN"]:
            f.query(f"SELECT id, a {neg} {lst} FROM sx", "II", "rowsort")
            f.query(f"SELECT count(*) FROM sx WHERE a {neg} {lst}", "I", "nosort")
        f.query(f"SELECT id, (a + b) IN {lst} FROM sx", "II", "rowsort")
    # boolean algebra over predicate pairs (3VL truth-table coverage)
    bpairs = [("a > b", "b > c"), ("a IS NULL", "b > 0"),
              ("a IN (1, 3, 5)", "c = 2"), ("a BETWEEN -3 AND 3", "b <> c")]
    for p1, p2 in bpairs:
        for comb in [f"({p1}) AND ({p2})", f"({p1}) OR ({p2})",
                     f"({p1}) = ({p2})", f"NOT ({p1}) OR NOT ({p2})",
                     f"({p1}) AND NOT ({p2})"]:
            f.query(f"SELECT id, {comb} FROM sx", "II", "rowsort")
            f.query(f"SELECT count(*) FROM sx WHERE {comb}", "I", "nosort")
    # scalar wrappers × window functions (expressions inside OVER)
    for e in ["COALESCE(a, 0) + COALESCE(b, 0)", "abs(a % 5)",
              "CASE WHEN a > 0 THEN a ELSE -a END"]:
        for w in [f"sum({e}) OVER (PARTITION BY c ORDER BY id ROWS UNBOUNDED PRECEDING)",
                  f"row_number() OVER (ORDER BY {e} NULLS FIRST, id)",
                  f"max({e}) OVER (PARTITION BY c)"]:
            f.query(f"SELECT id, {w} FROM sx", "II", "rowsort")
    # expression-keyed joins × aggregates over the join
    for on in ["COALESCE(sx.a, 0) = sy.k", "abs(sx.a % 7) = abs(sy.k)"]:
        f.query(f"SELECT sy.k, count(*), sum(sx.c) FROM sx JOIN sy ON {on} "
                "GROUP BY sy.k", "III", "rowsort")
        f.query(f"SELECT count(*), count(sy.w) FROM sx LEFT JOIN sy ON {on} "
                "AND sy.w > 5", "II", "nosort")
    return f


def gen_recursive_distinct():
    """DISTINCT-recursion (set-fixpoint) grammar over CYCLIC graphs —
    the family the UNION ALL corpus cannot express: `SELECT DISTINCT ...
    FROM <recursive CTE>` in the linear transitive-closure shape, which
    graft's SqlIncremental lowers to an incremental closure circuit
    whose SET fixpoint terminates on cycles (Spark's native UnionLoop
    counts paths and would not). Expected results are frozen from
    DuckDB's UNION (distinct) recursion — the same set fixpoint — via
    query_oracle, because DuckDB's UNION ALL recursion would not
    terminate on these graphs either. The runner spec routes this file
    through SqlIncremental.compile + batch evaluation, NOT spark.sql
    (see SltRunnerSpec). Deterministic edges only: no rng, so this
    generator's position in the run order cannot shift other files."""
    f = File("recursive_distinct.test")
    f.out += ["# CYCLIC-graph DISTINCT recursion: execute through the",
              "# graft closure-circuit lowering, NOT plain spark.sql",
              "# (the native UNION ALL loop would not terminate).", ""]

    graphs = {}
    # ring: 9-node directed cycle + 3 chords — one strongly connected core
    n = 9
    graphs["ring"] = [(i, (i + 1) % n, 1 + i % 4) for i in range(n)] + \
        [(0, 4, 5), (3, 8, 2), (6, 2, 3)]
    # twocyc: a 5-cycle and a 4-cycle, one-way bridge, self-loop tail
    graphs["twocyc"] = \
        [(i, (i + 1) % 5, 1 + i % 3) for i in range(5)] + \
        [(10 + i, 10 + (i + 1) % 4, 2 + i % 2) for i in range(4)] + \
        [(2, 10, 4), (13, 20, 2), (20, 20, 1)]
    # mesh: functional digraph on 11 nodes, extra out-edges on evens
    mesh = []
    for i in range(11):
        mesh.append((i, (2 * i + 1) % 11, 1 + i % 5))
        if i % 2 == 0:
            mesh.append((i, (3 * i + 2) % 11, 1 + (i + 2) % 4))
    graphs["mesh"] = mesh

    for t, edges in graphs.items():
        f.statement(f"CREATE TABLE {t}(src INTEGER, dst INTEGER, w INTEGER)")
        for s, d, w in edges:
            f.statement(f"INSERT INTO {t} VALUES({s},{d},{w})")

    def rec(anchor, step, outer, fmt):
        spark_sql = (f"WITH RECURSIVE r(s,d) AS ({anchor} UNION ALL {step}) "
                     f"{outer}")
        oracle_sql = (f"WITH RECURSIVE r(s,d) AS ({anchor} UNION {step}) "
                      f"{outer}")
        f.query_oracle(spark_sql, oracle_sql, fmt, "rowsort")

    for t, edges in graphs.items():
        nodes = sorted({s for s, _d, _w in edges})
        anchors = nodes[:3] + nodes[-1:]
        fwd = f"SELECT r.s, e.dst FROM r JOIN {t} e ON r.d = e.src"
        # 1) plain TC (anchor ≡ edge relation → the closure node alone),
        #    under three outer spellings incl. rename/reorder layers
        rec(f"SELECT src, dst FROM {t}", fwd,
            "SELECT DISTINCT s, d FROM r", "II")
        rec(f"SELECT src, dst FROM {t}", fwd,
            "SELECT DISTINCT d AS y, s AS x FROM r", "II")
        rec(f"SELECT src, dst FROM {t}", fwd,
            "SELECT s, count(*) FROM (SELECT DISTINCT s, d FROM r) q "
            "GROUP BY s", "II")
        # 2) anchored closures: reachability from one source node, the
        #    same three outer spellings plus a filter ABOVE the distinct
        for k in anchors:
            anc = f"SELECT src, dst FROM {t} WHERE src = {k}"
            rec(anc, fwd, "SELECT DISTINCT s, d FROM r", "II")
            rec(anc, fwd, "SELECT DISTINCT d AS reach, s AS frm FROM r", "II")
            rec(anc, fwd,
                f"SELECT d FROM (SELECT DISTINCT s, d FROM r) q "
                f"WHERE s = {k}", "I")
        # 3) filtered edge relation inside the recursion (cheap-edge
        #    closure): anchor full and anchor pinned
        for c in (2, 3):
            filt = (f"SELECT r.s, e.dst FROM r JOIN (SELECT src, dst "
                    f"FROM {t} WHERE w <= {c}) e ON r.d = e.src")
            rec(f"SELECT src, dst FROM {t}", filt,
                "SELECT DISTINCT s, d FROM r", "II")
            rec(f"SELECT src, dst FROM {t} WHERE src = {anchors[0]}", filt,
                "SELECT DISTINCT s, d FROM r", "II")
        # 4) flipped equality spelling in the join condition
        rec(f"SELECT src, dst FROM {t}",
            f"SELECT r.s, e.dst FROM r JOIN {t} e ON e.src = r.d",
            "SELECT DISTINCT s, d FROM r", "II")
        # 5) reverse reachability (ancestors): join on e.dst, emit e.src
        rec(f"SELECT dst, src FROM {t}",
            f"SELECT r.s, e.src FROM r JOIN {t} e ON r.d = e.dst",
            "SELECT DISTINCT s, d FROM r", "II")
        for k in anchors[:2]:
            rec(f"SELECT dst, src FROM {t} WHERE dst = {k}",
                f"SELECT r.s, e.src FROM r JOIN {t} e ON r.d = e.dst",
                "SELECT DISTINCT s, d FROM r", "II")
        # 6) aggregates over an anchored closure
        for k in anchors[:2]:
            rec(f"SELECT src, dst FROM {t} WHERE src = {k}", fwd,
                "SELECT count(*), min(d), max(d) FROM "
                "(SELECT DISTINCT s, d FROM r) q", "III")
    return f


def gen_selfjoin():
    """Joins whose sides SHARE column names — the dedup-pre-pass grammar:
    self equi/theta joins reading both sides' columns, outer joins over a
    same-named key reading the INNER side's key (NULL pads, not the
    preserved side's value), pure-theta outer joins (unit-key pads),
    NULL-safe key equality (IS NOT DISTINCT FROM — identical semantics in
    DuckDB and Spark), three-way chains with repeated names, and
    aggregates over self-join results."""
    f = File("selfjoin.test")
    f.statement("CREATE TABLE s1(k INTEGER, g INTEGER, v INTEGER)")
    for i in range(30):
        k = 100 + 7 * i
        g = "NULL" if i % 11 == 3 else str(100 + 7 * rng.randrange(40))
        v = "NULL" if i % 13 == 5 else str(150 + rng.randrange(120))
        f.statement(f"INSERT INTO s1 VALUES({k},{g},{v})")
    f.statement("CREATE TABLE s2(k INTEGER, v INTEGER)")
    for i in range(18):
        k = 100 + 7 * rng.randrange(35)
        v = 150 + rng.randrange(120)
        f.statement(f"INSERT INTO s2 VALUES({k},{v})")

    wheres = ["", " WHERE u.k > 150", " WHERE u.v IS NOT NULL",
              " WHERE u.k % 2 = 0"]
    # 1) self equi-joins: key-to-key, key-to-non-key, residual mixes
    for on in ["u.k = w.k", "u.k = w.g", "u.g = w.g AND u.k < w.k",
               "u.k = w.g AND u.v < w.v", "u.g = w.k AND u.v >= w.v"]:
        for wh in wheres:
            f.query(f"SELECT u.k, u.v, w.k, w.v FROM s1 u JOIN s1 w "
                    f"ON {on}{wh}", "IIII", "rowsort")
    # 2) self OUTER joins reading both sides
    for jt in ["LEFT", "RIGHT", "FULL"]:
        for on in ["u.k = w.g", "u.g = w.g AND u.k < w.k",
                   "u.k = w.g AND w.v > 200"]:
            for wh in ["", " WHERE u.k > 150", " WHERE u.v IS NOT NULL"]:
                f.query(f"SELECT u.k, u.g, w.k, w.v FROM s1 u {jt} JOIN s1 w "
                        f"ON {on}{wh}", "IIII", "rowsort")
    # 3) same-named key OUTER joins across two tables, reading the inner key
    for jt in ["LEFT", "RIGHT", "FULL"]:
        for sel in ["s1.k, s2.k, s1.v, s2.v", "s2.k, s2.v, s1.g, s1.k"]:
            for on in ["s1.k = s2.k", "s1.k = s2.k AND s2.v > 200"]:
                f.query(f"SELECT {sel} FROM s1 {jt} JOIN s2 ON {on}",
                        "IIII", "rowsort")
    # 4) pure-theta OUTER joins (no equi key): unit-key pads
    for jt in ["LEFT", "RIGHT", "FULL"]:
        for on in ["s2.k < s1.k - 120", "s2.v > s1.v + 30",
                   "s1.g = 114 AND s2.k > 200"]:
            f.query(f"SELECT s1.k, s1.v, s2.k, s2.v FROM s1 {jt} JOIN s2 "
                    f"ON {on}", "IIII", "rowsort")
    # 5) NULL-safe key equality (NULL matches NULL on the join key)
    for jt in ["JOIN", "LEFT JOIN", "FULL JOIN"]:
        f.query(f"SELECT u.k, u.g, w.k, w.g FROM s1 u {jt} s1 w "
                f"ON u.g IS NOT DISTINCT FROM w.g", "IIII", "rowsort")
        f.query(f"SELECT u.k, w.v FROM s1 u {jt} s1 w "
                f"ON u.v IS NOT DISTINCT FROM w.v AND u.k <= w.k",
                "II", "rowsort")
    # 6) three-way chains with repeated names across all three inputs
    for wh in ["", " WHERE a.k > 150", " WHERE a.v IS NOT NULL",
               " WHERE a.k % 2 = 0"]:
        f.query("SELECT a.k, b.v, c.v FROM s1 a JOIN s1 b ON a.k = b.g "
                "JOIN s2 c ON c.k = a.k" + wh, "III", "rowsort")
        f.query("SELECT a.k, b.v, c.v FROM s1 a JOIN s1 b ON a.k = b.g "
                "LEFT JOIN s2 c ON c.k = b.k" + wh, "III", "rowsort")
    # 7) aggregates / DISTINCT over self-join results
    f.query("SELECT u.k, count(*), max(w.v) FROM s1 u JOIN s1 w "
            "ON u.k = w.g GROUP BY u.k", "III", "rowsort")
    f.query("SELECT count(*), sum(u.v + w.v) FROM s1 u JOIN s1 w "
            "ON u.g = w.g AND u.k < w.k", "II", "rowsort")
    f.query("SELECT DISTINCT u.v, w.v FROM s1 u JOIN s1 w ON u.k = w.g",
            "II", "rowsort")
    return f


def gen_select9():
    """Volume family (r11 verdict #9): a second, larger deep-expression
    sweep over t1 — same Spark/DuckDB-safe operator palette as select7
    (no division, no col*col overflow, %% only over abs with a literal)
    plus BETWEEN / IN-list / NOT predicate forms. Single 32-row table and
    shallow plans keep the per-record spark.sql round trip cheap, so the
    family adds corpus volume at minimal suite wall-time."""
    f = File("select9.test")
    t1_statements(f)

    # private stream: appending this family must not shift the shared rng
    # consumed by earlier generators (their frozen files stay byte-stable)
    rng = random.Random(20260815)

    cols = ["a", "b", "c", "d", "e"]

    def leaf():
        r = rng.randrange(7)
        if r < 5:
            return cols[rng.randrange(5)]
        return str(rng.randrange(1, 200))

    def cond(depth):
        r = rng.randrange(11)
        e1, e2 = expr(depth - 1), expr(depth - 1)
        if r == 0:
            return f"{cols[rng.randrange(5)]} IS NULL"
        if r == 1:
            return f"{cols[rng.randrange(5)]} IS NOT NULL"
        if r == 2 and depth > 1:
            return f"({cond(depth - 1)} AND {cond(depth - 1)})"
        if r == 3 and depth > 1:
            return f"({cond(depth - 1)} OR {cond(depth - 1)})"
        if r == 4 and depth > 1:
            return f"(NOT {cond(depth - 1)})"
        if r == 5:
            lo = rng.randrange(80, 180)
            return f"{e1} BETWEEN {lo} AND {lo + rng.randrange(5, 90)}"
        if r == 6:
            vals = sorted(rng.randrange(90, 260) for _ in range(rng.randrange(2, 6)))
            return f"(abs({e1}) % 256) IN ({', '.join(str(v) for v in vals)})"
        op = ["<", "<=", ">", ">=", "=", "<>"][rng.randrange(6)]
        return f"{e1} {op} {e2}"

    def expr(depth):
        if depth <= 0:
            return leaf()
        r = rng.randrange(10)
        e1, e2 = expr(depth - 1), expr(depth - 1)
        if r == 0:
            return f"({e1} + {e2})"
        if r == 1:
            return f"({e1} - {e2})"
        if r == 2:
            return f"{rng.randrange(2, 4)} * {e1}"
        if r == 3:
            return f"abs({e1} - {e2})"
        if r == 4:
            return f"least({e1}, {e2})"
        if r == 5:
            return f"greatest({e1}, {e2})"
        if r == 6:
            return f"coalesce({e1}, {e2})"
        if r == 7:
            return f"nullif({e1}, {e2})"
        if r == 8:
            return f"(abs({e1}) % {rng.randrange(2, 10)})"
        return f"CASE WHEN {cond(depth - 1)} THEN {e1} ELSE {e2} END"

    # single expression: ordered / filtered / unordered (valuesort)
    for i in range(5200):
        e = expr(2 + i % 2)
        if i % 3 == 0:
            f.query(f"SELECT {e} FROM t1 ORDER BY a", "I", "nosort")
        elif i % 3 == 1:
            f.query(f"SELECT {e} FROM t1 WHERE {cond(2)} ORDER BY a",
                    "I", "nosort")
        else:
            f.query(f"SELECT {e} FROM t1", "I", "valuesort")

    # predicate-focused records (projection kept trivial)
    for i in range(4300):
        f.query(f"SELECT a FROM t1 WHERE {cond(3)} ORDER BY a", "I", "nosort")

    # expression pairs
    for i in range(3200):
        f.query(f"SELECT {expr(2)}, {expr(2)} FROM t1 ORDER BY a",
                "II", "nosort")

    # aggregates over nested expressions, with and without filters
    for i in range(2400):
        e = expr(1 + i % 2)
        agg = ["sum", "min", "max", "count"][i % 4]
        w = f" WHERE {cond(2)}" if i % 2 == 0 else ""
        f.query(f"SELECT {agg}({e}) FROM t1{w}", "I", "nosort")

    # grouped aggregates over expression keys
    for i in range(1200):
        key = f"abs({expr(1)}) % {rng.randrange(3, 6)}"
        f.query(
            f"SELECT {key}, sum({expr(2)}) FROM t1 GROUP BY {key}",
            "II", "rowsort")

    # expression ORDER BY (deterministic via trailing a)
    for i in range(700):
        f.query(
            f"SELECT a, {expr(2)} FROM t1 ORDER BY {expr(1)} NULLS FIRST, a",
            "II", "nosort")
    return f


def gen_castmatrix():
    """CAST matrix — the full supported-type-pair x edge-value grid the
    reference implements as 319 pairwise cast functions
    (lib/sqllib/src/casts.rs; string->bool parsing at :89-105, decimal
    truncation DBSPTypeDecimal.java:39-40). Sources live in BIGINT /
    DOUBLE / VARCHAR / DATE / TIMESTAMP columns (the SLT table surface);
    narrower sources are produced by chained casts. Where Spark (non-ANSI)
    and DuckDB agree, expectations are frozen verbatim; where they differ
    BY DESIGN, the expectation is frozen from a DuckDB formula that
    expresses Spark's documented semantics (every formula probe-verified
    against Spark 4 this round):
      - int -> narrower int WRAPS two's-complement (HUGEINT mod image);
      - double -> int TRUNCATES toward zero and SATURATES at INT bounds,
        then wraps to narrower targets; NaN -> 0;
      - string -> int trims, parses decimals by truncation, rejects
        exponents and out-of-range (NULL, not wrap/error);
      - string -> boolean accepts {true,t,y,yes,1 / false,f,n,no,0}
        trimmed case-insensitively, else NULL (Spark's set is wider than
        DuckDB's, so a CASE spells it out);
      - numeric -> boolean is nonzero-ness (NaN -> true);
      - invalid string -> date/timestamp/decimal is NULL (TRY_CAST image);
      - decimal targets round HALF_UP and overflow to NULL (both agree
        when sourced from DOUBLE; DECIMAL-literal rescale ties differ
        between the engines, so decimal sources route through DOUBLE).
    NOT emitted (probed disagreements): double->string outside
    [1e-3, 1e7) (Spark scientific vs DuckDB positional), NaN/Infinity
    string images, partial dates ('2023-01'), decimal-literal tie
    rescale."""
    f = File("castmatrix.test")
    f.statement("CREATE TABLE cm(id INTEGER, i BIGINT, f DOUBLE, s VARCHAR, d DATE, ts TIMESTAMP)")
    ivals = [0, 1, -1, 127, 128, -128, -129, 255, 256, 32767, 32768, -32768,
             -32769, 65535, 65536, 2147483647, 2147483648, -2147483648,
             -2147483649, 4294967295, 4294967296, 3000000000,
             9223372036854775807, -9223372036854775808, 42, -7, 100,
             1000000, -999999, 10, 2, 300, 40000, 1234567, 86, 5, -300,
             7000, -40000, 123, 99, -2, 17, 64, -64]
    fvals = [0.0, 1.0, -1.0, 0.5, -0.5, 1.5, 2.5, -2.5, 3.5, 1.9, -1.9,
             0.4999, 127.9, -128.9, 128.5, 300.7, 32767.6, -32768.4,
             1000000.0, -1000000.0, 0.25, 0.125, 100.0, 1234567.0, 0.001,
             2.75, -42.0, 7.0, 99.999, 0.0625, 123456.789, -0.0005, 3.25,
             12.345, 6.5, 8.875, 1e19, -1e19, 2147483646.7, -2147483647.9,
             4.5, 5.5, -3.5, -4.5, 0.75]
    svals = [" 42 ", "12.5", "abc", "", "+7", "007", "-13", "2147483648",
             "32768", "128", "-129", "1e3", " 1.5 ", ".5", "5.", "true",
             "FALSE", "t", "f", "y", "N", "yes", "no", "1", "0", " true ",
             "2", "on", "2023-01-15", " 2023-01-15 ", "2023-1-5",
             "2023-02-30", "2023-01-15 10:30:00", "2023-01-15T10:30:00",
             "2023-01-15 10:30:00.123", "junk", "-32769", "255", " -8 ",
             "9999999999999999999", "0.4999", "-2.5", "TRUE", "f", "3.999"]
    # NOTE: '-0' is deliberately absent — Z-set state keys normalize
    # -0.0 to 0.0 (Spark NormalizeFloatingNumbers; Rust OrderedFloat
    # does the same), so a standing view cannot preserve the sign bit
    dvals = ["2023-01-15", "2024-02-29", "1970-01-01", "2099-12-31",
             "2000-03-01", "1969-07-20", "2024-12-31", "1900-01-01"]
    tvals = ["2023-01-15 10:30:00", "1970-01-01 00:00:00",
             "2024-02-29 23:59:59", "2000-06-15 12:00:00",
             "1999-12-31 23:00:01", "2023-01-15 10:30:00.123",
             "2024-07-04 06:07:08", "1970-01-01 00:00:01"]
    N = 45
    for k in range(N):
        iv = "NULL" if k % 9 == 4 else str(ivals[k % len(ivals)])
        fv = "NULL" if k % 11 == 6 else repr(fvals[k % len(fvals)])
        sv = "NULL" if k % 13 == 9 else "'" + svals[k % len(svals)] + "'"
        dv = "NULL" if k % 7 == 3 else "'" + dvals[k % len(dvals)] + "'"
        tv = "NULL" if k % 8 == 5 else "'" + tvals[k % len(tvals)] + "'"
        f.statement(f"INSERT INTO cm VALUES({k},{iv},{fv},{sv},{dv},{tv})")
    # one NaN row (DuckDB needs the string image; Spark's runner parses
    # the bare literal) — excluded from string sweeps via NOT isnan
    f.statement_oracle(
        f"INSERT INTO cm VALUES({N},7,NaN,'nanrow','2023-05-05','2023-05-05 05:05:05')",
        f"INSERT INTO cm VALUES({N},7,CAST('nan' AS DOUBLE),'nanrow','2023-05-05','2023-05-05 05:05:05')")
    nrows = N + 1

    # ---- oracle formula builders (Spark semantics in DuckDB SQL) ----
    def wrap(expr, bits):
        half = 2 ** (bits - 1)
        full = 2 ** bits
        return (f"CAST((((CAST({expr} AS HUGEINT) + {half}) % {full} + {full})"
                f" % {full}) - {half} AS BIGINT)")
    def d2i_sat(col, lo, hi):
        # trunc toward zero, saturate at [lo, hi], NaN -> 0, NULL
        # propagates; branches unify through HUGEINT so the INT64 bound
        # literal isn't rounded out of range via DOUBLE
        return (f"CAST(CASE WHEN {col} IS NULL THEN NULL "
                f"WHEN isnan({col}) THEN CAST(0 AS HUGEINT) "
                f"WHEN {col} >= {hi} THEN CAST({hi} AS HUGEINT) "
                f"WHEN {col} <= {lo} THEN CAST({lo} AS HUGEINT) "
                f"ELSE CAST(TRUNC({col}) AS HUGEINT) END AS BIGINT)")
    def d2i_narrow(col, bits):
        return wrap(d2i_sat(col, -2147483648, 2147483647), bits)
    def s2i(col, lo, hi):
        # trim, reject exponents, parse as decimal, truncate, range-check
        t = (f"TRUNC(TRY_CAST(CASE WHEN regexp_matches(trim({col}), '[eE]') "
             f"THEN NULL ELSE trim({col}) END AS DECIMAL(38,10)))")
        return (f"CAST(CASE WHEN {t} BETWEEN {lo} AND {hi} THEN {t} "
                f"ELSE NULL END AS BIGINT)")
    def s2bool(col):
        return (f"CASE WHEN {col} IS NULL THEN NULL "
                f"WHEN lower(trim({col})) IN ('true','t','y','yes','1') THEN 1 "
                f"WHEN lower(trim({col})) IN ('false','f','n','no','0') THEN 0 "
                f"ELSE NULL END")

    I8 = (-128, 127)
    I16 = (-32768, 32767)
    I32 = (-2147483648, 2147483647)
    I64 = (-9223372036854775808, 9223372036854775807)

    # (spark_expr, duck_expr or None-if-identical, fmt char)
    pairs = [
        # BIGINT source -> narrower ints (wrap), double, decimal, string, bool
        ("CAST(CAST(i AS TINYINT) AS BIGINT)", wrap("i", 8), "I"),
        ("CAST(CAST(i AS SMALLINT) AS BIGINT)", wrap("i", 16), "I"),
        ("CAST(CAST(i AS INT) AS BIGINT)", wrap("i", 32), "I"),
        ("CAST(i AS DOUBLE)", None, "R"),
        ("CAST(CAST(i AS DECIMAL(9,3)) AS STRING)",
         "CAST(TRY_CAST(i AS DECIMAL(9,3)) AS VARCHAR)", "T"),
        ("CAST(i AS STRING)", "CAST(i AS VARCHAR)", "T"),
        ("CAST(CAST(i AS BOOLEAN) AS BIGINT)",
         "CASE WHEN i IS NULL THEN NULL WHEN i = 0 THEN 0 ELSE 1 END", "I"),
        # chained narrow-source images
        ("CAST(CAST(CAST(i AS TINYINT) AS SMALLINT) AS BIGINT)", wrap("i", 8), "I"),
        ("CAST(CAST(CAST(i AS SMALLINT) AS TINYINT) AS BIGINT)",
         wrap(wrap("i", 16), 8), "I"),
        ("CAST(CAST(CAST(i AS INT) AS SMALLINT) AS BIGINT)",
         wrap(wrap("i", 32), 16), "I"),
        ("CAST(CAST(i AS TINYINT) AS DOUBLE)",
         f"CAST({wrap('i', 8)} AS DOUBLE)", "R"),
        ("CAST(CAST(i AS SMALLINT) AS STRING)",
         f"CAST({wrap('i', 16)} AS VARCHAR)", "T"),
        ("CAST(CAST(i AS INT) AS STRING)",
         f"CAST({wrap('i', 32)} AS VARCHAR)", "T"),
        ("CAST(CAST(CAST(i AS TINYINT) AS BOOLEAN) AS BIGINT)",
         f"CASE WHEN i IS NULL THEN NULL WHEN {wrap('i', 8)} = 0 "
         "THEN 0 ELSE 1 END", "I"),
        # DOUBLE source -> ints (trunc+saturate+wrap), decimals, bool
        ("CAST(CAST(f AS TINYINT) AS BIGINT)", d2i_narrow("f", 8), "I"),
        ("CAST(CAST(f AS SMALLINT) AS BIGINT)", d2i_narrow("f", 16), "I"),
        ("CAST(CAST(f AS INT) AS BIGINT)", d2i_sat("f", *I32), "I"),
        ("CAST(f AS BIGINT)", d2i_sat("f", *I64), "I"),
        ("CAST(CAST(f AS DECIMAL(9,3)) AS STRING)",
         "CAST(CASE WHEN isnan(f) THEN NULL ELSE "
         "TRY_CAST(f AS DECIMAL(9,3)) END AS VARCHAR)", "T"),
        ("CAST(CAST(f AS DECIMAL(7,1)) AS STRING)",
         "CAST(CASE WHEN isnan(f) THEN NULL ELSE "
         "TRY_CAST(f AS DECIMAL(7,1)) END AS VARCHAR)", "T"),
        ("CAST(CAST(f AS BOOLEAN) AS BIGINT)",
         "CASE WHEN f IS NULL THEN NULL WHEN isnan(f) THEN 1 "
         "WHEN f = 0 THEN 0 ELSE 1 END", "I"),
        # VARCHAR source -> ints, double, bool, date, timestamp
        ("CAST(CAST(s AS TINYINT) AS BIGINT)", s2i("s", *I8), "I"),
        ("CAST(CAST(s AS SMALLINT) AS BIGINT)", s2i("s", *I16), "I"),
        ("CAST(CAST(s AS INT) AS BIGINT)", s2i("s", *I32), "I"),
        ("CAST(s AS BIGINT)", s2i("s", *I64), "I"),
        ("CAST(s AS DOUBLE)", "TRY_CAST(trim(s) AS DOUBLE)", "R"),
        ("CAST(CAST(s AS BOOLEAN) AS BIGINT)", s2bool("s"), "I"),

        # temporal pairs
        ("CAST(ts AS STRING)", "CAST(ts AS VARCHAR)", "T"),
        ("CAST(CAST(ts AS DATE) AS STRING)",
         "CAST(CAST(ts AS DATE) AS VARCHAR)", "T"),
        ("CAST(d AS STRING)", "CAST(d AS VARCHAR)", "T"),
        ("CAST(CAST(d AS TIMESTAMP) AS STRING)",
         "CAST(CAST(d AS TIMESTAMP) AS VARCHAR)", "T"),
    ]

    for spark_e, duck_e, fc in pairs:
        # whole-table sweep + every edge value as its own record
        if duck_e is None:
            f.query(f"SELECT id, {spark_e} FROM cm", "I" + fc, "rowsort")
        else:
            f.query_oracle(f"SELECT id, {spark_e} FROM cm",
                           f"SELECT id, {duck_e} FROM cm", "I" + fc, "rowsort")
        for k in range(nrows):
            if duck_e is None:
                f.query(f"SELECT {spark_e} FROM cm WHERE id = {k}", fc, "nosort")
            else:
                f.query_oracle(f"SELECT {spark_e} FROM cm WHERE id = {k}",
                               f"SELECT {duck_e} FROM cm WHERE id = {k}",
                               fc, "nosort")

    # VARCHAR -> DATE/TIMESTAMP: Spark leniently parses pure-integer
    # strings as YEARS ('32768' -> +32768-01-01) where DuckDB returns
    # NULL — exclude those ids symmetrically (the exclusion list is part
    # of the query text, identical for both engines)
    int_ids = [0, 4, 5, 6, 7, 8, 10, 23, 24, 26, 36, 37, 38, 39, 44]
    int_str_ids = "(" + ",".join(str(x) for x in int_ids) + ")"
    for spark_e, duck_e in [
            ("CAST(CAST(s AS DATE) AS STRING)",
             "CAST(TRY_CAST(trim(s) AS DATE) AS VARCHAR)"),
            ("CAST(CAST(s AS TIMESTAMP) AS STRING)",
             "CAST(TRY_CAST(trim(s) AS TIMESTAMP) AS VARCHAR)")]:
        f.query_oracle(
            f"SELECT id, {spark_e} FROM cm WHERE id NOT IN {int_str_ids}",
            f"SELECT id, {duck_e} FROM cm WHERE id NOT IN {int_str_ids}",
            "IT", "rowsort")
        for k in range(nrows):
            if k in int_ids:
                continue
            f.query_oracle(f"SELECT {spark_e} FROM cm WHERE id = {k}",
                           f"SELECT {duck_e} FROM cm WHERE id = {k}",
                           "T", "nosort")

    # double -> string, plain-format range only (probed boundary: Spark
    # goes scientific at 1e7 and below 1e-3)
    f.query_oracle(
        "SELECT id, CAST(f AS STRING) FROM cm WHERE NOT isnan(f) "
        "AND (f = 0.0 OR (abs(f) >= 0.001 AND abs(f) < 10000000))",
        "SELECT id, CAST(f AS VARCHAR) FROM cm WHERE NOT isnan(f) "
        "AND (f = 0.0 OR (abs(f) >= 0.001 AND abs(f) < 10000000))",
        "IT", "rowsort")

    # casts inside WHERE (TRUE-only 3VL), aggregates, GROUP BY
    f.query_oracle("SELECT id FROM cm WHERE CAST(i AS TINYINT) = i",
                   f"SELECT id FROM cm WHERE {wrap('i', 8)} = i",
                   "I", "rowsort")
    f.query_oracle("SELECT id FROM cm WHERE CAST(s AS INT) IS NOT NULL",
                   f"SELECT id FROM cm WHERE {s2i('s', *I32)} IS NOT NULL",
                   "I", "rowsort")
    f.query_oracle("SELECT id FROM cm WHERE CAST(s AS BOOLEAN)",
                   f"SELECT id FROM cm WHERE {s2bool('s')} = 1", "I", "rowsort")
    f.query_oracle("SELECT id FROM cm WHERE CAST(f AS INT) = 1",
                   f"SELECT id FROM cm WHERE {d2i_sat('f', *I32)} = 1",
                   "I", "rowsort")
    f.query_oracle("SELECT COUNT(*), COUNT(CAST(s AS INT)) FROM cm",
                   f"SELECT COUNT(*), COUNT({s2i('s', *I32)}) FROM cm",
                   "II", "nosort")
    f.query_oracle("SELECT SUM(CAST(i AS TINYINT)) FROM cm",
                   f"SELECT SUM({wrap('i', 8)}) FROM cm", "I", "nosort")
    f.query_oracle("SELECT SUM(CAST(f AS INT)) FROM cm",
                   f"SELECT SUM({d2i_sat('f', *I32)}) FROM cm", "I", "nosort")
    f.query_oracle(
        "SELECT CAST(i AS BOOLEAN), COUNT(*) FROM cm GROUP BY 1",
        "SELECT CASE WHEN i IS NULL THEN NULL WHEN i = 0 THEN 0 ELSE 1 END,"
        " COUNT(*) FROM cm GROUP BY 1", "II", "rowsort")
    f.query_oracle(
        "SELECT CAST(CAST(f AS TINYINT) AS BIGINT), COUNT(*) FROM cm "
        "GROUP BY 1", f"SELECT {d2i_narrow('f', 8)}, COUNT(*) FROM cm "
        "GROUP BY 1", "II", "rowsort")
    # probe-verified singletons: Spark-lenient parses DuckDB can't express
    for spark_e, lit, fc in [
            ("CAST(CAST('2023-01' AS DATE) AS STRING)", "'2023-01-01'", "T"),
            ("CAST(CAST('2023-01-15T10:30:00' AS TIMESTAMP) AS STRING)",
             "'2023-01-15 10:30:00'", "T"),
            ("CAST(CAST(1e10 AS TINYINT) AS BIGINT)", "-1", "I"),
            ("CAST(CAST(1e10 AS INT) AS BIGINT)", "2147483647", "I"),
            ("CAST(CAST(-1e10 AS INT) AS BIGINT)", "-2147483648", "I"),
            ("CAST(CAST(1e25 AS BIGINT) AS BIGINT)",
             "9223372036854775807", "I"),
            ("CAST(CAST('12.5' AS INT) AS BIGINT)", "12", "I"),
            ("CAST(CAST('1e3' AS INT) AS BIGINT)", "NULL", "I"),
            ("CAST(CAST('2147483648' AS INT) AS BIGINT)", "NULL", "I")]:
        f.query_oracle(f"SELECT {spark_e} FROM cm WHERE id = 0",
                       f"SELECT {lit} FROM cm WHERE id = 0", fc, "nosort")
    return f


def main():
    total = 0
    for g in (gen_select1, gen_select2, gen_select3, gen_select4,
              gen_select5, gen_aggregate, gen_index, gen_evidence,
              gen_select6, gen_select7, gen_window, gen_join, gen_subquery,
              gen_grouping, gen_string, gen_select8, gen_winjoin,
              gen_orderlimit, gen_recursive, gen_bagset, gen_lateral,
              gen_temporal, gen_scalarexpr, gen_recursive_distinct,
              gen_selfjoin, gen_select9, gen_castmatrix):
        total += g().write()
    print(f"TOTAL: {total} queries")


if __name__ == "__main__":
    main()
