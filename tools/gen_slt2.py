#!/usr/bin/env python3
"""Second, structurally INDEPENDENT SLT generator.

The main corpus (tools/gen_slt.py) is template cross-products: hand-picked
expression/WHERE/ORDER dimensions multiplied out. Every one of its 45k
records therefore shares one author's blind spots — the r12 verdict's top
gap, since the genuine SQLite sqllogictest corpus (the reference's
verification spine, /root/reference/README.md:79-81) is unreachable from
this container (no egress, not on disk). This generator attacks the same
goal a different way: RECURSIVE RANDOM EXPRESSION-TREE SAMPLING in the
style of SQLite's own sqlgenerator — typed grammar productions chosen by
a dedicated rng, nested to random depth, over tables with INT/REAL/TEXT
columns — so the query shapes are not enumerated by anyone; they fall out
of the grammar closure. Expectations are frozen from an embedded DuckDB
exactly like gen_slt.py (shared File/format layer — sharing the md5
FORMATTER is deliberate; it is the grammar that must not be shared).

Only constructs with identical DuckDB/Spark semantics are in the grammar:
no `/` (float-vs-int division), no round() (HALF_EVEN vs HALF_UP), no
negative substr positions, `%` only by positive literal divisors. Every
frozen record is still run through Spark by SltRunnerSpec, so any
divergence the exclusion list misses fails loudly there.

Usage: python3 tools/gen_slt2.py   (writes rexpr.test, rselect.test)
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(__file__))
from gen_slt import File, render, expected_block

rng = random.Random(977413)


def query_guarded(f, sql, fmt, order):
    """Emit a record unless its frozen result contains IEEE negative zero.
    The circuit path consolidates rows through Z-set grouping, where Spark
    (like any engine canonicalizing float keys — NormalizeFloatingNumbers)
    collapses -0.0 to 0.0; a plain projection preserves the sign bit. The
    values are IEEE-equal, but SLT's %.3f rendering distinguishes
    '-0.000' — the first unknown-unknown this generator caught (two
    records froze -0.000 from (x-x)*(x-y) shapes and failed ONLY via the
    engine cross-check). Keep such results out of the frozen corpus; the
    deviation is documented in PROGRESS.md.

    Emits from the single fetch (the guard used to re-execute each
    candidate inside File.query, doubling generation time)."""
    rows = f.con.execute(sql).fetchall()
    lines = render(rows, fmt, order)
    if any(l == "-0.000" for l in lines):
        raise ValueError("negative-zero result")
    assert all(l.strip() for l in lines), \
        f"whitespace-only result value breaks SLT framing: {sql!r}"
    f.out += [f"query {fmt} {order}", sql, "----"] + expected_block(lines) + [""]
    f.n_queries += 1

# ---------------------------------------------------------------------------
# typed expression grammar
# ---------------------------------------------------------------------------
# columns of the generator's own table u1 (created below): name -> type
INT_COLS = ["p", "q", "r"]
REAL_COLS = ["x", "y"]
TEXT_COLS = ["s", "t"]


def lit_int():
    return str(rng.randrange(-20, 120))


def lit_text():
    words = ["ax", "Bq", "cc", "d e", "", "fff", "G", "hi", "jj kk", "m-n"]
    return "'" + rng.choice(words) + "'"


def int_expr(depth):
    """A random INTEGER-typed expression tree."""
    if depth <= 0:
        return rng.choice(INT_COLS + [lit_int(), lit_int()])
    pick = rng.randrange(10)
    if pick <= 2:
        return f"({int_expr(depth - 1)} {rng.choice(['+', '-', '*'])} {int_expr(depth - 1)})"
    if pick == 3:
        # % only by a positive literal: column divisors can be 0/NULL and
        # the engines disagree on errors there
        return f"({int_expr(depth - 1)} % {rng.randrange(2, 14)})"
    if pick == 4:
        return f"abs({int_expr(depth - 1)})"
    if pick == 5:
        return f"coalesce({int_expr(depth - 1)}, {lit_int()})"
    if pick == 6:
        return f"nullif({int_expr(depth - 1)}, {int_expr(depth - 1)})"
    if pick == 7:
        return (f"CASE WHEN {bool_expr(depth - 1)} THEN {int_expr(depth - 1)} "
                f"ELSE {int_expr(depth - 1)} END")
    if pick == 8:
        return f"length({text_expr(depth - 1)})"
    return f"(CASE {rng.choice(INT_COLS)} % 3 WHEN 0 THEN {int_expr(depth - 1)} " \
           f"WHEN 1 THEN {lit_int()} END)"


def real_expr(depth):
    """A random REAL-typed expression: + - * over doubles are IEEE-exact
    and identical across engines; no division, no rounding functions."""
    if depth <= 0:
        return rng.choice(REAL_COLS)
    pick = rng.randrange(5)
    if pick <= 1:
        return f"({real_expr(depth - 1)} {rng.choice(['+', '-', '*'])} {real_expr(depth - 1)})"
    if pick == 2:
        return f"coalesce({real_expr(depth - 1)}, 0.5)"
    if pick == 3:
        return (f"CASE WHEN {bool_expr(depth - 1)} THEN {real_expr(depth - 1)} "
                f"ELSE {real_expr(depth - 1)} END")
    return f"abs({real_expr(depth - 1)})"


def text_expr(depth):
    if depth <= 0:
        return rng.choice(TEXT_COLS + [lit_text()])
    pick = rng.randrange(6)
    if pick <= 1:
        return f"({text_expr(depth - 1)} || {text_expr(depth - 1)})"
    if pick == 2:
        return f"upper({text_expr(depth - 1)})"
    if pick == 3:
        return f"lower({text_expr(depth - 1)})"
    if pick == 4:
        # 1-based positive positions only (negative differs across engines)
        return f"substr({text_expr(depth - 1)}, {rng.randrange(1, 4)}, {rng.randrange(1, 5)})"
    return f"coalesce({text_expr(depth - 1)}, {lit_text()})"


def bool_expr(depth):
    if depth <= 0:
        c = rng.choice(INT_COLS)
        return rng.choice([f"{c} > {lit_int()}", f"{c} IS NOT NULL",
                           f"{c} % 2 = 0"])
    pick = rng.randrange(10)
    if pick <= 1:
        return f"({bool_expr(depth - 1)} AND {bool_expr(depth - 1)})"
    if pick == 2:
        return f"({bool_expr(depth - 1)} OR {bool_expr(depth - 1)})"
    if pick == 3:
        return f"(NOT {bool_expr(depth - 1)})"
    if pick == 4:
        op = rng.choice(["=", "<>", "<", ">", "<=", ">="])
        return f"{int_expr(depth - 1)} {op} {int_expr(depth - 1)}"
    if pick == 5:
        return f"{int_expr(depth - 1)} IS NOT DISTINCT FROM {int_expr(depth - 1)}"
    if pick == 6:
        lo, hi = sorted((rng.randrange(-10, 90), rng.randrange(-10, 90)))
        return f"{int_expr(depth - 1)} BETWEEN {lo} AND {hi}"
    if pick == 7:
        items = ", ".join(sorted({lit_int() for _ in range(rng.randrange(2, 5))}))
        return f"{int_expr(depth - 1)} IN ({items})"
    if pick == 8:
        return f"{text_expr(depth - 1)} LIKE '%{rng.choice('abcdefgk')}%'"
    return f"{int_expr(depth - 1)} IS NULL"


def typed_expr():
    """(sql, fmt-char) for a random select-list item."""
    k = rng.randrange(6)
    if k <= 2:
        return int_expr(rng.randrange(1, 4)), "I"
    if k <= 4:
        return text_expr(rng.randrange(1, 3)), "T"
    return real_expr(rng.randrange(1, 3)), "R"


# ---------------------------------------------------------------------------
# table data — own shapes, own value distributions (negatives, empty
# strings, NULL-heavy columns; nothing shared with gen_slt's tables)
# ---------------------------------------------------------------------------

def u1_statements(f):
    f.statement("CREATE TABLE u1(id INTEGER, p INTEGER, q INTEGER, "
                "r INTEGER, x DOUBLE, y DOUBLE, s TEXT, t TEXT)")
    texts = ["alpha", "", "Mixed Case", "kk", "a b c", "zz-9", "QQ", "d"]
    for i in range(36):
        p = rng.randrange(-15, 85)
        q = "NULL" if rng.randrange(4) == 0 else str(rng.randrange(0, 60))
        r = "NULL" if rng.randrange(7) == 0 else str(rng.randrange(-30, 30))
        x = f"{rng.randrange(-40, 200) / 8.0!r}"
        y = "NULL" if rng.randrange(5) == 0 else f"{rng.randrange(0, 100) / 16.0!r}"
        s = "'" + rng.choice(texts) + "'"
        t = "NULL" if rng.randrange(6) == 0 else "'" + rng.choice(texts) + "'"
        f.statement(f"INSERT INTO u1 VALUES({i}, {p}, {q}, {r}, {x}, {y}, {s}, {t})")


def u2_statements(f):
    f.statement("CREATE TABLE u2(id INTEGER, p INTEGER, v INTEGER)")
    for i in range(28):
        p = rng.randrange(-15, 85)  # overlaps u1.p
        v = "NULL" if rng.randrange(6) == 0 else str(rng.randrange(0, 500))
        f.statement(f"INSERT INTO u2 VALUES({i}, {p}, {v})")


# ---------------------------------------------------------------------------
# families
# ---------------------------------------------------------------------------

def gen_rexpr():
    """Random scalar expression trees in select list + WHERE over one
    table. Deterministic presentation via ORDER BY id; every record keeps
    id as its first output column so ties cannot exist."""
    f = File("rexpr.test")
    u1_statements(f)
    made = 0
    while made < 2200:
        n = rng.randrange(1, 4)
        items = [typed_expr() for _ in range(n)]
        sel = ", ".join(e for e, _ in items)
        fmt = "I" + "".join(c for _, c in items)
        where = f" WHERE {bool_expr(rng.randrange(1, 4))}" if rng.randrange(3) else ""
        sql = f"SELECT id, {sel} FROM u1{where} ORDER BY id"
        try:
            query_guarded(f, sql, fmt, "nosort")
            made += 1
        except Exception:
            # a production DuckDB rejects (overflow in a folded literal,
            # etc.) — skip; the grammar is sampled, not enumerated
            continue
    return f


def gen_rselect():
    """Random query SHAPES: nested derived tables, random aggregates over
    random group keys, random 2-table join trees, random set-ops — the
    structural layer on top of rexpr's scalar layer."""
    f = File("rselect.test")
    u1_statements(f)
    u2_statements(f)

    def agg_item():
        k = rng.randrange(6)
        if k == 0:
            return "count(*)", "I"
        if k == 1:
            return f"count({rng.choice(INT_COLS + TEXT_COLS)})", "I"
        if k == 2:
            return f"sum({int_expr(rng.randrange(0, 3))})", "I"
        if k == 3:
            return f"min({int_expr(rng.randrange(0, 3))})", "I"
        if k == 4:
            return f"max({int_expr(rng.randrange(0, 3))})", "I"
        return f"count(DISTINCT {rng.choice(INT_COLS)})", "I"

    made = 0
    while made < 1400:
        shape = rng.randrange(10)
        try:
            if shape <= 2:
                # aggregate over a random group key expression
                g = int_expr(rng.randrange(0, 3))
                n = rng.randrange(1, 4)
                items = [agg_item() for _ in range(n)]
                sel = ", ".join(e for e, _ in items)
                fmt = "I" + "".join(c for _, c in items)
                where = f" WHERE {bool_expr(rng.randrange(1, 3))}" if rng.randrange(2) else ""
                having = ""
                if rng.randrange(3) == 0:
                    having = f" HAVING count(*) > {rng.randrange(1, 4)}"
                f.query(f"SELECT {g} AS gk, {sel} FROM u1{where} "
                        f"GROUP BY gk{having}", fmt, "rowsort")
            elif shape <= 4:
                # nested derived table: inner random projection + filter,
                # outer random filter over the aliased columns
                e1 = int_expr(rng.randrange(1, 4))
                e2, c2 = typed_expr()
                inner_w = f" WHERE {bool_expr(rng.randrange(1, 3))}" if rng.randrange(2) else ""
                outer_w = rng.choice(["", " WHERE c1 > 5", " WHERE c1 IS NOT NULL",
                                      " WHERE c1 % 2 = 0", " WHERE c1 < 40"])
                f.query(f"SELECT id, c1, c2 FROM (SELECT id, {e1} AS c1, "
                        f"{e2} AS c2 FROM u1{inner_w}) d{outer_w} ORDER BY id",
                        "II" + c2, "nosort")
            elif shape <= 6:
                # random join tree over u1 x u2
                jt = rng.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
                on = rng.choice(["u1.p = u2.p", "u1.p = u2.p AND u2.v > 100",
                                 "u1.q = u2.v % 60", "u1.p IS NOT DISTINCT FROM u2.p"])
                w = f" WHERE {bool_expr(rng.randrange(1, 3))}" if rng.randrange(3) == 0 else ""
                proj = rng.choice(["u1.id, u2.id", "u1.p, u2.p, u2.v",
                                   "u1.id, u2.v"])
                f.query(f"SELECT {proj} FROM u1 {jt} u2 ON {on}{w}",
                        "I" * (proj.count(",") + 1), "rowsort")
            elif shape <= 8:
                # scalar/EXISTS subquery in WHERE
                sub = rng.choice([
                    f"EXISTS (SELECT 1 FROM u2 WHERE u2.p = u1.p AND u2.v > {rng.randrange(50, 300)})",
                    f"u1.p IN (SELECT p FROM u2 WHERE v > {rng.randrange(0, 300)})",
                    f"u1.p > (SELECT min(p) FROM u2) + {rng.randrange(0, 30)}",
                    f"NOT EXISTS (SELECT 1 FROM u2 WHERE u2.p = u1.q)",
                ])
                extra = f" AND {bool_expr(rng.randrange(1, 3))}" if rng.randrange(2) else ""
                f.query(f"SELECT id, p FROM u1 WHERE {sub}{extra} ORDER BY id",
                        "II", "nosort")
            else:
                # set-op of two random projections (comparable int type)
                e1 = int_expr(rng.randrange(1, 3))
                e2 = int_expr(rng.randrange(1, 3))
                op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
                w1 = f" WHERE {bool_expr(rng.randrange(1, 3))}" if rng.randrange(2) else ""
                w2 = f" WHERE {bool_expr(rng.randrange(1, 3))}" if rng.randrange(2) else ""
                f.query(f"(SELECT {e1} FROM u1{w1}) {op} (SELECT {e2} FROM u1{w2})",
                        "I", "rowsort")
            made += 1
        except Exception:
            continue
    return f


# ---------------------------------------------------------------------------
# random join trees (r13 verdict #5): the independent generator aimed at
# the LOWERING machinery — 2-4-way join chains with mixed outer kinds,
# name collisions BY CONSTRUCTION (u3 shares p/q/s with u1 and v with u2;
# derived sides re-export whole colliding column sets), correlated
# subqueries anchored to random tree aliases, and aggregates over join
# results. Every ON/WHERE reference is alias-qualified so DuckDB binds
# deterministically; OUTPUT-name collisions (SELECT a.p, b.p) are kept —
# they are exactly the alias-apart class the circuit compiler must chew.
# ---------------------------------------------------------------------------

def u3_statements(f):
    f.statement("CREATE TABLE u3(id INTEGER, p INTEGER, q INTEGER, "
                "s TEXT, v INTEGER)")
    texts = ["alpha", "", "kk", "NN", "a b", "zz-9"]
    for i in range(31):
        p = rng.randrange(-15, 85)     # overlaps u1.p / u2.p
        q = "NULL" if rng.randrange(5) == 0 else str(rng.randrange(0, 60))
        s = "'" + rng.choice(texts) + "'"
        v = "NULL" if rng.randrange(7) == 0 else str(rng.randrange(0, 500))
        f.statement(f"INSERT INTO u3 VALUES({i}, {p}, {q}, {s}, {v})")


# table -> INT-typed columns usable in join keys / predicates / projections
RJ_INT_COLS = {"u1": ["id", "p", "q", "r"],
               "u2": ["id", "p", "v"],
               "u3": ["id", "p", "q", "v"]}


def gen_rjoin():
    f = File("rjoin.test")
    u1_statements(f)
    u2_statements(f)
    u3_statements(f)

    def join_item(alias):
        """One FROM item: base table or derived table re-exporting a
        colliding column set. Returns (sql_fragment, int_cols)."""
        t = rng.choice(["u1", "u2", "u3"])
        if rng.randrange(3) == 0:
            cols = RJ_INT_COLS[t]
            keep = sorted(rng.sample(cols, rng.randrange(2, len(cols) + 1)))
            w = ""
            if rng.randrange(2):
                c = rng.choice(keep)
                w = f" WHERE {c} {rng.choice(['>', '<', '>='])} {rng.randrange(-10, 90)}"
            return (f"(SELECT {', '.join(keep)} FROM {t}{w}) {alias}", keep)
        return f"{t} {alias}", RJ_INT_COLS[t]

    def on_cond(la, lcols, ra, rcols):
        lk = rng.choice(lcols)
        rk = rng.choice(rcols)
        k = rng.randrange(6)
        if k <= 2:
            base = f"{la}.{lk} = {ra}.{rk}"
        elif k == 3:
            base = f"{la}.{lk} IS NOT DISTINCT FROM {ra}.{rk}"
        elif k == 4:
            base = f"{la}.{lk} = {ra}.{rk} % {rng.randrange(2, 60)}"
        else:
            base = f"{la}.{lk} + {rng.randrange(0, 5)} = {ra}.{rk}"
        if rng.randrange(4) == 0:
            base += f" AND {ra}.{rng.choice(rcols)} > {rng.randrange(-5, 120)}"
        return base

    aliases = ["a", "b", "c", "dd"]
    made = 0
    while made < 1600:
        try:
            n = rng.randrange(2, 5)
            items = [join_item(aliases[i]) for i in range(n)]
            frm = items[0][0]
            for i in range(1, n):
                jt = rng.choice(["JOIN", "JOIN", "LEFT JOIN", "LEFT JOIN",
                                 "RIGHT JOIN", "FULL JOIN"])
                # the left anchor of each ON is a random EARLIER item, so
                # the tree is a chain with random cross-links
                li = rng.randrange(0, i)
                frm += f" {jt} {items[i][0]} ON " + on_cond(
                    aliases[li], items[li][1], aliases[i], items[i][1])
            wh = ""
            r = rng.randrange(10)
            if r <= 2:
                # correlated subquery anchored to a random alias
                ai = rng.randrange(0, n)
                acol = rng.choice(items[ai][1])
                sub = rng.choice([
                    f"EXISTS (SELECT 1 FROM u2 WHERE u2.p = {aliases[ai]}.{acol})",
                    f"NOT EXISTS (SELECT 1 FROM u3 WHERE u3.p = {aliases[ai]}.{acol} "
                    f"AND u3.v > {rng.randrange(0, 400)})",
                    f"{aliases[ai]}.{acol} IN (SELECT q FROM u3 WHERE v > {rng.randrange(0, 300)})",
                    f"{aliases[ai]}.{acol} > (SELECT min(p) FROM u2) + {rng.randrange(0, 40)}",
                ])
                wh = f" WHERE {sub}"
            elif r <= 4:
                ai = rng.randrange(0, n)
                acol = rng.choice(items[ai][1])
                wh = f" WHERE {aliases[ai]}.{acol} {rng.choice(['>', '<', '='])} " \
                     f"{rng.randrange(-10, 80)}"
            if rng.randrange(4) == 0:
                # aggregate over the join result, qualified group key
                gi = rng.randrange(0, n)
                gcol = rng.choice(items[gi][1])
                si = rng.randrange(0, n)
                scol = rng.choice(items[si][1])
                sql = (f"SELECT {aliases[gi]}.{gcol}, count(*), "
                       f"sum({aliases[si]}.{scol}) FROM {frm}{wh} "
                       f"GROUP BY {aliases[gi]}.{gcol}")
                query_guarded(f, sql, "III", "rowsort")
            else:
                # 2-4 projected columns across aliases; duplicates of the
                # SAME column name from different sides are deliberate
                k = rng.randrange(2, 5)
                proj = []
                for _ in range(k):
                    pi = rng.randrange(0, n)
                    proj.append(f"{aliases[pi]}.{rng.choice(items[pi][1])}")
                sql = f"SELECT {', '.join(proj)} FROM {frm}{wh}"
                query_guarded(f, sql, "I" * k, "rowsort")
            made += 1
        except Exception:
            continue
    return f


def main():
    total = 0
    for g in (gen_rexpr, gen_rselect, gen_rjoin):
        total += g().write()
    print(f"TOTAL: {total} queries")


if __name__ == "__main__":
    main()
