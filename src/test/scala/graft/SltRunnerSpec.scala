package graft

import graft.testing.SltRunner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Executes the SqlLogicTest corpora in src/test/resources/slt through the
  * SLT parser/executor — the reference's headline test format
  * (sqllogictest/Main.java, run-tests.sh:7-18). The three select files
  * mirror the SQLite select1–select5 + aggregate grammar families
  * (expressions × WHERE × ORDER BY, aggregates/GROUP BY, joins/set-ops/
  * subqueries/strings, compound set-op chains, join+group grammars,
  * correlated subqueries, deep expression nesting) with expected results
  * computed by DuckDB at generation time (tools/gen_slt.py) — >9000
  * queries total, every one verified by literal values or the SLT MD5
  * scheme. */
class SltRunnerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("slt")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def check(file: String, minQueries: Int): Unit = {
    val o = SltRunner.runResource(spark, s"/slt/$file")
    assert(o.failed.isEmpty,
      s"$file: ${o.failed.size} failures; first: ${o.failed.take(3).mkString("\n")}")
    assert(o.passed >= minQueries, s"$file: only ${o.passed} records passed")
  }

  test("select1.test: single-table expression grammar") { check("select1.test", 1200) }
  test("select2.test: aggregate and GROUP BY grammar") { check("select2.test", 280) }
  test("select3.test: joins, set ops, subqueries, strings") { check("select3.test", 170) }
  test("select4.test: compound set-operation grammar") { check("select4.test", 1700) }
  test("select5.test: join + GROUP BY grammar") { check("select5.test", 1100) }
  test("aggregate.test: expression/DISTINCT/multi-key aggregate grammar") {
    check("aggregate.test", 640)
  }
  test("index.test: index-family grammar (predicates, commute, deletes, views)") {
    check("index.test", 800)
  }
  test("evidence.test: scalar/string/3VL/subquery function semantics") {
    check("evidence.test", 100)
  }

  test("select6.test: correlated-subquery grammar") { check("select6.test", 870) }
  test("select7.test: deep-expression-nesting grammar") { check("select7.test", 2070) }
  test("select9.test: volume deep-expression sweep (BETWEEN/IN/NOT forms)") {
    check("select9.test", 16900)
  }

  test("window.test: window-function grammar (ranking, offsets, frames)") {
    check("window.test", 440)
  }

  test("join.test: multi-way-join grammar (outer mixes, agg-over-join, chains)") {
    check("join.test", 7700)
  }

  test("subquery.test: multi-col [NOT] IN, nested/set-op/scalar subqueries") {
    check("subquery.test", 1100)
  }

  test("grouping.test: ROLLUP/CUBE/GROUPING SETS with grouping() bits") {
    check("grouping.test", 370)
  }

  test("string.test: string-function grammar (probe-verified subset)") {
    check("string.test", 470)
  }

  test("select8.test: deep expressions over joined rows (pad-induced NULLs)") {
    check("select8.test", 2600)
  }

  test("winjoin.test: window functions over join results (padded NULLs)") {
    check("winjoin.test", 2300)
  }

  test("orderlimit.test: ORDER BY + LIMIT/OFFSET pagination grammar") {
    check("orderlimit.test", 550)
  }

  test("recursive.test: WITH RECURSIVE grammar (sequences, hierarchy, DAG paths)") {
    check("recursive.test", 120)
  }

  test("bagset.test: EXCEPT ALL / INTERSECT ALL bag-semantics chains") {
    check("bagset.test", 250)
  }

  test("castmatrix.test: full cast matrix (type pairs x edge values, " +
    "probe-verified Spark semantics)") {
    check("castmatrix.test", 1500)
  }

  test("selfjoin.test: name-colliding joins (self, outer same-named key, " +
    "theta-outer, null-safe keys)") {
    check("selfjoin.test", 80)
  }

  test("rexpr.test: random expression-tree grammar (independent generator)") {
    check("rexpr.test", 2100)
  }

  test("rselect.test: random query shapes (independent generator)") {
    check("rselect.test", 1300)
  }

  test("rjoin.test: random join-tree grammar (mixed outer kinds, name " +
    "collisions by construction, correlated anchors)") {
    check("rjoin.test", 1550)
  }

  test("grammar corpora re-run through the incremental SQL compiler") {
    // CROSS-CHECK the circuit compiler against the DuckDB-frozen grammar
    // corpora: every query the compiler can lower is BATCH-evaluated as a
    // circuit and must match the same frozen expectation spark.sql
    // matches; shapes the compiler rejects (UnsupportedPlanException —
    // e.g. ORDER BY, non-aggregate scalar subqueries) fall back to
    // spark.sql so the record still verifies, and a counter proves the
    // engine path carried real load rather than falling back throughout.
    // aggregate/subquery/bagset/lateral run every record; join.test is
    // SAMPLED 1-in-5 for suite time (5,369 records — the full corpus is
    // engine-green via `tools/run_main.sh graft.tools.SltEngineAudit`,
    // re-run it after any join-lowering change).
    var viaEngine = 0
    var seen = 0
    var sampleEvery = 1
    val exec: graft.testing.SltRunner.Exec = (s, q, srcs, order) => {
      // CircuitExec decides route-ability: rowsort/valuesort records run
      // the circuit directly (the harness sorts before comparing); a
      // NOSORT record with ORDER BY re-applies the query's own top-level
      // presentation sort over the circuit output (an OVER-clause ORDER
      // BY is NOT presentation — a text regex got this wrong and skipped
      // every window record); unsupported shapes and eval-time analysis
      // errors fall back to spark.sql, with the floor below proving the
      // engine path carried real load.
      seen += 1
      if (seen % sampleEvery != 0) s.sql(q).collect().toSeq
      else graft.testing.CircuitExec.tryEngine(s, q, srcs, order) match {
        case Some(rows) => viaEngine += 1; rows
        case None => s.sql(q).collect().toSeq
      }
    }
    // window/winjoin ride the same loop (r11 verdict #7): winjoin carries
    // outer-join padding NULLs into frames — the riskiest interaction the
    // circuit path sees; winjoin is sampled 1-in-4 for suite time (the
    // full corpus runs via tools/run_main.sh graft.tools.SltEngineAudit).
    // Floors pinned from the post-fix SltEngineAudit inventory
    // (PROGRESS.md round-12 table), minus a small slack; sampled
    // families scale the floor by the sampling rate.
    // join.test floor raised 1350 → 1520 (r13 verdict #1: the alias-apart
    // reject bucket is closed — 7,835/7,835 compile; sampled 1-in-5).
    // rjoin.test is the r14 random join-tree family (1,600 records, all
    // lowered; sampled 1-in-2).
    for ((file, every, atLeast) <- Seq(
        ("aggregate.test", 1, 620), ("subquery.test", 1, 1140),
        ("bagset.test", 1, 255), ("lateral.test", 1, 70),
        ("selfjoin.test", 1, 83), ("join.test", 5, 1520),
        ("window.test", 2, 200), ("winjoin.test", 4, 520),
        ("select6.test", 1, 750), ("castmatrix.test", 3, 500),
        ("rexpr.test", 2, 980), ("rselect.test", 2, 620),
        ("rjoin.test", 2, 780))) {
      viaEngine = 0; seen = 0; sampleEvery = every
      graft.testing.CircuitExec.resetEvalFailures()
      val o = graft.testing.SltRunner.runResource(spark, s"/slt/$file", exec)
      assert(o.failed.isEmpty,
        s"$file via engine: ${o.failed.size} failures; first: " +
          o.failed.take(3).mkString("\n"))
      assert(viaEngine >= atLeast,
        s"$file: only $viaEngine queries took the engine path")
      // Eval-time analysis failures are mis-rebuilt plans (compile
      // accepted, re-analysis died); they must not hide in the fallback
      // bucket — pin to zero per family.
      assert(graft.testing.CircuitExec.evalFailures == 0L,
        s"$file: ${graft.testing.CircuitExec.evalFailures} eval-time " +
          "analysis failures were silently reclassified as fallbacks")
      info(s"$file: $viaEngine of ${o.passed} queries via the circuit compiler")
    }
  }

  test("recursive_distinct.test: DISTINCT recursion over CYCLIC graphs " +
    "through the closure-circuit lowering") {
    // Routed through SqlIncremental (NOT spark.sql): these graphs are
    // cyclic, so the native UNION ALL UnionLoop would never terminate —
    // the lowering's SET fixpoint (anchor ∪ anchor∘E⁺ under distinct) is
    // what makes the queries well-defined, and DuckDB's UNION recursion
    // froze the same set fixpoint at generation time.
    val engineExec: graft.testing.SltRunner.Exec = (s, q, srcs, _) => {
      val inc = graft.engine.SqlIncremental.compile(s, q, srcs)
      val in = srcs.map(n => n -> graft.zset.ZSet.fromRows(s.table(n))).toMap
      graft.zset.ZSet.toRows(graft.zset.ZSet.consolidate(inc.batch(in)))
        .collect().toSeq
    }
    val o = graft.testing.SltRunner.runResource(
      spark, "/slt/recursive_distinct.test", engineExec)
    assert(o.failed.isEmpty,
      s"recursive_distinct.test: ${o.failed.size} failures; first: " +
        o.failed.take(3).mkString("\n"))
    assert(o.passed >= 70, s"only ${o.passed} records passed")
  }

  test("lateral.test: correlated LATERAL derived tables") {
    check("lateral.test", 65)
  }

  test("temporal.test: DATE/TIMESTAMP grammar (extract, trunc, intervals)") {
    check("temporal.test", 130)
  }

  test("scalarexpr.test: CASE/NULLIF/COALESCE/IN-list/3VL scalar grammar") {
    check("scalarexpr.test", 95)
  }

  test("pg_timestamp.test: postgres-derived timestamp vectors") {
    check("pg_timestamp.test", 38)
  }

  test("pg_date.test: postgres-derived date vectors") {
    check("pg_date.test", 26)
  }

  test("parser handles conditions, errors, and drops") {
    val text =
      """hash-threshold 8
        |
        |statement ok
        |CREATE TABLE tmp1(x INTEGER, y TEXT)
        |
        |statement ok
        |INSERT INTO tmp1 VALUES(1,'one'),(2,'two'),(3,NULL)
        |
        |onlyif mysql
        |query I nosort
        |SELECT nonexistent_function(x) FROM tmp1
        |----
        |
        |skipif spark
        |query I nosort
        |SELECT another_bad_one(x) FROM tmp1
        |----
        |
        |query IT rowsort
        |SELECT x, y FROM tmp1
        |----
        |1
        |one
        |2
        |two
        |3
        |NULL
        |
        |statement error
        |INSERT INTO missing_table VALUES(1)
        |
        |query I valuesort
        |SELECT x+10 FROM tmp1 WHERE y IS NOT NULL
        |----
        |11
        |12
        |
        |statement ok
        |DROP TABLE tmp1
        |""".stripMargin
    val o = SltRunner.run(spark, text, "inline")
    assert(o.failed.isEmpty, o.failed.mkString("\n"))
    assert(o.passed === 6) // 3 statements + 2 executed queries + 1 expected error
  }
}
