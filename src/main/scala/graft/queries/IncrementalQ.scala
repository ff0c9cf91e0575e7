package graft.queries

import graft.Tables
import graft.streaming.Incremental._
import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental evaluation under the DuckDB oracle: the circuit consumes
  * three delta batches carved from lineitem — two insert waves and a
  * retraction wave — and the integrated output must equal a plain SQL
  * aggregate over the *net* surviving rows. This puts the whole delta
  * algebra (linear filter, weighted aggregate re-fold, retraction
  * handling, output integration) under the same hash-exact gate as the
  * batch operators.
  *
  * Deltas: +rows with qty < 30, then +rows with 30 ≤ qty < 40, then
  * −rows with qty < 10 ⇒ net = rows with 10 ≤ qty < 40.
  */
object IncrementalQ {
  type QFn = (SparkSession, String) => DataFrame

  val defs: Map[String, QFn] = Map(
    "q90_incremental_agg" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      val circuit = source("L")
        .where(col("l_quantity") >= 5) // linear op inside the circuit
        .aggregate(Seq("l_suppkey"),
          "cnt" -> ZSet.wcount,
          "sum_qty" -> ZSet.wsum(col("l_quantity")))
      val r = new Runner(s, circuit, Map("L" -> li.limit(0)))
      r.step(Map("L" -> ZSet.fromRows(li.filter(col("l_quantity") < 30))))
      r.step(Map("L" -> ZSet.fromRows(
        li.filter(col("l_quantity") >= 30 && col("l_quantity") < 40))))
      r.step(Map("L" -> ZSet.negate(ZSet.fromRows(
        li.filter(col("l_quantity") < 10)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    "q91_incremental_join" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      val circuit = source("L").where(col("l_quantity") > 45)
        .join(source("O"), Seq("l_orderkey"))
      val r = new Runner(s, circuit, Map("L" -> li.limit(0), "O" -> o.limit(0)))
      // orders arrive, then lineitems, then cancelled ('F') orders retract
      r.step(Map("O" -> ZSet.fromRows(o)))
      r.step(Map("L" -> ZSet.fromRows(li)))
      r.step(Map("O" -> ZSet.negate(ZSet.fromRows(
        o.filter(col("o_orderstatus") === "F")))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Global (keyless) aggregate circuit: the empty-input correction makes
    // Q(∅) the SQL zero row, and each step re-folds the single group
    // (CalciteToDBSPCompiler.java:349-381).
    "q94_incremental_global" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      val circuit = source("L")
        .where(col("l_quantity") >= 5)
        .aggregateRowsGlobal(
          Seq(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"),
            max(col("l_quantity")).as("max_qty")),
          Seq("cnt", "sum_qty", "max_qty"))
      val r = new Runner(s, circuit, Map("L" -> li.limit(0)))
      r.step(Map("L" -> ZSet.fromRows(li.filter(col("l_quantity") < 30))))
      r.step(Map("L" -> ZSet.fromRows(
        li.filter(col("l_quantity") >= 30 && col("l_quantity") < 40))))
      r.step(Map("L" -> ZSet.negate(ZSet.fromRows(
        li.filter(col("l_quantity") < 10)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // SQL→circuit compiler under the gate: a view with differently-named
    // equi keys AND a residual predicate in the ON clause, compiled from
    // text (JoinConditionAnalyzer-style decomposition), maintained through
    // insert + retraction steps.
    // WHOLE-PROGRAM standing maintenance through the PUBLIC Engine API:
    // a DDL script declares 2 tables and 3 views sharing one join
    // subtree, and Engine.incrementalRunner compiles them TOGETHER with
    // structural CSE (the reference's MultiViewTests axis composed with
    // its `-i` incremental mode). One Runner advances the shared join
    // trace once per step; insert AND retraction waves on both inputs;
    // the gate compares the tagged union of all three consolidated views
    // against the same program over the net state in DuckDB.
    "q174_incremental_program" -> ((s, d) => {
      val e = new graft.engine.Engine(s)
      e.executeScript(
        """CREATE TABLE PORD (o_orderkey BIGINT NOT NULL,
                              o_custkey BIGINT NOT NULL,
                              o_totalprice DOUBLE NOT NULL);
          |CREATE TABLE PCUST (c_custkey BIGINT NOT NULL,
                               c_mktsegment VARCHAR NOT NULL);
          |CREATE VIEW V_DETAIL AS
          |  SELECT c_mktsegment AS seg, o_orderkey AS k,
          |         CAST(FLOOR(o_totalprice) AS BIGINT) AS v
          |  FROM PORD JOIN PCUST ON o_custkey = c_custkey;
          |CREATE VIEW V_TOTALS AS
          |  SELECT c_mktsegment AS seg, COUNT(*) AS k,
          |         SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS v
          |  FROM PORD JOIN PCUST ON o_custkey = c_custkey
          |  GROUP BY c_mktsegment;
          |CREATE VIEW V_BIG AS
          |  SELECT c_mktsegment AS seg, o_orderkey AS k, CAST(0 AS BIGINT) AS v
          |  FROM PORD JOIN PCUST ON o_custkey = c_custkey
          |  WHERE o_totalprice > 150000""".stripMargin)
      val ord = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val r = e.incrementalRunner(Seq("V_DETAIL", "V_TOTALS", "V_BIG"))
      r.bootstrap(Map(
        "PORD" -> ord.filter(col("o_orderkey") % 7 =!= 0),
        "PCUST" -> cust))
      r.stepAll(Map("PORD" -> ZSet.fromRows(
        ord.filter(col("o_orderkey") % 7 === 0))))
      r.stepAll(Map("PORD" -> ZSet.negate(ZSet.fromRows(
        ord.filter(col("o_custkey") % 10 === 3)))))
      r.stepAll(Map("PCUST" -> ZSet.negate(ZSet.fromRows(
        cust.filter(col("c_mktsegment") === "BUILDING")))))
      def tag(n: String, t: String): DataFrame =
        ZSet.toRows(ZSet.consolidate(r.output(n)))
          .select(lit(t).as("vw"), col("seg"), col("k"), col("v"))
      tag("V_DETAIL", "detail")
        .unionByName(tag("V_TOTALS", "totals"))
        .unionByName(tag("V_BIG", "big"))
    }),

    "q96_incremental_sql_join" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      li.limit(0).createOrReplaceTempView("L")
      o.limit(0).createOrReplaceTempView("O")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT l_orderkey, l_suppkey, l_quantity, o_orderstatus
           FROM L JOIN O ON l_orderkey = o_orderkey AND l_quantity > 45""",
        Set("L", "O"))
      val r = new Runner(s, circuit, Map("L" -> li.limit(0), "O" -> o.limit(0)))
      r.step(Map("O" -> ZSet.fromRows(o)))
      r.step(Map("L" -> ZSet.fromRows(li)))
      r.step(Map("O" -> ZSet.negate(ZSet.fromRows(
        o.filter(col("o_orderstatus") === "F")))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Composite SQL-compiled standing view: CTE + grouped aggregate +
    // uncorrelated scalar subquery (suppliers whose total shipped quantity
    // beats the average total), maintained through insert + retraction
    // waves — the dashboard-query shape end-to-end.
    "q87_incremental_cte_scalar" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      li.limit(0).createOrReplaceTempView("LC")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """WITH t AS (SELECT l_suppkey, SUM(l_quantity) AS total
                      FROM LC GROUP BY l_suppkey)
           SELECT l_suppkey, total FROM t
           WHERE total > (SELECT AVG(total) FROM t)""",
        Set("LC"))
      val r = new Runner(s, circuit, Map("LC" -> li.limit(0)))
      r.step(Map("LC" -> ZSet.fromRows(li.filter(col("l_quantity") < 30))))
      r.step(Map("LC" -> ZSet.fromRows(li.filter(col("l_quantity") >= 30))))
      r.step(Map("LC" -> ZSet.negate(ZSet.fromRows(
        li.filter(col("l_quantity") < 10)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Incremental ROLLUP view compiled from SQL text (Expand is linear;
    // NULL-keyed subtotal groups exercise the null-safe touched-group
    // re-fold) maintained through insert + retraction waves.
    "q88_incremental_rollup" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      li.limit(0).createOrReplaceTempView("LR")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                  SUM(l_quantity) AS sum_qty
           FROM LR GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
        Set("LR"))
      val r = new Runner(s, circuit, Map("LR" -> li.limit(0)))
      r.step(Map("LR" -> ZSet.fromRows(li.filter(col("l_quantity") < 30))))
      r.step(Map("LR" -> ZSet.fromRows(li.filter(col("l_quantity") >= 30))))
      r.step(Map("LR" -> ZSet.negate(ZSet.fromRows(
        li.filter(col("l_quantity") < 10)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Incremental DISTINCT (DBSPIncrementalDistinctOperator.java:31): rows
    // whose consolidated weight drops to zero leave the distinct view; the
    // three waves overlap so some rows reach weight 2 and one wave fully
    // cancels another's low range.
    "q99_incremental_distinct" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      val circuit = source("L").distinct
      val r = new Runner(s, circuit, Map("L" -> li.limit(0)))
      r.step(Map("L" -> ZSet.fromRows(li.filter(col("l_quantity") < 5))))
      r.step(Map("L" -> ZSet.fromRows(
        li.filter(col("l_quantity") >= 3 && col("l_quantity") < 6))))
      r.step(Map("L" -> ZSet.negate(ZSet.fromRows(
        li.filter(col("l_quantity") < 2)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Multi-column NULL-aware NOT IN (3VL) compiled from SQL: nullable
    // probe AND subquery columns, maintained through insert + retraction
    // waves — the retraction removes every NULL-x subquery row, flipping
    // one gate regime so previously-UNKNOWN outer rows re-enter.
    "q100_incremental_notin_null" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("l_partkey"), col("l_quantity"))
      val su = Tables.load(s, d, "supplier").select(col("s_suppkey"))
      li.limit(0).createOrReplaceTempView("LN")
      su.limit(0).createOrReplaceTempView("SN")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """WITH ot AS (SELECT l_orderkey, l_linenumber,
                              NULLIF(l_suppkey % 13, 5) AS a,
                              NULLIF(l_partkey % 11, 7) AS b
                       FROM LN),
                it AS (SELECT NULLIF(s_suppkey % 13, 5) AS x,
                              NULLIF(s_suppkey % 11, 3) AS y
                       FROM SN)
           SELECT l_orderkey, l_linenumber, a, b FROM ot
           WHERE (a, b) NOT IN (SELECT x, y FROM it)""",
        Set("LN", "SN"))
      val r = new Runner(s, circuit,
        Map("LN" -> li.limit(0), "SN" -> su.limit(0)))
      r.step(Map("LN" -> ZSet.fromRows(li.filter(col("l_quantity") < 30)),
        "SN" -> ZSet.fromRows(su)))
      // one combined wave: inserts + retractions on both sides (the
      // fine-grained per-regime stepping lives in SqlIncrementalSpec)
      r.step(Map("LN" -> ZSet.plus(
        ZSet.fromRows(
          li.filter(col("l_quantity") >= 30 && col("l_quantity") < 40)),
        ZSet.negate(ZSet.fromRows(li.filter(col("l_quantity") < 10)))),
        "SN" -> ZSet.negate(ZSet.fromRows(
          su.filter(col("s_suppkey") % 13 === 5)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // PATTERN-GROUPED multi-column NOT IN (SqlIncremental.expandPat): 4
    // nullable columns per side exceed the static 2^k mask enumeration's
    // ≤3-column guard, so each side expands against the OTHER side's
    // maintained distinct-NULL-pattern relation — fan-out per row is
    // #present-patterns, not 2^4. The waves drive the regimes that branch
    // is responsible for: empty subquery (all probes pass), first pattern
    // arrival (probe tuples re-expand against just the new patterns), and
    // a retraction removing every subquery row of one pattern family. The
    // compile-time strategy probe PROVES the run took the pattern-grouped
    // branch rather than silently falling back.
    "q160_incremental_notin_pattern" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("l_partkey"), col("l_quantity"))
      val su = Tables.load(s, d, "supplier").select(col("s_suppkey"))
      li.limit(0).createOrReplaceTempView("LP")
      su.limit(0).createOrReplaceTempView("SP")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """WITH ot AS (SELECT l_orderkey, l_linenumber,
                              NULLIF(l_suppkey % 13, 5) AS a,
                              NULLIF(l_partkey % 11, 7) AS b,
                              NULLIF(l_suppkey % 7, 3) AS c,
                              NULLIF(l_partkey % 5, 2) AS e
                       FROM LP),
                it AS (SELECT NULLIF(s_suppkey % 13, 5) AS w,
                              NULLIF(s_suppkey % 11, 3) AS x,
                              NULLIF(s_suppkey % 7, 1) AS y,
                              NULLIF(s_suppkey % 5, 4) AS z
                       FROM SP)
           SELECT l_orderkey, l_linenumber, a, b, c, e FROM ot
           WHERE (a, b, c, e) NOT IN (SELECT w, x, y, z FROM it)""",
        Set("LP", "SP"))
      require(graft.engine.SqlIncremental.lastNotInStrategy
          .contains("pattern-grouped"),
        s"q160 must exercise the pattern-grouped NOT IN branch, got " +
          s"${graft.engine.SqlIncremental.lastNotInStrategy}")
      val r = new Runner(s, circuit,
        Map("LP" -> li.limit(0), "SP" -> su.limit(0)))
      // wave 1: probes only, subquery EMPTY — every probe tuple passes
      r.step(Map("LP" -> ZSet.fromRows(li.filter(col("l_quantity") < 30))))
      // wave 2: first subquery patterns arrive (even suppliers) — probe
      // tuples re-expand against exactly the arriving pattern set
      r.step(Map("SP" -> ZSet.fromRows(su.filter(col("s_suppkey") % 2 === 0))))
      // wave 3: inserts + retractions on BOTH sides — odd suppliers bring
      // new patterns while the %13=5 family (the w-NULL patterns) retracts
      // wholesale, re-admitting previously-blocked probe tuples
      r.step(Map("LP" -> ZSet.plus(
        ZSet.fromRows(
          li.filter(col("l_quantity") >= 30 && col("l_quantity") < 40)),
        ZSet.negate(ZSet.fromRows(li.filter(col("l_quantity") < 10)))),
        "SP" -> ZSet.plus(
          ZSet.fromRows(su.filter(col("s_suppkey") % 2 === 1)),
          ZSet.negate(ZSet.fromRows(su.filter(col("s_suppkey") % 13 === 5))))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // DISTINCT-aggregate + FILTER-clause aggregate as a compiled standing
    // view: neither is weight-linear (a merged component sum cannot undo
    // duplicate collapse or a filter), so the circuit takes the exact
    // touched-group re-fold path — proven delta-correct here through
    // insert + retraction waves that change both the distinct sets and
    // the filtered sums of surviving groups.
    "q164_incremental_distinct_agg" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_partkey"), col("l_quantity"))
      li.limit(0).createOrReplaceTempView("LDA")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT l_suppkey,
                  COUNT(DISTINCT l_partkey) AS n_parts,
                  SUM(l_quantity) FILTER (WHERE l_quantity > 25) AS qty_hi,
                  COUNT(*) AS n_rows
           FROM LDA GROUP BY l_suppkey""",
        Set("LDA"))
      val r = new Runner(s, circuit, Map("LDA" -> li.limit(0)))
      r.step(Map("LDA" -> ZSet.fromRows(li.filter(col("l_quantity") < 30))))
      r.step(Map("LDA" -> ZSet.plus(
        ZSet.fromRows(
          li.filter(col("l_quantity") >= 30 && col("l_quantity") < 40)),
        ZSet.negate(ZSet.fromRows(li.filter(col("l_quantity") < 10))))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Uncorrelated EXISTS standing view: existence is a maintained global
    // count gate; the waves flip it empty→non-empty and then shrink (but
    // keep) the witness set.
    "q101_incremental_exists_uncorr" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val su = Tables.load(s, d, "supplier")
        .select(col("s_suppkey"), col("s_acctbal"))
      li.limit(0).createOrReplaceTempView("LE")
      su.limit(0).createOrReplaceTempView("SE")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT l_orderkey, l_linenumber, l_quantity FROM LE
           WHERE l_quantity < 20
             AND EXISTS (SELECT 1 FROM SE WHERE s_acctbal > 5000)""",
        Set("LE", "SE"))
      val r = new Runner(s, circuit,
        Map("LE" -> li.limit(0), "SE" -> su.limit(0)))
      r.step(Map("LE" -> ZSet.fromRows(li))) // gate closed: no witnesses yet
      r.step(Map("SE" -> ZSet.fromRows(su.filter(col("s_acctbal") > 5000))))
      r.step(Map("SE" -> ZSet.negate(ZSet.fromRows(su.filter(
        col("s_acctbal") > 5000 && col("s_suppkey") % 2 === 1)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Incremental windowed aggregate compiled from SQL: whole-partition
    // SUM/COUNT OVER maintained through insert + retraction waves — only
    // delta-touched partitions re-evaluate (Inc.windowAggregate), and the
    // final state must equal the window over the net rows.
    "q103_incremental_window" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      li.limit(0).createOrReplaceTempView("LW")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT l_orderkey, l_linenumber, l_quantity,
                  SUM(CAST(l_quantity AS BIGINT))
                    OVER (PARTITION BY l_orderkey) AS part_sum,
                  COUNT(*) OVER (PARTITION BY l_orderkey) AS part_n
           FROM LW""",
        Set("LW"))
      val r = new Runner(s, circuit, Map("LW" -> li.limit(0)))
      r.step(Map("LW" -> ZSet.fromRows(li.filter(col("l_quantity") < 30))))
      r.step(Map("LW" -> ZSet.plus(
        ZSet.fromRows(
          li.filter(col("l_quantity") >= 30 && col("l_quantity") < 40)),
        ZSet.negate(ZSet.fromRows(li.filter(col("l_quantity") < 10))))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Incremental RANGE-frame rolling window compiled from SQL (the
    // reference's signature taxi/fraud feature shape,
    // ComplexQueriesTest.java:42-61, maintained instead of recomputed):
    // touched partitions re-evaluate the full frame logic, so the final
    // state must equal the window over the net rows.
    "q106_incremental_window_range" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      ev.limit(0).createOrReplaceTempView("EW")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT event_id, user_id, ts_sec,
                  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_sec
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_1h,
                  SUM(CAST(event_id % 97 AS BIGINT)) OVER
                    (PARTITION BY user_id ORDER BY ts_sec
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS s_1h
           FROM (SELECT event_id, user_id,
                        unix_timestamp(CAST(ts AS TIMESTAMP)) AS ts_sec
                 FROM EW) e""",
        Set("EW"))
      val r = new Runner(s, circuit, Map("EW" -> ev.limit(0)))
      r.step(Map("EW" -> ZSet.fromRows(ev.filter(col("event_id") % 10 < 7))))
      r.step(Map("EW" -> ZSet.plus(
        ZSet.fromRows(
          ev.filter(col("event_id") % 10 >= 7 && col("event_id") % 10 < 9)),
        ZSet.negate(ZSet.fromRows(ev.filter(col("event_id") % 10 < 2))))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Unit-key cross join standing view (reference parity:
    // CalciteToDBSPCompiler.java:584 routes empty-key joins to a unit-key
    // stream join): a small threshold dimension × the supplier stream with
    // a both-sided residual, maintained through insert + retraction waves
    // on BOTH sides (including a dimension-row retraction, which must
    // retract its whole slice of the product).
    "q111_incremental_cross" -> ((s, d) => {
      val su = Tables.load(s, d, "supplier")
        .select(col("s_suppkey"), col("s_acctbal"))
      val re = Tables.load(s, d, "region").select(col("r_regionkey"))
      su.limit(0).createOrReplaceTempView("SX")
      re.limit(0).createOrReplaceTempView("TX")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT s_suppkey, t_key FROM SX CROSS JOIN
             (SELECT r_regionkey AS t_key,
                     r_regionkey * 1000 AS t_lim FROM TX) t
           WHERE s_acctbal > t_lim""",
        Set("SX", "TX"))
      val r = new Runner(s, circuit,
        Map("SX" -> su.limit(0), "TX" -> re.limit(0)))
      r.step(Map("SX" -> ZSet.fromRows(su.filter(col("s_suppkey") % 2 === 0)),
        "TX" -> ZSet.fromRows(re)))
      r.step(Map("SX" -> ZSet.plus(
        ZSet.fromRows(su.filter(col("s_suppkey") % 2 === 1)),
        ZSet.negate(ZSet.fromRows(su.filter(col("s_suppkey") % 5 === 0)))),
        "TX" -> ZSet.negate(ZSet.fromRows(re.filter(col("r_regionkey") === 4)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Pure-inequality correlated EXISTS (BETWEEN shape) as a standing
    // view: lowered to the BINNED range semi-join circuit instead of the
    // reference's quadratic cross-join decorrelation
    // (CalciteCompiler.java:438-441). Maintained through insert +
    // retraction waves on both sides.
    "q112_incremental_range_exists" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"))
      o.limit(0).createOrReplaceTempView("OX")
      li.limit(0).createOrReplaceTempView("LX")
      // stats-derived width (w* = sqrt(k·len/ρ)) instead of a magic
      // constant: the width shrinks as point density grows, so per-bin
      // occupancy — the 10×-data cost driver — stays bounded. Width only
      // changes the PLAN; the result is identical at any width.
      val binW = graft.operators.RangeJoin.suggestBinWidth(
        li.select(col("l_partkey").as("p")), "p",
        o.select((col("o_custkey") * 10).as("lo"),
          (col("o_custkey") * 10 + 50).as("hi")), "lo", "hi")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT o_orderkey, lo, hi FROM
             (SELECT o_orderkey, o_custkey * 10 AS lo,
                     o_custkey * 10 + 50 AS hi FROM OX) o
           WHERE EXISTS (SELECT 1 FROM LX
                         WHERE l_partkey >= lo AND l_partkey <= hi)""",
        Set("OX", "LX"),
        Map("spark.graft.incremental.rangeBinWidth" -> binW.toString))
      val r = new Runner(s, circuit,
        Map("OX" -> o.limit(0), "LX" -> li.limit(0)))
      // batch-priced snapshot bootstrap (the r6-flagged wave-1 full
      // cross-product load); the steady-state waves below — mixed insert/
      // retract on BOTH sides — are the binned circuit's actual test
      r.bootstrap(Map("OX" -> o.toDF(),
        "LX" -> li.filter(col("l_quantity") < 30).toDF()))
      r.step(Map("LX" -> ZSet.plus(
        ZSet.fromRows(
          li.filter(col("l_quantity") >= 30 && col("l_quantity") < 40)),
        ZSet.negate(ZSet.fromRows(li.filter(col("l_quantity") < 10)))),
        "OX" -> ZSet.negate(ZSet.fromRows(o.filter(col("o_orderkey") % 7 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Incremental interval/attribution join as a standing view (the
    // q133 stream-stream shape on the Z-set path): purchases × clicks of
    // the same user within the preceding hour, compiled from SQL — the
    // equi key (user) shuffles, the hour window stays a join residual, so
    // every wave is delta-proportional (bilinear: ΔP⋈C + P⋈ΔC + ΔP⋈ΔC).
    // Maintained through click inserts, purchase inserts, and a
    // click-spam takedown retraction.
    "q138_incremental_interval_join" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts").as("c_ts"))
      p.limit(0).createOrReplaceTempView("PIJ")
      c.limit(0).createOrReplaceTempView("CIJ")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT purchase_id, click_id, p_user AS user_id
           FROM PIJ JOIN CIJ ON p_user = c_user
            AND c_ts BETWEEN p_ts - INTERVAL '1' HOUR AND p_ts""",
        Set("PIJ", "CIJ"))
      val r = new Runner(s, circuit,
        Map("PIJ" -> p.limit(0), "CIJ" -> c.limit(0)))
      r.step(Map("CIJ" -> ZSet.fromRows(c)))
      r.step(Map("PIJ" -> ZSet.fromRows(p)))
      r.step(Map("CIJ" -> ZSet.negate(ZSet.fromRows(
        c.filter(col("click_id") % 2 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // INCREMENTAL SESSIONIZATION: gaps-and-islands (gap > 1 h starts a
    // new session) as a standing view. Both windows and the final
    // aggregate are PARTITIONED BY user, so a wave re-folds only the
    // users it touches — and retraction is the case naive session caches
    // get wrong: removing a MID-SESSION event can merge its neighbors
    // into one session (or removing a bridging event can split one), and
    // the per-user re-fold re-derives exactly that.
    "q150_incremental_sessionize" -> ((s, d) => {
      // NTZ-safe epoch micros: a pure wall-clock difference against the
      // NTZ epoch literal — unlike unix_micros(CAST(ts AS TIMESTAMP)),
      // never routed through the session timezone, so it equals DuckDB's
      // tz-free epoch_us(ts) under ANY harness timezone
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"),
          expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").as("ts_us"))
      ev.limit(0).createOrReplaceTempView("EVS")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """WITH m AS (
             SELECT user_id, event_id, ts_us,
                    CASE WHEN lag(ts_us) OVER w IS NULL
                          OR ts_us - lag(ts_us) OVER w > 3600000000
                         THEN 1 ELSE 0 END AS brk
             FROM EVS
             WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
           g AS (
             SELECT user_id, ts_us,
                    SUM(brk) OVER (PARTITION BY user_id
                      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid
             FROM m)
           SELECT user_id, sid, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
                  COUNT(*) AS n
           FROM g GROUP BY user_id, sid""",
        Set("EVS"))
      val r = new Runner(s, circuit, Map("EVS" -> ev.limit(0)))
      // USER-SLICED waves (the delta-proportional shape the circuit is
      // built for — only touched users' partitions re-fold): bootstrap
      // 90% of users, onboard the rest, then retract every 5th event of
      // a quarter of the users — mid-session removals whose neighboring
      // sessions must merge
      r.bootstrap(Map("EVS" -> ev.filter(col("user_id") % 10 =!= 3)))
      r.step(Map("EVS" -> ZSet.fromRows(ev.filter(col("user_id") % 10 === 3))))
      r.step(Map("EVS" -> ZSet.negate(ZSet.fromRows(
        ev.filter(col("user_id") % 4 === 0 && col("event_id") % 5 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Incremental PIVOT: the status × priority count matrix as a standing
    // view — CASE-conditional aggregates are weight-linear (a delta adds
    // ±1 to exactly the cells it hits), so each wave touches only the
    // groups its rows land in. The wide shape is what dashboards read;
    // maintaining it directly beats re-pivoting the fact table per
    // refresh.
    "q148_incremental_pivot" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      o.limit(0).createOrReplaceTempView("OPV")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT o_orderstatus,
                  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
                  COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high,
                  COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3_medium,
                  COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4_not_specified,
                  COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5_low
           FROM OPV GROUP BY o_orderstatus""",
        Set("OPV"))
      val r = new Runner(s, circuit, Map("OPV" -> o.limit(0)))
      r.step(Map("OPV" -> ZSet.fromRows(o.filter(col("o_orderkey") % 3 =!= 0))))
      r.step(Map("OPV" -> ZSet.fromRows(o.filter(col("o_orderkey") % 3 === 0))))
      r.step(Map("OPV" -> ZSet.negate(ZSet.fromRows(
        o.filter(col("o_totalprice") < 50000)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Incremental PER-GROUP TOP-K (leaderboard maintenance): the top-3
    // orders by price within each priority as a standing view. The ranking
    // window re-folds only TOUCHED partitions per wave; the retraction
    // wave removes orders that hold current top slots, so ranks 1-3 must
    // re-derive from the surviving state — the failure mode naive
    // top-k caches get wrong.
    "q149_incremental_group_topk" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
      o.limit(0).createOrReplaceTempView("OTK")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
             SELECT o_orderpriority, o_orderkey, o_totalprice,
                    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
             FROM OTK)
           WHERE rnk <= 3""",
        Set("OTK"))
      val r = new Runner(s, circuit, Map("OTK" -> o.limit(0)))
      r.step(Map("OTK" -> ZSet.fromRows(o.filter(col("o_orderkey") % 2 === 0))))
      r.step(Map("OTK" -> ZSet.fromRows(o.filter(col("o_orderkey") % 2 === 1))))
      // retract the current global top slice — every priority's podium
      // loses members and must re-rank from stored state
      r.step(Map("OTK" -> ZSet.negate(ZSet.fromRows(
        o.filter(col("o_totalprice") > 450000)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // INCREMENTAL TF-IDF: per-document top-term corpus statistics as a
    // standing view — explode is linear, tf and df are stacked traced
    // aggregates, the per-doc ranking is a touched-partition window
    // refold, and the final term join is bilinear, so a wave costs
    // O(Δdocs × their terms + touched term groups), never O(corpus).
    // Deliberately maintained WITHOUT the ln(N/df) multiplier: N is
    // corpus-global, so folding it into the stored value would make every
    // insert wave rewrite every row; the view stores (tf, df, rank) and a
    // reader applies idf at query time — the design that stays
    // delta-proportional at 100 TB.
    "q144_incremental_tfidf" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      docs.limit(0).createOrReplaceTempView("DTF")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """WITH toks AS (
             SELECT doc_id, term
             FROM DTF LATERAL VIEW explode(
               filter(split(lower(text), '[^\\p{L}\\p{N}]+'),
                      t -> length(t) > 0)) AS term),
           tf AS (SELECT doc_id, term, COUNT(*) AS tf
                  FROM toks GROUP BY doc_id, term),
           df AS (SELECT term AS df_term, COUNT(*) AS df
                  FROM tf GROUP BY term),
           ranked AS (
             SELECT doc_id, term, tf,
                    ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY tf DESC, term ASC) AS rnk
             FROM tf)
           SELECT r.doc_id, r.term, r.tf, d.df, r.rnk
           FROM ranked r JOIN df d ON r.term = d.df_term
           WHERE r.rnk <= 3""",
        Set("DTF"))
      val r = new Runner(s, circuit, Map("DTF" -> docs.limit(0)))
      // warehouse bootstrap, a newly-crawled batch, a takedown wave
      r.bootstrap(Map("DTF" -> docs.filter(col("doc_id") % 10 =!= 3)))
      r.step(Map("DTF" -> ZSet.fromRows(docs.filter(col("doc_id") % 10 === 3))))
      r.step(Map("DTF" -> ZSet.negate(ZSet.fromRows(
        docs.filter(col("doc_id") % 7 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Incremental AS-OF join — the standing feature-store view
    // (AsOfJoin.asOfLeftInc): clicks carry the latest earlier purchase per
    // user, maintained through insert waves on both sides plus build-side
    // AND probe-side retractions (a retracted purchase must un-carry from
    // every later click of that user). The build side is pre-aggregated
    // per (user, ts) INSIDE the circuit (Inc.aggregateRows), so as-of ties
    // stay deterministic under retractions too.
    "q115_incremental_asof" -> ((s, d) => {
      import org.apache.spark.sql.functions.{max, unix_micros}
      val ev = Tables.load(s, d, "events")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("value"))
      val buildInc = source("P")
        .aggregateRows(Seq("user_id", "ts_us"),
          Seq(max(col("value")).as("purchase_value")),
          Seq("user_id", "ts_us", "purchase_value"))
        .select(col("user_id"), col("ts_us"), col("purchase_value"),
          col("ts_us").as("purchase_ts_us"))
      val buildSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          purchases.schema("user_id").dataType),
        org.apache.spark.sql.types.StructField("ts_us",
          purchases.schema("ts_us").dataType),
        org.apache.spark.sql.types.StructField("purchase_value",
          purchases.schema("value").dataType),
        org.apache.spark.sql.types.StructField("purchase_ts_us",
          purchases.schema("ts_us").dataType)))
      val circuit = graft.operators.AsOfJoin.asOfLeftInc(
        source("C"), clicks.schema, buildInc, buildSchema,
        Seq("user_id"), "ts_us")
      val r = new Runner(s, circuit,
        Map("C" -> clicks.limit(0), "P" -> purchases.limit(0)))
      r.step(Map("C" -> ZSet.fromRows(clicks.filter(col("event_id") % 2 === 0)),
        "P" -> ZSet.fromRows(purchases)))
      r.step(Map("C" -> ZSet.plus(
        ZSet.fromRows(clicks.filter(col("event_id") % 2 === 1)),
        ZSet.negate(ZSet.fromRows(clicks.filter(col("event_id") % 11 === 0)))),
        "P" -> ZSet.negate(ZSet.fromRows(
          purchases.filter(col("ts_us") % 3 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // ORDER BY ... LIMIT standing view: per-step top-k re-evaluation with
    // retraction of the previous result (reference visitSort :980-1048).
    "q95_incremental_topk" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val circuit = source("L").reevaluate(
        _.sort(col("l_quantity").desc, col("l_orderkey").asc,
          col("l_linenumber").asc).limit(10))
      val r = new Runner(s, circuit, Map("L" -> li.limit(0)))
      r.step(Map("L" -> ZSet.fromRows(li.filter(col("l_quantity") < 30))))
      r.step(Map("L" -> ZSet.fromRows(li.filter(col("l_quantity") >= 30))))
      r.step(Map("L" -> ZSet.negate(ZSet.fromRows(
        li.filter(col("l_quantity") >= 50)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // TPC-H Q3 as a STANDING VIEW: the full shipping-priority query
    // (3-way join + grouped fixed-point revenue + top-10) compiled from
    // SQL and maintained through insert waves on all three tables plus an
    // order-retraction wave (cancelled 'F' orders leave, taking their
    // groups and top-10 membership with them). Revenue reduces through
    // the DECIMAL(38,0) fixed-point image, so incremental merge and
    // retraction arithmetic are exact — the integrated state hash-matches
    // DuckDB's batch answer over the net rows.
    "q128_incremental_tpch_q3" -> ((s, d) => {
      val c = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"), col("o_orderstatus"))
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
          col("l_shipdate"), col("l_quantity"))
      c.limit(0).createOrReplaceTempView("CQ3")
      o.limit(0).createOrReplaceTempView("OQ3")
      li.limit(0).createOrReplaceTempView("LQ3")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
                  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                    * 10000.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
                    AS revenue
           FROM CQ3
           JOIN OQ3 ON c_custkey = o_custkey
           JOIN LQ3 ON o_orderkey = l_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1997-06-17'
             AND l_shipdate > TIMESTAMP '1997-06-17'
           GROUP BY l_orderkey, o_orderdate, o_orderpriority
           ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        Set("CQ3", "OQ3", "LQ3"))
      val r = new Runner(s, circuit, Map(
        "CQ3" -> c.limit(0), "OQ3" -> o.limit(0), "LQ3" -> li.limit(0)))
      // batch-priced snapshot bootstrap (same cadence as q130) — the
      // standing view pays delta prices only for the deltas; full-load-
      // THROUGH-the-delta-path coverage lives in SqlIncrementalSpec
      // ("full snapshot through the delta path") on a capped fixture, so
      // the bench measures steady-state incremental cost, not a bulk load
      r.bootstrap(Map("CQ3" -> c, "OQ3" -> o,
        "LQ3" -> li.filter(col("l_orderkey") % 50 =!= 0)))
      r.step(Map("LQ3" -> ZSet.fromRows(
        li.filter(col("l_orderkey") % 50 === 0))))
      r.step(Map("OQ3" -> ZSet.negate(ZSet.fromRows(
        o.filter(col("o_orderstatus") === "F")))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // CONTINUOUS NEAR-DUP DETECTION: the MinHash-LSH pipeline (per-row
    // signatures → banded bucket self-join → distinct candidate pairs →
    // exact-Jaccard verify) as a standing incremental view — the shape a
    // training-data pipeline actually runs: documents stream in, duplicate
    // pairs stream out, and a retracted document takes its pairs with it.
    // Every stage is circuit-native: signature/banding are LINEAR (per-row
    // expressions, delta-proportional by construction), the bucket
    // self-join and both verify joins are bilinear traced joins, candidate
    // dedup across bands is an incremental Refold. Per-step cost is
    // O(Δdocs × bucket occupancy), never O(corpus).
    //
    // Oracle exactness mirrors q76: at J ≥ 0.9 with 16 bands × 4 rows the
    // banding miss probability is < 4e-8 and verification removes all
    // false positives, so the maintained state equals DuckDB's exact
    // all-pairs Jaccard over the net surviving corpus.
    "q129_incremental_near_dup" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val n = 3; val k = 64; val bandCount = 16; val rowsPerBand = k / bandCount
      val toksE = filter(split(lower(col("text")), "[^\\p{L}\\p{N}]+"),
        t => length(t) > 0)
      // projection boundary between tokens and shingles: higher-order
      // functions are interpreted, so the shingle lambda must read a bound
      // column, not re-evaluate the token split per element
      val shE = array_distinct(
        when(size(col("__toks")) < n, array(concat_ws(" ", col("__toks"))))
          .otherwise(transform(sequence(lit(0), size(col("__toks")) - n),
            i => concat_ws(" ", slice(col("__toks"), i + 1, lit(n))))))
      val D = source("D")
      // .traced: tokenize→shingle is the corpus's heaviest per-row
      // derivation and BOTH jaccard-join sides consult it as a pre-step
      // value — untraced, each step re-shingled the WHOLE corpus twice
      // (measured 7-10 s/step at sf0.1); traced, steps shingle only the
      // delta docs and joins read the stored result.
      val sh = D.select(col("doc_id"), toksE.as("__toks"))
        // zero-token docs emit no signature (mirrors the batch path, which
        // drops them at the explode, and the q76 oracle's len(t) > 0)
        .where(size(col("__toks")) > 0)
        .select(col("doc_id"), shE.as("sh"))
        .traced
      // hash shingles ONCE behind a projection boundary; the k permutation
      // minima are then computed DISTRIBUTED (posexplode → k grouped MINs,
      // whole-stage codegen + map-side partial aggregation) instead of the
      // k interpreted array_min(transform(...)) folds per row — Spark
      // higher-order functions are interpreted, and k×|shingles| lambda
      // evaluations per doc per circuit evaluation dominated this query's
      // step CPU (guide §4). Values are BIT-IDENTICAL: integer MIN over
      // the same affine images is order-independent. Z-set semantics are
      // preserved by consolidating first (canonical rows, so the groupBy
      // on (doc_id, hs, weight) maps each row 1:1) — a linear op because
      // signatures are a pure per-row function.
      val P = 2305843009213693951L // 2^61 - 1, as minhashSignatureFromHashes
      val sig = sh
        .select(col("doc_id"), transform(col("sh"), s => xxhash64(s)).as("hs"))
        .linear { df =>
          val z = graft.zset.ZSet.consolidate(df)
          val W = graft.zset.ZSet.W
          val mins = (0 until k).map { i =>
            val a = 2L * i + 1; val b = 7919L * (i + 1)
            min(pmod(col("__h") * a + b, lit(P))).as(s"__m$i")
          }
          z.select(col("doc_id"), col("hs"), col(W),
              explode(col("hs")).as("__h"))
            .groupBy(col("doc_id"), col("hs"), col(W))
            .agg(mins.head, mins.tail: _*)
            .select(col("doc_id"),
              array((0 until k).map(i => col(s"__m$i")): _*).as("sig"),
              col(W))
        }
        // .traced: the band join reads signatures as pre-step values on
        // both sides — store them so only delta docs are re-signed.
        .traced
      val bandsInc = sig.select(col("doc_id"), posexplode(
          array((0 until bandCount).map(b => xxhash64(concat_ws("_",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))): _*))
        .as(Seq("band_id", "band_key")))
      val aSide = bandsInc.select(col("band_id"), col("band_key"),
        col("doc_id").as("id_a"))
      val bSide = bandsInc.select(col("band_id"), col("band_key"),
        col("doc_id").as("id_b"))
      val pairs = aSide.join(bSide, Seq("band_id", "band_key"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .distinct
      val shA = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val shB = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
      val circuit = pairs.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1))
              .cast("double")).as("jaccard"))
        .where(col("jaccard") >= 0.9)
      val r = new Runner(s, circuit, Map("D" -> docs.limit(0)))
      // batch-priced snapshot bootstrap, then a ~5% newly-crawled batch,
      // then a takedown wave retracting 1/7 of the corpus (pairs must
      // un-derive) — the production cadence of a continuous-dedup view
      r.bootstrap(Map("D" -> docs.filter(col("doc_id") % 20 =!= 1)))
      r.step(Map("D" -> ZSet.fromRows(docs.filter(col("doc_id") % 20 === 1))))
      r.step(Map("D" -> ZSet.negate(ZSet.fromRows(
        docs.filter(col("doc_id") % 7 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // TPC-H Q10 as a STANDING VIEW: the returned-item report — a 4-way
    // join (customer × orders × lineitem × nation) with grouped
    // fixed-point revenue and top-20 — compiled from SQL and maintained
    // through insert waves plus a CUSTOMER retraction wave (a churned
    // customer's groups leave the report entirely, dragging top-20
    // membership with them). Same DECIMAL(38,0) fixed-point image as
    // q128, so incremental merge/retraction arithmetic is exact.
    "q130_incremental_tpch_q10" -> ((s, d) => {
      val c = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
          col("l_returnflag"), col("l_quantity"))
      val n = Tables.load(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
      c.limit(0).createOrReplaceTempView("CQ10")
      o.limit(0).createOrReplaceTempView("OQ10")
      li.limit(0).createOrReplaceTempView("LQ10")
      n.limit(0).createOrReplaceTempView("NQ10")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT c_custkey, c_name, n_name,
                  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                    * 10000.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
                    AS revenue,
                  COUNT(*) AS n_items
           FROM CQ10
           JOIN OQ10 ON c_custkey = o_custkey
           JOIN LQ10 ON o_orderkey = l_orderkey
           JOIN NQ10 ON c_nationkey = n_nationkey
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1996-07-01'
             AND l_returnflag = 'R'
           GROUP BY c_custkey, c_name, n_name
           ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
        Set("CQ10", "OQ10", "LQ10", "NQ10"))
      val r = new Runner(s, circuit, Map("CQ10" -> c.limit(0),
        "OQ10" -> o.limit(0), "LQ10" -> li.limit(0), "NQ10" -> n.limit(0)))
      // batch-priced snapshot bootstrap, then production-shaped waves: a
      // ~2% lineitem delta (late-arriving shipments) and a 10%
      // customer-churn retraction — the steady-state costs a standing
      // report actually pays
      r.bootstrap(Map("CQ10" -> c, "NQ10" -> n, "OQ10" -> o,
        "LQ10" -> li.filter(col("l_orderkey") % 50 =!= 0)))
      r.step(Map("LQ10" -> ZSet.fromRows(
        li.filter(col("l_orderkey") % 50 === 0))))
      r.step(Map("CQ10" -> ZSet.negate(ZSet.fromRows(
        c.filter(col("c_custkey") % 10 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // The TRAINING-CORPUS CURATION PIPELINE as one standing view: token
    // gate + English stopword gate (linear, codegen'd) feeding exact
    // content dedup (keep lowest doc_id, count duplicates). Documents
    // stream in and out; the curated deduplicated corpus is continuously
    // maintained — filters are weight-linear, the dedup is one
    // incremental grouped aggregate on the content key, so steps cost
    // O(Δdocs + touched content groups).
    "q131_incremental_corpus_pipeline" -> ((s, d) => {
      val TA = graft.pipeline.TextAnalysis
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val D = source("D")
      val filtered = D
        .select(col("doc_id"),
          TA.tokenCountWs(col("text")).as("n_tok"),
          TA.countOccurrences(
            concat(lit(" "), lower(col("text")), lit(" ")), " the ")
            .as("n_the"),
          md5(col("text")).as("ck"))
        .where(col("n_tok") >= 20 && col("n_the") >= 1)
      val circuit = filtered.aggregateRows(Seq("ck"),
        Seq(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"),
          min(col("n_tok")).as("n_tok")),
        Seq("ck", "keep_id", "n_dups", "n_tok"))
      val r = new Runner(s, circuit, Map("D" -> docs.limit(0)))
      r.bootstrap(Map("D" -> docs.filter(col("doc_id") % 10 =!= 3)))
      r.step(Map("D" -> ZSet.fromRows(docs.filter(col("doc_id") % 10 === 3))))
      r.step(Map("D" -> ZSet.negate(ZSet.fromRows(
        docs.filter(col("doc_id") % 6 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // RETRIEVAL-INDEX MAINTENANCE: exact ANN top-5 per probe as a standing
    // view over a mutating embedding corpus. Per step the Reeval node
    // re-scores ONE pass over consolidated state (broadcast probes,
    // per-partition top-k — the TakeOrdered shape at scale) and retracts
    // the previous result from its own trace; that single state scan is
    // the fundamental cost of exact top-k under arbitrary retractions (a
    // retracted neighbor can promote anything). The retraction wave
    // removes a slab of the corpus including current top hits, so ranks
    // must shift — hash-exact against DuckDB's window-ranked cosine.
    "q132_incremental_ann" -> ((s, d) => {
      val emb = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val probes = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val E = source("E")
      val circuit = E.reevaluate(df =>
        graft.pipeline.Similarity.bruteForceTopK(df, probes, 5))
      val r = new Runner(s, circuit, Map("E" -> emb.limit(0)))
      r.bootstrap(Map("E" -> emb.filter(col("vec_id") % 11 =!= 5)))
      r.step(Map("E" -> ZSet.fromRows(emb.filter(col("vec_id") % 11 === 5))))
      r.step(Map("E" -> ZSet.negate(ZSet.fromRows(
        emb.filter(col("vec_id") % 9 === 4 && col("vec_id") >= 3)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // RETRIEVAL-INDEX MAINTENANCE, INDEXED (q132's 100 TB shape): the
    // same exact ANN top-5 standing view, maintained by the TopKInc
    // operator instead of per-step re-evaluation. Inserts score only the
    // DELTA against the broadcast probes and merge into the maintained
    // top-k (exact: an insert either beats the old kth or doesn't); a
    // full corpus re-score happens ONLY when a retraction removes a
    // current top hit, and then only for the hit probes. A wave whose
    // removals miss every top hit touches no state at all
    // (IncrementalTopKSpec asserts the rescan counter is 0). This is the
    // honest exactness boundary: gating the REFILL through LSH/IVF
    // buckets would skip state, but a far bucket can still hold the true
    // next-best vector, so bucket-restricted refill is approximate by
    // construction — the bucketed candidate paths stay on the batch side
    // (Similarity.lshTopK / ivfTopK, q79).
    "q155_incremental_ann_indexed" -> ((s, d) => {
      val Sim = graft.pipeline.Similarity
      val emb = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val probes = broadcast(emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        .withColumn("__nq", Sim.norm2(col("q_vec"))))
      def score(rows: org.apache.spark.sql.DataFrame) =
        rows.withColumn("__nc", Sim.norm2(col("embedding")))
          .crossJoin(probes)
          .withColumn("cos",
            Sim.dot(col("embedding"), col("q_vec")) /
              (col("__nc") * col("__nq")))
          .select(col("q_id"), col("vec_id"), col("cos"))
      val circuit = source("E").topKPerGroup(score, Seq("vec_id"),
        Seq("q_id"), Seq(col("cos").desc, col("vec_id").asc), 5)
      val r = new Runner(s, circuit, Map("E" -> emb.limit(0)))
      r.bootstrap(Map("E" -> emb.filter(col("vec_id") % 11 =!= 5)))
      // insert-only wave: merges into the index, no state scan
      r.step(Map("E" -> ZSet.fromRows(emb.filter(col("vec_id") % 11 === 5))))
      // takedown wave removing current top hits: restricted re-score
      r.step(Map("E" -> ZSet.negate(ZSet.fromRows(
        emb.filter(col("vec_id") % 9 === 4 && col("vec_id") >= 3)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // RETRIEVAL-INDEX MAINTENANCE, IVF-BUCKETED (the r8-verdict ask made
    // honest): the coarse quantizer is trained ONCE on the bootstrap
    // corpus and FROZEN (production IVF cadence — retraining would move
    // every bucket boundary per wave); each probe pre-ranks its nProbe
    // nearest centroids, and the TopKInc score function assigns rows to
    // their nearest centroid and joins them against the probe-bucket
    // table — so an insert reaches ONLY the probes that probe its
    // bucket, and a probe re-ranks ONLY candidates from its probed
    // buckets ("re-rank only probes whose candidate buckets changed").
    // Here nProbe = nCentroids, so probed buckets cover the corpus and
    // the maintained view must equal the exact brute-force oracle (the
    // q79 axis, now standing); the realistic nProbe < nCentroids
    // configuration is bucket-gating- and recall-spec'd in
    // IncrementalTopKSpec/PipelineSpec.
    "q156_incremental_ann_ivf" -> ((s, d) => {
      val Sim = graft.pipeline.Similarity
      val emb = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val boot = emb.filter(col("vec_id") % 11 =!= 5)
      val probes = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val nCentroids = 16
      val score = Sim.ivfProbeScorer(boot, probes, nCentroids,
        nProbe = nCentroids)
      val circuit = source("E").topKPerGroup(score, Seq("vec_id"),
        Seq("q_id"), Seq(col("cos").desc, col("vec_id").asc), 5)
      val r = new Runner(s, circuit, Map("E" -> emb.limit(0)))
      r.bootstrap(Map("E" -> boot))
      r.step(Map("E" -> ZSet.fromRows(emb.filter(col("vec_id") % 11 === 5))))
      // REQUANTIZE mid-stream (Similarity.requantizeIvf): retrain the
      // coarse quantizer on the drifted corpus, re-bucket, resume — the
      // final wave runs on the requantized runner, so the re-index
      // operation itself sits under the hash-exact oracle (full probing
      // makes the result quantizer-invariant; gating/recall axes are
      // spec'd in IncrementalTopKSpec).
      val r2 = Sim.requantizeIvf(r, "E", probes, nCentroids,
        nProbe = nCentroids, k = 5)
      r.decommission() // blue/green: the new index is live, release the old
      r2.step(Map("E" -> ZSet.negate(ZSet.fromRows(
        emb.filter(col("vec_id") % 9 === 4 && col("vec_id") >= 3)))))
      ZSet.toRows(ZSet.consolidate(r2.output))
    }),

    // STRATIFIED CAP as a standing view: keep at most K documents per
    // (lang, source) stratum, chosen content-addressed (md5(text)
    // ascending) so the kept set is deterministic, engine-independent,
    // and stable under arrival order — the per-stratum quota every
    // training-mix recipe enforces. TopKInc maintains it exactly:
    // inserts merge delta-proportionally, and retracting a KEPT document
    // refills from the stratum's next-by-hash (only hit strata re-score).
    "q167_incremental_stratified_cap" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      def score(rows: DataFrame): DataFrame =
        rows.select(col("lang"), col("source"), col("doc_id"),
          md5(col("text")).as("h"))
      val circuit = source("DC").topKPerGroup(score, Seq("doc_id"),
        Seq("lang", "source"), Seq(col("h").asc, col("doc_id").asc),
        k = 10, rankCol = "rk")
      val r = new Runner(s, circuit, Map("DC" -> docs.limit(0)))
      r.bootstrap(Map("DC" -> docs.filter(col("doc_id") % 4 =!= 3)))
      r.step(Map("DC" -> ZSet.fromRows(docs.filter(col("doc_id") % 4 === 3))))
      r.step(Map("DC" -> ZSet.negate(ZSet.fromRows(
        docs.filter(col("doc_id") % 7 === 2)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // MULTI-SINK standing maintenance under one oracle: a single Runner
    // maintains TWO views over the same document stream — per-content-key
    // dedup groups and per-token-bucket corpus stats — sharing the parsed
    // linear chain (one circuit DAG, one set of input integrals, one
    // synchronized stepAll per wave). The gate compares the union of both
    // consolidated outputs (tagged by view) against the union of the two
    // batch queries — multi-view consistency, not just per-view values.
    "q68_incremental_multiview" -> ((s, d) => {
      val TA = graft.pipeline.TextAnalysis
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val parsed = source("D").select(col("doc_id"),
        TA.tokenCountWs(col("text")).as("n_tok"),
        md5(col("text")).as("ck"))
      val dedup = parsed.aggregateRows(Seq("ck"),
        Seq(min(col("doc_id")).as("a"), count(lit(1)).as("b")),
        Seq("ck", "a", "b"))
        .select(lit("dedup").as("view"), col("ck").as("k"),
          col("a"), col("b"))
      val stats = parsed
        .select(concat(lit("tok_"), floor(col("n_tok") / 100).cast("long"))
          .as("bucket"), col("n_tok"))
        .aggregateLinear(Seq("bucket"),
          Seq("cnt" -> ZSet.wcount, "toks" -> ZSet.wsum(col("n_tok"))))
        .select(lit("stats").as("view"), col("bucket").as("k"),
          col("cnt").as("a"), col("toks").as("b"))
      val r = new Runner(s,
        Seq("DEDUP" -> dedup, "STATS" -> stats),
        Map("D" -> docs.limit(0)))
      r.bootstrap(Map("D" -> docs.filter(col("doc_id") % 8 =!= 2)))
      r.stepAll(Map("D" -> ZSet.fromRows(docs.filter(col("doc_id") % 8 === 2))))
      r.stepAll(Map("D" -> ZSet.negate(ZSet.fromRows(
        docs.filter(col("doc_id") % 5 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output("DEDUP")))
        .unionByName(ZSet.toRows(ZSet.consolidate(r.output("STATS"))))
    }),

    // Holistic aggregates as standing views: AggRows re-folds touched
    // groups over expanded rows with PLAIN Spark aggregate columns, so
    // even order-statistics (exact interpolated percentiles — no
    // merge-able sketch, no weight-linear form) maintain exactly under
    // retractions. Per step: re-sort only the touched groups.
    "q67_incremental_percentile" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
      val circuit = source("L")
        .aggregateRows(Seq("l_returnflag"),
          Seq(expr("percentile(l_quantity, 0.5)").as("p50_qty"),
            expr("percentile(l_quantity, 0.9)").as("p90_qty"),
            count(lit(1)).as("n")),
          Seq("l_returnflag", "p50_qty", "p90_qty", "n"))
      val r = new Runner(s, circuit, Map("L" -> li.limit(0)))
      r.bootstrap(Map("L" -> li.filter(col("l_orderkey") % 40 =!= 0)))
      r.step(Map("L" -> ZSet.fromRows(li.filter(col("l_orderkey") % 40 === 0))))
      r.step(Map("L" -> ZSet.negate(ZSet.fromRows(
        li.filter(col("l_quantity") >= 45)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // SELF-JOIN standing view through the dedup pre-pass: both join
    // sides are the SAME source, so every column name exists on both —
    // the compiler renames the right side's colliding columns behind a
    // projection (SqlIncremental.dedupJoinNames) and re-anchors the
    // SELECT list, keeping the name-addressed circuit unambiguous. The
    // same-named equi key merges USING-style (inner join); the
    // linenumber inequality stays as a post-join residual; the quantity
    // gates push below the bilinear join on each side.
    "q168_incremental_self_join" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"))
      li.limit(0).createOrReplaceTempView("LS")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT a.l_orderkey AS okey,
                  a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
                  a.l_quantity AS qty_a, b.l_quantity AS qty_b
           FROM LS a JOIN LS b
             ON a.l_orderkey = b.l_orderkey
            AND a.l_linenumber < b.l_linenumber
           WHERE a.l_quantity > 45 AND b.l_quantity > 45""",
        Set("LS"))
      val r = new Runner(s, circuit, Map("LS" -> li.limit(0)))
      r.step(Map("LS" -> ZSet.fromRows(li.filter(col("l_orderkey") % 3 === 0))))
      // inserts + a retraction wave: each delta joins against the OTHER
      // side's stored state, both sides being the same integral
      r.step(Map("LS" -> ZSet.plus(
        ZSet.fromRows(li.filter(col("l_orderkey") % 3 === 1)),
        ZSet.negate(ZSet.fromRows(li.filter(
          col("l_orderkey") % 3 === 0 && col("l_partkey") % 2 === 0))))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // OUTER join over a SAME-NAMED key, reading the inner side's key:
    // with the historical USING-style merge a `SELECT o.k` would read
    // the preserved side's value on unmatched rows — the pre-pass
    // renames same-named keys for outer joins so the inner side's key is
    // its own column and NULL-pads (Postgres/DuckDB ON-join semantics),
    // maintained here through order inserts and retractions that flip
    // rows between padded and matched.
    "q169_incremental_outer_key" -> ((s, d) => {
      val cu = Tables.load(s, d, "customer").select(col("c_custkey"))
      val or = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      cu.limit(0).createOrReplaceTempView("CK")
      or.limit(0).createOrReplaceTempView("OK")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """WITH c AS (SELECT c_custkey AS k FROM CK),
                o AS (SELECT o_custkey AS k, o_totalprice AS price FROM OK)
           SELECT c.k AS ck, o.k AS ok, price
           FROM c LEFT JOIN o ON c.k = o.k""",
        Set("CK", "OK"))
      val r = new Runner(s, circuit,
        Map("CK" -> cu.limit(0), "OK" -> or.limit(0)))
      // customers alone: every row padded (ok and price NULL)
      r.step(Map("CK" -> ZSet.fromRows(cu)))
      // even orders arrive: their customers flip padded → matched
      r.step(Map("OK" -> ZSet.fromRows(or.filter(col("o_orderkey") % 2 === 0))))
      // odd orders arrive while cheap even orders retract: a customer
      // whose last order leaves must flip BACK to the padded row
      r.step(Map("OK" -> ZSet.plus(
        ZSet.fromRows(or.filter(col("o_orderkey") % 2 === 1)),
        ZSet.negate(ZSet.fromRows(or.filter(
          col("o_orderkey") % 2 === 0 && col("o_totalprice") < 50000))))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // LATERAL join as a standing view: the compiler decorrelates the
    // per-row subquery with Spark's own optimizer rules
    // (PullupCorrelatedPredicates + RewriteLateralSubquery, applied to
    // just the LateralJoin subtree) into plain join/aggregate circuit
    // nodes, so the lateral aggregate maintains incrementally — order
    // inserts/retractions re-fold only the touched customers' groups.
    "q170_incremental_lateral" -> ((s, d) => {
      val cu = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val or = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      cu.limit(0).createOrReplaceTempView("CL")
      or.limit(0).createOrReplaceTempView("OL")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT c_custkey, c_mktsegment, y.n AS n, y.mx AS mx
           FROM CL LEFT JOIN LATERAL (
             SELECT COUNT(*) AS n, MAX(o_totalprice) AS mx
             FROM OL
             WHERE o_custkey = c_custkey AND o_totalprice > 100000) y
           ON true""",
        Set("CL", "OL"))
      val r = new Runner(s, circuit,
        Map("CL" -> cu.limit(0), "OL" -> or.limit(0)))
      r.step(Map("CL" -> ZSet.fromRows(cu)))
      r.step(Map("OL" -> ZSet.fromRows(or.filter(col("o_orderkey") % 2 === 0))))
      // MAX is not weight-linear: the retraction wave forces the touched
      // groups to re-fold from consolidated state
      r.step(Map("OL" -> ZSet.plus(
        ZSet.fromRows(or.filter(col("o_orderkey") % 2 === 1)),
        ZSet.negate(ZSet.fromRows(or.filter(
          col("o_orderkey") % 2 === 0 && col("o_totalprice") > 300000))))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // CHAINED standing views through the public Engine API (r13 verdict
    // #9): W_SEG is defined FROM V_ENRICH — not from the base tables —
    // and compiled TOGETHER the structural-CSE memo hands W the same
    // join-projection node V's sink uses, so V's deltas feed W's
    // aggregate without re-deriving from sources (EngineSpec pins the
    // node-count; this row pins end-to-end correctness through insert and
    // retraction waves). Mirrors the reference's multi-view catalog
    // composition (MultiViewTests).
    "q175_incremental_chained_views" -> ((s, d) => {
      val e = new graft.engine.Engine(s)
      e.executeScript(
        """CREATE TABLE XORD (o_orderkey BIGINT NOT NULL,
                              o_custkey BIGINT NOT NULL,
                              o_totalprice DOUBLE NOT NULL);
          |CREATE TABLE XCUST (c_custkey BIGINT NOT NULL,
                               c_mktsegment VARCHAR NOT NULL);
          |CREATE VIEW V_ENRICH AS
          |  SELECT c_mktsegment AS seg, o_orderkey AS k,
          |         CAST(FLOOR(o_totalprice) AS BIGINT) AS price
          |  FROM XORD JOIN XCUST ON o_custkey = c_custkey;
          |CREATE VIEW W_SEG AS
          |  SELECT seg, COUNT(*) AS n, SUM(price) AS total
          |  FROM V_ENRICH WHERE price > 50000 GROUP BY seg""".stripMargin)
      val ord = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val r = e.incrementalRunner(Seq("V_ENRICH", "W_SEG"))
      r.bootstrap(Map(
        "XORD" -> ord.filter(col("o_orderkey") % 5 =!= 0),
        "XCUST" -> cust))
      r.stepAll(Map("XORD" -> ZSet.fromRows(
        ord.filter(col("o_orderkey") % 5 === 0))))
      r.stepAll(Map("XORD" -> ZSet.negate(ZSet.fromRows(
        ord.filter(col("o_custkey") % 8 === 2)))))
      ZSet.toRows(ZSet.consolidate(r.output("V_ENRICH")))
        .select(lit("enrich").as("vw"), col("seg"), col("k"),
          col("price").as("x"))
        .unionByName(
          ZSet.toRows(ZSet.consolidate(r.output("W_SEG")))
            .select(lit("seg").as("vw"), col("seg"), col("n").as("k"),
              col("total").as("x")))
    }),

    // TPC-H Q12 as a STANDING view (r13 verdict #7): the CASE-sum pivot
    // over an equi-join with a NON-EQUI residual referencing both sides
    // (l_shipdate > o_orderdate + 30 days) — the residual rides the
    // bilinear join delta, the pivot sums are weight-linear re-folds.
    // Waves: late-arriving lineitems, then an orders retraction that must
    // un-derive their joined contributions from both pivot columns.
    "q181_incremental_tpch_q12" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      o.limit(0).createOrReplaceTempView("OQ12")
      li.limit(0).createOrReplaceTempView("LQ12")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """SELECT l_returnflag,
                  SUM(CASE WHEN o_orderpriority = '1-URGENT'
                             OR o_orderpriority = '2-HIGH'
                           THEN 1 ELSE 0 END) AS high_line_count,
                  SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                            AND o_orderpriority <> '2-HIGH'
                           THEN 1 ELSE 0 END) AS low_line_count
           FROM OQ12 JOIN LQ12 ON o_orderkey = l_orderkey
           WHERE l_shipdate > o_orderdate + INTERVAL '30' DAY
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY l_returnflag""",
        Set("OQ12", "LQ12"))
      val r = new Runner(s, circuit,
        Map("OQ12" -> o.limit(0), "LQ12" -> li.limit(0)))
      r.bootstrap(Map("OQ12" -> o,
        "LQ12" -> li.filter(col("l_orderkey") % 40 =!= 0)))
      r.step(Map("LQ12" -> ZSet.fromRows(
        li.filter(col("l_orderkey") % 40 === 0))))
      r.step(Map("OQ12" -> ZSet.negate(ZSet.fromRows(
        o.filter(col("o_orderkey") % 7 === 0)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    })
  )

  val oracles: Map[String, String] = Map(
    "q175_incremental_chained_views" ->
      """WITH v AS (
            SELECT c_mktsegment AS seg, o_orderkey AS k,
                   CAST(FLOOR(o_totalprice) AS BIGINT) AS price
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_custkey % 8 <> 2)
          SELECT 'enrich' AS vw, seg, k, price AS x FROM v
          UNION ALL
          SELECT 'seg' AS vw, seg, COUNT(*) AS k,
                 CAST(SUM(price) AS BIGINT) AS x
          FROM v WHERE price > 50000 GROUP BY seg""",
    "q181_incremental_tpch_q12" ->
      """SELECT l_returnflag,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                             OR o_orderpriority = '2-HIGH'
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                            AND o_orderpriority <> '2-HIGH'
                           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          FROM orders
          JOIN lineitem ON o_orderkey = l_orderkey
          WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
            AND o_orderkey % 7 <> 0
          GROUP BY l_returnflag""",
    "q174_incremental_program" ->
      """WITH po AS (SELECT o_orderkey, o_custkey, o_totalprice
                     FROM orders WHERE o_custkey % 10 <> 3),
              pc AS (SELECT c_custkey, c_mktsegment
                     FROM customer WHERE c_mktsegment <> 'BUILDING'),
              j AS (SELECT c_mktsegment AS seg, o_orderkey, o_totalprice
                    FROM po JOIN pc ON o_custkey = c_custkey)
         SELECT 'detail' AS vw, seg, o_orderkey AS k,
                CAST(FLOOR(o_totalprice) AS BIGINT) AS v FROM j
         UNION ALL
         SELECT 'totals' AS vw, seg, CAST(COUNT(*) AS BIGINT) AS k,
                CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS v
         FROM j GROUP BY seg
         UNION ALL
         SELECT 'big' AS vw, seg, o_orderkey AS k, CAST(0 AS BIGINT) AS v
         FROM j WHERE o_totalprice > 150000""",
    "q168_incremental_self_join" ->
      """WITH ls AS (SELECT l_orderkey, l_linenumber, l_quantity
                     FROM lineitem
                     WHERE (l_orderkey % 3 = 0 AND l_partkey % 2 = 1)
                        OR l_orderkey % 3 = 1)
         SELECT a.l_orderkey AS okey,
                a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
                a.l_quantity AS qty_a, b.l_quantity AS qty_b
         FROM ls a JOIN ls b
           ON a.l_orderkey = b.l_orderkey
          AND a.l_linenumber < b.l_linenumber
         WHERE a.l_quantity > 45 AND b.l_quantity > 45""",
    "q169_incremental_outer_key" ->
      """WITH c AS (SELECT c_custkey AS k FROM customer),
              o AS (SELECT o_custkey AS k, o_totalprice AS price
                    FROM orders
                    WHERE (o_orderkey % 2 = 0 AND o_totalprice >= 50000)
                       OR o_orderkey % 2 = 1)
         SELECT c.k AS ck, o.k AS ok, price
         FROM c LEFT JOIN o ON c.k = o.k""",
    "q170_incremental_lateral" ->
      """WITH ol AS (SELECT o_custkey, o_totalprice FROM orders
                     WHERE (o_orderkey % 2 = 0 AND o_totalprice <= 300000)
                        OR o_orderkey % 2 = 1)
         SELECT c_custkey, c_mktsegment, y.n AS n, y.mx AS mx
         FROM customer LEFT JOIN LATERAL (
           SELECT COUNT(*) AS n, MAX(o_totalprice) AS mx
           FROM ol
           WHERE o_custkey = c_custkey AND o_totalprice > 100000) y
         ON true""",
    "q90_incremental_agg" ->
      """SELECT l_suppkey, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
         FROM lineitem
         WHERE l_quantity >= 10 AND l_quantity < 40 AND l_quantity >= 5
         GROUP BY l_suppkey""",
    "q91_incremental_join" ->
      """SELECT l_orderkey, l_suppkey, l_quantity, o_orderstatus
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity > 45 AND o_orderstatus <> 'F'""",
    "q94_incremental_global" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
                CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
                MAX(l_quantity) AS max_qty
         FROM lineitem
         WHERE l_quantity >= 10 AND l_quantity < 40 AND l_quantity >= 5""",
    "q95_incremental_topk" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
         FROM lineitem WHERE l_quantity < 50
         ORDER BY l_quantity DESC, l_orderkey, l_linenumber LIMIT 10""",
    "q96_incremental_sql_join" ->
      """SELECT l_orderkey, l_suppkey, l_quantity, o_orderstatus
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity > 45 AND o_orderstatus <> 'F'""",
    "q99_incremental_distinct" ->
      """SELECT DISTINCT l_suppkey, l_quantity FROM lineitem
         WHERE l_quantity >= 2 AND l_quantity < 6""",
    "q88_incremental_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt,
                CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
         FROM lineitem WHERE l_quantity >= 10
         GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q100_incremental_notin_null" ->
      """WITH ot AS (SELECT l_orderkey, l_linenumber,
                            NULLIF(l_suppkey % 13, 5) AS a,
                            NULLIF(l_partkey % 11, 7) AS b
                     FROM lineitem
                     WHERE l_quantity >= 10 AND l_quantity < 40),
              it AS (SELECT NULLIF(s_suppkey % 13, 5) AS x,
                            NULLIF(s_suppkey % 11, 3) AS y
                     FROM supplier WHERE s_suppkey % 13 <> 5)
         -- DuckDB has no row-value IN subquery; 3VL NOT IN ≡ "no subquery
         -- row maybe-matches" (every row differs definitely on some column)
         SELECT l_orderkey, l_linenumber, a, b FROM ot
         WHERE NOT EXISTS (
           SELECT 1 FROM it
           WHERE (it.x = ot.a OR it.x IS NULL OR ot.a IS NULL)
             AND (it.y = ot.b OR it.y IS NULL OR ot.b IS NULL))""",
    "q160_incremental_notin_pattern" ->
      """WITH ot AS (SELECT l_orderkey, l_linenumber,
                            NULLIF(l_suppkey % 13, 5) AS a,
                            NULLIF(l_partkey % 11, 7) AS b,
                            NULLIF(l_suppkey % 7, 3) AS c,
                            NULLIF(l_partkey % 5, 2) AS e
                     FROM lineitem
                     WHERE l_quantity >= 10 AND l_quantity < 40),
              it AS (SELECT NULLIF(s_suppkey % 13, 5) AS w,
                            NULLIF(s_suppkey % 11, 3) AS x,
                            NULLIF(s_suppkey % 7, 1) AS y,
                            NULLIF(s_suppkey % 5, 4) AS z
                     FROM supplier WHERE s_suppkey % 13 <> 5)
         -- 3VL NOT IN ≡ "no subquery row maybe-matches" (some column
         -- differs definitely), spelled NOT EXISTS for DuckDB
         SELECT l_orderkey, l_linenumber, a, b, c, e FROM ot
         WHERE NOT EXISTS (
           SELECT 1 FROM it
           WHERE (it.w = ot.a OR it.w IS NULL OR ot.a IS NULL)
             AND (it.x = ot.b OR it.x IS NULL OR ot.b IS NULL)
             AND (it.y = ot.c OR it.y IS NULL OR ot.c IS NULL)
             AND (it.z = ot.e OR it.z IS NULL OR ot.e IS NULL))""",
    "q101_incremental_exists_uncorr" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity < 20
           AND EXISTS (SELECT 1 FROM supplier
                       WHERE s_acctbal > 5000 AND s_suppkey % 2 = 0)""",
    "q167_incremental_stratified_cap" ->
      """SELECT lang, source, doc_id, h, rk FROM (
           SELECT lang, source, doc_id, md5(text) AS h,
                  CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
                         ORDER BY md5(text), doc_id) AS INTEGER) AS rk
           FROM documents WHERE doc_id % 7 <> 2) ranked
         WHERE rk <= 10""",
    "q164_incremental_distinct_agg" ->
      """SELECT l_suppkey,
                CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                CAST(SUM(l_quantity) FILTER (WHERE l_quantity > 25)
                  AS DOUBLE) AS qty_hi,
                COUNT(*) AS n_rows
         FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 40
         GROUP BY l_suppkey""",
    "q115_incremental_asof" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us,
                           MAX(value) AS purchase_value
                    FROM events
                    WHERE event_type = 'purchase' AND epoch_us(ts) % 3 <> 0
                    GROUP BY 1, 2),
              c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
                    FROM events
                    WHERE event_type = 'click' AND event_id % 11 <> 0)
         SELECT c.event_id, c.user_id, c.ts_us, c.value,
                p.purchase_value, p.ts_us AS purchase_ts_us
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND p.ts_us <= c.ts_us""",
    "q128_incremental_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
                CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                  * 10000.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
                  AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-06-17'
           AND l_shipdate > TIMESTAMP '1997-06-17'
           AND o_orderstatus <> 'F'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q112_incremental_range_exists" ->
      """SELECT o_orderkey, lo, hi FROM
           (SELECT o_orderkey, o_custkey * 10 AS lo,
                   o_custkey * 10 + 50 AS hi
            FROM orders WHERE o_orderkey % 7 <> 0) o
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_quantity >= 10 AND l_quantity < 40
                         AND l_partkey >= lo AND l_partkey <= hi)""",
    "q150_incremental_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
           FROM events
           WHERE NOT (user_id % 4 = 0 AND event_id % 5 = 0)),
         m AS (
           SELECT user_id, event_id, ts_us,
                  CASE WHEN lag(ts_us) OVER w IS NULL
                        OR ts_us - lag(ts_us) OVER w > 3600000000
                       THEN 1 ELSE 0 END AS brk
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         g AS (
           SELECT user_id, ts_us,
                  CAST(SUM(brk) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS sid
           FROM m)
         SELECT user_id, sid, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
                COUNT(*) AS n
         FROM g GROUP BY user_id, sid""",
    "q148_incremental_pivot" ->
      """SELECT o_orderstatus,
                COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
                COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high,
                COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3_medium,
                COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4_not_specified,
                COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5_low
         FROM orders WHERE o_totalprice >= 50000
         GROUP BY o_orderstatus""",
    "q149_incremental_group_topk" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
           FROM orders WHERE o_totalprice <= 450000)
         WHERE rnk <= 3""",
    "q144_incremental_tfidf" ->
      raw"""WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                        t -> length(t) > 0)) AS term
              FROM documents WHERE doc_id % 7 <> 0),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf
                   FROM toks GROUP BY 1, 2),
            df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            ranked AS (
              SELECT doc_id, term, tf,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY tf DESC, term ASC) AS rnk
              FROM tf)
            SELECT r.doc_id, r.term, r.tf, d.df, r.rnk
            FROM ranked r JOIN df d USING (term)
            WHERE r.rnk <= 3""",
    "q138_incremental_interval_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                p.user_id AS user_id
         FROM events p JOIN events c
           ON p.event_type = 'purchase' AND c.event_type = 'click'
          AND p.user_id = c.user_id
          AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
         WHERE c.event_id % 2 <> 0""",
    "q111_incremental_cross" ->
      """SELECT s_suppkey, t_key FROM supplier
         CROSS JOIN (SELECT r_regionkey AS t_key,
                            r_regionkey * 1000 AS t_lim
                     FROM region WHERE r_regionkey <> 4) t
         WHERE s_acctbal > t_lim AND s_suppkey % 5 <> 0""",
    "q103_incremental_window" ->
      """WITH fin AS (SELECT l_orderkey, l_linenumber, l_quantity
                      FROM lineitem
                      WHERE l_quantity >= 10 AND l_quantity < 40)
         SELECT l_orderkey, l_linenumber, l_quantity,
                CAST(SUM(CAST(l_quantity AS BIGINT))
                  OVER (PARTITION BY l_orderkey) AS BIGINT) AS part_sum,
                COUNT(*) OVER (PARTITION BY l_orderkey) AS part_n
         FROM fin""",
    "q87_incremental_cte_scalar" ->
      """WITH t AS (SELECT l_suppkey, CAST(SUM(l_quantity) AS DOUBLE) AS total
                    FROM lineitem WHERE l_quantity >= 10 GROUP BY l_suppkey)
         SELECT l_suppkey, total FROM t
         WHERE total > (SELECT AVG(total) FROM t)""",
    "q106_incremental_window_range" ->
      """WITH net AS (SELECT event_id, user_id,
                             CAST(FLOOR(epoch_us(ts) / 1000000) AS BIGINT) AS ts_sec
                      FROM events
                      WHERE event_id % 10 >= 2 AND event_id % 10 < 9)
         SELECT event_id, user_id, ts_sec,
                COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_sec
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_1h,
                CAST(SUM(CAST(event_id % 97 AS BIGINT)) OVER
                  (PARTITION BY user_id ORDER BY ts_sec
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS s_1h
         FROM net""",
    // exact word-3-gram Jaccard over all surviving pairs (doc_id % 7 <> 0
    // is the net corpus after the retraction wave); O(n²) is fine for the
    // oracle at gate scale — the engine side stays banded-LSH throughout
    "q129_incremental_near_dup" ->
      raw"""WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                 t -> length(t) > 0) AS t
              FROM documents
              WHERE doc_id % 7 <> 0
            ), sh AS (
              SELECT doc_id,
                     CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                          ELSE list_distinct(list_transform(range(len(t) - 2),
                                 i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))
                     END AS s
              FROM toks
              WHERE len(t) > 0
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / greatest(len(list_distinct(a.s || b.s)), 1) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / greatest(len(list_distinct(a.s || b.s)), 1) >= 0.9""",
    "q130_incremental_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
                CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                  * 10000.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
                  AS revenue,
                COUNT(*) AS n_items
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-07-01'
           AND l_returnflag = 'R'
           AND c_custkey % 10 <> 0
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
    // net corpus after the takedown wave is doc_id % 6 <> 0; gates and
    // dedup mirror the q72 token formula and md5 content key
    "q131_incremental_corpus_pipeline" ->
      raw"""WITH f AS (
              SELECT doc_id, md5(text) AS ck,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE length(trim(regexp_replace(trim(text), '\s+', ' ', 'g')))
                               - length(replace(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ', '')) + 1
                          END AS BIGINT) AS n_tok,
                     CAST((length(' ' || lower(text) || ' ')
                           - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5
                          AS BIGINT) AS n_the
              FROM documents
              WHERE doc_id % 6 <> 0)
            SELECT ck, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups,
                   MIN(n_tok) AS n_tok
            FROM f
            WHERE n_tok >= 20 AND n_the >= 1
            GROUP BY ck""",
    // net corpus after the takedown wave; the union of both standing
    // views' batch answers, tagged per view
    "q68_incremental_multiview" ->
      raw"""WITH p AS (
              SELECT doc_id, md5(text) AS ck,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE length(trim(regexp_replace(trim(text), '\s+', ' ', 'g')))
                               - length(replace(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ', '')) + 1
                          END AS BIGINT) AS n_tok
              FROM documents
              WHERE doc_id % 5 <> 0)
            SELECT 'dedup' AS view, ck AS k,
                   MIN(doc_id) AS a, COUNT(*) AS b
            FROM p GROUP BY ck
            UNION ALL
            SELECT 'stats', 'tok_' || CAST(FLOOR(n_tok / 100) AS BIGINT),
                   COUNT(*), CAST(SUM(n_tok) AS BIGINT)
            FROM p GROUP BY 2""",
    "q67_incremental_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS p50_qty,
                quantile_cont(l_quantity, 0.9) AS p90_qty,
                COUNT(*) AS n
         FROM lineitem
         WHERE l_quantity < 45
         GROUP BY l_returnflag""",
    // final corpus = all embeddings minus the retracted slab; identical
    // cosine arithmetic and tie-break as q75
    // IVF probing every centroid covers the whole corpus → the standing
    // view must equal the exact brute-force ranking over the net rows
    "q156_incremental_ann_ivf" -> {
      val dotQ =
        """list_reduce(list_transform(list_zip(e.embedding, q.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)"""
      val normE = """SQRT(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"""
      val normQ = """SQRT(list_reduce(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"""
      s"""SELECT q_id, rank, vec_id, cos FROM (
            SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
                   ($dotQ) / ($normE * $normQ) AS cos,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY ($dotQ) / ($normE * $normQ) DESC, e.vec_id ASC) AS rank
            FROM (SELECT * FROM embeddings
                  WHERE NOT (vec_id % 9 = 4 AND vec_id >= 3)) e,
                 (SELECT * FROM embeddings WHERE vec_id < 3) q) t
          WHERE rank <= 5"""
    },

    "q155_incremental_ann_indexed" -> {
      // same net corpus as q132 (bootstrap ∪ insert − takedown); the two
      // queries must agree with the oracle AND each other — Reeval vs
      // TopKInc is a pure execution-strategy choice
      val dotQ =
        """list_reduce(list_transform(list_zip(e.embedding, q.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)"""
      val normE = """SQRT(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"""
      val normQ = """SQRT(list_reduce(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"""
      s"""SELECT q_id, rank, vec_id, cos FROM (
            SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
                   ($dotQ) / ($normE * $normQ) AS cos,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY ($dotQ) / ($normE * $normQ) DESC, e.vec_id ASC) AS rank
            FROM (SELECT * FROM embeddings
                  WHERE NOT (vec_id % 9 = 4 AND vec_id >= 3)) e,
                 (SELECT * FROM embeddings WHERE vec_id < 3) q) t
          WHERE rank <= 5"""
    },

    "q132_incremental_ann" -> {
      val dotQ =
        """list_reduce(list_transform(list_zip(e.embedding, q.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)"""
      val normE = """SQRT(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"""
      val normQ = """SQRT(list_reduce(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"""
      s"""SELECT q_id, rank, vec_id, cos FROM (
            SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
                   ($dotQ) / ($normE * $normQ) AS cos,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY ($dotQ) / ($normE * $normQ) DESC, e.vec_id ASC) AS rank
            FROM (SELECT * FROM embeddings
                  WHERE NOT (vec_id % 9 = 4 AND vec_id >= 3)) e,
                 (SELECT * FROM embeddings WHERE vec_id < 3) q) t
          WHERE rank <= 5"""
    }
  )
}
