package graft.queries

import graft.Tables
import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-set (weighted multiset) operators surfaced as oracle-checkable queries:
  * negate / weighted sum / subtract / distinct / weight-aware aggregate.
  * Weights are materialized in the output so DuckDB can verify the algebra
  * (weight arithmetic is plain SQL).
  *
  * Reference: DBSPNegateOperator.java:31, DBSPSumOperator.java:33,
  * DBSPSubtractOperator.java:32, DBSPDistinctOperator.java:32,
  * DBSPAggregateOperator.java:35 with the Z-set weight semantics of
  * DBSPZSetLiteral.java:38-42. The integrate/differentiate pair and the
  * incremental operator variants are step-indexed (not expressible as a
  * single SQL query) and are covered by IncrementalEquivalenceSpec instead.
  */
object ZSetQ {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def zA(s: SparkSession, d: String) = ZSet.fromRows(
    T(s, d, "lineitem").filter(col("l_quantity") < 5)
      .select(col("l_suppkey"), col("l_quantity")))
  private def zB(s: SparkSession, d: String) = ZSet.fromRows(
    T(s, d, "lineitem").filter(col("l_quantity") < 4)
      .select(col("l_suppkey"), col("l_quantity")))

  val defs: Map[String, QFn] = Map(
    // DBSPNegateOperator: all weights negated
    "q60_zset_negate" -> ((s, d) =>
      ZSet.consolidate(ZSet.negate(zA(s, d)))),

    // DBSPSumOperator: weighted union, weights of equal rows add
    "q61_zset_sum" -> ((s, d) =>
      ZSet.consolidate(ZSet.plus(zA(s, d), zB(s, d)))),

    // DBSPSubtractOperator: B − A leaves negative weights where A ⊃ B
    "q62_zset_subtract" -> ((s, d) =>
      ZSet.consolidate(ZSet.minus(zB(s, d), zA(s, d)))),

    // DBSPDistinctOperator: positive consolidated weight → 1
    "q63_zset_distinct" -> ((s, d) =>
      ZSet.distinct(ZSet.plus(zA(s, d), zB(s, d)))),

    // Weight-aware grouped fold: COUNT = Σw, SUM = Σ w·x; zero-weight
    // groups vanish (here: rows with 4 ≤ qty < 5 per supplier)
    "q64_zset_aggregate" -> ((s, d) =>
      ZSet.aggregate(ZSet.minus(zA(s, d), zB(s, d)), Seq("l_suppkey"),
        "cnt" -> ZSet.wcount,
        "sum_qty" -> ZSet.wsum(col("l_quantity"))))
  )

  private val selA = "SELECT l_suppkey, l_quantity, CAST(1 AS BIGINT) AS weight FROM lineitem WHERE l_quantity < 5"
  private val selB = "SELECT l_suppkey, l_quantity, CAST(1 AS BIGINT) AS weight FROM lineitem WHERE l_quantity < 4"

  // NB: integer SUMs are CAST to BIGINT — DuckDB's SUM(BIGINT) yields
  // HUGEINT, which hash-mismatches Spark's int64 in the driver compare.
  val oracles: Map[String, String] = Map(
    "q60_zset_negate" ->
      s"""SELECT l_suppkey, l_quantity, CAST(SUM(-weight) AS BIGINT) AS weight FROM ($selA) a
          GROUP BY l_suppkey, l_quantity HAVING SUM(-weight) <> 0""",
    "q61_zset_sum" ->
      s"""SELECT l_suppkey, l_quantity, CAST(SUM(weight) AS BIGINT) AS weight
          FROM ($selA UNION ALL $selB) u
          GROUP BY l_suppkey, l_quantity HAVING SUM(weight) <> 0""",
    "q62_zset_subtract" ->
      s"""SELECT l_suppkey, l_quantity, CAST(SUM(weight) AS BIGINT) AS weight
          FROM ($selB UNION ALL SELECT l_suppkey, l_quantity, -weight FROM ($selA) a) u
          GROUP BY l_suppkey, l_quantity HAVING SUM(weight) <> 0""",
    "q63_zset_distinct" ->
      s"""SELECT l_suppkey, l_quantity, CAST(1 AS BIGINT) AS weight
          FROM ($selA UNION ALL $selB) u
          GROUP BY l_suppkey, l_quantity HAVING SUM(weight) > 0""",
    "q64_zset_aggregate" ->
      s"""SELECT l_suppkey, CAST(SUM(weight) AS BIGINT) AS cnt,
                 CAST(SUM(l_quantity * weight) AS DOUBLE) AS sum_qty
          FROM ($selA UNION ALL SELECT l_suppkey, l_quantity, -weight FROM ($selB) b) u
          GROUP BY l_suppkey HAVING SUM(weight) <> 0"""
  )
}
