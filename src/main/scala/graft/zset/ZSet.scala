package graft.zset

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-set algebra over DataFrames.
  *
  * A Z-set is a multiset with signed integer multiplicities — the reference's
  * core abstraction (`OrdZSet<Tuple, Weight>`, ir/type/DBSPTypeZSet.java:31-46;
  * "A ZSet is a map from tuples to integer weights" with weight-merging add()
  * at ir/expression/literal/DBSPZSetLiteral.java:38-42,110-124). Negative
  * weight = retraction.
  *
  * Spark representation: a DataFrame whose last column is `weight: Long`.
  * All operators here are *lazy* DataFrame transformations; weights of equal
  * rows are merged only at `consolidate` (one shuffle on the row value), so
  * chains of linear operators add zero shuffles — the same property the DBSP
  * runtime gets from merging on demand.
  *
  * Operator ↔ reference mapping:
  *  - negate      → DBSPNegateOperator.java:31 (`neg`)
  *  - plus/sum    → DBSPSumOperator.java:33 (`sum`, n-ary weighted union)
  *  - minus       → DBSPSubtractOperator.java:32 (`minus`)
  *  - distinct    → DBSPDistinctOperator.java:32 (weights > 0 → 1)
  *  - map/filter  → DBSPMapOperator.java:35 / DBSPFilterOperator.java:34
  *    (linear: applied to rows, weights carried through)
  *  - join        → DBSPJoinOperator.java:35 (bilinear: result weight is the
  *    product of input weights)
  *  - aggregate   → DBSPAggregateOperator.java:35 (weight-aware fold,
  *    ir/DBSPAggregate.java:46-120): COUNT = Σw, SUM(x) = Σ w·x
  *
  * Scale: `consolidate`/`aggregate` shuffle once on their key; everything
  * else is map-side. At 100 TB the weight column costs 8 bytes/row and
  * removes nothing from Catalyst's pushdown (filters on data columns still
  * reach the scan).
  */
object ZSet {
  val W = "weight"

  /** Column by LITERAL name — auto-generated names like `rpad(s, 8, '.')`
    * contain dots/quotes that `col`'s parser would misread. */
  private def cq(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  private def dataCols(df: DataFrame): Seq[Column] =
    df.columns.filterNot(_ == W).map(cq).toSeq

  /** Lift a plain relation into a Z-set with all weights = 1. */
  def fromRows(df: DataFrame): DataFrame = df.withColumn(W, lit(1L))

  /** Expand a (consolidated, positive) Z-set back into a plain multiset:
    * each row repeated `weight` times. Expansion is CHUNKED: a single
    * `sequence(1, w)` materializes a w-element array in one task, so a
    * consolidated weight of 10⁹ would allocate 8 GB in one go — instead an
    * outer explode emits one row per ≤10⁶-element chunk (the outer array is
    * ≤ w/10⁶ entries) and the inner explode expands a bounded array per
    * chunk, keeping peak allocation ≤ 8 MB regardless of weight. */
  def toRows(df: DataFrame): DataFrame = {
    val C = 1000000L
    df.filter(col(W) > 0)
      .withColumn("__chunk", explode(sequence(lit(0L),
        expr(s"($W - 1L) div ${C}L"))))
      .withColumn("__rep", explode(sequence(lit(1L),
        least(lit(C), col(W) - col("__chunk") * C))))
      .select(dataCols(df): _*)
  }

  /** Negate all weights (DBSPNegateOperator). */
  def negate(z: DataFrame): DataFrame = z.withColumn(W, -col(W))

  /** Weighted union: weights of identical rows add — lazily (merging is
    * deferred to the next consolidate/aggregate, like the runtime's `sum`). */
  def plus(zs: DataFrame*): DataFrame = zs.reduce(_ unionByName _)

  /** Weighted difference a − b (DBSPSubtractOperator). */
  def minus(a: DataFrame, b: DataFrame): DataFrame = plus(a, negate(b))

  /** Merge weights of equal rows and drop zero-weight rows. One shuffle on
    * the full row value. */
  def consolidate(z: DataFrame): DataFrame = {
    val cols = dataCols(z)
    z.groupBy(cols: _*).agg(sum(col(W)).as(W)).filter(col(W) =!= 0)
  }

  /** Set-semantics distinct: rows with positive consolidated weight, at
    * weight 1 (DBSPDistinctOperator: "weights → 1"). */
  def distinct(z: DataFrame): DataFrame =
    consolidate(z).filter(col(W) > 0).withColumn(W, lit(1L))

  /** Positive part: consolidated rows clamped to weight ≥ 1 — the
    * multiset semantics of EXCEPT ALL (max(0, w) copies survive). */
  def positive(z: DataFrame): DataFrame =
    consolidate(z).filter(col(W) > 0)

  /** Linear map: project/compute over data columns, weight carried through.
    * (exprs must not reference `weight`.) */
  def map(z: DataFrame)(exprs: Column*): DataFrame =
    z.select(exprs :+ col(W): _*)

  /** Linear filter. */
  def filter(z: DataFrame)(cond: Column): DataFrame = z.filter(cond)

  /** Bilinear equi-join: result weight = product of weights
    * (DBSPJoinOperator; w(k,l,r) = w_l · w_r). */
  def join(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val aw = a.withColumnRenamed(W, "__wl")
    val bw = b.withColumnRenamed(W, "__wr")
    aw.join(bw, keys)
      .withColumn(W, col("__wl") * col("__wr"))
      .drop("__wl", "__wr")
  }

  /** Bilinear equi-join with NULL-SAFE key equality (`<=>`): NULL keys
    * match NULL keys. Used where the join key is a ROW VALUE rather than a
    * SQL join key — e.g. matching rows of a relation against a distinct
    * set of its own row values (outer-join pads / EXISTS residuals over
    * nullable columns), where SQL's NULL≠NULL would silently miscount
    * rows containing NULLs. Output carries `a`'s key columns. */
  def joinNullSafe(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val aw = a.withColumnRenamed(W, "__wl")
    val bw = keys.foldLeft(b.withColumnRenamed(W, "__wr")) {
      (d, k) => d.withColumnRenamed(k, s"__rk_$k")
    }
    val cond = keys.map(k => aw(k) <=> bw(s"__rk_$k")).reduce(_ && _)
    aw.join(bw, cond)
      .withColumn(W, col("__wl") * col("__wr"))
      .drop("__wl" +: "__wr" +: keys.map(k => s"__rk_$k"): _*)
  }

  /** Weight-aware grouped fold (DBSPAggregateOperator): linear aggregates
    * only — COUNT = Σw, SUM(x) = Σ w·x. Emits no row for groups whose
    * weight sum is 0 (an empty group in Z-set semantics). */
  def aggregate(z: DataFrame, keys: Seq[String], aggs: (String, Column)*): DataFrame = {
    val named = aggs.map { case (n, c) => c.as(n) } :+ sum(col(W)).as("__gw")
    z.groupBy(keys.map(col): _*)
      .agg(named.head, named.tail: _*)
      .filter(col("__gw") =!= 0)
      .drop("__gw")
  }

  /** Σw — weighted COUNT(*) (AggregateCompiler.processCount:116-148). */
  def wcount: Column = sum(col(W))

  /** Σ w·x — weighted SUM (processSum:183-204). */
  def wsum(x: Column): Column = sum(x * col(W))

  /** An empty Z-set with the given schema (+ weight). */
  def empty(spark: org.apache.spark.sql.SparkSession, schema: StructType): DataFrame =
    fromRows(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
}
