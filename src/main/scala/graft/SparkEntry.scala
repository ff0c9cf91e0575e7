package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one named entry per implemented operator from
  * SURVEY.md §2; `oracleSql` carries the DuckDB-dialect equivalent for the
  * driver's correctness gate (omitted only for ops not expressible in SQL,
  * which get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's signature workload shape — a rolling RANGE-window
    * feature (ComplexQueriesTest.java:42-61 taxi / :369-440 fraud) joined
    * back to a grouped aggregate. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, d, "events")
      // NTZ-safe epoch seconds (wall-clock diff, never session-tz routed)
      .withColumn("ts_sec", expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-3600, 0)
    val feats = ev.select(
      col("event_id"), col("user_id"), col("event_type"),
      count(lit(1)).over(w).as("n_1h"),
      (sum(Exact.fix(col("value"))).over(w).cast("double") / 10000.0).as("sum_1h"))
    val byType = ev.groupBy(col("event_type"))
      .agg(Exact.davg(col("value")).as("avg_value"))
    feats.join(broadcast(byType), Seq("event_type"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    _root_.graft.queries.Relational.defs ++
    _root_.graft.queries.Aggregates.defs ++
    _root_.graft.queries.Windows.defs ++
    _root_.graft.queries.Temporal.defs ++
    _root_.graft.queries.Scalar.defs ++
    _root_.graft.queries.Arrays.defs ++
    _root_.graft.queries.ZSetQ.defs ++
    _root_.graft.queries.Pipeline.defs ++
    _root_.graft.queries.SourcesQ.defs ++
    _root_.graft.queries.IncrementalQ.defs ++
    _root_.graft.queries.StreamsQ.defs ++
    _root_.graft.queries.Recursive.defs ++
    _root_.graft.queries.TpcH.defs ++
    _root_.graft.queries.Workloads.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    _root_.graft.queries.Relational.oracles ++
    _root_.graft.queries.Aggregates.oracles ++
    _root_.graft.queries.Windows.oracles ++
    _root_.graft.queries.Temporal.oracles ++
    _root_.graft.queries.Scalar.oracles ++
    _root_.graft.queries.Arrays.oracles ++
    _root_.graft.queries.ZSetQ.oracles ++
    _root_.graft.queries.Pipeline.oracles ++
    _root_.graft.queries.SourcesQ.oracles ++
    _root_.graft.queries.IncrementalQ.oracles ++
    _root_.graft.queries.StreamsQ.oracles ++
    _root_.graft.queries.Recursive.oracles ++
    _root_.graft.queries.TpcH.oracles ++
    _root_.graft.queries.Workloads.oracles
}
