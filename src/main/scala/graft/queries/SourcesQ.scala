package graft.queries

import graft.Tables
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink coverage: CSV ingestion (lib/readers/src/lib.rs:51) proven
  * by round-tripping real table data through the CSV path and aggregating
  * it — the oracle runs the same aggregate on the original parquet, so a
  * hash match certifies the CSV reader end-to-end (types, nulls,
  * timestamps). */
object SourcesQ {
  type QFn = (SparkSession, String) => DataFrame

  // CSV fixtures live under the JVM temp dir (not the repo — queries must not
  // mutate the checkout) and are written once per source dir, outside the
  // timed query closure, so the bench measures the read path only.
  private val fixtures = scala.collection.concurrent.TrieMap.empty[String, String]
  private def csvFixture(s: SparkSession, d: String): String =
    fixtures.getOrElseUpdate(d, {
      val path = java.nio.file.Files
        .createTempDirectory("graft_csv_supplier_").toString
      Sources.writeCsv(Tables.load(s, d, "supplier"), path)
      path
    })

  private val jsonFixtures = scala.collection.concurrent.TrieMap.empty[String, String]
  private def jsonFixture(s: SparkSession, d: String): String =
    jsonFixtures.getOrElseUpdate(d, {
      val path = java.nio.file.Files
        .createTempDirectory("graft_json_supplier_").toString
      Sources.writeJsonl(Tables.load(s, d, "supplier"), path)
      path
    })

  private val orcFixtures = scala.collection.concurrent.TrieMap.empty[String, String]
  private def orcFixture(s: SparkSession, d: String): String =
    orcFixtures.getOrElseUpdate(d, {
      val path = java.nio.file.Files
        .createTempDirectory("graft_orc_orders_").toString
      Sources.writeOrc(Tables.load(s, d, "orders"), path)
      path
    })

  // Hive-style partitioned parquet sink: orders written partitionBy
  // o_orderpriority, so a reader filtering on the partition column prunes
  // whole directories before any IO — at 100 TB the difference between
  // scanning one partition and scanning the lake.
  private val partFixtures = scala.collection.concurrent.TrieMap.empty[String, String]
  private def partFixture(s: SparkSession, d: String): String =
    partFixtures.getOrElseUpdate(d, {
      val path = java.nio.file.Files
        .createTempDirectory("graft_part_orders_").toString
      Tables.load(s, d, "orders").write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(path)
      path
    })

  // Bucketed catalog tables (external — an explicit temp path, so the
  // session's default warehouse under the checkout is never written):
  // orders and customer both bucketed+sorted on the customer key with the
  // same bucket count, so the join below reads bucket i against bucket i
  // with no Exchange on either side (plan property proven in
  // BucketedJoinSpec; here the RESULT goes through the DuckDB gate).
  // NOT memoized by dir alone: the saved tables live in the creating
  // SparkSession's in-memory catalog, so a cached name from a stopped
  // session would dangle. tableExists makes the check session-scoped;
  // the write is idempotent (mode overwrite).
  // Creation is serialized per DATASET (not per session): the temp dir is
  // shared across sessions, so two sessions first-calling concurrently
  // would otherwise race their mode-overwrite writes on the SAME path —
  // one session's scan can then read the other's half-replaced files. A
  // per-dataset lock makes every writer (and the tableExists check-then-
  // act) mutually exclusive regardless of which session runs it.
  private val bucketLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private val bucketDirs = scala.collection.concurrent.TrieMap.empty[String, String]
  private def bucketFixture(s: SparkSession, d: String): (String, String) = {
    val tag = (d.hashCode.toLong & 0xffffffffL).toHexString
    val ot = s"graft_orders_b_$tag"; val ct = s"graft_customer_b_$tag"
    val lock = bucketLocks.getOrElseUpdate(d, new Object)
    lock.synchronized {
      if (!s.catalog.tableExists(ot) || !s.catalog.tableExists(ct)) {
        val base = bucketDirs.getOrElseUpdate(d, java.nio.file.Files
          .createTempDirectory("graft_bucket_").toString)
        Tables.load(s, d, "orders").write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$base/$ot").saveAsTable(ot)
        Tables.load(s, d, "customer").write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$base/$ct").saveAsTable(ct)
      }
    }
    (ot, ct)
  }

  /** Pre-create every source/sink fixture OUTSIDE a timed region: the
    * bench's warmup calls this so a fixture-creating query's first timed
    * run measures its read/join path, not a load-sensitive `saveAsTable`
    * (the r10 q134 finding: ~90% of its bench number was the bucketed
    * fixture write landing inside the timer). Idempotent — each fixture
    * memoizes per dataset. */
  def warmFixtures(s: SparkSession, d: String): Unit = {
    csvFixture(s, d); jsonFixture(s, d); orcFixture(s, d)
    partFixture(s, d); bucketFixture(s, d)
    ()
  }

  val defs: Map[String, QFn] = Map(
    "q80_csv_source" -> ((s, d) => {
      val schema = Tables.load(s, d, "supplier").schema
      Sources.readCsv(s, csvFixture(s, d), schema)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("s_suppkey")).as("sum_key"))
    }),

    // NDJSON round-trip: write real supplier rows as JSON lines, read them
    // back under the declared schema, aggregate — the oracle aggregates the
    // original parquet, so a hash match certifies the JSON reader
    // end-to-end (types, strings, nulls).
    "q81_json_source" -> ((s, d) => {
      val schema = Tables.load(s, d, "supplier").schema
      Sources.readJsonl(s, jsonFixture(s, d), schema)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("s_suppkey")).as("sum_key"),
          min(col("s_name")).as("min_name"))
    }),

    // ORC round-trip: real orders rows (incl. TIMESTAMP_NTZ o_orderdate)
    // through Spark's vectorized ORC writer/reader; the oracle aggregates
    // the original parquet, so a hash match certifies the ORC path
    // end-to-end (types, timestamps, strings, nulls).
    "q83_orc_source" -> ((s, d) => {
      val schema = Tables.load(s, d, "orders").schema
      Sources.readOrc(s, orcFixture(s, d), schema)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_key"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"))
    }),

    // Partitioned parquet sink + partition-pruned read-back: the filter on
    // the partition column is satisfied from directory names (the scan's
    // PartitionFilters — PlanAudit-able), so only 2 of 5 partitions are
    // read. The oracle filters the original un-partitioned table; a hash
    // match certifies the sink round-trip AND that pruning lost no rows.
    "q84_partitioned_sink" -> ((s, d) =>
      s.read.parquet(partFixture(s, d))
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_key"))),

    // Co-located bucketed join: both sides pre-bucketed on the join key →
    // zero-Exchange sort-merge join (the 100 TB pattern that turns every
    // repeated fact-dim join from a full network shuffle into local reads).
    "q134_bucketed_join" -> ((s, d) => {
      val (ot, ct) = bucketFixture(s, d)
      s.table(ot).join(s.table(ct),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          graft.Exact.dsum(col("o_totalprice")).as("sum_price"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q80_csv_source" ->
      """SELECT s_nationkey, COUNT(*) AS n, CAST(SUM(s_suppkey) AS BIGINT) AS sum_key
         FROM supplier GROUP BY s_nationkey""",
    "q81_json_source" ->
      """SELECT s_nationkey, COUNT(*) AS n, CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
                MIN(s_name) AS min_name
         FROM supplier GROUP BY s_nationkey""",
    "q83_orc_source" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
                CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
                MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
         FROM orders GROUP BY o_orderstatus""",
    "q84_partitioned_sink" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
                CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
         FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         GROUP BY o_orderpriority, o_orderstatus""",
    "q134_bucketed_join" -> {
      val sp = graft.Exact.sqlDsum("o_totalprice")
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders, $sp AS sum_price
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment"""
    }
  )
}
