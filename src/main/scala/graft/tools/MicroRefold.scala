package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark: reproduce the q160 probe-distinct refold plan shape in
  * isolation to attribute its ~26 s task CPU (dev tool; not on any query
  * path). */
object MicroRefold {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.ansi.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val cpuAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) cpuAcc.addAndGet(te.taskMetrics.executorCpuTime)
    })
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c0 = cpuAcc.get
      val n = f
      org.apache.spark.GraftSparkBridge.drainListenerBus(s.sparkContext, 2000L)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"MICRO $label%-28s wall $wall%6.2f s cpu ${(cpuAcc.get - c0) / 1000000L}%8d ms rows=$n")
    }
    val li = Tables.load(s, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_partkey"), col("l_quantity"))
      .filter(col("l_quantity") < 30)
      .withColumn("weight", lit(1L))
    val p = li.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    val anchored = org.apache.spark.sql.GraftSqlBridge.reanchor(p)
    timed("cache-scan-count")(anchored.count())
    def proj(df: DataFrame): DataFrame = df.select(
      when(col("l_suppkey") % 13 === 5, lit(null)).otherwise(col("l_suppkey") % 13).as("a"),
      when(col("l_partkey") % 11 === 7, lit(null)).otherwise(col("l_partkey") % 11).as("b"),
      when(col("l_suppkey") % 7 === 3, lit(null)).otherwise(col("l_suppkey") % 7).as("c"),
      when(col("l_partkey") % 5 === 2, lit(null)).otherwise(col("l_partkey") % 5).as("e"),
      col("weight"))
    val left = proj(anchored)
    timed("proj-count")(left.count())
    val touched = proj(anchored).select("a","b","c","e").distinct()
    timed("touched-count")(touched.count())
    val names = Seq("a","b","c","e")
    // exact refold: null-safe semi join + weight sum + set-normalize + sum
    val semi = left.join(touched.select(names.map(c => col(c).as(s"__t_$c")): _*),
      names.map(n => col(n) <=> col(s"__t_$n")).reduce(_ && _), "left_semi")
    val folded = semi.groupBy(names.map(col): _*).agg(sum(col("weight")).as("weight"))
      .filter(col("weight") =!= 0 && col("weight") > 0)
      .select(names.map(col) :+ lit(1L).as("weight"): _*)
      .groupBy(names.map(col): _*).agg(sum(col("weight")).as("weight"))
      .filter(col("weight") =!= 0)
    timed("refold-1")(folded.count())
    timed("refold-2")(folded.count())
    timed("refold-3")(folded.count())
    // variant: broadcast the touched side
    val semiB = left.join(broadcast(touched.select(names.map(c => col(c).as(s"__t_$c")): _*)),
      names.map(n => col(n) <=> col(s"__t_$n")).reduce(_ && _), "left_semi")
    val foldedB = semiB.groupBy(names.map(col): _*).agg(sum(col("weight")).as("weight"))
      .filter(col("weight") =!= 0 && col("weight") > 0)
    timed("bcast-semi-1")(foldedB.count())
    timed("bcast-semi-2")(foldedB.count())
    // variant: aggregate FIRST, then semi join the folded groups
    val foldedFirst = left.groupBy(names.map(col): _*).agg(sum(col("weight")).as("weight"))
      .join(touched.select(names.map(c => col(c).as(s"__t_$c")): _*),
        names.map(n => col(n) <=> col(s"__t_$n")).reduce(_ && _), "left_semi")
      .filter(col("weight") =!= 0 && col("weight") > 0)
    timed("agg-first-1")(foldedFirst.count())
    timed("agg-first-2")(foldedFirst.count())
    // variant: plain groupBy with no semi at all (upper bound of agg cost)
    val justAgg = left.groupBy(names.map(col): _*).agg(sum(col("weight")).as("weight"))
    timed("agg-only-1")(justAgg.count())
    timed("agg-only-2")(justAgg.count())
    // variant: sort-merge semi but non-null-safe key (plain equi join on coalesced)
    val semiEq = left.join(touched.select(names.map(c => col(c).as(s"__t_$c")): _*),
      names.map(n => col(n) === col(s"__t_$n")).reduce(_ && _), "left_semi")
    timed("eq-semi-1")(semiEq.count())
    timed("smj-semi-only")(semi.count())
    println("PLAN semi:"); semi.explain()
    println("PLAN agg-first:"); foldedFirst.explain()
    val sorted = left.sortWithinPartitions(names.map(n => coalesce(col(n), lit(0))): _*)
    timed("sort-only")(sorted.count())
    s.stop()
  }
}
