package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from driver testdata by key-offset
  * replication — for SCALING measurements only (the correctness gate
  * stays on the driver's own parquet; see TESTDATA.md).
  *
  * Each fact table is unioned N times with all integer keys offset by
  * i·10⁷ per replica, so per-key densities, join fan-outs, group sizes
  * and selectivity are preserved exactly — the workload grows by N with
  * no distribution shift. Two content-bearing tables get extra care:
  *
  *  - `documents.text` is vowel-permuted per replica (translate over a
  *    per-replica vowel rotation): replicas are NOT near-duplicates of
  *    each other, so the near-dup/cluster workloads keep their pair rate
  *    per document instead of exploding quadratically in N;
  *  - dimension tables (region, nation) are copied once, like TPC-H.
  *
  * Usage: tools/run_main.sh graft.tools.ScaleData <srcDir> <outDir> <N>
  */
object ScaleData {
  private val OFF = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1); val n = args(2).toInt
    // documents.text distinctness relies on one distinct text transform
    // per replica (5 vowel rotations × 2 consonant layers below);
    // silently wrapping past them would alias replicas into EXACT
    // duplicates and corrupt the near-dup workloads.
    require(n >= 1 && n <= 10,
      s"N=$n out of range: 1..10 replicas supported (one distinct text " +
        "transform per replica keeps documents pairwise non-duplicate)")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def save(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    // Replica text transforms must keep replicas pairwise NON-duplicate
    // (exact or near): the five vowel ROTATIONS differ from each other at
    // every vowel, and replicas 5-9 add a consonant rotation on top —
    // two replicas therefore differ on every vowel occurrence or on
    // every occurrence of 16 common consonants. (The r10-flagged table
    // mixed non-rotation permutations like "aeiuo" that agree with the
    // identity on a/e/i, so o/u-free documents aliased exactly.)
    val vowelPerms = Seq("aeiou", "eioua", "iouae", "ouaei", "uaeio")
    val cons = "bcdfghjklmnpqrst"
    val consRot = cons.tail + cons.head
    def repl(t: String, keys: Seq[String],
             extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until n).map { i =>
        val base = keys.foldLeft(load(t))((d, k) =>
          d.withColumn(k, col(k) + lit(i * OFF)))
        extra(base, i)
      }.reduce(_ unionByName _)

    save("region", load("region"))
    save("nation", load("nation"))
    save("customer", repl("customer", Seq("c_custkey")))
    save("supplier", repl("supplier", Seq("s_suppkey")))
    save("part", repl("part", Seq("p_partkey")))
    save("orders", repl("orders", Seq("o_orderkey", "o_custkey")))
    save("lineitem", repl("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    save("events", repl("events", Seq("event_id", "user_id")))
    save("documents", repl("documents", Seq("doc_id"), (d, i) => {
      val vowels =
        translate(col("text"), "aeiou", vowelPerms(i % vowelPerms.length))
      d.withColumn("text",
        if (i < vowelPerms.length) vowels
        else translate(vowels, cons, consRot))
    }))
    save("embeddings", repl("embeddings", Seq("vec_id")))
    spark.stop()
  }
}
