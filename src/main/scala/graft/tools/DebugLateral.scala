package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.optimizer.{PullupCorrelatedPredicates, RewriteLateralSubquery}

object DebugLateral {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("dbg").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq((1L, "A")).toDF("c_custkey", "c_mktsegment").createOrReplaceTempView("CL")
    Seq((1L, 1L, 10.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView("OL")
    val q = """SELECT c_custkey, c_mktsegment, y.n AS n, y.mx AS mx
           FROM CL LEFT JOIN LATERAL (
             SELECT COUNT(*) AS n, MAX(o_totalprice) AS mx
             FROM OL
             WHERE o_custkey = c_custkey AND o_totalprice > 100000) y
           ON true"""
    val analyzed = spark.sql(q).queryExecution.analyzed
    val lj = analyzed.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LateralJoin => l }.get
    val rewritten = RewriteLateralSubquery(PullupCorrelatedPredicates(lj))
    println("=== rewritten lateral ===")
    println(rewritten.treeString)
    spark.stop()
  }
}
