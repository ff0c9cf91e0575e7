package graft

import graft.engine.Engine
import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Port of the reference's incremental-equivalence axis
  * (NaiveIncrementalTests.java:35 re-runs the EndToEndTests goldens with
  * incremental=true and asserts identical outputs): each golden query over
  * table T is compiled to an incremental circuit by SqlIncremental, fed
  * T's rows as stepped deltas — insert e0, insert e1, then retract e0 —
  * and after every step the integrated incremental output must equal a
  * full recompute over the integrated input. */
class NaiveIncrementalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("naive-inc")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()
  import scala.jdk.CollectionConverters._

  private lazy val engine: Engine = {
    val e = new Engine(spark)
    e.executeStatement(
      """CREATE TABLE T (
        |  COL1 INT NOT NULL, COL2 DOUBLE NOT NULL, COL3 BOOLEAN NOT NULL,
        |  COL4 VARCHAR NOT NULL, COL5 INT, COL6 DOUBLE)""".stripMargin)
    e
  }

  private val tSchema = StructType(Seq(
    StructField("COL1", IntegerType), StructField("COL2", DoubleType),
    StructField("COL3", BooleanType), StructField("COL4", StringType),
    StructField("COL5", IntegerType), StructField("COL6", DoubleType)))

  private def delta(rows: (Seq[Any], Long)*): DataFrame =
    spark.createDataFrame(
      rows.map { case (r, w) => Row(r :+ w: _*) }.asJava,
      StructType(tSchema.fields :+ StructField(ZSet.W, LongType)))

  private val e0 = Seq[Any](10, 12.0, true, "Hi", null, null)
  private val e1 = Seq[Any](10, 1.0, false, "Hi", 1, 0.0)

  private def canon(z: DataFrame): Seq[String] =
    ZSet.consolidate(z).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  /** The goldens whose plan shapes the incremental compiler supports. */
  private val goldens = Seq(
    "projectTest"        -> "SELECT T.COL3 FROM T",
    "projectNullable"    -> "SELECT T.COL5 FROM T",
    "plusNull"           -> "SELECT T.COL1 + T.COL5 FROM T",
    "negateNull"         -> "SELECT -T.COL5 FROM T",
    "whereBool"          -> "SELECT * FROM T WHERE COL3",
    "whereCompare"       -> "SELECT * FROM T WHERE COL2 < COL1",
    "whereCast"          -> "SELECT * FROM T WHERE COL2 < CAST(COL5 AS DOUBLE)",
    "unionAll"           -> "(SELECT COL1 FROM T) UNION ALL (SELECT COL5 FROM T)",
    "distinctCol"        -> "SELECT DISTINCT COL1, COL4 FROM T",
    "selfJoin"           -> ("SELECT A, B FROM " +
      "(SELECT COL1, COL3 AS A FROM T) T1 JOIN (SELECT COL1, COL3 AS B FROM T) T2 USING (COL1)"),
    "groupByAgg"         -> ("SELECT COL1, COUNT(COL2) AS C, SUM(COL2) AS S, " +
      "MAX(COL2) AS M, AVG(COL2) AS A FROM T GROUP BY COL1"),
    "groupByTwoKeys"     -> "SELECT COL1, COL3, SUM(COL2) AS S FROM T GROUP BY COL1, COL3",
    "havingTest"         -> "SELECT COL1, SUM(COL2) AS S FROM T GROUP BY COL1 HAVING SUM(COL2) > 5",
    "concatProject"      -> "SELECT T.COL4 || ' ' || T.COL4 AS CC FROM T",
    "nullableBool3VL"    -> "SELECT (T.COL5 > 10 AND T.COL3) AS B FROM T",
    // set-op goldens (exceptTest :366, intersectTest :195)
    "exceptTest"         -> "SELECT * FROM T EXCEPT (SELECT * FROM T WHERE COL3)",
    "exceptAllTest"      -> ("(SELECT COL1 FROM T) UNION ALL (SELECT COL1 FROM T) " +
      "EXCEPT ALL (SELECT COL1 FROM T)"),
    "intersectTest"      -> "SELECT * FROM T INTERSECT (SELECT * FROM T)",
    "intersectFiltered"  -> ("SELECT COL1, COL4 FROM T INTERSECT " +
      "(SELECT COL1, COL4 FROM T WHERE COL3)"))

  goldens.foreach { case (name, sql) =>
    test(s"incremental ≡ batch: $name") {
      val r = new graft.streaming.Incremental.Runner(spark,
        graft.engine.SqlIncremental.compile(engine.spark, sql, Set("T")),
        Map("T" -> spark.createDataFrame(List.empty[Row].asJava, tSchema)))
      val steps = Seq(
        delta((e0, 1L)),          // insert row e0
        delta((e1, 1L)),          // insert row e1 (full table-T fixture)
        delta((e0, -1L)))         // retract e0
      steps.foreach { d =>
        r.step(Map("T" -> d))
        assert(canon(r.output) === canon(r.recompute), s"$name diverged")
      }
    }
  }
}
