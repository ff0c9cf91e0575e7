package graft

import graft.sources.Sources
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.sql.DriverManager

/** Proves the JDBC source (lib/readers/src/lib.rs:75 analogue) against an
  * embedded Apache Derby database — the derby jars ship with the Spark
  * distribution, so this exercises the real DriverManager + partitioned
  * range-scan path without any external service. */
class JdbcSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("jdbc-source")
    .getOrCreate()

  private val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_").toString
  private val url = s"jdbc:derby:$dbDir/graftdb;create=true"

  override def beforeAll(): Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE emp (id INT NOT NULL, name VARCHAR(32), salary DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO emp VALUES (?, ?, ?)")
    (0 until 100).foreach { i =>
      ps.setInt(1, i)
      if (i % 10 == 0) ps.setNull(2, java.sql.Types.VARCHAR)
      else ps.setString(2, s"name_$i")
      ps.setDouble(3, 1000.0 + i)
      ps.addBatch()
    }
    ps.executeBatch()
    conn.close()
  }

  override def afterAll(): Unit = spark.stop()

  test("unpartitioned JDBC read round-trips rows and types") {
    val df = Sources.readJdbc(spark, url, "emp")
    assert(df.count() === 100L)
    val r = df.filter("id = 7").collect()(0)
    assert(r.getAs[String]("NAME") === "name_7")
    assert(r.getAs[Double]("SALARY") === 1007.0)
    assert(df.filter("name IS NULL").count() === 10L)
  }

  test("partitioned JDBC read splits the scan into range slices") {
    val df = Sources.readJdbc(spark, url, "emp",
      partitionOn = Some(("id", 0L, 100L)), numPartitions = 4)
    // the scan itself must be 4 parallel range queries, not a single task
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100L)
    // every row lands in exactly one slice: sum is complete and unduplicated
    val total = df.agg(org.apache.spark.sql.functions.sum("id")).collect()(0).getLong(0)
    assert(total === (0 until 100).sum.toLong)
  }
}
