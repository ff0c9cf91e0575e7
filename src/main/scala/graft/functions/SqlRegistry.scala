package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}

/** Registers the parity functions as *SQL-callable* names, so Engine view
  * text can use the reference's spellings directly (`SELECT
  * ELEMENT(ARRAY(2))`, `ST_DISTANCE(ST_POINT(0,0), ST_POINT(0,1))`,
  * `DECADE(ts)`, …). Bodies are the composed Catalyst expressions from
  * SqlFunctions — they inline into the plan and stay inside whole-stage
  * codegen; nothing here is a UDF. */
object SqlRegistry {

  def register(spark: SparkSession): Unit = {
    import SqlFunctions._
    val fns: Map[String, Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column] = Map(
      "ELEMENT"        -> (a => element(a(0))),
      "ST_POINT"       -> (a => stPoint(a(0), a(1))),
      "ST_DISTANCE"    -> (a => stDistance(a(0), a(1))),
      "DECADE"         -> (a => decade(a(0))),
      "CENTURY"        -> (a => century(a(0))),
      "MILLENNIUM"     -> (a => millennium(a(0))),
      "ISOYEAR"        -> (a => isoyear(a(0))),
      "ISODOW"         -> (a => isodow(a(0))),
      "PG_DOW"         -> (a => dow(a(0))),
      "EPOCH_SECOND"   -> (a => epochSecond(a(0))),
      "TIMESTAMPDIFF_MONTH" -> (a => timestampdiffMonth(a(0), a(1))),
      "CEIL_TS_MONTH"  -> (a => ceilTs(a(0), "month")),
      "CEIL_TS_HOUR"   -> (a => ceilTs(a(0), "hour")),
      "FDIV"           -> (a => fdiv(a(0), a(1))))
    fns.foreach { case (n, b) => GraftSqlBridge.registerSqlFunction(spark, n, b) }
  }
}
