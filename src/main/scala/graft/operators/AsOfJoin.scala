package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join and gap-based sessionization — temporal operators a
  * feature-engineering pipeline needs that Spark SQL lacks natively
  * (the reference gained an ASOF join front-end late in its life:
  * doc/sql/grammar.rst documents `ASOF JOIN` with a single `<=`
  * match condition; DuckDB's ASOF JOIN has the same semantics and
  * serves as the correctness oracle).
  *
  * Both operators are composed from built-in window functions — choice
  * (a) of the custom-operator preference order — so they stay inside
  * whole-stage codegen and cost exactly ONE shuffle on the key columns:
  *
  *  - A naive as-of via range join explodes to O(probe x build-within-
  *    range) rows before picking the max; the union + last(ignoreNulls)
  *    carry-forward below is O(n log n) sort work per partition with no
  *    intermediate blow-up, the standard scale-safe formulation.
  *  - At 100 TB the shuffle is keyed on the join key (user/entity id,
  *    high cardinality); AQE handles stragglers. No broadcast is needed
  *    on either side, and neither side is materialized on the driver.
  */
object AsOfJoin {

  /** Left as-of join: for every probe row, attach the payload of the
    * latest build row with the same `keys` and `build.tsCol <=
    * probe.tsCol` (inclusive); probe rows with no such build row keep
    * NULL payload.
    *
    * Requirements: both sides carry `tsCol` under the same name; build
    * payload column names must not clash with probe columns; build rows
    * are unique per (keys, tsCol) — pre-aggregate the build side
    * otherwise (ties would make any engine's answer arbitrary). A NULL
    * in a build payload column is treated as absent for that column
    * (carry-forward looks past it), matching last-observation-carried-
    * forward semantics.
    */
  def asOfLeft(probe: DataFrame, build: DataFrame,
               keys: Seq[String], tsCol: String): DataFrame = {
    val (probeCols, buildCols, eval) =
      carryForwardParts(probe.schema, build.schema, keys, tsCol)
    eval(probe.select(probeCols: _*).unionByName(build.select(buildCols: _*)))
  }

  private val side = "__graft_asof_side"

  /** The shared union + carry-forward machinery: given the two schemas,
    * returns the per-side tagging projections (as Column lists, so the
    * incremental path can apply them weight-preservingly) and the window
    * eval over the tagged union — used by [[asOfLeft]] and as the
    * touched-partition re-fold of the INCREMENTAL as-of ([[asOfLeftInc]]). */
  private def carryForwardParts(probeSchema: org.apache.spark.sql.types.StructType,
                                buildSchema: org.apache.spark.sql.types.StructType,
                                keys: Seq[String], tsCol: String)
      : (Seq[Column], Seq[Column], DataFrame => DataFrame) = {
    val payload = buildSchema.fieldNames.filterNot(c => keys.contains(c) || c == tsCol)
    val probeOnly = probeSchema.fieldNames.filterNot(c => keys.contains(c) || c == tsCol)
    require(probeOnly.intersect(payload).isEmpty,
      s"as-of payload clashes with probe columns: ${probeOnly.intersect(payload).mkString(",")}")
    val probeCols: Seq[Column] =
      (keys :+ tsCol).map(col) ++
        probeOnly.map(col) ++
        payload.map(c => lit(null).cast(buildSchema(c).dataType).as(c)) :+
        lit(1).as(side)
    val buildCols: Seq[Column] =
      (keys :+ tsCol).map(col) ++
        probeOnly.map(c => lit(null).cast(probeSchema(c).dataType).as(c)) ++
        payload.map(col) :+
        lit(0).as(side)
    // Build rows sort before probe rows at equal ts => `<=` is inclusive.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val eval = (u: DataFrame) => u
      .select(
        (keys :+ tsCol).map(col) ++ probeOnly.map(col) ++
          payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
          col(side): _*)
      .filter(col(side) === 1)
      .select(probeSchema.fieldNames.map(col) ++ payload.map(col): _*)
    (probeCols, buildCols, eval)
  }

  /** INCREMENTAL left as-of join — the standing feature-store view: the
    * same carry-forward formulation lifted into the delta algebra. The
    * tagged probe/build union is LINEAR (weight-preserving projections),
    * and the window eval re-folds only the (key) partitions a delta
    * touches via `Inc.windowAggregate`, retracting those partitions'
    * previous rows from the operator's own trace — so a probe insert, a
    * build insert that rewrites later rows' carried payload, and a build
    * RETRACTION that un-carries it are all handled by one re-fold of the
    * touched keys, delta-proportional across keys.
    *
    * `probeSchema`/`buildSchema` fix the union column types (circuits
    * carry no schema); same contracts as [[asOfLeft]] — shared `tsCol`
    * name, clash-free payload, build unique per (keys, ts) (pre-aggregate
    * with `Inc.aggregateRows` otherwise). */
  def asOfLeftInc(probe: graft.streaming.Incremental.Inc,
                  probeSchema: org.apache.spark.sql.types.StructType,
                  build: graft.streaming.Incremental.Inc,
                  buildSchema: org.apache.spark.sql.types.StructType,
                  keys: Seq[String], tsCol: String)
      : graft.streaming.Incremental.Inc = {
    val (probeCols, buildCols, eval) =
      carryForwardParts(probeSchema, buildSchema, keys, tsCol)
    val tagged = probe.select(probeCols: _*) union build.select(buildCols: _*)
    tagged.windowAggregate(keys)(eval)
  }

  /** Gap-based sessionization: assigns a per-key 1-based `session_id`
    * that increments whenever the gap to the previous event (ordered by
    * `tsCol`, tie-broken by `tieCol`) exceeds `gapSec`. `tsCol` must be
    * integral epoch seconds (the same convention the RANGE-window
    * queries use). Two window functions over ONE (key, ts) sort — a
    * single shuffle; session ids are deterministic even under ts ties
    * because tied rows always land in the same session. */
  def sessionize(events: DataFrame, keys: Seq[String], tsCol: String,
                 tieCol: String, gapSec: Long): DataFrame = {
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val newSession = when(
      lag(col(tsCol), 1).over(ord).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(ord) > gapSec, 1).otherwise(0)
    events.withColumn("session_id",
      sum(newSession).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
