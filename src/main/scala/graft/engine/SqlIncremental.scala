package graft.engine

import graft.streaming.Incremental
import graft.streaming.Incremental.Inc
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.InnerLike
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.GraftSqlBridge

/** SQL → incremental circuit translator: the step that makes `CREATE VIEW`
  * text incrementally maintainable, mirroring the reference's pipeline
  * (Calcite RelNode → DBSP circuit, CalciteToDBSPCompiler.java:72, then
  * incrementalized by IncrementalizeVisitor/OptimizeIncrementalVisitor —
  * SURVEY §4.2). Here Spark's analyzer is the front-end: we walk the
  * *analyzed* logical plan of the view and emit the equivalent
  * `Incremental.Inc` circuit over the named source tables.
  *
  * Supported plan shapes (v1): source scans, Project, Filter, inner
  * equi-joins on same-named columns (USING-join shape), grouped
  * aggregates (any Spark aggregate function — groups are re-folded from
  * consolidated state, so non-linear MIN/MAX/AVG are exact under
  * retractions), UNION ALL, DISTINCT, and subquery aliases. Anything else
  * throws `UnsupportedPlanException` with the offending node — the
  * fallback is the manual `Incremental` DSL.
  */
object SqlIncremental {

  final class UnsupportedPlanException(msg: String)
    extends IllegalArgumentException(msg)

  /** Compile a SQL query into an incremental circuit over `sources`
    * (names of tables registered as temp views). */
  def compile(spark: SparkSession, sql: String, sources: Set[String]): Inc = {
    val analyzed = spark.sql(sql).queryExecution.analyzed
    // Spark lowercases temp-view names in analyzed plans; map back to the
    // declared source spelling so Runner input keys line up.
    val byLower = sources.map(s => s.toLowerCase -> s).toMap
    walk(analyzed, byLower)
  }

  private def walk(plan: LogicalPlan, sources: Map[String, String]): Inc = plan match {
    case SubqueryAlias(id, child) if sources.contains(id.name.toLowerCase) =>
      Incremental.source(sources(id.name.toLowerCase))
    case SubqueryAlias(_, child) => walk(child, sources)

    case Project(exprs, child) =>
      walk(child, sources).select(exprs.map(toColumn): _*)

    case Filter(cond, child) =>
      walk(child, sources).where(toColumn(cond))

    case Join(left, right, _: InnerLike, cond, _) =>
      val keys = equiKeys(cond, left, right)
      walk(left, sources).join(walk(right, sources), keys)

    case Aggregate(groupExprs, aggExprs, child, _) =>
      val keys = groupExprs.map {
        case a: AttributeReference => a.name
        case other => throw new UnsupportedPlanException(
          s"incremental GROUP BY supports plain columns, got: $other")
      }
      if (keys.isEmpty) throw new UnsupportedPlanException(
        "global aggregates need a grouping key in incremental mode " +
          "(add a constant key, e.g. GROUP BY 'all')")
      val keySet = keys.map(_.toLowerCase).toSet
      val aggCols = aggExprs.filter {
        case a: AttributeReference => !keySet.contains(a.name.toLowerCase)
        case _ => true
      }.map(toColumn)
      val outOrder = aggExprs.map(_.name)
      walk(child, sources).aggregateRows(keys, aggCols, outOrder)

    case Union(children, false, false) =>
      children.map(walk(_, sources)).reduce(_ union _)

    case Distinct(child) => walk(child, sources).distinct
    case Deduplicate(_, child) => walk(child, sources).distinct

    case other => throw new UnsupportedPlanException(
      s"unsupported plan node for incremental mode: ${other.nodeName}")
  }

  /** Re-anchor attribute references by name so the expression resolves
    * against the circuit's delta/state DataFrames instead of the original
    * analyzed plan's exprIds. */
  private def toColumn(e: Expression): Column = {
    val cleaned = e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }
    GraftSqlBridge.column(cleaned match {
      case al: Alias => al
      case ne: NamedExpression => ne
      case other => other
    })
  }

  /** Extract same-named equi-join keys from an inner-join condition:
    * conjunctions of `l.k = r.k`. Differently-named keys or residual
    * predicates are unsupported in v1 (alias columns to matching names). */
  private def equiKeys(cond: Option[Expression],
                       left: LogicalPlan, right: LogicalPlan): Seq[String] = {
    val c = cond.getOrElse(throw new UnsupportedPlanException(
      "cross join without condition is not supported incrementally"))
    val leftAttrs = left.outputSet
    val rightAttrs = right.outputSet
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    split(c).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name.equalsIgnoreCase(b.name) &&
            ((leftAttrs.contains(a) && rightAttrs.contains(b)) ||
             (leftAttrs.contains(b) && rightAttrs.contains(a))) =>
        a.name
      case other => throw new UnsupportedPlanException(
        s"incremental join supports same-named equi conditions, got: $other")
    }
  }
}
