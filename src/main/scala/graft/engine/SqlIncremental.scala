package graft.engine

import graft.streaming.Incremental
import graft.streaming.Incremental.Inc
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.{FullOuter, InnerLike, LeftAnti, LeftOuter, LeftSemi, RightOuter}
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

    case Join(left, right, joinType, cond, _) =>
      val keys = equiKeys(cond, left, right)
      // Name-based re-anchoring cannot disambiguate same-named non-key
      // columns from both sides (the analyzed plan's qualifiers are
      // erased) — require the user to alias them in subqueries.
      val keySet = keys.map(_.toLowerCase).toSet
      val dupes = (left.output.map(_.name) ++ right.output.map(_.name))
        .filterNot(n => keySet.contains(n.toLowerCase))
        .groupBy(_.toLowerCase).filter(_._2.size > 1).keys
      if (dupes.nonEmpty) throw new UnsupportedPlanException(
        s"join sides share non-key column name(s) ${dupes.mkString(", ")} — " +
          "alias them apart in subqueries for incremental mode")
      val l = walk(left, sources)
      val r = walk(right, sources)
      val inner = l.join(r, keys)
      joinType match {
        case _: InnerLike => inner
        // Outer joins follow the reference's construction (inner result ∪
        // null-padded unmatched side, CalciteToDBSPCompiler.java:665-747),
        // composed from circuit primitives so incrementality is inherited:
        // a retraction that removes a row's last match automatically flows
        // a retraction of the inner row and an insertion of the padded row.
        // Key columns use USING semantics (merged; coalesce of both sides).
        case LeftOuter =>
          inner union padUnmatched(l, r, keys, left.output, right.output)
        case RightOuter =>
          inner union padUnmatched(r, l, keys, right.output, left.output)
        case FullOuter =>
          inner union padUnmatched(l, r, keys, left.output, right.output) union
            padUnmatched(r, l, keys, right.output, left.output)
        // Semi/anti appear when compiling optimized plans (EXISTS/IN are
        // rewritten there); the reference throws Unimplemented for them
        // (:571-572) — we support them compositionally.
        case LeftSemi => l.semiJoin(r, keys)
        case LeftAnti => l.antiJoin(r, keys)
        case other => throw new UnsupportedPlanException(
          s"unsupported join type for incremental mode: $other")
      }

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
      // SQL UNION ALL is positional; the weighted union merges by name —
      // re-alias every branch to the first branch's column names.
      val names = children.head.output.map(_.name)
      children.map { child =>
        val branch = walk(child, sources)
        val renamed = child.output.map(_.name).zip(names).map {
          case (from, to) =>
            org.apache.spark.sql.functions.col(from).as(to)
        }
        branch.select(renamed: _*)
      }.reduce(_ union _)

    case Distinct(child) => walk(child, sources).distinct
    case Deduplicate(_, child) => walk(child, sources).distinct

    // Set ops follow the reference's circuits (visitMinus :492-519,
    // visitIntersect :809-853): EXCEPT = distinct(distinct(a) − distinct(b));
    // EXCEPT ALL = positive part of (a − b); INTERSECT = whole-row join of
    // the distincts (bilinear, weight 1·1).
    case Except(left, right, isAll) =>
      val l = walk(left, sources)
      val r = walk(right, sources).select(renameTo(right, left): _*)
      if (isAll) l.minus(r).positivePart
      else l.distinct.minus(r.distinct).distinct
    case Intersect(left, right, false) =>
      val names = left.output.map(_.name)
      walk(left, sources).distinct
        .join(walk(right, sources).distinct
          .select(renameTo(right, left): _*), names)

    // Views over views: inline the referenced view's plan into the circuit
    case v: View => walk(v.child, sources)

    // Aggregate-OVER windows (DBSPWindowAggregateOperator): a delta only
    // affects results inside its PARTITION BY groups, so the circuit
    // re-evaluates the window over touched partitions and retracts their
    // previous rows (Inc.windowAggregate). Requires a plain-column
    // partition spec; empty partition specs would re-evaluate everything.
    case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
      val partKeys = w.partitionSpec.map {
        case a: AttributeReference => a.name
        case other => throw new UnsupportedPlanException(
          s"incremental window PARTITION BY supports plain columns, got: $other")
      }
      if (partKeys.isEmpty) throw new UnsupportedPlanException(
        "incremental windows need a PARTITION BY (a global window re-evaluates all state)")
      val childCols = w.child.output.map(a =>
        org.apache.spark.sql.functions.col(a.name))
      val winCols = w.windowExpressions.map(toColumn)
      walk(w.child, sources).windowAggregate(partKeys) { rows =>
        rows.select(childCols ++ winCols: _*)
      }

    case other => throw new UnsupportedPlanException(
      s"unsupported plan node for incremental mode: ${other.nodeName}")
  }

  /** Positional re-aliasing of `from`'s columns to `to`'s names (binary
    * set ops are positional; the weighted union merges by name). */
  private def renameTo(from: LogicalPlan, to: LogicalPlan): Seq[Column] = {
    import org.apache.spark.sql.functions.col
    from.output.map(_.name).zip(to.output.map(_.name)).map {
      case (f, t) => col(f).as(t)
    }
  }

  /** Rows of `keep` with no join partner in `other`, padded with typed
    * NULLs for `other`'s non-key columns. matched = keep ⋈ distinct(π_k
    * other) — the bilinear join against a weight-1 key set preserves each
    * kept row's multiplicity, so keep − matched is exactly the unmatched
    * multiset. */
  private def padUnmatched(keep: Inc, other: Inc, keys: Seq[String],
                           keepOut: Seq[Attribute],
                           otherOut: Seq[Attribute]): Inc = {
    import org.apache.spark.sql.functions.{col, lit}
    val keyCols = keys.map(col)
    val otherKeys = other.select(keyCols: _*).distinct
    val matched = keep.join(otherKeys, keys)
    val unmatched = keep.minus(matched)
    val keySet = keys.map(_.toLowerCase).toSet
    val padded =
      keepOut.map(a => col(a.name)) ++
        otherOut.filterNot(a => keySet.contains(a.name.toLowerCase))
          .map(a => lit(null).cast(a.dataType).as(a.name))
    unmatched.select(padded: _*)
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
