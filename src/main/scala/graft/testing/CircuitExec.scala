package graft.testing

import graft.engine.SqlIncremental
import graft.zset.ZSet
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, NullsFirst, NullsLast, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Offset, Sort}
import org.apache.spark.sql.GraftSqlBridge

/** Shared SLT query executor that routes records through the circuit
  * compiler — the cross-check harness behind SltRunnerSpec's grammar
  * test and the SltEngineAudit tool.
  *
  * A circuit's output is an unordered Z-set, so ORDER BY needs care:
  *  - rowsort/valuesort records are sorted by the harness before
  *    comparing — the circuit result is used directly;
  *  - nosort records with ORDER BY need exact row order. The ORDER is
  *    PRESENTATION, not semantics (the reference compiles ORDER BY as a
  *    final presentation node too): the circuit computes the semantic
  *    result (including ORDER BY ... LIMIT top-k views, whose row SET
  *    depends on the order), and the record's own top-level sort is
  *    re-applied over the circuit output. When the sort references
  *    columns outside the output (Spark widens the projection for
  *    those), the caller falls back to spark.sql.
  */
object CircuitExec {

  /** Eval-time analysis failures: compile() ACCEPTED the plan but a
    * rebuilt fragment failed re-analysis inside batch()/collect(). These
    * are mis-rebuilt plans, not sound-boundary rejects — they still fall
    * back so the record verifies, but they're counted separately so the
    * cross-check spec can assert the count stays at zero instead of
    * letting a targeted lowering regression hide in the fallback bucket
    * (only the aggregate per-family floor would catch it otherwise). */
  private val evalFailureCount = new java.util.concurrent.atomic.AtomicLong
  def evalFailures: Long = evalFailureCount.get
  def resetEvalFailures(): Unit = evalFailureCount.set(0L)

  /** Try to evaluate one SLT query record through the circuit compiler.
    * None = this record needs a spark.sql fallback (unsupported shape,
    * or a nosort ORDER BY whose keys aren't in the output). Throws
    * nothing: compile/analysis errors surface as None. */
  def tryEngine(s: SparkSession, q: String, srcs: Set[String],
                order: SltHash.SortOrder): Option[Seq[Row]] = {
    val needsOrder = order == SltHash.NoSort &&
      "(?i)\\bORDER\\s+BY\\b".r.findFirstIn(q).isDefined
    val presentation: Option[Seq[Column]] =
      if (!needsOrder) Some(Nil)
      else topSortCols(s.sql(q).queryExecution.analyzed)
    presentation.flatMap { sortCols =>
      // Compile and eval fail SEPARATELY: an UnsupportedPlanException or
      // AnalysisException at compile time is a sound-boundary reject; an
      // AnalysisException during batch()/collect() (rebuilt fragments
      // re-analyze lazily) is a mis-rebuilt plan and bumps evalFailures
      // before falling back, so the spec can pin that count to zero.
      val compiled =
        try Some(SqlIncremental.compile(s, q, srcs))
        catch {
          case _: SqlIncremental.UnsupportedPlanException => None
          case _: org.apache.spark.sql.AnalysisException => None
        }
      compiled.flatMap { inc =>
        try {
          val in = srcs.map(n => n -> ZSet.fromRows(s.table(n))).toMap
          val out = ZSet.toRows(ZSet.consolidate(inc.batch(in)))
          val ordered = if (sortCols.isEmpty) out else out.sort(sortCols: _*)
          Some(ordered.collect().toSeq)
        } catch {
          case _: org.apache.spark.sql.AnalysisException =>
            evalFailureCount.incrementAndGet(); None
        }
      }
    }
  }

  /** The record's top-level presentation sort, as columns over the
    * OUTPUT schema — None when the sort keys reference columns Spark had
    * to widen the projection for (they aren't in the circuit output). */
  private def topSortCols(p: LogicalPlan): Option[Seq[Column]] = {
    def top(p: LogicalPlan): Option[Sort] = p match {
      case s: Sort => Some(s)
      case GlobalLimit(_, child) => top(child)
      case LocalLimit(_, child) => top(child)
      case Offset(_, child) => top(child)
      case _ => None
    }
    top(p).flatMap { s =>
      val outNames = s.child.output.map(_.name.toLowerCase).toSet
      val ok = s.order.forall(_.references.forall(a =>
        outNames.contains(a.name.toLowerCase)))
      if (!ok) None
      else Some(s.order.map(toSortColumn))
    }
  }

  private def toSortColumn(so: SortOrder): Column = {
    val base = GraftSqlBridge.column(so.child.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
    (so.direction, so.nullOrdering) match {
      case (Ascending, NullsFirst)  => base.asc_nulls_first
      case (Ascending, NullsLast)   => base.asc_nulls_last
      case (Descending, NullsFirst) => base.desc_nulls_first
      case (Descending, NullsLast)  => base.desc_nulls_last
    }
  }
}
