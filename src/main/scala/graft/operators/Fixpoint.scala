package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Recursive-query evaluation: semi-naive least fixpoints under set
  * semantics (the DBSP paper's recursion story — a nested circuit iterated
  * to a fixed point; the reference repo itself has no recursive-query
  * support, so this is beyond-reference surface).
  *
  * Spark 4 executes `WITH RECURSIVE` natively (`UnionLoop`), which covers
  * SQL-text recursion; this operator is the DataFrame-level equivalent for
  * circuits and for callers that need set-semantics (cycle-safe) closure,
  * which UNION ALL recursion cannot express without a depth cap.
  *
  * Scale/shape notes:
  *  - The driver-side `while` is over ITERATIONS (graph diameter), not
  *    rows — each iteration is one distributed join + anti-join; this is
  *    the same structure GraphX/Pregel use. Work per iteration is
  *    O(|frontier| ⋈ |edges|), and the frontier only shrinks on real
  *    workloads (semi-naive: only NEW facts re-enter the step).
  *  - Every iteration's new-facts frame is persisted, materialized by the
  *    termination count, and re-anchored as a `LogicalRDD` leaf, so plan
  *    depth stays O(1) regardless of iteration count (without this the
  *    k-th iteration would nest k join trees and Catalyst planning blows
  *    up — the same wave-staging lesson as the incremental Runner).
  *  - Anti-joins use NULL-SAFE equality on every column: a NULL-bearing
  *    fact would never equal itself under `=` and the loop would not
  *    terminate.
  *  - Intermediates are unpersisted once the final closure is materialized;
  *    one cache entry (the result) survives, owned by the caller.
  */
object Fixpoint {

  /** Least fixpoint of `X = distinct(base ∪ step(X))` computed
    * semi-naively: only the previous iteration's NEW rows are fed to
    * `step`. `step` must be monotone (it is only ever applied to row sets,
    * never retracted). Rows are SET-semantics: duplicates are collapsed. */
  /** a \ b under set semantics, NULL-SAFE on every column (a NULL-bearing
    * row must equal itself or subtraction silently keeps it). */
  def setMinus(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = a.columns.toSeq
    val bb = b.toDF(cols.map(c => s"__r_$c"): _*)
    val cond = cols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    a.join(bb, cond, "left_anti")
  }

  def semiNaive(base: DataFrame, step: DataFrame => DataFrame,
                maxIters: Int = 10000): DataFrame = {
    val cols = base.columns.toSeq
    val chunks = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def settle(df: DataFrame): (DataFrame, Long) = {
      val p = df.persist()
      val n = p.count()
      chunks += p
      (GraftSqlBridge.reanchor(p), n)
    }
    var (total, frontier) = {
      val (t, _) = settle(base.dropDuplicates())
      (t, t)
    }
    var iters = 0
    var done = false
    while (!done && iters < maxIters) {
      val (fresh, n) =
        settle(setMinus(step(frontier).dropDuplicates().select(cols.map(col): _*),
          total))
      if (n == 0) done = true
      else { total = total.unionAll(fresh); frontier = fresh; iters += 1 }
    }
    if (!done) throw new IllegalStateException(
      s"fixpoint did not converge within $maxIters iterations")
    val out = total.persist()
    out.count()
    val anchored = GraftSqlBridge.reanchor(out)
    chunks.foreach(_.unpersist(false))
    anchored
  }

  /** Compose two binary relations: (a.src→a.dst) ∘ (b.src→b.dst) joined on
    * a.dst = b.src, yielding (a.src, b.dst). */
  def compose(a: DataFrame, b: DataFrame,
              src: String = "src", dst: String = "dst"): DataFrame =
    a.toDF(src, "__mid").join(b.toDF("__mid", dst), "__mid")
      .select(col(src), col(dst))

  /** Set-semantics transitive closure of an edge relation (columns
    * `src`, `dst`), cycle-safe. */
  def transitiveClosure(edges: DataFrame,
                        src: String = "src", dst: String = "dst"): DataFrame = {
    val e = edges.select(col(src), col(dst))
    semiNaive(e, frontier => compose(frontier, e, src, dst))
  }
}
