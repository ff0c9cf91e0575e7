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
  *  - The driver-side `while` is over ITERATIONS, not rows — each
  *    iteration is one distributed join + anti-join (the GraphX/Pregel
  *    structure). The step receives BOTH the frontier and the accumulated
  *    total, so closure-style callers can compose frontier×total — path
  *    DOUBLING, which converges in O(log diameter) iterations instead of
  *    O(diameter); on a 1000-hop chain that is 10 rounds, not 1000.
  *  - Iteration latency is dominated by fixed per-job cost, not data, so
  *    the loop sizes `spark.sql.shuffle.partitions` to the observed
  *    frontier/total row counts (1 partition for small graphs, growing
  *    toward the session setting for large ones) and plans non-adaptively
  *    — AQE's per-stage blocking rounds are pure overhead on plans over
  *    cached leaves whose sizes the loop already knows. Both settings are
  *    restored on exit.
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

  /** a \ b under set semantics, NULL-SAFE on every column (a NULL-bearing
    * row must equal itself or subtraction silently keeps it). */
  def setMinus(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = a.columns.toSeq
    val bb = b.toDF(cols.map(c => s"__r_$c"): _*)
    val cond = cols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    a.join(bb, cond, "left_anti")
  }

  /** Least fixpoint of `X = distinct(base ∪ step(frontier, X))` computed
    * semi-naively: `step` sees the previous iteration's NEW rows and the
    * accumulated total (compose against the total for doubling). `step`
    * must be monotone and must only derive facts that are valid
    * compositions of its inputs; every (frontier, total) combination is
    * eventually offered, so saturation implies closure. Rows are
    * SET-semantics: duplicates are collapsed. */
  def semiNaive(base: DataFrame,
                step: (DataFrame, DataFrame) => DataFrame,
                maxIters: Int = 10000): DataFrame =
    semiNaiveOwned(base, step, maxIters)._1

  /** As `semiNaive`, but also hands back the PERSISTED frame backing the
    * result so the caller can `unpersist` it once the result is consumed
    * (materialized downstream) — standing callers (the incremental closure
    * operator) would otherwise leak one cache entry per maintenance step.
    * Unpersisting is always safe for correctness: the anchored frame's RDD
    * lineage recomputes dropped blocks. */
  def semiNaiveOwned(base: DataFrame,
                     step: (DataFrame, DataFrame) => DataFrame,
                     maxIters: Int = 10000): (DataFrame, DataFrame) = {
    val spark = base.sparkSession
    val cols = base.columns.toSeq
    val chunks = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // AQE-off + frontier-sized shuffle partitions are scoped to THIS thread
    // via a cloned SQLConf (see GraftSqlBridge.withScopedConf) — concurrent
    // queries on the same session (parallel Runner waves, streaming
    // micro-batches) keep their own settings.
    GraftSqlBridge.withScopedConf(spark,
        Map("spark.sql.adaptive.enabled" -> "false")) { conf =>
      def settle(df: DataFrame): (DataFrame, Long) = {
        // MEMORY_AND_DISK explicitly: evicted iteration chunks must fall
        // back to disk, not recompute a k-deep lineage.
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = p.count()
        chunks += p
        (GraftSqlBridge.reanchor(p), n)
      }
      def sizeShuffle(rows: Long): Unit =
        conf.setConfString("spark.sql.shuffle.partitions",
          math.min(math.max(1L, rows / 250000L), sessionParts.toLong).toString)
      sizeShuffle(0L)
      var (total, frontier, totalRows) = {
        val (t, n) = settle(base.dropDuplicates())
        (t, t, n)
      }
      var iters = 0
      var done = false
      while (!done && iters < maxIters) {
        sizeShuffle(totalRows)
        val (fresh, n) = settle(setMinus(
          step(frontier, total).dropDuplicates().select(cols.map(col): _*),
          total))
        if (n == 0) done = true
        else {
          total = total.unionAll(fresh); frontier = fresh
          totalRows += n; iters += 1
        }
      }
      if (!done) throw new IllegalStateException(
        s"fixpoint did not converge within $maxIters iterations")
      sizeShuffle(totalRows)
      val out = total.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      val anchored = GraftSqlBridge.reanchor(out)
      chunks.foreach(_.unpersist(false))
      (anchored, out)
    }
  }

  /** Compose two binary relations: (a.src→a.dst) ∘ (b.src→b.dst) joined on
    * a.dst = b.src, yielding (a.src, b.dst). */
  def compose(a: DataFrame, b: DataFrame,
              src: String = "src", dst: String = "dst"): DataFrame =
    a.toDF(src, "__mid").join(b.toDF("__mid", dst), "__mid")
      .select(col(src), col(dst))

  /** Set-semantics transitive closure of an edge relation (columns
    * `src`, `dst`), cycle-safe. Doubling composition (frontier×total both
    * ways) converges in O(log diameter) iterations. */
  def transitiveClosure(edges: DataFrame,
                        src: String = "src", dst: String = "dst"): DataFrame =
    transitiveClosureOwned(edges, src, dst)._1

  /** As `transitiveClosure`, but hands back the persisted backing frame for
    * caller-side release (see `semiNaiveOwned`). */
  def transitiveClosureOwned(edges: DataFrame, src: String = "src",
                             dst: String = "dst"): (DataFrame, DataFrame) = {
    val e = edges.select(col(src), col(dst))
    semiNaiveOwned(e, (frontier, total) =>
      compose(frontier, total, src, dst)
        .unionAll(compose(total, frontier, src, dst)))
  }
}
