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

  /** Driver-side SMALL-REGIME kernel. Iterative fixpoints at test/delta
    * scale are bound by fixed per-job cost (~0.3-0.7 s × O(log diameter)
    * iterations — measured, see PROGRESS), not by data; below a size bound
    * the whole reduction is cheaper on one core than as a job cascade.
    * This is the same decision Spark itself makes when it collects a small
    * join side to the driver for broadcast (autoBroadcastJoinThreshold),
    * applied to recursion. The distributed semi-naive loop remains the
    * ONLY path above the bound — `semiNaive` returns None the moment the
    * working set outgrows the cap and callers resume distributed, so the
    * bound limits MEMORY, never the answer. */
  private[graft] object Local {
    type Rel = Set[(Any, Any)]

    /** Inner-join composition with SQL `=` key semantics: NULL keys never
      * match (mirrors the distributed `compose`'s equi-join). */
    def compose(a: Rel, b: Rel): Rel = {
      val ix = new scala.collection.mutable.HashMap[Any, List[Any]]()
      b.foreach { case (s, d) => if (s != null) ix(s) = d :: ix.getOrElse(s, Nil) }
      val out = Set.newBuilder[(Any, Any)]
      a.foreach { case (s, m) =>
        if (m != null) ix.getOrElse(m, Nil).foreach(d => out += ((s, d)))
      }
      out.result()
    }

    /** Semi-naive least fixpoint of `X = base ∪ step(frontier, X)`; None
      * when the total outgrows `cap` (caller falls back to the distributed
      * loop). Scala value equality matches the distributed loop's
      * NULL-SAFE row equality. */
    def semiNaive(base: Rel, step: (Rel, Rel) => Rel,
                  cap: Long): Option[Rel] = {
      var total = base
      var frontier = base
      while (frontier.nonEmpty) {
        if (total.size > cap) return None
        val fresh = step(frontier, total) diff total
        total = total union fresh
        frontier = fresh
      }
      Some(total)
    }

    /** Set-semantics transitive closure (doubling step). */
    def closure(edges: Rel, cap: Long): Option[Rel] =
      semiNaive(edges,
        (f, t) => compose(f, t) union compose(t, f), cap)

    /** Collected pair view of a 2-column DataFrame. */
    def pairs(rows: Array[org.apache.spark.sql.Row]): Rel =
      rows.iterator.map(r => (r.get(0), r.get(1))).toSet

    /** Pair set back to a DataFrame under the given 2-column schema (a
      * LocalRelation — broadcast-free to join against, O(1) to anchor). */
    def toDF(spark: org.apache.spark.sql.SparkSession, rel: Rel,
             schema: org.apache.spark.sql.types.StructType): DataFrame = {
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(rel.toSeq.map { case (a, b) =>
          org.apache.spark.sql.Row(a, b)
        }: _*)
      spark.createDataFrame(rows, schema)
    }

    /** Row cap derived from the session's local-regime byte bound (pairs
      * of two 8-byte-ish values + set overhead ≈ 32 B each). */
    def capRows(spark: org.apache.spark.sql.SparkSession): Long =
      maxBytes(spark) / 32L

    def maxBytes(spark: org.apache.spark.sql.SparkSession): Long =
      spark.conf.get("graft.closure.localMaxBytes", (64L << 20).toString).toLong
  }

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
                     maxIters: Int = 10000,
                     localStep: Option[(Local.Rel, Local.Rel) => Local.Rel] = None)
      : (DataFrame, DataFrame) = {
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
      val debug = sys.env.contains("GRAFT_STEP_DEBUG")
      sizeShuffle(0L)
      var (total, frontier, totalRows) = {
        val t0 = System.nanoTime()
        val (t, n) = settle(base.dropDuplicates())
        if (debug) println(
          f"FIXITER base  rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        (t, t, n)
      }
      // Small regime: the base is already settled (size known, cached) —
      // run the whole fixpoint as one driver kernel when it and a
      // conservative 2× growth margin fit the local bound. Falls through
      // to the distributed loop untouched when the kernel overflows.
      val localResult: Option[Local.Rel] =
        if (localStep.isDefined && cols.size == 2 &&
            totalRows <= Local.capRows(spark) / 2) {
          val t0 = System.nanoTime()
          val r = Local.semiNaive(Local.pairs(total.collect()),
            localStep.get, Local.capRows(spark))
          if (debug) r match {
            case Some(res) => println(
              f"FIXITER local rows=${res.size}%-8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
            case None => println("FIXITER local-overflow -> distributed")
          }
          r
        } else None
      if (localResult.isDefined) {
        val out = Local.toDF(spark, localResult.get, base.schema)
        chunks.foreach(_.unpersist(false))
        (out, out)
      } else {
      var iters = 0
      var done = false
      while (!done && iters < maxIters) {
        sizeShuffle(totalRows)
        val t0 = System.nanoTime()
        val (fresh, n) = settle(setMinus(
          step(frontier, total).dropDuplicates().select(cols.map(col): _*),
          total))
        if (debug) println(
          f"FIXITER it=$iters%-3d rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
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
        .unionAll(compose(total, frontier, src, dst)),
      localStep =
        Some((f, t) => Local.compose(f, t) union Local.compose(t, f)))
  }
}
