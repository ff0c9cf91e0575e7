package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's `private[sql]` Expression↔Column conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Used by
  * graft.engine.SqlIncremental to re-anchor analyzed-plan expressions onto
  * circuit DataFrames. Kept to exactly two forwarders so the internal API
  * surface we depend on stays auditable. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a catalyst Expression tree. The lazy
    * `expression` wrapper (ColumnNodeExpression) is only unwrapped at
    * Dataset API entry points; function-registry builders need the real
    * tree so the analyzer can resolve it in place. */
  def toExpressionTree(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Re-anchor a persisted + already-materialized DataFrame onto its
    * computed internal-row RDD as a `LogicalRDD` leaf (the same mechanism
    * `Dataset.checkpoint` uses — stats/partitioning/ordering carry over).
    * The returned frame has an O(1)-depth plan, so standing state that is
    * advanced by union every step stops growing the analyzer/optimizer's
    * per-step work. The ORIGINAL frame owns the cache entry: keep it
    * pinned until the re-anchored state is superseded.
    *
    * The anchored leaf's `originStats` are OVERWRITTEN with the cache
    * entry's ACTUAL built byte size when the frame is materialized:
    * `fromDataset` copies the source plan's optimizer estimate, which for
    * a delta plan derives from the full parquet inputs and inflates by
    * 100-1000× — every downstream size-driven decision (broadcast vs
    * sort-merge join selection against kilobyte deltas being the critical
    * one) then plans against fiction. Real bytes make Catalyst's own
    * JoinSelection do the right thing with no per-operator hints. */
  def reanchor(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    // Truncate the cached-buffer RDD's LINEAGE (localCheckpoint): anchoring
    // truncates the LOGICAL plan, but the buffers RDD still references the
    // physical RDD chain that computed it — which itself ends in earlier
    // anchored frames, so the object graph telescopes across waves and
    // steps and every task binary ships it (measured: 1.0-1.35 MB task
    // binaries by q160's step 3, java serialization of which showed up as
    // a top executor RUNNABLE frame). The blocks are already materialized;
    // localCheckpoint just drops the parent DAG at the next job boundary.
    // Trade (the one Spark documents for localCheckpoint): a LOST block is
    // a job failure instead of a recompute — with MEMORY_AND_DISK blocks
    // that takes an executor death, and deployments that would rather
    // recompute set spark.graft.incremental.anchorLocalCheckpoint=false.
    if (ds.sparkSession.conf.get(
        "spark.graft.incremental.anchorLocalCheckpoint", "true").toBoolean) {
      ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds).foreach {
        cd =>
          val b = cd.cachedRepresentation.cacheBuilder
          if (b.isCachedColumnBuffersLoaded) {
            val rdd = b.cachedColumnBuffers
            if (!rdd.isLocallyCheckpointed) rdd.localCheckpoint()
          }
      }
    }
    val lr = execution.LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
      isStreaming = false)
    val sized = cachedBuiltBytes(df) match {
      case Some(b) =>
        // Keep the constraints fromDataset derived from the source plan
        // (not-null inference, downstream filter pruning) while replacing
        // only the stats: recompute them the same way fromDataset does —
        // rewrite the optimized plan's constraints onto the leaf's fresh
        // output attributes. Passing None here silently dropped constraint
        // propagation from every anchored state/delta.
        val (_, constraints) = execution.LogicalRDD
          .rewriteStatsAndConstraints(lr, ds.queryExecution.optimizedPlan)
        lr.copy()(ds.sparkSession,
          Some(catalyst.plans.logical.Statistics(
            sizeInBytes = BigInt(math.max(b, 1L)))),
          constraints)
      case None => lr
    }
    classic.Dataset.ofRows(ds.sparkSession, sized)
  }

  /** Run `f` under a THREAD-LOCAL clone of the session's SQLConf with
    * `overrides` applied. Catalyst rules and physical planning read
    * `SQLConf.get` (thread-local-aware), and a Dataset's analysis /
    * optimization / job submission all happen on the calling thread, so
    * per-operator conf experiments (AQE off, sized shuffle partitions)
    * scoped this way never leak to concurrent queries on the same session
    * — unlike `spark.conf.set`, which mutates session-global state. `f`
    * receives the clone so iterative callers can re-tune it mid-loop. */
  def withScopedConf[T](spark: SparkSession, overrides: Map[String, String])
                       (f: internal.SQLConf => T): T = {
    val cloned = spark.asInstanceOf[classic.SparkSession].sessionState.conf.clone()
    overrides.foreach { case (k, v) => cloned.setConfString(k, v) }
    internal.SQLConf.withExistingConf(cloned)(f(cloned))
  }

  /** Fork the session: an independent-conf clone sharing the SparkContext
    * and cached data. Streaming fixtures use it to pin their own
    * shuffle-partition count for the life of a query — a `spark.conf.set`
    * on the shared session would transiently re-plan every concurrent
    * query, and `withScopedConf`'s thread-local clone does not reach the
    * streaming engine's micro-batch threads (the engine re-clones the
    * session the query was STARTED from, which is exactly what this
    * forwarder provides). */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** ACTUAL built byte size of a DataFrame's cache entry, read from the
    * CachedRDDBuilder's size accumulator — Some only when the frame is
    * cached AND its column buffers were materialized. `InMemoryRelation
    * .stats` falls back to the plan's OPTIMIZER estimate whenever the
    * loaded-buffers check misses, and a join-derived estimate can be off
    * by 1000× (a 3,000-row self-join delta estimating 149 MB) — poisoning
    * any byte-driven decision (local-kernel gating, step-width sizing)
    * fed from it. */
  def cachedBuiltBytes(df: DataFrame): Option[Long] = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds).collect {
      case cd if cd.cachedRepresentation.cacheBuilder.isCachedColumnBuffersLoaded =>
        cd.cachedRepresentation.cacheBuilder.sizeInBytesStats.value.longValue
    }
  }

  /** Register a session-scoped SQL function whose body is composed from
    * Column expressions (stays fully codegen'd — this is NOT a UDF). */
  def registerSqlFunction(spark: SparkSession, name: String,
                          build: Seq[Column] => Column): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name,
        exprs => toExpressionTree(build(exprs.map(column))), "internal")
}
