package graft.streaming

import graft.zset.ZSet
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over weighted-delta DataFrames — the
  * reference's distinctive layer (§4.2 of SURVEY.md).
  *
  * The reference incrementalizes a circuit by wrapping sources in I
  * (integrate) and sinks in D (differentiate)
  * (backend/optimize/IncrementalizeVisitor.java:35-63), then pushes the
  * integrals through **linear** operators unchanged and replaces I∘op with
  * dedicated incremental operators for the non-linear ones
  * (OptimizeIncrementalVisitor.java:37-178: join :96-108, distinct :139-149,
  * aggregate :152-164). We implement the same algebra directly:
  *
  *  - linear ops (map/filter/negate/union/minus): delta in → delta out;
  *  - bilinear join: Δ(A⋈B) = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB
  *    (DBSPIncrementalJoinOperator.java:35);
  *  - aggregate / distinct: re-fold only the groups touched by the delta
  *    against integrated state, emitting retractions of their previous
  *    results (DBSPIncrementalAggregateOperator.java:35,
  *    DBSPIncrementalDistinctOperator.java:31). Negative weights can shrink
  *    MIN/MAX, so re-folding affected groups — not streaming accumulation —
  *    is the only correct general strategy (SURVEY §7.4 risk 2).
  *
  * A node is (batch, delta): `batch` evaluates the operator over full
  * integrated inputs; `delta` produces the output delta for one step given
  * the *pre-step* integrated inputs and the step's input deltas. Batch ≡
  * incremental equivalence (the reference's NaiveIncrementalTests.java:35
  * axis) then holds by construction and is asserted in
  * IncrementalEquivalenceSpec.
  *
  * Scale: each step's work is O(|delta| + touched groups), never O(state).
  * State lives in consolidated Z-set DataFrames; on a cluster these would be
  * checkpointed tables (Delta/parquet) merged per micro-batch via
  * foreachBatch — here they are persisted DataFrames, re-consolidated each
  * step so lineage stays O(1) deep.
  */
object Incremental {

  type Inputs = Map[String, DataFrame] // name → Z-set (weighted)

  /** A circuit node: full-recompute semantics + per-step delta semantics. */
  final case class Inc(
      batch: Inputs => DataFrame,
      delta: (Inputs, Inputs) => DataFrame) {

    /** Linear unary op lifted to both modes (map/filter/negate/…). */
    def linear(f: DataFrame => DataFrame): Inc =
      Inc(in => f(batch(in)), (i, d) => f(delta(i, d)))

    def select(exprs: Column*): Inc = linear(ZSet.map(_)(exprs: _*))
    def where(cond: Column): Inc = linear(_.filter(cond))
    def negate: Inc = linear(ZSet.negate)

    /** Weighted union (n-ary sum operator is linear). */
    def union(other: Inc): Inc = Inc(
      in => ZSet.plus(batch(in), other.batch(in)),
      (i, d) => ZSet.plus(delta(i, d), other.delta(i, d)))

    def minus(other: Inc): Inc = union(other.negate)

    /** Bilinear incremental equi-join:
      * Δ(A⋈B) = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB. */
    def join(other: Inc, keys: Seq[String]): Inc = Inc(
      in => ZSet.join(batch(in), other.batch(in), keys),
      (i, d) => {
        val a = batch(i); val b = other.batch(i)
        val da = delta(i, d); val db = other.delta(i, d)
        ZSet.plus(
          ZSet.join(da, b, keys),
          ZSet.join(a, db, keys),
          ZSet.join(da, db, keys))
      })

    /** Incremental grouped aggregate: re-fold only groups present in the
      * delta; emit (new result) − (old result) for those groups. */
    def aggregate(keys: Seq[String], aggs: (String, Column)*): Inc = Inc(
      in => ZSet.fromRows(ZSet.aggregate(batch(in), keys, aggs: _*)),
      (i, d) => {
        val oldChild = batch(i)
        val dChild = delta(i, d)
        val newChild = ZSet.plus(oldChild, dChild)
        val touched = dChild.select(keys.map(col): _*).distinct()
        def refold(child: DataFrame) =
          ZSet.aggregate(
            Incremental.touchedOnly(child, touched, keys),
            keys, aggs: _*)
        ZSet.minus(
          ZSet.fromRows(refold(newChild)),
          ZSet.fromRows(refold(oldChild)))
      })

    /** Incremental SEMI join: rows of this side with ≥1 match in `other`
      * — the bilinear join against other's distinct key set, which
      * preserves this side's multiplicities (SEMI/ANTI are how Calcite
      * lowers EXISTS/IN upstream of the reference, which itself throws
      * Unimplemented for them — CalciteToDBSPCompiler.java:571-572; we
      * support them compositionally). */
    def semiJoin(other: Inc, keys: Seq[String]): Inc = {
      import org.apache.spark.sql.functions.col
      join(other.select(keys.map(col): _*).distinct, keys)
    }

    /** Incremental ANTI join: this side minus its semi join. */
    def antiJoin(other: Inc, keys: Seq[String]): Inc =
      minus(semiJoin(other, keys))

    /** Incremental grouped aggregate over *expanded* rows: consolidates
      * state, expands weights back to row multiplicity, and applies plain
      * Spark aggregate columns — so ANY aggregate function (MIN/MAX/AVG/
      * percentiles/…) is exact under retractions, at the cost of the
      * expansion. Only groups touched by the delta are re-folded.
      * `outOrder` fixes the output column order (keys and aggregates as
      * the original query listed them). */
    def aggregateRows(keys: Seq[String], aggCols: Seq[Column],
                      outOrder: Seq[String]): Inc = {
      require(keys.nonEmpty, "aggregateRows needs grouping keys")
      def fold(child: DataFrame): DataFrame = {
        val rows = ZSet.toRows(ZSet.consolidate(child))
        rows.groupBy(keys.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
          .select(outOrder.map(col): _*)
      }
      Inc(
        in => ZSet.fromRows(fold(batch(in))),
        (i, d) => {
          val oldChild = batch(i)
          val dChild = delta(i, d)
          val touched = dChild.select(keys.map(col): _*).distinct()
          def out(child: DataFrame) = ZSet.fromRows(fold(
            Incremental.touchedOnly(child, touched, keys)))
          ZSet.minus(out(ZSet.plus(oldChild, dChild)), out(oldChild))
        })
    }

    /** Incremental GLOBAL aggregate (no grouping keys). The single group is
      * touched by every delta, so each step re-folds the whole consolidated
      * state — the cost a global standing aggregate fundamentally has under
      * arbitrary retractions (MIN/MAX can shrink). Empty input emits the
      * SQL zero row (COUNT=0, SUM=NULL): Spark's global `groupBy().agg`
      * does this natively, which is the reference's empty-input correction
      * circuit — constant zero row + retraction when the first row arrives
      * (CalciteToDBSPCompiler.java:349-381) — expressed as a re-fold. The
      * Runner seeds the output integral with Q(∅) so the integral of
      * deltas telescopes to Q(state). */
    def aggregateRowsGlobal(aggCols: Seq[Column], outOrder: Seq[String]): Inc = {
      def fold(child: DataFrame): DataFrame =
        ZSet.toRows(ZSet.consolidate(child))
          .groupBy()
          .agg(aggCols.head, aggCols.tail: _*)
          .select(outOrder.map(col): _*)
      Inc(
        in => ZSet.fromRows(fold(batch(in))),
        (i, d) => {
          val oldChild = batch(i)
          ZSet.minus(
            ZSet.fromRows(fold(ZSet.plus(oldChild, delta(i, d)))),
            ZSet.fromRows(fold(oldChild)))
        })
    }

    /** Whole-state re-evaluation: compute `eval` over the consolidated new
      * state and retract the previous evaluation. The per-step cost is one
      * `eval` over state ×2 — only correct to use for operators whose
      * output is a small function of the whole input, e.g. ORDER BY/LIMIT
      * top-k (the reference re-aggregates sorts into a sorted Vec the same
      * way, visitSort :980-1048). At scale the eval is TakeOrdered-shaped:
      * a scan + per-partition top-k + k-row reduce, no full sort. */
    def reevaluate(eval: DataFrame => DataFrame): Inc = Inc(
      in => ZSet.fromRows(eval(ZSet.toRows(ZSet.consolidate(batch(in))))),
      (i, d) => {
        val oldChild = batch(i)
        def out(child: DataFrame) =
          ZSet.fromRows(eval(ZSet.toRows(ZSet.consolidate(child))))
        ZSet.minus(out(ZSet.plus(oldChild, delta(i, d))), out(oldChild))
      })

    /** Incremental partitioned window aggregate
      * (DBSPWindowAggregateOperator.java:34-39 participates in incremental
      * circuits via OptimizeIncrementalVisitor:53-93): a delta only
      * changes results inside the partitions it touches, so re-evaluate
      * the window over those partitions of the new state and retract
      * their previous results. Cost per step: O(touched partitions), not
      * O(state). `eval` receives the consolidated positive rows of the
      * child and must return one result row per input row. */
    def windowAggregate(partitionKeys: Seq[String])
                       (eval: DataFrame => DataFrame): Inc = Inc(
      in => ZSet.fromRows(eval(ZSet.toRows(ZSet.consolidate(batch(in))))),
      (i, d) => {
        val oldChild = batch(i)
        val dChild = delta(i, d)
        val touched = dChild.select(partitionKeys.map(col): _*).distinct()
        def out(child: DataFrame) =
          ZSet.fromRows(eval(ZSet.toRows(ZSet.consolidate(
            Incremental.touchedOnly(child, touched, partitionKeys)))))
        ZSet.minus(out(ZSet.plus(oldChild, dChild)), out(oldChild))
      })

    /** Nonlinear per-row re-evaluation shared by distinct and positive
      * part: re-derive only the rows the delta touches, retract their
      * previous derivation. */
    private def rowRefold(derive: DataFrame => DataFrame): Inc = Inc(
      in => derive(batch(in)),
      (i, d) => {
        val oldChild = batch(i)
        val dChild = delta(i, d)
        val names = dChild.columns.filterNot(_ == ZSet.W).toSeq
        val touched = dChild.select(names.map(col): _*).distinct()
        def out(child: DataFrame) =
          derive(Incremental.touchedOnly(child, touched, names))
        ZSet.minus(out(ZSet.plus(oldChild, dChild)), out(oldChild))
      })

    /** Incremental distinct: re-evaluate presence only for touched rows. */
    def distinct: Inc = rowRefold(ZSet.distinct)

    /** Incremental positive part (EXCEPT ALL's clamp): max(0, w) copies of
      * each touched row survive. */
    def positivePart: Inc = rowRefold(ZSet.positive)
  }

  /** Input node: its delta is the step's delta for `name`; its batch value
    * is the integral of everything fed so far. */
  def source(name: String): Inc = Inc(
    in => in(name),
    (_, d) => d(name))

  /** Restrict `child` to rows whose key columns match a touched-key row,
    * with NULL-SAFE equality: grouping treats NULL as a value (a rollup
    * subtotal or a nullable GROUP BY key), so the filter must too — a
    * plain equi semi-join would silently drop NULL-keyed groups from
    * every re-fold. */
  private def touchedOnly(child: DataFrame, touched: DataFrame,
                          keys: Seq[String]): DataFrame = {
    val t = touched.toDF(keys.map(k => s"__t_$k"): _*)
    val cond = keys.map(k => col(k) <=> col(s"__t_$k")).reduce(_ && _)
    child.join(broadcastIfSmall(t), cond, "left_semi")
  }

  /** Broadcast the touched-key list only when the optimizer can prove it
    * small. A per-micro-batch delta usually is; a catch-up delta touching
    * most of the key domain is not, and a forced `broadcast()` of it OOMs
    * the driver at scale. We consult Catalyst's plan-size estimate (zero
    * extra jobs; conservative — join-derived estimates inflate, which errs
    * toward NOT forcing) and otherwise leave the join unhinted so AQE can
    * still pick a broadcast at runtime from actual shuffle sizes. */
  private def broadcastIfSmall(df: DataFrame): DataFrame = {
    val threshold = {
      val t = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      if (t > 0) t else 10L << 20
    }
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= threshold) broadcast(df) else df
  }

  /** Step-driver: integrates input deltas and the output stream, asserting
    * the DBSP contract out = D(Q(I(in))). Used by tests and as the v1
    * runtime for incremental views.
    *
    * State maintenance is adaptive: each step appends the delta as a union
    * (no shuffle) and weights merge downstream wherever state is consumed.
    * A full consolidation — the only shuffling O(state) operation — runs
    * when the lazily-unioned row count exceeds twice the last consolidated
    * base (so a stream of small deltas consolidates rarely, while catch-up
    * deltas comparable to the state consolidate before the next re-fold
    * reads them), or every `consolidateEvery` steps as a lineage bound —
    * mirroring DBSP's background trace merges. Each new state is
    * materialized into the block cache and its superseded predecessor is
    * unpersisted, so storage memory stays O(current state) instead of
    * growing linearly with step count. */
  final class Runner(spark: SparkSession, query: Inc,
                     schemas: Map[String, DataFrame],
                     consolidateEvery: Int = 8) {
    /** Integrated inputs (lazily-unioned Z-sets). */
    private var integrated: Inputs =
      schemas.map { case (n, df) => n -> ZSet.fromRows(df.limit(0)) }
    /** Integrated output, seeded with Q(∅): for most queries that is the
      * empty Z-set, but a global aggregate's Q(∅) is the zero row
      * (COUNT=0, SUM=NULL) — the reference's empty-input correction
      * (CalciteToDBSPCompiler.java:349-381). Seeding makes the integral of
      * per-step deltas telescope to Q(state) exactly. */
    private var outState: Option[DataFrame] = Some(query.batch(integrated))
    private var steps = 0
    /** Row count of each state at its last consolidation. */
    private val baseRows = scala.collection.mutable.Map.empty[String, Long]

    /** Persist + materialize the advanced state; consolidate if the lazy
      * union has outgrown its consolidated base; release the predecessor. */
    private def advance(name: String, z: DataFrame, compact: Boolean,
                        superseded: Option[DataFrame]): DataFrame = {
      val lazyState = z.persist()
      val rows = lazyState.count() // narrow scan: cached parent + delta
      val result =
        if (compact || rows > 2L * math.max(baseRows.getOrElse(name, 0L), 1L)) {
          val c = ZSet.consolidate(lazyState).persist()
          baseRows(name) = c.count()
          lazyState.unpersist(false)
          c
        } else lazyState
      superseded.foreach(_.unpersist(false))
      result
    }

    /** Feed one step of input deltas (weighted); returns the output delta. */
    def step(deltas: Inputs): DataFrame = {
      val full = integrated.map { case (n, z) =>
        n -> deltas.getOrElse(n, z.limit(0))
      }
      val d = query.delta(integrated, full).persist()
      steps += 1
      val compact = steps % consolidateEvery == 0
      // Advance the output FIRST: its count materializes d (which reads the
      // pre-step input states) into the cache, so the input advances below
      // can safely unpersist those superseded states — and the separate
      // `d.count()` barrier a naive protocol pays is free.
      outState = Some(advance("__out", outState match {
        case Some(o) => ZSet.plus(o, d)
        case None    => d
      }, compact, outState))
      integrated = integrated.map { case (n, z) =>
        n -> advance(n, ZSet.plus(z, full(n)), compact, Some(z))
      }
      d
    }

    /** Integral of all output deltas so far, including the Q(∅) seed
      * (weights merged lazily by the consumer — wrap in ZSet.consolidate
      * for canonical rows). */
    def output: DataFrame = outState.get

    /** Persist consolidated state to parquet so maintenance can resume in
      * a later session/process — the durable-state-table shape a cluster
      * deployment uses (checkpoint per micro-batch via foreachBatch).
      *
      * Each table is written to a temp dir and swapped in, and the live
      * state is re-anchored onto the freshly written files: after a
      * restore, the state's lineage points INTO the checkpoint dir, and
      * overwriting files that lazy plans still reference would re-apply
      * the step's delta on any cache miss. Re-anchoring also cuts the
      * lineage to any foreachBatch micro-batch DataFrame, which is only
      * valid during its batch. */
    def checkpoint(dir: String): Unit = {
      def writeSwap(df: DataFrame, dest: String): Unit = {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val tmp = new org.apache.hadoop.fs.Path(dest + ".tmp")
        df.write.mode("overwrite").parquet(tmp.toString)
        val d = new org.apache.hadoop.fs.Path(dest)
        fs.delete(d, true)
        fs.rename(tmp, d)
      }
      integrated.foreach { case (n, z) =>
        writeSwap(ZSet.consolidate(z), s"$dir/in_$n")
      }
      writeSwap(ZSet.consolidate(output), s"$dir/out")
      val superseded = integrated.values.toSeq ++ outState.toSeq
      integrated = integrated.map { case (n, _) =>
        n -> spark.read.parquet(s"$dir/in_$n")
      }
      outState = Some(spark.read.parquet(s"$dir/out"))
      baseRows.clear()
      superseded.foreach(_.unpersist(false))
    }

    /** Resume from a checkpoint written by `checkpoint`. */
    def restore(dir: String): Unit = {
      integrated = integrated.map { case (n, _) =>
        n -> spark.read.parquet(s"$dir/in_$n")
      }
      outState = Some(spark.read.parquet(s"$dir/out"))
      steps = 0
    }

    /** Full recompute over the integrated inputs — the equivalence oracle. */
    def recompute: DataFrame = ZSet.consolidate(query.batch(integrated))
  }
}
