package graft.streaming

import graft.operators.Fixpoint
import graft.zset.ZSet
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Incremental view maintenance over weighted-delta DataFrames — the
  * reference's distinctive layer (§4.2 of SURVEY.md).
  *
  * The reference incrementalizes a circuit by wrapping sources in I
  * (integrate) and sinks in D (differentiate)
  * (backend/optimize/IncrementalizeVisitor.java:35-63), then pushes the
  * integrals through **linear** operators unchanged and replaces I∘op with
  * dedicated *stateful* incremental operators for the non-linear ones
  * (OptimizeIncrementalVisitor.java:37-178: join :96-108, distinct :139-149,
  * aggregate :152-164). Each such operator owns a stored **trace** — the
  * integral of its own output stream (DBSPIntegralOperator.java:31; the DBSP
  * runtime keeps a trace per join/aggregate/distinct operator). We implement
  * the same algebra AND the same state model:
  *
  *  - linear ops (map/filter/negate/union/minus): delta in → delta out,
  *    stateless;
  *  - bilinear join: Δ(A⋈B) = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB
  *    (DBSPIncrementalJoinOperator.java:35) — A and B read from stored
  *    traces, never re-derived;
  *  - aggregate / distinct / top-k / window: re-fold only the groups touched
  *    by the delta against the child's stored trace, and retract those
  *    groups' previous results by reading them from the operator's OWN
  *    output trace (DBSPIncrementalAggregateOperator.java:35,
  *    DBSPIncrementalDistinctOperator.java:31) — so neither the old child
  *    state nor the old results are recomputed. Negative weights can shrink
  *    MIN/MAX, so re-folding affected groups — not streaming accumulation —
  *    remains the only correct general strategy (SURVEY §7.4 risk 2).
  *
  * A circuit is a DAG of `Inc` nodes. Each node exposes `batch` (full
  * recompute over integrated inputs — the equivalence oracle) and a per-step
  * `deltaEval` evaluated inside a `StepCtx` that memoizes every node's delta
  * (shared sub-circuits are computed once per step) and serves pre-step
  * values from the Runner's stored traces. Batch ≡ incremental equivalence
  * (the reference's NaiveIncrementalTests.java:35 axis) holds by induction —
  * trace(X) after k steps telescopes to X.batch(integrated inputs) — and is
  * asserted in IncrementalEquivalenceSpec.
  *
  * Scale: each step's work is O(|delta| + touched groups), never O(state).
  * State (input integrals + operator traces) lives in consolidated Z-set
  * DataFrames; on a cluster these are checkpointed tables (Delta/parquet)
  * merged per micro-batch via foreachBatch — here they are persisted
  * DataFrames, re-consolidated adaptively so lineage stays O(1) deep. One
  * Runner maintains N sink views over ONE set of input integrals and shared
  * traces — the reference's multi-view catalogs (MultiViewTests; a circuit
  * registers many output handles).
  */
object Incremental {

  type Inputs = Map[String, DataFrame] // name → Z-set (weighted)

  /** Overflow-saturating add for byte estimates. */
  private[streaming] def satAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (((a ^ s) & (b ^ s)) < 0L) Long.MaxValue else s
  }

  /** Per-step evaluation context: pre-step input integrals, the step's
    * input deltas, the Runner's stored traces, and a per-node delta memo so
    * shared sub-circuits contribute one computation per step. */
  final class StepCtx private[streaming] (
      pre: Inputs,
      stepDeltas: Inputs,
      trace: Long => Option[DataFrame],
      traceBytesOf: Long => Long = _ => Long.MaxValue,
      childBytesOf: Inc => Long = _ => Long.MaxValue,
      untouched: Inc => Boolean = _ => false,
      deltaSchemaOf: mutable.LongMap[org.apache.spark.sql.types.StructType] =
        mutable.LongMap.empty,
      onRescanGroups: Long => Unit = _ => ()) {
    /** Report how many groups a TopKInc node fully re-scored this step —
      * routed to the OWNING Runner's counter (a JVM-global here would be
      * clobbered by concurrent Runners in other queries/specs). */
    private[streaming] def recordRescanGroups(n: Long): Unit = onRescanGroups(n)
    /** Conservative byte estimate of a node's stored trace (the Runner's
      * size bookkeeping; Long.MaxValue when unknown) — drives small-regime
      * decisions (ClosureInc's driver kernel). */
    private[streaming] def traceBytes(id: Long): Long = traceBytesOf(id)
    /** Conservative byte estimate of the integrals + this step's deltas of
      * every source below `n`. */
    private[streaming] def childBytes(n: Inc): Long = childBytesOf(n)
    private val memo = mutable.LongMap.empty[DataFrame]
    private val deferred = mutable.ArrayBuffer.empty[DataFrame]
    /** Register a persisted helper frame (e.g. an eager fixpoint's backing
      * cache) for release once this step's waves are all materialized —
      * the Runner unpersists them at end of step. Safe: every consumer is
      * by then an anchored cache entry whose RDD lineage can recompute. */
    private[streaming] def releaseAfterStep(df: DataFrame): Unit = deferred += df
    private[streaming] def drainDeferred(): Seq[DataFrame] = {
      val r = deferred.toSeq; deferred.clear(); r
    }
    private[streaming] def inputValue(name: String): DataFrame = pre(name)
    private[streaming] def inputDelta(name: String): DataFrame = stepDeltas(name)
    private[streaming] def deltaOf(n: Inc): DataFrame =
      memo.getOrElseUpdate(n.id, {
        // A node fed by NO source this step touches has the zero Z-set as
        // its delta (the Runner's wave scheduling already relies on this).
        // Hand parents an O(1) empty LocalRelation instead of the node's
        // delta tree: otherwise Catalyst re-analyzes and re-prunes the
        // whole dead subtree inside EVERY referencing plan, and a bilinear
        // join embeds it twice. The node's delta schema is computed once
        // ever (Runner-cached across steps) from a plan whose children are
        // themselves empty leaves, so even that analysis is shallow.
        if (untouched(n)) {
          val schema = deltaSchemaOf.getOrElseUpdate(n.id, n.deltaEval(this).schema)
          pre.headOption.orElse(stepDeltas.headOption) match {
            case Some((_, anyDf)) =>
              anyDf.sparkSession.createDataFrame(
                java.util.Collections.emptyList[org.apache.spark.sql.Row](),
                schema)
            case None => n.deltaEval(this) // no inputs at all — unreachable
          }
        } else n.deltaEval(this)
      })
    /** Replace a node's memoized delta with its materialized re-anchored
      * frame, so every parent planned afterwards composes against an O(1)
      * leaf instead of embedding this node's full delta tree. */
    private[streaming] def setDelta(n: Inc, df: DataFrame): Unit =
      memo(n.id) = df
    /** Pre-step value of `n`: the stored trace when the Runner keeps one,
      * else recomputed through the cheap linear pass-through chain down to
      * source integrals / traced operators. */
    private[streaming] def valueOf(n: Inc): DataFrame =
      trace(n.id).getOrElse(n.valueEval(this))
    /** The node's own stored output integral (stateful operators retract
      * previous results from it instead of recomputing them). */
    private[streaming] def traceOf(n: Inc): DataFrame =
      trace(n.id).getOrElse(throw new IllegalStateException(
        s"stateful node ${n.id} has no stored trace — Runner marking bug"))
  }

  /** A circuit node. Combinators build the DAG; the Runner walks it, places
    * traces on the stateful (non-linear) operators, and drives steps. */
  sealed abstract class Inc {
    private[streaming] val id: Long = Inc.ids.getAndIncrement()
    private[streaming] def kids: Seq[Inc]
    /** Children whose PRE-STEP VALUE this node's delta reads — these drive
      * the Runner's trace placement (the incrementalizer's I-insertion,
      * IncrementalizeVisitor.java:35-63). */
    private[streaming] def valueDeps: Seq[Inc] = Seq.empty
    /** True for operators that retract from their own output trace. */
    private[streaming] def ownTrace: Boolean = false

    /** Full-recompute semantics over integrated inputs (the oracle). */
    def batch(in: Inputs): DataFrame

    /** This step's output delta, evaluated against pre-step traces. */
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame

    /** Pre-step value when the Runner stores no trace for this node: only
      * linear chains and sources are evaluated this way (cheap — map-side
      * over cached integrals). Non-linear nodes consulted for value always
      * get a trace from the Runner's marking pass. */
    private[streaming] def valueEval(ctx: StepCtx): DataFrame =
      throw new IllegalStateException(
        s"node $id consulted for value without a stored trace")

    // ---- combinators (the circuit-building API) --------------------------

    /** Linear unary op lifted to both modes (map/filter/negate/…). */
    def linear(f: DataFrame => DataFrame): Inc = Linear(this, f)

    /** Materialization point: store this node's output integral as a trace
      * so value-consulting consumers (bilinear joins, refolds) read the
      * stored result instead of re-deriving the chain from the source
      * integral every step. Use after expensive per-row derivations
      * (signatures, shingles, tokenizations) consumed by joins. */
    def traced: Inc = Traced(this)

    def select(exprs: Column*): Inc = linear(ZSet.map(_)(exprs: _*))
    def where(cond: Column): Inc = linear(_.filter(cond))
    def negate: Inc = linear(ZSet.negate)

    /** Weighted union (n-ary sum operator is linear). */
    def union(other: Inc): Inc = SumN(Seq(this, other))
    def minus(other: Inc): Inc = union(other.negate)

    /** Bilinear incremental equi-join:
      * Δ(A⋈B) = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB, with A and B served from stored
      * traces (DBSPIncrementalJoinOperator.java:35). */
    def join(other: Inc, keys: Seq[String]): Inc = JoinInc(this, other, keys)

    /** Bilinear join with NULL-SAFE key equality (`<=>`) — for joins whose
      * key is a row VALUE (outer-join pad matching, EXISTS residuals over
      * nullable columns), where SQL's NULL≠NULL would miscount NULL-bearing
      * rows. Same Δ algebra as `join`. */
    def joinNullSafe(other: Inc, keys: Seq[String]): Inc =
      JoinInc(this, other, keys, nullSafe = true)

    /** Bilinear equi-join fused with a LINEAR post-map (filter / narrow
      * projection / consolidation over the join output) applied inside the
      * node, so the traced delta/trace hold the post-map's (small) result
      * rather than the raw join output. `post` MUST be weight-linear:
      * per-row maps/filters that carry the weight column through, plus
      * ZSet.consolidate (identity on Z-set values). See JoinInc. */
    def joinThen(other: Inc, keys: Seq[String], nullSafe: Boolean = false)
                (post: DataFrame => DataFrame): Inc =
      JoinInc(this, other, keys, nullSafe, Some(post))

    /** Incremental grouped aggregate (weight-linear folds: COUNT = Σw,
      * SUM = Σ w·x): re-fold only groups present in the delta; retract
      * those groups' previous results from the own output trace. */
    def aggregate(keys: Seq[String], aggs: (String, Column)*): Inc =
      AggW(this, keys, aggs)

    /** Incremental grouped aggregate over *expanded* rows: consolidates
      * touched state, expands weights back to row multiplicity, and applies
      * plain Spark aggregate columns — so ANY aggregate function (MIN/MAX/
      * AVG/percentiles/…) is exact under retractions. Only touched groups
      * re-fold; previous results come from the own trace. `outOrder` fixes
      * the output column order. */
    def aggregateRows(keys: Seq[String], aggCols: Seq[Column],
                      outOrder: Seq[String]): Inc = {
      require(keys.nonEmpty, "aggregateRows needs grouping keys")
      require(keys.forall(outOrder.contains),
        s"aggregateRows output must carry its grouping keys (trace " +
          s"retraction is key-restricted): keys=$keys out=$outOrder")
      AggRows(this, keys, aggCols, outOrder)
    }

    /** Weight-LINEAR incremental grouped aggregate (the reference's linear
      * aggregate path, AggregateCompiler.java:116-231: COUNT = Σw,
      * SUM(x) = Σ w·x): every component is a group-wise SUM of a row
      * expression × weight, so the step delta is computed by aggregating
      * ONLY the input delta and merging the component sums with the
      * previous results read from the own trace — per-step cost O(|delta|),
      * with no scan of the child state at all (the reason this node has no
      * valueDeps and its child needs no trace). The node's output carries
      * the components plus a `__gw` group-weight column (the group-liveness
      * bit: a group exists while Σw ≠ 0); callers project/finalize with a
      * linear select on top. Component NULL semantics are the SQL ones a
      * plain `sum` has (all-NULL → NULL) — callers needing SUM's
      * NULL-on-empty must pair each sum with a non-null-count component
      * and finalize with `when(cnt > 0, s)`. */
    def aggregateLinear(keys: Seq[String], comps: Seq[(String, Column)]): Inc = {
      require(keys.nonEmpty, "aggregateLinear needs grouping keys")
      AggLinear(this, keys, comps)
    }

    /** Incremental GLOBAL aggregate (no grouping keys). The single group is
      * touched by every delta, so each step re-folds the whole consolidated
      * child state — the cost a global standing aggregate fundamentally has
      * under arbitrary retractions (MIN/MAX can shrink) — but the previous
      * result is read from the own trace, not recomputed. Empty input emits
      * the SQL zero row (COUNT=0, SUM=NULL): Spark's global `groupBy().agg`
      * does this natively, which is the reference's empty-input correction
      * circuit (CalciteToDBSPCompiler.java:349-381); the Runner seeds the
      * trace with Q(∅) so the integral of deltas telescopes to Q(state). */
    def aggregateRowsGlobal(aggCols: Seq[Column], outOrder: Seq[String]): Inc =
      AggGlobal(this, aggCols, outOrder)

    /** Whole-state re-evaluation: compute `eval` over the consolidated new
      * state and retract the previous evaluation — read from the own trace,
      * so the per-step cost is ONE `eval` over state (the reference
      * re-aggregates sorts into a sorted Vec the same way, visitSort
      * :980-1048). Only correct for operators whose output is a small
      * function of the whole input, e.g. ORDER BY/LIMIT top-k; at scale the
      * eval is TakeOrdered-shaped: per-partition top-k + a k-row reduce. */
    def reevaluate(eval: DataFrame => DataFrame): Inc = Reeval(this, eval)

    /** Incremental per-group exact top-k with a MONOTONE-REMOVAL shortcut
      * — the retrieval-index-maintenance shape (standing exact-ANN views).
      * The reference maintains ORDER BY/LIMIT views by re-aggregating the
      * sorted state per step (visitSort, CalciteToDBSPCompiler.java:
      * 980-1048 — the `reevaluate` analogue here); this operator refines
      * that with the monotonicity argument below so steady-state waves
      * never touch state at all.
      * The child must maintain SET semantics (presence weights 0/1 — a
      * keyed corpus; compose `.distinct` upstream otherwise). `score`
      * maps its plain rows to scored candidate rows, one per (group, row)
      * pair — e.g. cosine of each vector against a broadcast probe set —
      * and this operator maintains the exact top-k per group under
      * `orderBy` (which must be a TOTAL order: include a tiebreaker).
      * `idCols` are the child columns that identify a row inside the
      * output (e.g. vec_id), used to detect when a removal hits a current
      * top hit. Group keys and id columns must be NON-NULL: hit-group
      * routing uses equi semi/anti joins, which would silently misroute
      * NULL-keyed groups (same caveat as Spark's own keyed-state ops) —
      * the operator ENFORCES this per row with an in-column raise_error,
      * so NULL-keyed input fails loudly instead of producing a stale
      * top-k.
      *
      * Per step: inserted rows are scored (delta-proportional) and MERGED
      * with the surviving previous top-k — exact, because removing a
      * non-top-k row can never change a top-k (every row that outranked
      * it still does), and an inserted row either beats the old kth or
      * doesn't. Only when a removal hits a CURRENT top-k row does the
      * operator fall back to a full re-score over consolidated state —
      * and then only for the hit groups. A no-top-hit wave therefore
      * NEVER scans state (contrast `reevaluate`, which re-scores one full
      * pass per step): this is the honest exactness boundary — bucketed
      * (LSH/IVF) gating of the fallback would skip state, but a far
      * bucket can still hold the true next-best row, so any
      * bucket-restricted refill is approximate by construction. The
      * per-step rescan count is observable via the owning
      * `Runner.lastRescanGroups` (asserted 0 for no-hit waves in
      * IncrementalTopKSpec). */
    def topKPerGroup(score: DataFrame => DataFrame, idCols: Seq[String],
                     groupCols: Seq[String], orderBy: Seq[Column], k: Int,
                     rankCol: String = "rank"): Inc =
      TopKInc(this, score, idCols, groupCols, orderBy, k, rankCol)

    /** Incremental partitioned window aggregate
      * (DBSPWindowAggregateOperator.java:34-39 participates in incremental
      * circuits via OptimizeIncrementalVisitor:53-93): a delta only changes
      * results inside the partitions it touches, so re-evaluate the window
      * over those partitions of the new state and retract their previous
      * results from the own trace. Cost per step: O(touched partitions).
      * `eval` receives consolidated positive rows of the child and must
      * return one result row per input row. */
    def windowAggregate(partitionKeys: Seq[String])
                       (eval: DataFrame => DataFrame): Inc =
      WindowAgg(this, partitionKeys, eval)

    /** Incremental distinct: re-derive presence only for touched rows;
      * previous presence read from the own trace
      * (DBSPIncrementalDistinctOperator.java:31). */
    def distinct: Inc = Refold(this, ZSet.distinct)

    /** Incremental positive part (EXCEPT ALL's clamp): max(0, w) copies of
      * each touched row survive. */
    def positivePart: Inc = Refold(this, ZSet.positive)

    /** Incremental transitive closure of this edge Z-set (SET semantics,
      * cycle-safe) — recursion as a standing view, the DBSP paper's nested
      * fixpoint circuit (the reference repo has no recursive queries at
      * all, so this is beyond-reference surface). Insert-only steps do
      * DELTA-PROPORTIONAL work: new pairs must route through ≥1 new edge,
      * so they are exactly the semi-naive closure of
      * U = (I ∪ T)∘ΔE∘(I ∪ T) (old-closure segments absorbed around each
      * new edge) minus T — no recomputation of the old closure. Steps with
      * retractions run DELETE-AND-REDERIVE (DRed, Gupta/Mumick/
      * Subrahmanian '93): over-delete the pairs with SOME derivation
      * through a removed edge (one shot — the old trace is already
      * closed, so D = (I∪T)∘ΔE⁻∘(I∪T)), then re-derive survivors from a
      * base of still-present over-deleted edges bracketed by unaffected
      * closure segments — fixpoint frames sized by the severed
      * neighborhood, never the closure. */
    def closure(src: String, dst: String): Inc = ClosureInc(this, src, dst)

    /** Incremental SEMI join: rows of this side with ≥1 match in `other` —
      * the bilinear join against other's distinct key set (a small traced
      * state), which preserves this side's multiplicities (SEMI/ANTI are
      * how Calcite lowers EXISTS/IN upstream of the reference, which itself
      * throws Unimplemented for them — CalciteToDBSPCompiler.java:571-572;
      * we support them compositionally). */
    def semiJoin(other: Inc, keys: Seq[String]): Inc =
      join(other.select(keys.map(col): _*).distinct, keys)

    /** Incremental ANTI join: this side minus its semi join. */
    def antiJoin(other: Inc, keys: Seq[String]): Inc =
      minus(semiJoin(other, keys))
  }

  private object Inc {
    val ids = new java.util.concurrent.atomic.AtomicLong()
  }

  private object Runner {
    /** Shared daemon pool for concurrent state materialization. */
    lazy val materializeEc: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(
        java.util.concurrent.Executors.newFixedThreadPool(8, r => {
          val t = new Thread(r, "graft-materialize")
          t.setDaemon(true)
          t
        }))

    /** JVM-wide task CPU-time accumulator (one listener per SparkContext):
      * each Runner snapshots it around a step to MEASURE whether the step
      * was compute-bound — the feedback the step-width sizing reads instead
      * of a hardcoded operator whitelist (r13 verdict #3). Concurrent work
      * from other queries inflates a reading, which errs toward keeping
      * full width — the safe direction. */
    private val cpuNs = new java.util.concurrent.atomic.AtomicLong
    @volatile private var cpuListenerCtx: org.apache.spark.SparkContext = null
    def taskCpuNs(sc: org.apache.spark.SparkContext): Long = {
      if (cpuListenerCtx ne sc) synchronized {
        if (cpuListenerCtx ne sc) {
          sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              val m = t.taskMetrics
              if (m != null) cpuNs.addAndGet(m.executorCpuTime)
            }
          })
          cpuListenerCtx = sc
        }
      }
      cpuNs.get
    }
  }

  /** Input node: its delta is the step's delta for `name`; its value is the
    * Runner's input integral (the I the incrementalizer places on sources). */
  def source(name: String): Inc = Source(name)

  // ---- node implementations ----------------------------------------------

  /** Bootstrap-only leaf holding an already-materialized value — the
    * Runner's snapshot bootstrap substitutes these for traced descendants
    * so each traced node's batch evaluation reads persisted child values
    * instead of re-deriving the whole subtree per node. Never part of a
    * stepping circuit. */
  private[streaming] final case class BootLeaf(df: DataFrame) extends Inc {
    def kids: Seq[Inc] = Nil
    def batch(in: Inputs): DataFrame = df
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame =
      throw new IllegalStateException("BootLeaf is bootstrap-only")
  }

  private[streaming] final case class Source(name: String) extends Inc {
    def kids: Seq[Inc] = Nil
    def batch(in: Inputs): DataFrame = in(name)
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = ctx.inputDelta(name)
    override private[streaming] def valueEval(ctx: StepCtx): DataFrame =
      ctx.inputValue(name)
  }

  private[streaming] final case class Linear(child: Inc, f: DataFrame => DataFrame)
      extends Inc {
    def kids: Seq[Inc] = Seq(child)
    def batch(in: Inputs): DataFrame = f(child.batch(in))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = f(ctx.deltaOf(child))
    override private[streaming] def valueEval(ctx: StepCtx): DataFrame =
      f(ctx.valueOf(child))
  }

  /** Trace-owning IDENTITY: delta in → delta out (linear), but the Runner
    * stores this node's output integral. Place it after an EXPENSIVE linear
    * derivation (per-row tokenization, shingling, hashing, signatures)
    * that a bilinear consumer reads as a pre-step VALUE: without it, value
    * consultation passes through linear chains down to the source integral
    * and re-derives the whole corpus every step (the A side of every
    * Δ(A⋈B) term); with it, the derivation runs once per DELTA and the
    * stored result serves all consumers — the incrementalizer's I placed
    * mid-chain. Costs one state (the derived corpus) — the classic
    * space-for-recompute trade, which at 100 TB is the difference between
    * per-step work O(Δ) and O(corpus). */
  private[streaming] final case class Traced(child: Inc) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def ownTrace: Boolean = true
    def batch(in: Inputs): DataFrame = child.batch(in)
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame =
      ctx.deltaOf(child)
  }

  private[streaming] final case class SumN(children: Seq[Inc]) extends Inc {
    def kids: Seq[Inc] = children
    def batch(in: Inputs): DataFrame = ZSet.plus(children.map(_.batch(in)): _*)
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame =
      ZSet.plus(children.map(ctx.deltaOf): _*)
    override private[streaming] def valueEval(ctx: StepCtx): DataFrame =
      ZSet.plus(children.map(ctx.valueOf): _*)
  }

  /** Bilinear incremental equi-join, optionally FUSED with a linear
    * post-map (`post`: filter / projection / consolidation applied to the
    * join output INSIDE the node, before the Runner materializes its
    * delta). Linearity makes the fusion exact: for linear f,
    * Δ(f(A⋈B)) = f(ΔA⋈B + A⋈ΔB + ΔA⋈ΔB), and consolidation is identity
    * on Z-set values — so batch ≡ incremental is unchanged. The point is
    * the TRACE: a traced join whose consumers immediately filter/narrow
    * its output would otherwise integrate (and rescan, every step) the
    * full pre-filter join output — for the NOT IN mask expansion that is
    * millions of 17-column witness-pair rows per step where the fused
    * node stores thousands of consolidated tuples. */
  private[streaming] final case class JoinInc(left: Inc, right: Inc,
                                              keys: Seq[String],
                                              nullSafe: Boolean = false,
                                              post: Option[DataFrame => DataFrame] = None) extends Inc {
    def kids: Seq[Inc] = Seq(left, right)
    override private[streaming] def valueDeps: Seq[Inc] = kids
    private def app(df: DataFrame): DataFrame = post.fold(df)(f => f(df))
    private def jn(a: DataFrame, b: DataFrame): DataFrame =
      if (nullSafe) ZSet.joinNullSafe(a, b, keys) else ZSet.join(a, b, keys)
    def batch(in: Inputs): DataFrame =
      app(jn(left.batch(in), right.batch(in)))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = {
      // Broadcast-hint any provably-small operand (traces and anchored
      // deltas carry accurate cached stats; the check costs zero jobs).
      // This matters most for LOW-CARDINALITY KEYS: the subquery regime
      // gates join a ≤1-row relation to the full outer state on a
      // constant key, and an unhinted shuffle would funnel every outer
      // row into one partition to meet it. With the hint the join is
      // map-side and the big side never moves.
      // The cap is deliberately far below autoBroadcastJoinThreshold:
      // hinting a multi-MB operand trades a shuffle for a driver
      // collect+rebroadcast that is usually SLOWER locally; the win case
      // is the genuinely tiny side (a gate relation, a distinct key set
      // of a small dimension), where the big side then never moves.
      def hintTiny(df: DataFrame): DataFrame = {
        val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
        if (est <= (1L << 18)) broadcast(df) else df
      }
      val a = hintTiny(ctx.valueOf(left))
      val b = hintTiny(ctx.valueOf(right))
      val da = hintTiny(ctx.deltaOf(left))
      val db = hintTiny(ctx.deltaOf(right))
      app(ZSet.plus(jn(da, b), jn(a, db), jn(da, db)))
    }
    // Reached only if this join's value is consulted but the Runner chose
    // not to trace it (never, per marking) — correct O(state) fallback.
    override private[streaming] def valueEval(ctx: StepCtx): DataFrame =
      app(jn(ctx.valueOf(left), ctx.valueOf(right)))
  }

  private[streaming] final case class AggW(child: Inc, keys: Seq[String],
                                           aggs: Seq[(String, Column)]) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def valueDeps: Seq[Inc] = kids
    override private[streaming] def ownTrace: Boolean = true
    private def fold(z: DataFrame): DataFrame =
      ZSet.fromRows(ZSet.aggregate(z, keys, aggs: _*))
    def batch(in: Inputs): DataFrame = fold(child.batch(in))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = {
      val dChild = ctx.deltaOf(child)
      val touched = dChild.select(keys.map(col): _*).distinct()
      val newChild = ZSet.plus(ctx.valueOf(child), dChild)
      ZSet.minus(
        fold(touchedOnly(newChild, touched, keys)),
        ZSet.consolidate(touchedOnly(ctx.traceOf(this), touched, keys)))
    }
  }

  private[streaming] final case class AggRows(child: Inc, keys: Seq[String],
                                              aggCols: Seq[Column],
                                              outOrder: Seq[String]) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def valueDeps: Seq[Inc] = kids
    override private[streaming] def ownTrace: Boolean = true
    private def fold(z: DataFrame): DataFrame =
      ZSet.fromRows(
        ZSet.toRows(ZSet.consolidate(z))
          .groupBy(keys.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
          .select(outOrder.map(col): _*))
    def batch(in: Inputs): DataFrame = fold(child.batch(in))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = {
      val dChild = ctx.deltaOf(child)
      val touched = dChild.select(keys.map(col): _*).distinct()
      val newChild = ZSet.plus(ctx.valueOf(child), dChild)
      ZSet.minus(
        fold(touchedOnly(newChild, touched, keys)),
        ZSet.consolidate(touchedOnly(ctx.traceOf(this), touched, keys)))
    }
  }

  /** Weight-linear grouped aggregate: components are group-wise sums, so
    * old ⊕ Δ merges by addition. Output schema: keys ++ comps ++ __gw. */
  private[streaming] final case class AggLinear(child: Inc, keys: Seq[String],
                                                comps: Seq[(String, Column)]) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def ownTrace: Boolean = true
    private val GW = "__gw"
    private def raw(z: DataFrame): DataFrame = {
      val cols = comps.map { case (n, c) => c.as(n) } :+ sum(col(ZSet.W)).as(GW)
      z.groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*)
    }
    def batch(in: Inputs): DataFrame =
      ZSet.fromRows(raw(child.batch(in)).filter(col(GW) =!= 0))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = {
      // the only input-sized operation: one aggregation of the delta
      val dComp = raw(ctx.deltaOf(child))
      val touched = dComp.select(keys.map(col): _*).distinct()
      val oldZ = ZSet.consolidate(touchedOnly(ctx.traceOf(this), touched, keys))
      // merge old component rows with the delta's components (sums add;
      // a group stays alive while its merged Σw ≠ 0)
      val mergeCols =
        comps.map { case (n, _) => sum(col(n)).as(n) } :+ sum(col(GW)).as(GW)
      val merged = ZSet.toRows(oldZ).unionByName(dComp)
        .groupBy(keys.map(col): _*)
        .agg(mergeCols.head, mergeCols.tail: _*)
        .filter(col(GW) =!= 0)
      ZSet.minus(ZSet.fromRows(merged), oldZ)
    }
  }

  private[streaming] final case class AggGlobal(child: Inc, aggCols: Seq[Column],
                                                outOrder: Seq[String]) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def valueDeps: Seq[Inc] = kids
    override private[streaming] def ownTrace: Boolean = true
    private def fold(z: DataFrame): DataFrame =
      ZSet.fromRows(
        ZSet.toRows(ZSet.consolidate(z))
          .groupBy()
          .agg(aggCols.head, aggCols.tail: _*)
          .select(outOrder.map(col): _*))
    def batch(in: Inputs): DataFrame = fold(child.batch(in))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame =
      ZSet.minus(
        fold(ZSet.plus(ctx.valueOf(child), ctx.deltaOf(child))),
        ZSet.consolidate(ctx.traceOf(this)))
  }

  private[streaming] final case class Reeval(child: Inc,
                                             eval: DataFrame => DataFrame) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def valueDeps: Seq[Inc] = kids
    override private[streaming] def ownTrace: Boolean = true
    private def out(z: DataFrame): DataFrame =
      ZSet.fromRows(eval(ZSet.toRows(ZSet.consolidate(z))))
    def batch(in: Inputs): DataFrame = out(child.batch(in))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame =
      ZSet.minus(
        out(ZSet.plus(ctx.valueOf(child), ctx.deltaOf(child))),
        ZSet.consolidate(ctx.traceOf(this)))
  }

  /** See the `topKPerGroup` combinator's doc. State: the child's integral
    * (which the Runner keeps anyway for any bilinear consumer) plus this
    * node's own output trace (≤ k rows per group — the "index"). The
    * hit-group set is collected eagerly (it is bounded by the output
    * trace, k·|groups| rows), so the no-hit path never even PLANS a join
    * against consolidated state. */
  private[streaming] final case class TopKInc(child: Inc,
      score: DataFrame => DataFrame, idCols: Seq[String],
      groupCols: Seq[String], orderBy: Seq[Column], k: Int,
      rankCol: String) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def valueDeps: Seq[Inc] = kids
    override private[streaming] def ownTrace: Boolean = true
    /** The non-NULL key contract, enforced PER ROW: hit-group routing
      * uses equi semi/anti joins, so a NULL group or id key would
      * silently misroute (a removal never matches, leaving a stale
      * top-k). Raise at execution instead — the guard lives INSIDE the
      * key column so the optimizer cannot prune it (RangeJoin's binSeq
      * pattern). */
    private def guardKeys(rows: DataFrame, cols: Seq[String],
                          what: String): DataFrame =
      cols.foldLeft(rows) { (d, c) =>
        d.withColumn(c, when(col(c).isNull, raise_error(lit(
            s"topKPerGroup: NULL $what key '$c' — NULL group/id keys " +
              "misroute through the hit-group equi joins; filter or " +
              "COALESCE them upstream"))).otherwise(col(c)))
      }
    private def scored(rows: DataFrame): DataFrame =
      guardKeys(score(guardKeys(rows, idCols, "id")), groupCols, "group")
    private def rank(rows: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
      rows.withColumn(rankCol, row_number().over(w))
        .filter(col(rankCol) <= k)
    }
    def batch(in: Inputs): DataFrame =
      ZSet.fromRows(rank(scored(ZSet.toRows(ZSet.consolidate(child.batch(in))))))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = {
      val dS = guardKeys(ZSet.consolidate(ctx.deltaOf(child)), idCols, "id")
      val removedIds = dS.filter(col(ZSet.W) < 0)
        .select(idCols.map(col): _*).distinct()
      val inserted = ZSet.toRows(dS) // positive delta rows, plain
      val prevOut = ZSet.consolidate(ctx.traceOf(this))
      val prevRows = ZSet.toRows(prevOut)
      val groupSchema = org.apache.spark.sql.types.StructType(
        groupCols.map(n => prevRows.schema(n)))
      // groups whose CURRENT top-k lost a member — tiny by construction
      // (own trace ⋈ delta removals), collected so the branch is real
      val hitKeys = prevRows
        .join(removedIds, idCols, "left_semi")
        .select(groupCols.map(col): _*).distinct().collect()
      ctx.recordRescanGroups(hitKeys.length.toLong)
      // surviving previous top-k ∪ scored inserts (delta-proportional)
      val cand = prevRows.drop(rankCol).unionByName(scored(inserted))
      val out =
        if (hitKeys.isEmpty) rank(cand)
        else {
          val hit = broadcast(prevRows.sparkSession.createDataFrame(
            java.util.Arrays.asList(hitKeys: _*), groupSchema))
          // fallback, restricted to the hit groups: one consolidated
          // pass over state — the irreducible exact-refill cost
          val full = ZSet.toRows(ZSet.consolidate(
            ZSet.plus(ctx.valueOf(child), ctx.deltaOf(child))))
          rank(cand.join(hit, groupCols.toSeq, "left_anti"))
            .unionByName(
              rank(scored(full).join(hit, groupCols.toSeq, "left_semi")))
        }
      ZSet.consolidate(ZSet.minus(ZSet.fromRows(out), prevOut))
    }
  }

  private[streaming] final case class WindowAgg(child: Inc, partKeys: Seq[String],
                                                eval: DataFrame => DataFrame) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def valueDeps: Seq[Inc] = kids
    override private[streaming] def ownTrace: Boolean = true
    private def out(z: DataFrame): DataFrame =
      ZSet.fromRows(eval(ZSet.toRows(ZSet.consolidate(z))))
    def batch(in: Inputs): DataFrame = out(child.batch(in))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = {
      val dChild = ctx.deltaOf(child)
      val touched = dChild.select(partKeys.map(col): _*).distinct()
      val newChild = ZSet.plus(ctx.valueOf(child), dChild)
      ZSet.minus(
        out(touchedOnly(newChild, touched, partKeys)),
        ZSet.consolidate(touchedOnly(ctx.traceOf(this), touched, partKeys)))
    }
  }

  /** Nonlinear per-row re-derivation shared by distinct and positive part:
    * re-derive only the rows the delta touches; previous derivations read
    * from the own trace.
    *
    * The emitted delta is CONSOLIDATED (weights of equal rows merged,
    * zero-weight rows dropped) — one extra shuffle of O(touched) rows per
    * step — so a step whose re-derivation matches the previous presence
    * emits a PHYSICALLY EMPTY delta, not a pair of offsetting ±1 rows.
    * Downstream bilinear joins then do literally nothing. The subquery
    * regime gates (SqlIncremental.uncorrelatedExists / nullAwareNotIn)
    * depend on this: their 0/1-row gate relations sit on a constant key
    * against the FULL outer state, and an offsetting pair surviving to
    * that join would re-emit O(outer) rows for a semantic no-op. */
  private[streaming] final case class Refold(child: Inc,
                                             derive: DataFrame => DataFrame) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def valueDeps: Seq[Inc] = kids
    override private[streaming] def ownTrace: Boolean = true
    def batch(in: Inputs): DataFrame = derive(child.batch(in))
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = {
      val dChild = ctx.deltaOf(child)
      val names = dChild.columns.filterNot(_ == ZSet.W).toSeq
      val touched = dChild.select(names.map(col): _*).distinct()
      val newChild = ZSet.plus(ctx.valueOf(child), dChild)
      ZSet.consolidate(ZSet.minus(
        derive(touchedOnly(newChild, touched, names)),
        ZSet.consolidate(touchedOnly(ctx.traceOf(this), touched, names))))
    }
  }

  /** Incremental transitive closure (see the `closure` combinator's doc).
    * The fixpoint loops run EAGERLY inside deltaEval (persist + count per
    * iteration — iteration results are re-anchored leaves), so the frame
    * this returns is a shallow union over already-computed chunks; the
    * Runner's wave materialization of it is one cheap cache pass.
    *
    * Retraction steps use DRed (delete-and-rederive). Soundness rests on
    * these facts about the old trace T (transitively closed) and the
    * over-delete set D = pairs with SOME old path through a removed edge:
    *  1. D = (I∪T)∘ΔE⁻∘(I∪T) needs NO fixpoint — segments between removed
    *     edges are themselves old-closure pairs, so one bracketing
    *     composition covers paths through any number of removed edges;
    *  2. every pair of K = T − D survives (ALL its derivations avoid
    *     removed edges), and the rederivable part of D is the fixpoint
    *     R = D ∩ ((K∪R)∘(K∪R) ∪ S) seeded by the still-present
    *     over-deleted edges S = D ∩ E_new (added edges are never in
    *     D ⊆ T, so S needs no added-edge handling). NOTE K is NOT closed
    *     under composition — D over-approximates, so two kept segments
    *     can compose into an over-deleted pair — which is exactly why
    *     K∘K-shaped rederivations must be included;
    *  3. every composition in R has its left factor starting in π_src(D)
    *     and its right factor ending in π_dst(D), so K participates only
    *     through K_L = K⋉(src∈π_src(D)) and K_R = K⋉(dst∈π_dst(D)) —
    *     fixpoint frames scale with the AFFECTED NEIGHBORHOOD (severed
    *     pairs + kept closure rows touching their endpoints), never |T|.
    * Then closure(E_new − added) = K ∪ R; added edges extend it via the
    * insert construction. A pair both severed and re-added in the same
    * step nets to weight 0 in the emitted delta — present throughout,
    * exactly right. */
  private[streaming] final case class ClosureInc(child: Inc, src: String,
                                                 dst: String) extends Inc {
    def kids: Seq[Inc] = Seq(child)
    override private[streaming] def valueDeps: Seq[Inc] = kids
    override private[streaming] def ownTrace: Boolean = true
    /** Present edges of a Z-set: SET semantics means weight > 0 (an edge
      * retracted below zero is absent, exactly as in ZSet.distinct). */
    private def rowsOf(z: DataFrame): DataFrame =
      ZSet.consolidate(z).filter(col(ZSet.W) > 0L)
        .select(col(src), col(dst)).distinct()
    def batch(in: Inputs): DataFrame =
      ZSet.fromRows(
        Fixpoint.transitiveClosure(rowsOf(child.batch(in)), src, dst))
    /** Materialize an intermediate: persisted (deferred-released via ctx),
      * counted, re-anchored so downstream plans see a flat leaf; the count
      * also drives the broadcast decision in [[hinted]]. */
    private def settle(ctx: StepCtx, df: DataFrame): (DataFrame, Long) = {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = p.count()
      ctx.releaseAfterStep(p)
      (org.apache.spark.sql.GraftSqlBridge.reanchor(p), n)
    }
    /** Settle several INDEPENDENT frames with ONE Spark job: persist each,
      * then materialize all caches through a single unioned count (the
      * retraction wave is job-floor-bound at small deltas, so collapsing
      * three sequential count barriers into one action matters more than
      * any per-row cost). */
    private def settleMany(ctx: StepCtx,
                           dfs: Seq[DataFrame]): Seq[(DataFrame, Long)] = {
      val ps = dfs.map(_.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val counts = ps.zipWithIndex.map { case (p, i) =>
          p.groupBy().count().select(lit(i).as("__i"), col("count"))
        }.reduce(_ unionAll _).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      ps.zipWithIndex.map { case (p, i) =>
        ctx.releaseAfterStep(p)
        (org.apache.spark.sql.GraftSqlBridge.reanchor(p), counts(i))
      }
    }
    /** Broadcast-hint a settled frame we KNOW is small (re-anchored leaves
      * have no stats, so the planner can't see it itself). 1M two-column
      * rows ≈ tens of MB — safely inside driver/executor budgets. */
    private def hinted(df: DataFrame, n: Long): DataFrame =
      if (n <= 1000000L) broadcast(df) else df
    private def doubling: (DataFrame, DataFrame) => DataFrame =
      (f, t) => Fixpoint.compose(f, t, src, dst)
        .unionAll(Fixpoint.compose(t, f, src, dst))
    private def cphase[A](label: String)(f: => A): A =
      if (!sys.env.contains("GRAFT_STEP_DEBUG")) f
      else {
        val t0 = System.nanoTime(); val r = f
        println(f"CLOSUREPHASE $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        r
      }
    private[streaming] def deltaEval(ctx: StepCtx): DataFrame = {
      val dChild = ctx.deltaOf(child)
      // Small regime (the broadcast-threshold decision, see Fixpoint.Local):
      // when the trace + child integral + delta provably fit the local
      // bound, maintenance is ONE collect job + a driver kernel instead of
      // the ~15-job distributed DRed cascade. The byte estimates come from
      // the Runner's state bookkeeping — Long.MaxValue (= never local)
      // when unknown.
      val bound = Fixpoint.Local.maxBytes(dChild.sparkSession)
      val est = Incremental.satAdd(ctx.traceBytes(id), ctx.childBytes(child))
      if (sys.env.contains("GRAFT_STEP_DEBUG"))
        println(s"CLOSUREEST est=$est bound=$bound " +
          s"trace=${ctx.traceBytes(id)} child=${ctx.childBytes(child)}")
      val viaKernel = if (est <= bound) localDelta(ctx, dChild) else None
      viaKernel.getOrElse(distributedDelta(ctx, dChild))
    }

    /** Small-regime maintenance: one Spark job collects the consolidated
      * trace, child integral, and delta; the new closure is recomputed on
      * the driver and diffed against the old trace — below the byte bound
      * a full local recompute is strictly cheaper than ANY job cascade,
      * delta-proportional or not. Returns None (falling back to the
      * distributed DRed path) if the collected state or the closure
      * outgrows the local cap, so the bound limits driver memory, never
      * the answer. */
    private def localDelta(ctx: StepCtx, dChild: DataFrame): Option[DataFrame] = {
      import graft.operators.Fixpoint.Local
      val spark = dChild.sparkSession
      val cap = Local.capRows(spark)
      val pair = Seq(col(src), col(dst))
      def tagged(tag: Int, z: DataFrame): DataFrame =
        ZSet.consolidate(z.select(pair :+ col(ZSet.W): _*))
          .select(lit(tag).as("__tag") +: pair :+ col(ZSet.W): _*)
      val rows = cphase("local-gather")(
        tagged(0, ctx.traceOf(this))
          .unionAll(tagged(1, ctx.valueOf(child)))
          .unionAll(tagged(2, dChild))
          .collect())
      if (rows.length > cap) None
      else cphase("local-kernel") {
        val tOldB = Set.newBuilder[(Any, Any)]
        val eW = mutable.HashMap.empty[(Any, Any), Long]
        rows.foreach { r =>
          val k = (r.get(1), r.get(2))
          if (r.getInt(0) == 0) { if (r.getLong(3) > 0L) tOldB += k }
          else eW(k) = eW.getOrElse(k, 0L) + r.getLong(3)
        }
        val eNew: Local.Rel =
          eW.iterator.collect { case (k, w) if w > 0L => k }.toSet
        Local.closure(eNew, cap).map { cNew =>
          val tOld = tOldB.result()
          val outSchema = org.apache.spark.sql.types.StructType(
            dChild.select(pair: _*).schema.fields :+
              org.apache.spark.sql.types.StructField(ZSet.W,
                org.apache.spark.sql.types.LongType, nullable = false))
          val out: Seq[org.apache.spark.sql.Row] =
            (cNew diff tOld).toSeq.map { case (a, b) =>
              org.apache.spark.sql.Row(a, b, 1L) } ++
            (tOld diff cNew).toSeq.map { case (a, b) =>
              org.apache.spark.sql.Row(a, b, -1L) }
          spark.createDataFrame(
            java.util.Arrays.asList(out: _*), outSchema)
        }
      }
    }

    private def distributedDelta(ctx: StepCtx, dChild: DataFrame): DataFrame = {
      val names = Seq(src, dst)
      val touched = dChild.select(col(src), col(dst)).distinct()
      val newVal = ZSet.plus(ctx.valueOf(child), dChild)
      // Presence can only change for delta-touched edges, so restrict both
      // sides to them (delta-proportional, never O(edge state)). ΔE⁺/ΔE⁻
      // are PRESENCE changes: weight-only moves (3→1, or a lift toward
      // zero that stays ≤0) contribute nothing.
      val eOld = rowsOf(touchedOnly(ctx.valueOf(child), touched, names))
      val eNew = rowsOf(touchedOnly(newVal, touched, names))
      val addedE = Fixpoint.setMinus(eNew, eOld)
      // The trace's present-pairs view (a consolidate + distinct over the
      // FULL closure) appears in every bracketing composition, in K, and
      // in the insert extension — as a lazy plan it would re-shuffle the
      // whole trace once per referencing job subtree. Settle it once per
      // step; the broadcast-hinted alias serves the compose joins (inner,
      // build-side = this), while setMinus keeps the unhinted frame (the
      // left side of a left-anti can't be the build side).
      val (tOldS, nTOld) = cphase("settle-tOld")(settle(ctx, rowsOf(ctx.traceOf(this))))
      val tOld = tOldS
      val tOldH = hinted(tOldS, nTOld)
      val (tMid, deleted) =
        if (cphase("neg-probe")(dChild.filter(col(ZSet.W) < 0).isEmpty)) (tOldH, None)
        else {
          val removedE = Fixpoint.setMinus(eOld, eNew)
          if (cphase("removed-probe")(removedE.isEmpty)) (tOldH, None)
          else {
            // Over-delete: one bracketing composition, no fixpoint (doc ¶1).
            val l = Fixpoint.compose(tOldH, removedE, src, dst)
              .unionAll(removedE)
            val (d, nD) = cphase("over-delete")(settle(ctx,
              l.unionAll(Fixpoint.compose(l, tOldH, src, dst))
                .dropDuplicates()))
            val dH = hinted(d, nD)
            ClosureInc.lastOverDeleted = nD
            // K = T − D survives untouched; S = still-present over-deleted
            // edges (restricting the edge integral BY D keeps the
            // consolidate delta-local; the semi-join scan is map-side
            // under the broadcast hint).
            val k = Fixpoint.setMinus(tOld, dH)
            // K's only useful rows start at an affected src / end at an
            // affected dst (doc ¶3) — settle the two restrictions once so
            // the fixpoint never rescans the full kept closure. S and the
            // two K restrictions are independent, so they share one job.
            val dSrc = broadcast(d.select(col(src)).distinct().toDF("__n"))
            val dDst = broadcast(d.select(col(dst)).distinct().toDF("__n"))
            val Seq((s, nS), (kL, nKL), (kR, nKR)) = cphase("settle-skLkR")(settleMany(ctx, Seq(
              rowsOf(touchedOnly(newVal, dH, names)),
              k.join(dSrc, col(src) <=> col("__n"), "left_semi"),
              k.join(dDst, col(dst) <=> col("__n"), "left_semi"))))
            val sH = hinted(s, nS)
            val kLH = hinted(kL, nKL)
            val kRH = hinted(kR, nKR)
            val inD: DataFrame => DataFrame = x => touchedOnly(x, dH, names)
            // Base: surviving edges + pairs splitting into two kept
            // segments; the step closes over frontier∘total both ways plus
            // frontier bracketed by kept segments — everything restricted
            // to D, so frames stay neighborhood-sized.
            val b = sH.unionAll(inD(Fixpoint.compose(kLH, kRH, src, dst)))
            val bc: DataFrame => DataFrame =
              if (nD <= 1000000L) broadcast else identity[DataFrame]
            val (r, owned) = cphase("rederive-fix")(Fixpoint.semiNaiveOwned(b, (f, t) => {
              val fb = bc(f)
              inD(Fixpoint.compose(fb, t, src, dst)
                .unionAll(Fixpoint.compose(t, fb, src, dst))
                .unionAll(Fixpoint.compose(kLH, fb, src, dst))
                .unionAll(Fixpoint.compose(fb, kRH, src, dst)))
            }))
            ctx.releaseAfterStep(owned)
            ClosureInc.lastRederived = cphase("rederive-count")(r.count())
            (k.unionAll(r), Some(Fixpoint.setMinus(dH, r)))
          }
        }
      // Inserts extend tMid — when addedE is empty every frame below is
      // empty and the fixpoint settles in one count.
      val leftExt = Fixpoint.compose(tMid, addedE, src, dst).unionAll(addedE)
      val u = leftExt
        .unionAll(Fixpoint.compose(leftExt, tMid, src, dst))
        .dropDuplicates()
      val (closureU, owned) = cphase("insert-fix")(Fixpoint.semiNaiveOwned(u, doubling))
      ctx.releaseAfterStep(owned)
      val pos = ZSet.fromRows(Fixpoint.setMinus(closureU, tMid))
      deleted match {
        case None => pos
        case Some(del) => ZSet.plus(ZSet.negate(ZSet.fromRows(del)), pos)
      }
    }
  }

  private[graft] object ClosureInc {
    /** Last retraction step's DRed sizes (per-JVM observability for specs
      * and GRAFT_STEP_DEBUG sessions): candidates over-deleted, pairs
      * rederived. −1 = no retraction step has run. */
    @volatile private[graft] var lastOverDeleted: Long = -1L
    @volatile private[graft] var lastRederived: Long = -1L
  }

  // ---- shared helpers -----------------------------------------------------

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

  /** Step-driver maintaining N sink views over one set of input integrals
    * and shared per-operator traces — the circuit runtime. Asserts the DBSP
    * contract out = D(Q(I(in))) per view.
    *
    * State model (the reference's, re-expressed): the Runner stores
    *  - one integral per input table (the I on sources),
    *  - one output trace per stateful operator (the traces inside
    *    DBSP's incremental join/aggregate/distinct operators),
    *  - one output integral per sink whose root operator is stateless.
    * A step computes every node's delta ONCE (memoized; shared sub-circuits
    * are shared), advances each touched state by its own delta, and
    * materializes ALL new states in a SINGLE Spark job (no per-state count
    * barriers — the job both populates the caches and yields the sizes the
    * consolidation heuristic needs).
    *
    * State maintenance is adaptive: each advance appends the delta as a
    * union (no shuffle); a full consolidation — the only shuffling O(state)
    * operation — runs when the cached size of the lazily-unioned state
    * exceeds twice its last consolidated base, or after `consolidateEvery`
    * advances as a lineage bound — mirroring DBSP's background trace
    * merges. Superseded states are unpersisted so storage stays O(current
    * state). */
  final class Runner(val spark: SparkSession, roots: Seq[(String, Inc)],
                     schemas: Map[String, DataFrame],
                     consolidateEvery: Int = 8,
                     adaptiveDeltas: Boolean = false) {

    /** Single-view runner (sink named "__out"). */
    def this(spark: SparkSession, query: Inc, schemas: Map[String, DataFrame]) =
      this(spark, Seq("__out" -> query), schemas)
    def this(spark: SparkSession, query: Inc, schemas: Map[String, DataFrame],
             consolidateEvery: Int) =
      this(spark, Seq("__out" -> query), schemas, consolidateEvery)

    require(roots.nonEmpty, "Runner needs at least one sink view")
    private val rootOf: Map[String, Inc] = roots.toMap
    private val primary: String = roots.head._1

    /** Deterministic node order (DFS from the sinks, declaration order) —
      * stable across identical circuit rebuilds, so checkpoint state keys
      * survive a process restart. */
    private val nodes: Seq[Inc] = {
      val seen = mutable.LinkedHashMap.empty[Long, Inc]
      def dfs(n: Inc): Unit = if (!seen.contains(n.id)) {
        seen(n.id) = n; n.kids.foreach(dfs)
      }
      roots.foreach { case (_, r) => dfs(r) }
      seen.values.toSeq
    }
    private val nodeKey: Map[Long, Int] = nodes.map(_.id).zipWithIndex.toMap

    /** Distinct circuit nodes / stateful (trace-owning) nodes this Runner
      * maintains — observability for structural-CSE assertions: two views
      * compiled together over the same subtree must NOT double these. */
    def nodeCount: Int = nodes.size
    def statefulNodeCount: Int = nodes.count(_.ownTrace)

    /** Source tables reachable below each node — a step that feeds no
      * source of a subtree cannot change that subtree's output (its delta
      * is the zero Z-set), so untouched traces are left as-is. */
    private val sourcesBelow: Map[Long, Set[String]] = {
      val m = mutable.Map.empty[Long, Set[String]]
      def go(n: Inc): Set[String] = m.getOrElseUpdate(n.id, n match {
        case Source(nm) => Set(nm)
        case _ => n.kids.flatMap(go).toSet
      })
      nodes.foreach(go)
      m.toMap
    }

    /** Trace placement (the incrementalizer's I-insertion): every operator
      * that retracts from its own output, plus every non-linear operator
      * whose pre-step value a parent consults (value consultation passes
      * through linear chains and sources for free). */
    private val tracedIds: Set[Long] = {
      val t = mutable.Set.empty[Long]
      nodes.foreach(n => if (n.ownTrace) t += n.id)
      def mark(n: Inc): Unit = if (!t.contains(n.id)) n match {
        case Linear(c, _) => mark(c)
        case SumN(cs)     => cs.foreach(mark)
        case _: Source    => ()
        case other        => t += other.id // stateless non-linear (join)
      }
      nodes.foreach(_.valueDeps.foreach(mark))
      t.toSet
    }
    private def tracedNodes: Seq[Inc] = nodes.filter(n => tracedIds(n.id))

    /** Traced nodes immediately below each node: a node's delta tree
      * extends down to its nearest traced descendants (whose deltas are
      * materialized + re-anchored before any parent plans against them). */
    private val nearestTracedBelow: Map[Long, Set[Long]] = {
      val m = mutable.Map.empty[Long, Set[Long]]
      def below(n: Inc): Set[Long] =
        m.getOrElseUpdate(n.id, n.kids.flatMap { k =>
          if (tracedIds(k.id)) Set(k.id) else below(k)
        }.toSet)
      nodes.foreach(below)
      m.toMap
    }
    /** Materialization wave per traced node (1 = no traced descendants):
      * wave k's deltas are planned only after wave k-1's are anchored, so
      * every delta plan is a shallow tree over cached leaves — the DBSP
      * execution model (each operator computes its delta once per step,
      * parents consume stored results, never re-derivations). */
    private val waveOf: Map[Long, Int] = {
      val m = mutable.Map.empty[Long, Int]
      def wave(id: Long): Int = {
        if (!m.contains(id))
          m(id) = 1 + nearestTracedBelow(id).map(wave).maxOption.getOrElse(0)
        m(id)
      }
      tracedIds.foreach(wave)
      m.toMap
    }

    private val emptyInputs: Inputs =
      schemas.map { case (n, df) => n -> ZSet.fromRows(df.limit(0)) }

    /** Integrated inputs (lazily-unioned Z-sets). */
    private var integrated: Inputs = emptyInputs
    /** Stored traces: node id → integral of that node's output deltas,
      * seeded with the node's Q(∅) — for most operators the empty Z-set,
      * but a global aggregate's Q(∅) is the zero row (COUNT=0, SUM=NULL),
      * the reference's empty-input correction
      * (CalciteToDBSPCompiler.java:349-381). Seeding makes each trace
      * telescope to the node's batch value exactly.
      *
      * Seeds are LAZY (computed on first read): building Q(∅) eagerly
      * costs one full Catalyst analysis of the node's batch plan per
      * traced node at Runner construction — measured ~1.3 s driver time
      * for a 6-node circuit — and a snapshot bootstrap immediately
      * overwrites every one of them without reading.
      *
      * TrieMap, not mutable.Map: traceOf/stateByKey are reachable from
      * step/checkpoint paths, and the Runner's other cross-thread fields
      * are already @volatile — a lock-free concurrent map keeps the lazy
      * getOrElseUpdate safe if any of those is ever driven off the
      * construction thread (worst case under a race: Q(∅) is computed
      * twice, both results identical, one wins). */
    private val traces = scala.collection.concurrent.TrieMap.empty[Long, DataFrame]
    private val nodeById: Map[Long, Inc] = nodes.map(n => n.id -> n).toMap
    private def traceOf(id: Long): DataFrame =
      traces.getOrElseUpdate(id, nodeById(id).batch(emptyInputs))
    /** Output integrals for sinks whose root is stateless (a traced root's
      * output IS its trace). */
    private var outs: Map[String, DataFrame] =
      roots.filterNot { case (_, r) => tracedIds(r.id) }
        .map { case (nm, r) => nm -> r.batch(emptyInputs) }.toMap

    /** Refcounts over the persisted frames backing live state unions and
      * caller-held deltas (identity-keyed — DataFrames don't define value
      * equality); a frame's cache entry is released when its last reference
      * drops. */
    private val refs = new java.util.IdentityHashMap[DataFrame, Integer]()
    private def incref(df: DataFrame): Unit =
      refs.put(df, Integer.valueOf(Option(refs.get(df)).fold(0)(_.intValue) + 1))
    private def decref(df: DataFrame): Unit = {
      val n = Option(refs.get(df)).fold(0)(_.intValue) - 1
      if (n <= 0) { refs.remove(df); df.unpersist(false) }
      else refs.put(df, Integer.valueOf(n))
    }
    /** Previous step's deltas (one reference held for the caller, released
      * at the next step). */
    private var lastDeltas: Seq[DataFrame] = Nil
    /** Delta schema per node, filled on first use — lets untouched nodes'
      * deltas short-circuit to empty LocalRelations in later steps without
      * even an analysis pass (schemas never change for a fixed circuit). */
    private val deltaSchemas =
      mutable.LongMap.empty[org.apache.spark.sql.types.StructType]
    /** Per state key, the persisted constituent frames backing its current
      * lazy union (the compacted base + the anchored deltas appended since);
      * all released together when the state compacts. */
    private val constituents = mutable.Map.empty[String, List[DataFrame]]
    /** Cached size (bytes) of each state at its last compaction. */
    private val baseSize = mutable.Map.empty[String, Long]
    /** Cached bytes of deltas appended since each state's last compaction. */
    private val accSize = mutable.Map.empty[String, Long]
    /** Advances since each state's last compaction (lineage bound). */
    private val pending = mutable.Map.empty[String, Int]

    /** Conservative byte estimate of a state's current value. Tracked
      * bookkeeping when available (seeded 0 — every state starts empty);
      * after a checkpoint/restore cleared it, the plan's stats (parquet
      * reads — file-accurate). Long.MaxValue when neither can say. */
    private def stateBytes(k: String): Long =
      if (baseSize.contains(k) || accSize.contains(k))
        satAdd(baseSize.getOrElse(k, 0L), accSize.getOrElse(k, 0L))
      else {
        val s = try stateByKey(k).queryExecution.optimizedPlan.stats.sizeInBytes
        catch { case _: Throwable => BigInt(Long.MaxValue) }
        if (s > Long.MaxValue) Long.MaxValue else s.toLong
      }

    private def inKey(name: String) = s"in_$name"
    private def outKey(name: String) = s"out_$name"
    private def traceKey(id: Long) = s"trace_${nodeKey(id)}"
    private val idByTraceKey: Map[String, Long] =
      nodes.map(n => traceKey(n.id) -> n.id).toMap

    // Every state starts EMPTY (traces seed with Q(∅), a zero-ish row at
    // most): record 0 bytes so small-regime decisions see fresh states as
    // small rather than unknown.
    locally {
      schemas.keys.foreach(n => baseSize(inKey(n)) = 0L)
      tracedNodes.foreach(n => baseSize(traceKey(n.id)) = 0L)
      outs.keys.foreach(n => baseSize(outKey(n)) = 0L)
    }

    private def stateByKey(k: String): DataFrame =
      if (k.startsWith("in_")) integrated(k.stripPrefix("in_"))
      else if (k.startsWith("out_")) outs(k.stripPrefix("out_"))
      else traceOf(idByTraceKey(k))
    private def setState(k: String, df: DataFrame): Unit =
      if (k.startsWith("in_")) integrated += k.stripPrefix("in_") -> df
      else if (k.startsWith("out_")) outs += k.stripPrefix("out_") -> df
      else traces(idByTraceKey(k)) = df

    private var started = false

    /** SNAPSHOT BOOTSTRAP: seed the input integrals, every operator trace,
      * and stateless-root outputs with their BATCH values over full initial
      * tables (plain rows, weight 1 each) before the first step.
      *
      * Semantically identical to feeding the snapshot as a first
      * insert-only delta — every trace is the integral of the node's output
      * deltas seeded with Q(∅), and both paths leave it at Q(snapshot) — but
      * priced as one batch query per traced node (Catalyst plans, broadcast
      * joins, whole-stage codegen, no per-wave barriers) instead of a
      * full-corpus crawl through the delta path. This is the deployment
      * shape for a standing view at scale: bootstrap from the warehouse
      * snapshot, then stream deltas; step one is already delta-sized.
      *
      * Inputs absent from `init` start empty. Must precede the first step;
      * the circuit stays fully retraction-capable afterwards (the DBSP
      * algebra doesn't distinguish how state was reached). */
    /** Disable columnar-cache compression while Runner frames are
      * persisted (restored by popCacheCompression). Every state/delta the
      * Runner materializes is written once and read a handful of times
      * before release — thread-dump profiling (q160 sf0.1) showed the
      * dictionary/RLE encoders (CompressibleColumnBuilder, dictionary
      * HashMap growth) as a top RUNNABLE frame, pure build-side CPU paid
      * per step for compression that never amortizes (guide §1 empirical
      * loop; −24% q160 wall measured). Compression pays for LONG-LIVED hot
      * caches, which these are not. Deployments that want it back (e.g.
      * memory-starved executors where state must stay in-memory
      * compressed) set spark.graft.incremental.cacheCompressed=true. */
    private def pushCacheCompression(): Option[String] = {
      val key = "spark.sql.inMemoryColumnarStorage.compressed"
      val want = spark.conf
        .getOption("spark.graft.incremental.cacheCompressed")
        .getOrElse("false")
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, want)
      prev
    }
    private def popCacheCompression(prev: Option[String]): Unit = prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.inMemoryColumnarStorage.compressed", v)
      case None => spark.conf.unset(
        "spark.sql.inMemoryColumnarStorage.compressed")
    }

    def bootstrap(init: Map[String, DataFrame]): Unit = {
      val unknown = init.keySet -- schemas.keySet
      require(unknown.isEmpty, s"bootstrap for undeclared inputs: $unknown")
      require(!started, "bootstrap must precede the first step")
      started = true
      val prevComp = pushCacheCompression()
      try bootstrapImpl(init) finally popCacheCompression(prevComp)
    }

    private def bootstrapImpl(init: Map[String, DataFrame]): Unit = {
      // Staged evaluation, like stepAll's waves: seed (persist +
      // materialize + re-anchor) each state, then substitute the anchored
      // value for that node wherever a LATER wave's batch plan would
      // re-derive it — each traced node's bootstrap job reads cached child
      // values, so the snapshot is evaluated once end-to-end, not once per
      // traced node.
      val memo = mutable.Map.empty[Long, DataFrame]
      def subst(n: Inc): Inc = memo.get(n.id) match {
        case Some(df) => BootLeaf(df)
        case None => n match {
          case s: Source        => s
          case l: BootLeaf      => l
          case Linear(c, f)     => Linear(subst(c), f)
          case Traced(c)        => Traced(subst(c))
          case SumN(cs)         => SumN(cs.map(subst))
          case JoinInc(l, r, k, ns, post) =>
            JoinInc(subst(l), subst(r), k, ns, post)
          case AggW(c, k, a)    => AggW(subst(c), k, a)
          case AggRows(c, k, a, o) => AggRows(subst(c), k, a, o)
          case AggLinear(c, k, cs) => AggLinear(subst(c), k, cs)
          case AggGlobal(c, a, o)  => AggGlobal(subst(c), a, o)
          case Reeval(c, f)     => Reeval(subst(c), f)
          case TopKInc(c, sc, ic, gc, ob, kk, rc) =>
            TopKInc(subst(c), sc, ic, gc, ob, kk, rc)
          case WindowAgg(c, k, f) => WindowAgg(subst(c), k, f)
          case Refold(c, f)     => Refold(subst(c), f)
          case ClosureInc(c, s2, d2) => ClosureInc(subst(c), s2, d2)
        }
      }
      def seed(pairs: Seq[(String, DataFrame)],
               after: (String, DataFrame) => Unit): Unit = if (pairs.nonEmpty) {
        val frames = pairs.map(_._2)
        frames.foreach(_.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        materialize(frames)
        pairs.foreach { case (k, c) =>
          baseSize(k) = math.max(cachedSizeBytes(c), 1L)
          accSize(k) = 0L
          pending(k) = 0
          incref(c)
          constituents(k) = List(c)
          val anchored = org.apache.spark.sql.GraftSqlBridge.reanchor(c)
          setState(k, anchored)
          after(k, anchored)
        }
      }
      // wave 0: input integrals (anchored — every batch plan reads these).
      // NOT consolidated: snapshot rows arrive at weight 1, and a Z-set of
      // weight-1 duplicates equals its consolidated form — skipping the
      // full-row groupBy turns each input seed into a map-only cache build
      // (measured: 2.8 s of q130's bootstrap was consolidating the four
      // TPC-H inputs). The adaptive compaction consolidates later if the
      // state ever warrants it.
      phase("boot-inputs")(seed(schemas.toSeq.map { case (nm, df) =>
        inKey(nm) -> init.get(nm).map(ZSet.fromRows)
          .getOrElse(ZSet.fromRows(df.limit(0)))
      }, (_, _) => ()))
      val inputs: Inputs = integrated
      // traced nodes bottom-up, one materialization job per wave
      val maxWave = waveOf.values.maxOption.getOrElse(0)
      for (w <- 1 to maxWave) {
        val waveNodes = tracedNodes.filter(n => waveOf(n.id) == w)
        phase(s"boot-wave-$w")(seed(waveNodes.map(n =>
            traceKey(n.id) -> ZSet.consolidate(subst(n).batch(inputs))),
          (k, a) => memo(idByTraceKey(k)) = a))
      }
      // stateless roots (linear chains over traced/source leaves)
      phase("boot-roots")(seed(outs.keys.toSeq.map(nm =>
        outKey(nm) -> ZSet.consolidate(subst(rootOf(nm)).batch(inputs))),
        (_, _) => ()))
    }

    /** Feed one step of input deltas (weighted); returns the primary
      * sink's output delta. */
    def step(deltas: Inputs): DataFrame = stepAll(deltas)(primary)

    private val debugTiming = sys.env.contains("GRAFT_STEP_DEBUG")
    private def phase[A](label: String)(f: => A): A =
      if (!debugTiming) f
      else {
        val t0 = System.nanoTime(); val r = f
        println(f"STEPPHASE $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        r
      }

    /** Feed one step of input deltas; returns every sink's output delta.
      *
      * Materialization is staged by WAVE (a traced node's wave is 1 + the
      * max wave of its nearest traced descendants): wave k's deltas are
      * planned only after wave k-1's are materialized, re-anchored as
      * LogicalRDD leaves, and swapped into the step memo — so every plan
      * Catalyst ever sees is a SHALLOW tree over cached leaves. This is
      * the DBSP execution model (each operator computes its delta once per
      * step; parents consume stored results), and it is what keeps the
      * driver's planning cost per step O(circuit), not O(circuit depth ×
      * plan size): a single-pass variant that embeds child delta plans in
      * parents re-optimizes the shared subtrees once per parent and races
      * the union job against its own uncomputed caches. Jobs per step =
      * wave count (+1 for untraced-root sinks) — each small and shallow. */
    /** One synchronized step for several inputs. AQE is suspended for the
      * step's jobs by default: a step runs MANY delta-sized shuffle stages,
      * and adaptive execution inserts a materialization barrier + re-plan
      * per stage — measured ~20% of q100's wave wall-time at sf0.1 — while
      * having nothing to adapt on kilobyte deltas. Deployments whose
      * per-batch deltas are themselves huge (where runtime skew/coalesce
      * re-planning pays for its barriers) can set
      * `spark.graft.incremental.stepAqe=true` to keep AQE on inside steps;
      * batch/initial jobs outside stepAll are unaffected either way. */
    def stepAll(deltas: Inputs): Map[String, DataFrame] = {
      val aqeKey = "spark.sql.adaptive.enabled"
      val partsKey = "spark.sql.shuffle.partitions"
      val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
      val keepAqe = spark.conf.getOption("spark.graft.incremental.stepAqe")
        .exists(_.toBoolean)
      val prevAqe = spark.conf.getOption(aqeKey)
      val prevParts = spark.conf.getOption(partsKey)
      val prevBcast = spark.conf.getOption(bcastKey)
      val prevComp = pushCacheCompression()
      if (!keepAqe) spark.conf.set(aqeKey, "false")
      // Step-scoped broadcast threshold. A step's joins run against
      // ANCHORED frames whose stats are the actual cached byte sizes (see
      // GraftSqlBridge.reanchor), so estimates inside a step are honest —
      // and with AQE suspended, join strategy is decided purely from them.
      // Raising the threshold to 64 MB (conf-able) lets touched-key semi
      // joins and other delta-vs-state joins take the broadcast-hash path
      // (measured: the q160 probe-distinct refold's sort-merge null-safe
      // semi over 348k state rows cost 25 s task CPU vs 0.6 s broadcast —
      // the composite coalesce/isnull sort dominates). 64 MB broadcasts
      // are standard large-executor practice; deployments with tight
      // drivers can lower spark.graft.incremental.stepBroadcastBytes.
      // SIZING MARGIN: anchored stats are COMPRESSED columnar cache bytes,
      // and a broadcast hash relation deserializes to roughly 2-5x that —
      // the 64 MB default is chosen with that inflation in mind (worst
      // case ~300 MB built relation, routine executor practice; Spark's
      // own hard cap of 8 GB/512M rows stays far away). Deployments
      // sizing the conf themselves should budget the same multiplier.
      // SESSION OWNERSHIP: like the AQE and shuffle-width toggles above,
      // this is a session-global mutation for the step's duration — a
      // Runner step must own its session (callers running concurrent
      // queries on the same session fork it first, as the streaming
      // fixtures do via GraftSqlBridge.cloneSession). A thread-local
      // override cannot replace these: materializeWave plans on the
      // materializeEc pool threads, which a calling thread's SQLConf
      // clone does not reach.
      val stepBcast = spark.conf
        .getOption("spark.graft.incremental.stepBroadcastBytes")
        .map(_.toLong).getOrElse(64L << 20)
      if (stepBcast > 0) spark.conf.set(bcastKey, stepBcast.toString)
      try stepAllImpl(deltas)
      finally {
        popCacheCompression(prevComp)
        if (stepBcast > 0) prevBcast match {
          case Some(v) => spark.conf.set(bcastKey, v)
          case None => spark.conf.unset(bcastKey)
        }
        if (!keepAqe) prevAqe match {
          case Some(v) => spark.conf.set(aqeKey, v)
          case None => spark.conf.unset(aqeKey)
        }
        // stepAllImpl may have narrowed the shuffle width for the step's
        // delta-sized stages; restore on every exit path (unset when the
        // session never set it explicitly — conf.get would have read the
        // built-in default and pinned it).
        prevParts match {
          case Some(v) => spark.conf.set(partsKey, v)
          case None => spark.conf.unset(partsKey)
        }
      }
    }

    /** Groups fully re-scored by THIS Runner's TopKInc nodes in its last
      * step (−1 = no step yet; summed across TopKInc nodes) — spec /
      * GRAFT_STEP_DEBUG observability: a wave whose removals miss every
      * current top hit must report 0. Per-Runner by construction (the
      * StepCtx routes the count here), so concurrent Runners in other
      * queries or suites cannot clobber each other's reading. */
    @volatile private var rescanned: Long = -1L
    def lastRescanGroups: Long = rescanned

    /** Width floor derived from the prior step's measured task CPU time
      * (−1 = no step measured yet → full width); the per-slot target is
      * pinnable for tests/deployments. See the stepParts sizing below. */
    @volatile private var cpuFloorParts: Int = -1
    /** Previous step's own measured floor: the applied floor is the MAX of
      * the last two measurements, so a reading the bus drain still missed
      * (its events then land in the NEXT delta) widens rather than narrows
      * — the stated safety direction. */
    @volatile private var prevMeasuredFloor: Int = -1
    /** Per-slot CPU target for the width floor. 4 s (was 1 s, before that
      * 250 ms): the floor must only keep width for steps whose COMPUTE
      * needs it, but a wide step's own fixed work is itself task CPU —
      * per-task scheduling/dispatch, task-binary deserialization, cache
      * BUILD cost per partition (column builders run once per partition
      * per persisted frame), codegen'd iterator setup — all of it scaling
      * WITH width, so width begets width. At 1 s/slot q160's
      * overhead-inflated 25-45 s step CPU readings sustained floors of
      * 22-45 and the steps ran ~30% slower than at width 8 with identical
      * plans (measured sf0.1, and the c8 driver run beat c32 2.3× on the
      * same query). At 4 s/slot those steps derive floors ≤ 11 and narrow,
      * while genuinely compute-bound steps still widen: q151's closure
      * fixpoint measures 100+ s of step CPU → floor 25+, within 1.3× of
      * the session width on this box and far above the byte floor —
      * q151-class protection intact (StepWidthSpec pins it). */
    private val stepCpuPerSlotMs: Long = spark.conf
      .getOption("spark.graft.incremental.stepCpuMsPerSlot")
      .map(_.toLong).getOrElse(4000L)
    /** The shuffle width the last step actually chose — observability for
      * the width-regression specs (timing-free). */
    @volatile private var lastStepWidth: Int = -1
    def lastStepShuffleWidth: Int = lastStepWidth

    private def stepAllImpl(deltas: Inputs): Map[String, DataFrame] = {
      val unknown = deltas.keySet -- integrated.keySet
      require(unknown.isEmpty, s"deltas for undeclared inputs: $unknown")
      started = true
      rescanned = 0L
      val cpuNsBefore = Runner.taskCpuNs(spark.sparkContext)
      val active = deltas.keySet
      def touchedNode(n: Inc): Boolean = sourcesBelow(n.id).exists(active)

      // Compact states whose appended deltas outgrew their base (union
      // > 2× the last compacted size) or that hit the lineage bound —
      // decided from the PREVIOUS step's sizes and swapped in lazily here,
      // so the compaction (the only O(state) shuffle) executes inside the
      // first materialization pass: every delta plan that reads the state
      // populates/reads the one cache entry.
      val compacts: Map[String, DataFrame] = phase("compact-plans") {
        constituents.keys.filter { k =>
          pending.getOrElse(k, 0) >= consolidateEvery ||
            accSize.getOrElse(k, 0L) > math.max(baseSize.getOrElse(k, 0L), 1L)
        }.map { k =>
          // MEMORY_AND_DISK explicitly: compacted state under heap pressure
          // must degrade to disk reads, never to full-lineage recompute.
          val c = ZSet.consolidate(stateByKey(k))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          setState(k, c)
          k -> c
        }.toMap
      }

      val persisted = mutable.ArrayBuffer.empty[DataFrame]
      val anchorOf = new java.util.IdentityHashMap[DataFrame, DataFrame]()
      // frames that already ARE anchored leaves (e.g. a traced root's delta
      // read back out of the memo) — re-materializing them would double-cache
      val anchors = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]())
      def anchored(df: DataFrame): DataFrame =
        Option(anchorOf.get(df)).getOrElse(df)
      /** Persist + materialize one wave (a single multi-threaded union
        * job), then re-anchor each frame onto its computed RDD. */
      def materializeWave(dfs: Seq[DataFrame], extras: Seq[DataFrame]): Unit = {
        val fresh = dfs.distinct
          .filterNot(anchorOf.containsKey).filterNot(anchors.contains)
        if (fresh.nonEmpty || extras.nonEmpty) {
          phase("  persist")(fresh.foreach(_.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
          materialize(fresh ++ extras)
          phase("  reanchor")(fresh.foreach { df =>
            val a = org.apache.spark.sql.GraftSqlBridge.reanchor(df)
            anchorOf.put(df, a)
            anchors.add(a)
          })
          persisted ++= fresh
        }
      }

      // Step-scoped shuffle width. A step's shuffles move delta-sized and
      // state-sized frames whose bytes the Runner tracks exactly
      // (baseSize/accSize per state) — at the session's full width every
      // one of those stages pays a fixed per-task scheduling floor for
      // kilobyte partitions (measured: q160 sf0.1 steps at width 8 run
      // ~30% faster than at 32 with identical plans). Size to ~32 MB per
      // partition over touched state bytes + the incoming delta plans'
      // optimizer estimates (caller plans over parquet estimate at file
      // size — an OVERestimate, which errs toward keeping full width),
      // floored at 8, capped at the session width so a genuinely large
      // step (snapshot bootstrap pushed through step, TB-delta
      // deployments) keeps every core busy while steady-state small
      // deltas stop paying 32 scheduling floors per stage. Pinnable via
      // spark.graft.incremental.stepShufflePartitions; session-global for
      // the step's duration, like the AQE suspension above. Physical
      // planning (where Spark reads the width) happens at materialization
      // time, so the compaction plans built above are narrowed too —
      // their bytes are part of the same estimate.
      val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val stepParts: Int = spark.conf
        .getOption("spark.graft.incremental.stepShufflePartitions")
        .map(_.toInt).getOrElse {
          def planBytes(df: DataFrame): Long = {
            // Size from a FRESH wrapper Dataset: forcing the caller frame's
            // OWN QueryExecution here would pin its plan BEFORE wave-0's
            // persist registers it, and Spark's lazy QE then skips cache
            // substitution for every later action on that frame — the
            // persist never builds, each downstream reference re-executes
            // the raw delta plan, and cachedSizeBytes falls back to the
            // join-inflated optimizer estimate (measured: q151's 3,000-row
            // delta reading 149 MB, defeating the closure's local kernel).
            val s = try df.select(col("*"))
              .queryExecution.optimizedPlan.stats.sizeInBytes
            catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
            if (s > Long.MaxValue) Long.MaxValue else s.toLong
          }
          // Compute-bound steps keep width: derived from the PREVIOUS
          // step's MEASURED task CPU time, not an operator whitelist (r13
          // verdict #3 — the q151 closure fixpoint at byte-width 8 ran
          // 27.6 s vs 8.8 s at 32, and any future compute-heavy operator
          // would have silently re-tripped a type list). cpuFloorParts is
          // the width at which the prior step's CPU spreads to
          // ~stepCpuPerSlotMs per slot; the first step has no measurement
          // and errs wide (it is also usually the bootstrap-sized one).
          val byteSized = {
            val touchedBytes = (
              tracedNodes.filter(touchedNode)
                .map(n => stateBytes(traceKey(n.id))) ++
                active.toSeq.map(s => stateBytes(inKey(s))) ++
                active.toSeq.map(s => planBytes(deltas(s)))
              ).foldLeft(0L)(satAdd)
            val target = 32L << 20
            if (touchedBytes >= target.toLong * sessionParts) sessionParts
            else math.max(8L, (touchedBytes + target - 1) / target)
              .min(sessionParts).toInt
          }
          if (cpuFloorParts < 0) sessionParts
          else math.max(byteSized, math.min(cpuFloorParts, sessionParts))
        }
      lastStepWidth = stepParts
      if (sys.env.contains("GRAFT_STEP_DEBUG"))
        println(s"STEPPARTS $stepParts (session $sessionParts)")
      if (stepParts != sessionParts)
        spark.conf.set("spark.sql.shuffle.partitions", stepParts)

      // Wave 0: raw input deltas (+ pending compactions ride along) — every
      // downstream delta then reads an anchored leaf instead of re-scanning
      // the caller's plan.
      val inputDeltas: Seq[(String, DataFrame)] =
        active.toSeq.map(n => n -> deltas(n))
      phase("wave-0")(materializeWave(inputDeltas.map(_._2), compacts.values.toSeq))

      val full: Inputs = integrated.map { case (n, z) =>
        // limit(0) over the cached state optimizes to an empty LocalRelation,
        // so Catalyst's PropagateEmptyRelation prunes every untouched branch
        // out of the step's plans.
        n -> deltas.get(n).map(anchored).getOrElse(z.limit(0))
      }
      // Cached sizes of this step's (just-materialized) input deltas — with
      // the state bookkeeping these drive small-regime operator decisions.
      val inputDeltaBytes: Map[String, Long] =
        inputDeltas.map { case (nm, d) => nm -> cachedSizeBytes(d) }.toMap
      val ctx = new StepCtx(integrated, full,
        id => if (tracedIds(id)) Some(traceOf(id)) else None,
        id => stateBytes(traceKey(id)),
        n => sourcesBelow(n.id).toSeq
          .map(s => satAdd(stateBytes(inKey(s)),
            inputDeltaBytes.getOrElse(s, 0L)))
          .foldLeft(0L)(satAdd),
        n => !touchedNode(n),
        deltaSchemas,
        n => rescanned += n)

      // Settle the compactions now that they're materialized: re-anchor,
      // release every constituent they folded in, reset bookkeeping.
      compacts.foreach { case (k, c) =>
        baseSize(k) = math.max(cachedSizeBytes(c), 1L)
        accSize(k) = 0L
        pending(k) = 0
        constituents(k).foreach(decref)
        incref(c)
        constituents(k) = List(c)
        setState(k, org.apache.spark.sql.GraftSqlBridge.reanchor(c))
      }

      // Waves 1..K: traced operators bottom-up; each node's delta is
      // computed once, materialized, and re-anchored into the memo before
      // any parent's delta is planned.
      val advTraces = mutable.ArrayBuffer.empty[(Inc, DataFrame)]
      val maxWave = waveOf.values.maxOption.getOrElse(0)
      for (w <- 1 to maxWave) {
        val waveNodes =
          tracedNodes.filter(n => waveOf(n.id) == w && touchedNode(n))
        if (waveNodes.nonEmpty) phase(s"wave-$w") {
          val ds = waveNodes.map(n => n -> ctx.deltaOf(n))
          materializeWave(ds.map(_._2), Nil)
          ds.foreach { case (n, d) => ctx.setDelta(n, anchored(d)) }
          advTraces ++= ds
        }
      }

      // Sink deltas: a traced root's delta is already anchored in the memo;
      // untraced roots (linear chains over traced/source leaves) need one
      // final shallow pass.
      val rootDeltas: Map[String, DataFrame] = phase("root-deltas") {
        val rd = roots.map { case (nm, r) => nm -> ctx.deltaOf(r) }.toMap
        materializeWave(rd.values.toSeq, Nil)
        rd
      }

      // Advance each touched state as a LAZY union of its previous value
      // and the anchored delta leaf — nothing to plan, nothing to run; the
      // delta's cache entry is pinned (refcounted — deltas are shared
      // across states) until a compaction folds it into the state's base.
      // (key, new state union, this step's constituent original)
      val advancedStates: Seq[(String, DataFrame, DataFrame)] =
        advTraces.toSeq.map { case (n, d) =>
          (traceKey(n.id), ZSet.plus(traceOf(n.id), anchored(d)), d)
        } ++
          outs.collect {
            case (nm, o) if touchedNode(rootOf(nm)) =>
              (outKey(nm), ZSet.plus(o, anchored(rootDeltas(nm))), rootDeltas(nm))
          } ++
          inputDeltas.map { case (nm, d) =>
            (inKey(nm), ZSet.plus(integrated(nm), anchored(d)), d)
          }
      advancedStates.foreach { case (k, st, d) =>
        incref(d)
        constituents(k) = constituents.getOrElse(k, Nil) :+ d
        pending(k) = pending.getOrElse(k, 0) + 1
        accSize(k) = accSize.getOrElse(k, 0L) + cachedSizeBytes(d)
        setState(k, st)
      }

      // Helper caches registered by eager operators (fixpoint chunks) are
      // no longer needed once every wave is materialized.
      ctx.drainDeferred().foreach(_.unpersist(false))

      // One reference on this step's deltas is held for the caller and
      // released at the next step.
      val stepDeltas = persisted.toSeq
      stepDeltas.foreach(incref)
      lastDeltas.foreach(decref)
      lastDeltas = stepDeltas

      // Feedback for the NEXT step's width: how many slots would spread
      // this step's measured task CPU to ~stepCpuPerSlotMs each. A
      // shuffle-floor-bound step (kilobyte deltas, CPU ≪ floor) derives a
      // small floor and stays narrow; a compute-bound step (fixpoint
      // re-derivation over stored closure) derives a wide floor without
      // anyone having to declare its operator compute-bound. Tasks from
      // concurrent queries inflate the reading, erring wide (safe).
      // onTaskEnd events arrive ASYNCHRONOUSLY on the listener bus: drain
      // it (bounded) before snapshotting, and additionally retain the max
      // of the last two measurements — an under-counted step (drain timed
      // out; its stragglers land in the next delta) then errs WIDE for one
      // step instead of serializing a compute-bound successor (the
      // q151-class regression this measurement replaces the whitelist to
      // prevent).
      org.apache.spark.GraftSparkBridge.drainListenerBus(
        spark.sparkContext, 2000L)
      val stepCpuMs = (Runner.taskCpuNs(spark.sparkContext) - cpuNsBefore) / 1000000L
      val measuredFloor = math.max(8L, stepCpuMs / math.max(1L, stepCpuPerSlotMs))
        .min(Int.MaxValue).toInt
      cpuFloorParts = math.max(measuredFloor, prevMeasuredFloor)
      prevMeasuredFloor = measuredFloor
      if (sys.env.contains("GRAFT_STEP_DEBUG"))
        println(s"STEPCPU ${stepCpuMs}ms -> next floor $cpuFloorParts")

      rootDeltas.map { case (nm, d) => nm -> anchored(d) }
    }

    /** Integral of a sink's output deltas so far, including the Q(∅) seed
      * (weights merged lazily by the consumer — wrap in ZSet.consolidate
      * for canonical rows). */
    def output(name: String): DataFrame = {
      val r = rootOf.getOrElse(name, throw new IllegalArgumentException(
        s"unknown sink $name (have ${roots.map(_._1).mkString(", ")})"))
      if (tracedIds(r.id)) traceOf(r.id) else outs(name)
    }
    def output: DataFrame = output(primary)

    /** Full recompute over the integrated inputs — the equivalence oracle. */
    def recompute(name: String): DataFrame =
      ZSet.consolidate(rootOf(name).batch(integrated))
    def recompute: DataFrame = recompute(primary)

    /** Consolidated positive rows of one source's integrated input — the
      * current corpus a REBUILD bootstraps from (e.g. an IVF requantize:
      * retrain the quantizer on this state, re-bucket, resume —
      * Similarity.requantizeIvf). One consolidated scan of stored state;
      * no trace is recomputed. */
    def inputState(name: String): DataFrame = {
      require(schemas.contains(name), s"unknown source $name")
      ZSet.toRows(ZSet.consolidate(integrated(name)))
    }

    /** One Spark job materializing every given cached plan (populates the
      * block-manager caches; InMemoryRelation's accumulators then carry the
      * sizes the consolidation heuristic reads — no per-state actions).
      *
      * RDD construction runs in parallel: under AQE, building a cached
      * plan's RDD executes its shuffle stages as eager blocking jobs
      * (AdaptiveSparkPlanExec.getFinalPhysicalPlan), so a serial loop over
      * N states pays N× the stage latency; concurrent submission lets the
      * scheduler overlap them (the multi-threaded-driver pattern Spark
      * documents — on a cluster this is N concurrent job groups). */
    private def materialize(dfs: Seq[DataFrame]): Unit = if (dfs.nonEmpty) {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = Runner.materializeEc
      // Delta/compaction plans are built over WARM state: cached frames
      // whose sizes are known (broadcastIfSmall decides broadcasts from
      // actual cached stats), so AQE's runtime re-planning buys nothing
      // here while costing a re-optimization pass plus a blocking job
      // round PER SHUFFLE STAGE per plan — the per-micro-batch latency
      // floor. Planning these passes non-adaptively lets the single union
      // job run every stage of every delta concurrently. Cold-scan-heavy
      // deployments can re-enable with adaptiveDeltas=true.
      val prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
      if (!adaptiveDeltas) spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
      val rdds = Await.result(
        Future.sequence(dfs.zipWithIndex.map { case (df, i) => Future {
          val t0 = System.nanoTime()
          if (sys.env.contains("GRAFT_STEP_EXPLAIN"))
            println(s"STEPPLAN[$i]\n${df.queryExecution.executedPlan.treeString.take(8000)}")
          val r = df.queryExecution.toRdd.map(_ => ())
          if (debugTiming)
            println(f"STEPPHASE   toRdd-$i%-8d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
          r
        }}),
        Duration.Inf)
      val t1 = System.nanoTime()
      if (sys.env.contains("GRAFT_STEP_ISOLATE")) {
        // Debug-only: run each frame's job SEQUENTIALLY and attribute task
        // CPU per frame (slower than the union job; never the bench path).
        rdds.zipWithIndex.foreach { case (r, i) =>
          val ti = System.nanoTime()
          val cpu0 = Runner.taskCpuNs(spark.sparkContext)
          val n = r.count()
          org.apache.spark.GraftSparkBridge.drainListenerBus(
            spark.sparkContext, 2000L)
          val cpuMs = (Runner.taskCpuNs(spark.sparkContext) - cpu0) / 1000000L
          println(f"STEPISO[$i] wall ${(System.nanoTime() - ti) / 1e9}%7.2f s cpu $cpuMs%6d ms rows=$n")
        }
      } else
      spark.sparkContext.union(rdds).count()
      if (debugTiming)
        println(f"STEPPHASE   union-job        ${(System.nanoTime() - t1) / 1e9}%7.2f s (${dfs.size} states)")
      } finally {
        if (!adaptiveDeltas) spark.conf.set("spark.sql.adaptive.enabled", prior)
      }
    }

    /** Post-materialization cached size of a persisted DataFrame, from the
      * cache entry's BUILD-TIME size accumulator (no job). The previous
      * `withCachedData.collectFirst{ InMemoryRelation }.stats` read could
      * silently return the plan's OPTIMIZER estimate (InMemoryRelation
      * .stats falls back to it when the buffers-loaded check misses), and
      * a join-derived estimate inflates 1000× — measured: q151's 3,000-row
      * step-1 delta read 149 MB, pushing the closure off its local kernel
      * onto the ~15-job distributed DRed cascade and poisoning accSize for
      * the rest of the run. Falls back to the old path only when the
      * accumulator route finds no built entry. */
    private def cachedSizeBytes(df: DataFrame): Long =
      org.apache.spark.sql.GraftSqlBridge.cachedBuiltBytes(df).getOrElse {
        val stats = df.queryExecution.withCachedData.collectFirst {
          case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            r.stats.sizeInBytes
        }.getOrElse(df.queryExecution.optimizedPlan.stats.sizeInBytes)
        if (stats > Long.MaxValue) Long.MaxValue else stats.toLong
      }

    /** Persist consolidated state to parquet so maintenance can resume in a
      * later session/process — the durable-state-table shape a cluster
      * deployment uses (checkpoint per micro-batch via foreachBatch).
      * Writes the input integrals, every operator trace, and stateless-root
      * output integrals under deterministic names (the DFS node order, so a
      * rebuilt identical circuit restores into the same slots).
      *
      * Each table is written to a temp dir and swapped in, and the live
      * state is re-anchored onto the freshly written files: after a
      * restore, the state's lineage points INTO the checkpoint dir, and
      * overwriting files that lazy plans still reference would re-apply the
      * step's delta on any cache miss. Re-anchoring also cuts the lineage
      * to any foreachBatch micro-batch DataFrame, which is only valid
      * during its batch. */
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
      integrated.foreach { case (n, z) => writeSwap(ZSet.consolidate(z), s"$dir/${inKey(n)}") }
      outs.foreach { case (n, o) => writeSwap(ZSet.consolidate(o), s"$dir/${outKey(n)}") }
      tracedNodes.foreach(n => writeSwap(ZSet.consolidate(traceOf(n.id)), s"$dir/${traceKey(n.id)}"))
      integrated = integrated.map { case (n, _) => n -> spark.read.parquet(s"$dir/${inKey(n)}") }
      outs = outs.map { case (n, _) => n -> spark.read.parquet(s"$dir/${outKey(n)}") }
      tracedNodes.foreach(n =>
        traces(n.id) = spark.read.parquet(s"$dir/${traceKey(n.id)}"))
      releaseAll()
    }

    /** Release every cache this Runner holds (persisted state unions,
      * retained deltas) WITHOUT writing anything durable. Call when the
      * Runner is superseded — e.g. the old side of a blue/green
      * requantize swap (Similarity.requantizeIvf) — so the stale index's
      * storage doesn't stay resident for the rest of the session. The
      * Runner must not be stepped afterwards; reading its outputs may
      * recompute from full lineage instead of caches. */
    def decommission(): Unit = releaseAll()

    /** Drop every cache reference (states now anchor on durable storage). */
    private def releaseAll(): Unit = {
      constituents.values.flatten.foreach(decref)
      constituents.clear()
      lastDeltas.foreach(decref)
      lastDeltas = Nil
      baseSize.clear(); accSize.clear(); pending.clear()
    }

    /** Resume from a checkpoint written by `checkpoint` (same circuit
      * structure — node slots match by deterministic DFS order). */
    def restore(dir: String): Unit = {
      integrated = integrated.map { case (n, _) => n -> spark.read.parquet(s"$dir/${inKey(n)}") }
      outs = outs.map { case (n, _) => n -> spark.read.parquet(s"$dir/${outKey(n)}") }
      tracedNodes.foreach(n =>
        traces(n.id) = spark.read.parquet(s"$dir/${traceKey(n.id)}"))
      releaseAll()
    }
  }
}
