package graft.engine

import graft.streaming.Incremental
import graft.streaming.Incremental.Inc
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Sum}
import org.apache.spark.sql.catalyst.plans.{FullOuter, InnerLike, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.GraftSqlBridge

import scala.collection.mutable

/** SQL → incremental circuit translator: the step that makes `CREATE VIEW`
  * text incrementally maintainable, mirroring the reference's pipeline
  * (Calcite RelNode → DBSP circuit, CalciteToDBSPCompiler.java:72, then
  * incrementalized by IncrementalizeVisitor/OptimizeIncrementalVisitor —
  * SURVEY §4.2). Here Spark's analyzer is the front-end: we walk the
  * *analyzed* logical plan of the view and emit the equivalent
  * `Incremental.Inc` circuit over the named source tables.
  *
  * Supported plan shapes: source scans, Project, Filter (including
  * EXISTS / [NOT] IN subquery predicates, lowered to semi/anti circuits —
  * correlated EXISTS may mix equality keys with inequality residuals, and
  * NOT IN over nullable columns takes the null-aware 3VL circuit),
  * joins of every type with arbitrary equi keys and residual predicates
  * (single-sided conjuncts pushed below inner joins; outer-join residuals
  * pad "unmatched after residual" via null-safe row-value matching;
  * CROSS JOIN and pure-theta joins compile as unit-key bilinear joins —
  * the reference's empty-key lowering, CalciteToDBSPCompiler.java:584 —
  * sized for a small side against a fact stream),
  * grouped aggregates
  * over plain or computed keys and keyless (global) aggregates with the
  * empty-input zero row (any Spark aggregate function — groups re-fold
  * from consolidated state, so non-linear MIN/MAX/AVG are exact under
  * retractions), ROLLUP/CUBE/GROUPING SETS (Expand is linear),
  * UNNEST/explode (Generate is linear), DISTINCT, UNION [ALL],
  * EXCEPT [ALL], INTERSECT [ALL], windows (partitioned: touched-partition
  * re-fold; global: whole-state re-evaluation; computed PARTITION BY
  * projected below), ORDER BY ... LIMIT top-k views, bare ORDER BY
  * (presentation-only), WITH ... CTEs (inlined, including refs inside
  * subquery expressions), scalar subqueries in select lists and filter
  * predicates (uncorrelated: constant-key join; correlated: decorrelated
  * grouped join with the aggregate-over-empty default), uncorrelated
  * EXISTS (a global COUNT(*) trace on a constant key gating the outer
  * relation), and subquery aliases / nested views. Genuinely unsupported
  * shapes — LIMIT without ORDER BY, non-aggregate scalar subqueries —
  * throw `UnsupportedPlanException` with an explanation; the fallback is
  * the manual `Incremental` DSL.
  *
  * Cost note: the Runner stores an output trace per non-linear operator
  * (the reference's per-operator integrals, IncrementalizeVisitor.java:
  * 35-63 / OptimizeIncrementalVisitor.java:96-164), so a composite view's
  * per-step cost is O(|delta| + touched groups) per operator — inner
  * aggregates and join inputs are read from stored state, never re-derived
  * from the raw source integrals.
  */
object SqlIncremental {

  final class UnsupportedPlanException(msg: String)
    extends IllegalArgumentException(msg)

  /** Compile a SQL query into an incremental circuit over `sources`
    * (names of tables registered as temp views). */
  def compile(spark: SparkSession, sql: String, sources: Set[String]): Inc = {
    // clear the strategy probe so a compile that never reaches the NOT IN
    // lowering cannot report a PREVIOUS compile's branch as its own
    notInStrategyTL.remove()
    val analyzed = spark.sql(sql).queryExecution.analyzed
    // Spark lowercases temp-view names in analyzed plans; map back to the
    // declared source spelling so Runner input keys line up.
    val byLower = sources.map(s => s.toLowerCase -> s).toMap
    // LATERAL joins are decorrelated BEFORE the global name-dedup pass:
    // the joins Spark synthesizes during decorrelation routinely duplicate
    // left-side names (`SELECT x.a, y.b ... LATERAL (SELECT b ...)`), and
    // only a whole-plan dedup can rename the clash consistently through
    // the ANCESTOR nodes that reference the lateral's output (a
    // subtree-local dedup leaves the parent projection ambiguous). The
    // root projection re-pins the query's original output names — at the
    // sink duplicates are legal because nothing above resolves by name.
    val inlined = inlineCtes(analyzed)
    val decorr = decorrelateLaterals(inlined)
    val rooted =
      if (decorr eq inlined) inlined
      else Project(
        inlined.output.map(a => Alias(a, a.name)(): NamedExpression), decorr)
    val deduped = dedupJoinNames(rooted)
    val inc = walk(deduped, byLower)
    // A top-level projection may legitimately repeat names (`SELECT u.a,
    // w.a, x.a` over merged keys) — legal as a QUERY result, but the
    // Runner's state machinery is name-addressed (unionByName advances,
    // by-name consolidation), so duplicate sink names are uniquified
    // positionally (a, a__dup1, …). SLT/batch consumers compare values
    // positionally; named consumers were already told to alias apart.
    val outCols = circuitCols(deduped)
    if (outCols.map(_.toLowerCase).distinct.size == outCols.size) inc
    else {
      val seen = mutable.Map.empty[String, Int]
      // A generated name must not collide with ANY output name (a query
      // can itself project a column literally named a__dup1) nor with a
      // previously generated one — loop the suffix until free.
      val allLower = outCols.map(_.toLowerCase).toSet
      val emitted = mutable.Set.empty[String]
      val uniq = outCols.map { n =>
        val k = n.toLowerCase
        val c = seen.getOrElse(k, 0)
        seen(k) = c + 1
        val out =
          if (c == 0) n
          else {
            var i = c
            var cand = s"${n}__dup$i"
            while (allLower.contains(cand.toLowerCase) ||
                   emitted.contains(cand.toLowerCase)) {
              i += 1; cand = s"${n}__dup$i"
            }
            cand
          }
        emitted += out.toLowerCase
        out
      }
      inc.linear { df =>
        val it = uniq.iterator
        df.toDF(df.columns.map(c =>
          if (c == graft.zset.ZSet.W) c else it.next()): _*)
      }
    }
  }

  /** Debug-only: the plan as the circuit walker will see it (CTEs
    * inlined, laterals decorrelated, join names deduped). */
  private[graft] def debugLowered(spark: SparkSession, sql: String): LogicalPlan = {
    val analyzed = spark.sql(sql).queryExecution.analyzed
    val inlined = inlineCtes(analyzed)
    val decorr = decorrelateLaterals(inlined)
    val rooted =
      if (decorr eq inlined) inlined
      else Project(
        inlined.output.map(a => Alias(a, a.name)(): NamedExpression), decorr)
    dedupJoinNames(rooted)
  }

  /** Compile with per-call tuning overrides (e.g. the range-join bin
    * width) instead of mutating the SHARED session conf — a `conf.set` on
    * a session other queries are concurrently planning against would
    * transiently re-plan them. Overrides are thread-local to this compile
    * call and consulted before the session conf. */
  def compile(spark: SparkSession, sql: String, sources: Set[String],
              overrides: Map[String, String]): Inc = {
    val prev = compileConf.get // restore, not clear: tolerate re-entrancy
    compileConf.set(prev ++ overrides)
    try compile(spark, sql, sources)
    finally { if (prev.isEmpty) compileConf.remove() else compileConf.set(prev) }
  }

  private val compileConf = new ThreadLocal[Map[String, String]] {
    override def initialValue(): Map[String, String] = Map.empty
  }
  private def confGet(spark: SparkSession, key: String, default: String): String =
    compileConf.get.getOrElse(key, spark.conf.get(key, default))

  /** Which multi-column NULL-aware NOT IN lowering the last compile ON
    * THIS THREAD chose — `"static-mask"` (≤3 nullable columns per side)
    * or `"pattern-grouped"` (beyond that). Circuit-shape observability so
    * a gate query exercising the pattern-grouped branch can PROVE the
    * branch was taken (thread-local, so concurrent compiles in other
    * queries cannot clobber the reading). */
  private val notInStrategyTL = new ThreadLocal[String]
  private[graft] def lastNotInStrategy: Option[String] =
    Option(notInStrategyTL.get)

  /** Compile several views into circuits that SHARE structurally identical
    * sub-circuits — the reference's one-circuit-many-output-handles model
    * (MultiViewTests): two views over the same CTE/aggregate/join subtree
    * get the SAME `Inc` instance for it, so the multi-sink Runner keeps ONE
    * trace and advances it once per step. Equivalence is Catalyst's own:
    * sub-plans are memoized by `LogicalPlan.canonicalized` (normalized
    * exprIds — exactly the `sameResult` relation), so textual differences
    * that analyze to the same plan still share. Output names are handled,
    * not ignored: canonicalization erases alias names (`SELECT a AS x`
    * and `SELECT a AS y` canonicalize equal) while an Inc's downstream
    * operators address its columns by name, so a hit whose stored names
    * differ shares the node through a linear rename projection (handing
    * view 2 the stored circuit verbatim would leak view 1's aliases).
    * Source scans are resolved before the memo: canonicalization
    * strips `SubqueryAlias`, and two empty sources with identical schemas
    * would otherwise collide. */
  def compileAll(spark: SparkSession, views: Seq[(String, String)],
                 sources: Set[String]): Seq[(String, Inc)] = {
    memo.set(mutable.HashMap.empty)
    try views.map { case (n, sql) => n -> compile(spark, sql, sources) }
    finally memo.remove()
  }

  /** Cross-view structural-CSE memo, active only inside [[compileAll]]
    * (thread-local: concurrent compilations on other threads are
    * unaffected; `null` = disabled). Keyed by the canonicalized plan with
    * the OUTPUT NAMES stored alongside: canonicalization erases aliases,
    * so a name-blind hit would hand view 2 a circuit carrying view 1's
    * column names. A hit whose names differ still SHARES the node (and
    * its trace) through a linear rename projection. */
  private val memo =
    new ThreadLocal[mutable.HashMap[LogicalPlan, (Inc, Seq[String])]]

  /** Fresh-name counter for [[dedupJoinNames]] — global so rename targets
    * are unique even across nested subquery compilations (an EXISTS
    * lowering joins outer- and subquery-derived nodes, so their internal
    * names share one namespace). */
  private val dedupCounter = new java.util.concurrent.atomic.AtomicInteger

  /** Rename right-side join columns whose names collide with the left
    * side. The analyzed plan disambiguates by exprId, but the circuit
    * world addresses columns BY NAME, so a self-join like
    * `SELECT u.a, w.a FROM t u JOIN t w ON u.a = w.b` would be ambiguous
    * after translation (previously rejected). This pre-pass puts a rename
    * projection under the join's right input (`a` → `a__rN`) and lets
    * Catalyst's `transformUpWithNewOutput` rewrite every ancestor
    * reference to the fresh attribute, so the name-addressed lowering
    * sees unique names throughout.
    *
    * Same-named equi keys stay un-renamed for inner/semi/anti joins —
    * they merge USING-style into one value-equal column. OUTER joins
    * rename them too: with a merged key, a query reading the inner
    * side's key would see the preserved side's value where the correct
    * answer is the NULL pad; as a renamed pair the inner side's key is
    * its own column and pads correctly.
    *
    * Correlated subqueries are then re-anchored by exprId (their
    * `OuterReference`s live inside the subquery plan, which
    * `transformUpWithNewOutput` does not reach), and each subquery plan
    * is deduplicated recursively for its own internal joins. */
  private[graft] def dedupJoinNames(p: LogicalPlan): LogicalPlan = {
    val mapping = mutable.Map.empty[ExprId, AttributeReference]
    // fresh exprId → fresh name: `transformUpWithNewOutput` rewrites
    // ancestor references to the new exprId but KEEPS the old attribute
    // name (names are cosmetic in Catalyst's exprId world) — this
    // lowering is name-addressed, so a second pass re-names those refs
    val newName = mutable.Map.empty[ExprId, String]
    val deduped0 = p.transformUpWithNewOutput {
      case j @ Join(left, right, joinType, cond, _) =>
        // Effective (post-rename) names: renames from already-visited
        // joins only land as ATTRIBUTE names in the second pass below, so
        // at visit time an attribute's `name` can be stale. Chained
        // double-LATERALs hit exactly this — the second domain join's
        // condition pairs the copied subtree's fresh attr against an
        // already-renamed one; judging "same-named key" by the stale name
        // marks it mergeable, skips the rename, and the walker later
        // rejects the collision. Consult the plan-global rename registry.
        def eff(a: Attribute): String =
          newName.getOrElse(a.exprId, a.name)
        val leftNames = left.output.map(eff(_).toLowerCase).toSet
        val mergeable = joinType match {
          case _: InnerLike | LeftSemi | LeftAnti => true
          case _ => false
        }
        val keepSame: Set[ExprId] =
          if (!mergeable) Set.empty
          else analyzeCondition(cond, left, right)._1.collect {
            case EquiPair(a, b, _) if eff(a).equalsIgnoreCase(eff(b)) =>
              b.exprId
          }.toSet
        val clash = right.output.filter(a =>
          leftNames.contains(eff(a).toLowerCase) && !keepSame.contains(a.exprId))
        if (clash.isEmpty) j -> Nil
        else {
          val renames: Map[ExprId, Alias] = clash.map(a => a.exprId ->
            Alias(a, s"${eff(a)}__r${dedupCounter.incrementAndGet()}")()).toMap
          val projList: Seq[NamedExpression] =
            right.output.map(a => renames.getOrElse(a.exprId, a))
          val newCond = cond.map(_.transformUp {
            case a: AttributeReference if renames.contains(a.exprId) =>
              renames(a.exprId).toAttribute
          })
          val attrMap = clash.map(a =>
            (a: Attribute) -> (renames(a.exprId).toAttribute: Attribute))
          mapping ++= renames.map { case (id, al) => id ->
            al.toAttribute.asInstanceOf[AttributeReference] }
          newName ++= renames.values.map(al => al.exprId -> al.name)
          // semi/anti output is the left side alone: the renamed attrs
          // never escape, so nothing upstream needs remapping
          val visible = joinType match {
            case LeftSemi | LeftAnti => Nil
            case _ => attrMap
          }
          j.copy(right = Project(projList, right), condition = newCond) -> visible
        }
    }
    val deduped =
      if (newName.isEmpty) deduped0
      else deduped0.transformUpWithSubqueries {
        case q => q.transformExpressions {
          case a: AttributeReference
              if newName.get(a.exprId).exists(_ != a.name) =>
            a.withName(newName(a.exprId))
          // OuterReference is a LEAF expression (Catalyst shields outer
          // attrs from transforms), so the AttributeReference case above
          // never reaches its payload — and transformUpWithNewOutput has
          // ALREADY re-pointed subquery outer refs at the fresh exprId
          // while keeping the stale name, so the exprId-keyed re-anchoring
          // below misses them too. Rename the payload explicitly: a
          // correlated EXISTS keyed on a renamed join column otherwise
          // compiles its semi join against whatever column still carries
          // the OLD name on the other side (caught by rjoin.test).
          case OuterReference(a: AttributeReference)
              if newName.get(a.exprId).exists(_ != a.name) =>
            OuterReference(a.withName(newName(a.exprId)))
        }
      }
    deduped.transformAllExpressions {
      case s: SubqueryExpression =>
        val anchored =
          if (mapping.isEmpty) s.plan
          else s.plan.transformUpWithSubqueries {
            case q => q.transformExpressions {
              case OuterReference(a: AttributeReference)
                  if mapping.contains(a.exprId) =>
                OuterReference(mapping(a.exprId))
            }
          }
        val rec = dedupJoinNames(anchored)
        if (rec eq s.plan) s else s.withNewPlan(rec)
    }
  }

  /** Decorrelate every LATERAL join in the plan with Spark's OWN
    * optimizer rules, applied per-LateralJoin SUBTREE (running them on
    * the whole plan would also pull up EXISTS/IN/scalar subqueries this
    * compiler lowers itself from their analyzed form).
    * PullupCorrelatedPredicates runs DecorrelateInnerQuery on the lateral
    * body (equality AND inequality correlation, aggregates via domain
    * joins); RewriteLateralSubquery then folds it into a plain Join the
    * circuit walker already compiles. The rewrite preserves the
    * LateralJoin's output attributes, so ancestor references stay valid;
    * the caller runs the global dedupJoinNames pass afterwards to rename
    * the left/right name clashes domain joins produce by construction. */
  private def decorrelateLaterals(p: LogicalPlan): LogicalPlan =
    if (!p.exists(_.isInstanceOf[LateralJoin])) p
    else p.transformUp { case lj: LateralJoin => decorrelateOneLateral(lj) }

  private def decorrelateOneLateral(lj: LateralJoin): LogicalPlan = {
    import org.apache.spark.sql.catalyst.optimizer.{
      PullupCorrelatedPredicates, RewriteLateralSubquery}
    val rewritten =
      try RewriteLateralSubquery(PullupCorrelatedPredicates(lj))
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new UnsupportedPlanException(
            s"LATERAL decorrelation failed: ${e.getMessage}")
      }
    if (rewritten.exists(_.isInstanceOf[LateralJoin]))
      throw new UnsupportedPlanException(
        "correlated LATERAL shape Spark cannot decorrelate")
    rewritten
  }

  /** Inline every WITH ... CTE before compilation (the optimizer's
    * InlineCTE does the same; re-anchoring is by name, so the ref/def
    * exprId mismatch is immaterial). Must traverse INTO subquery
    * expressions — a CTE referenced inside a scalar subquery is invisible
    * to a plain transform. A CTE used twice simply appears twice in the
    * circuit. */
  private def inlineCtes(p: LogicalPlan): LogicalPlan = {
    var defs = Map.empty[Long, LogicalPlan]
    var cur = p.transformUpWithSubqueries {
      case w: WithCTE =>
        w.cteDefs.foreach(d => defs += d.id -> d.child)
        w.plan
    }
    var changed = true
    while (changed) {
      changed = false
      cur = cur.transformUpWithSubqueries {
        case r: CTERelationRef if defs.contains(r.cteId) =>
          changed = true; defs(r.cteId)
      }
    }
    cur
  }

  private def walk(plan: LogicalPlan, sources: Map[String, String]): Inc =
    plan match {
      case SubqueryAlias(id, _) if sources.contains(id.name.toLowerCase) =>
        Incremental.source(sources(id.name.toLowerCase))
      case _ =>
        val m = memo.get
        if (m == null) walkImpl(plan, sources)
        else {
          val names = plan.output.map(_.name)
          m.get(plan.canonicalized) match {
            case Some((inc, storedNames)) if storedNames == names => inc
            case Some((inc, storedNames)) =>
              // Same result, different aliases: share the node (one trace)
              // behind a linear POSITIONAL rename to this plan's names —
              // positional (not by-name) so subtrees whose stored names
              // repeat (`SELECT a, a FROM t`) still share instead of
              // compiling a duplicate stateful node. Canonical-equal plans
              // have equal arity, so the zip is total; the weight column is
              // kept wherever the child's layout put it.
              inc.linear { df =>
                val it = names.iterator
                df.toDF(df.columns.map(c =>
                  if (c == graft.zset.ZSet.W) c else it.next()): _*)
              }
            case _ =>
              val inc = walkImpl(plan, sources)
              m.update(plan.canonicalized, (inc, names))
              inc
          }
        }
    }

  private def walkImpl(plan: LogicalPlan, sources: Map[String, String]): Inc = plan match {
    case SubqueryAlias(id, child) if sources.contains(id.name.toLowerCase) =>
      Incremental.source(sources(id.name.toLowerCase))
    case SubqueryAlias(_, child) => walk(child, sources)

    case p @ Project(exprs, child) =>
      // Uncorrelated scalar subqueries in the select list become bilinear
      // joins on a constant key against the subquery circuit. Only
      // global-aggregate-shaped subqueries are accepted: they produce
      // exactly one row on any state (including the empty-input zero row),
      // so the constant-key join is exactly the scalar semantics.
      val scalars = exprs.flatMap(_.collect { case s: ScalarSubquery => s })
        .groupBy(_.exprId).map(_._2.head).toSeq
      if (scalars.isEmpty) walk(child, sources).select(exprs.map(toColumn): _*)
      else try {
        val (node, nameOf) = attachScalars(
          walk(child, sources), child.output.map(_.name), scalars, sources)
        val rewritten = exprs.map(_.transform {
          case s: ScalarSubquery =>
            UnresolvedAttribute.quoted(nameOf(s.exprId))
        })
        node.select(rewritten.map(toColumn): _*)
      } catch {
        case e: UnsupportedPlanException =>
          decorrelateScalarFallback(p, sources).getOrElse(throw e)
      }

    case f @ Filter(cond, child) =>
      // EXISTS / [NOT] IN predicates lower to semi/anti join circuits here
      // (the analyzed plan keeps them as subquery expressions; Calcite
      // performs the same lowering upstream of the reference, which itself
      // throws Unimplemented for the resulting semi/anti —
      // CalciteToDBSPCompiler.java:571-572).
      try compileFilter(cond, child, sources)
      catch {
        case e: UnsupportedPlanException
            if cond.exists(_.isInstanceOf[ScalarSubquery]) =>
          decorrelateScalarFallback(f, sources).getOrElse(throw e)
      }

    case Join(left, right, joinType, cond, _) =>
      // Decompose the condition into equi pairs + residual, mirroring the
      // reference's JoinConditionAnalyzer.java:48-79: any conjunct
      // `l.a = r.b` (or null-safe `l.a <=> r.b`) becomes a (possibly
      // renamed) equi key; everything else becomes a filter over the
      // joined result.
      val (pairs0, residualAll) = analyzeCondition(cond, left, right)
      // post-demotion invariant: pairs are ALL plain or ALL null-safe
      val nullSafeKeys = pairs0.exists(_.nullSafe)
      val pairs = pairs0.map(p => (p.l, p.r))
      def keyJoin(a: Inc, b: Inc, ks: Seq[String]): Inc =
        if (nullSafeKeys) a.joinNullSafe(b, ks) else a.join(b, ks)
      // Single-sided residual conjuncts push down to their side BEFORE the
      // bilinear join (for inner joins this is semantics-preserving and
      // shrinks both the state and every per-step delta product); only
      // conjuncts referencing both sides stay as a post-join filter.
      val (leftOnly, rightOnly, residual) = residualAll match {
        case Some(r) if joinType.isInstanceOf[InnerLike] =>
          def split(e: Expression): Seq[Expression] = e match {
            case And(a, b) => split(a) ++ split(b)
            case other => Seq(other)
          }
          val conjuncts = split(r)
          val lo = conjuncts.filter(_.references.subsetOf(left.outputSet))
          val ro = conjuncts.filter(c => !lo.contains(c) &&
            c.references.subsetOf(right.outputSet))
          val rest = conjuncts.filterNot(c => lo.contains(c) || ro.contains(c))
          (lo.reduceOption(And), ro.reduceOption(And), rest.reduceOption(And))
        case other => (None, None, other)
      }
      // Non-inner joins keep the whole residual on the inner branch (no
      // side pushdown: an ON conjunct on the preserved side governs
      // MATCHING, not filtering — a preserved row failing it is padded,
      // not dropped). Pads then become "unmatched AFTER the residual"
      // (the reference composes the same join+filter graphs,
      // CalciteToDBSPCompiler.java:665-747): matched preserved-side row
      // VALUES are read off the inner result and the complement is padded,
      // with NULL-SAFE value matching so NULL-bearing rows aren't
      // double-padded.
      val residualRowMatch = residual.isDefined && !joinType.isInstanceOf[InnerLike]
      // No equi pair (CROSS JOIN / pure theta): compile as a UNIT-KEY
      // bilinear join — both sides tagged with a constant key, the
      // reference's own lowering for empty-key joins
      // (CalciteToDBSPCompiler.java:584, incrementalized like any bilinear
      // join by OptimizeIncrementalVisitor.java:96-108). SIZE NOTE: the
      // per-step delta product is |Δl|·|r| + |l|·|Δr|, so this is meant
      // for the shapes such views actually take — a small dimension
      // (threshold rows, a calendar frame) against a fact stream. The
      // Runner broadcast-hints the provably-tiny side, keeping the big
      // side in place; two LARGE sides make the standing view itself
      // quadratic — that cost is inherent to the query, not the circuit.
      val unitKey = pairs.isEmpty
      // Same-named pairs merge USING-style; differently-named pairs rename
      // the right key to the left name for the bilinear join and the right
      // column is reconstructed in the output projection.
      val sameNamed = pairs.filter { case (a, b) => a.name.equalsIgnoreCase(b.name) }
      val renamed = pairs.filterNot { case (a, b) => a.name.equalsIgnoreCase(b.name) }
      val keys = if (unitKey) Seq("__xk") else pairs.map(_._1.name)
      val mergedKeySet = sameNamed.map(_._1.name.toLowerCase).toSet
      val renameMap = renamed.map { case (a, b) => b.name -> a.name }.toMap
      // CIRCUIT column lists, not plan attribute lists: a lower inner
      // join's merged same-named key leaves TWO plan attributes carrying
      // one name (u.a and w.a after `u JOIN w ON u.a = w.a`) while the
      // circuit frame has ONE value-equal column — projecting or
      // dupe-checking from plan attrs would double it (the r13 verdict's
      // 372-record join.test reject bucket). circuitCols collapses merges
      // recursively, so the names below are the walked frame's truth.
      val lCols = circuitCols(left)
      val rCols = circuitCols(right)
      val lType: Map[String, org.apache.spark.sql.types.DataType] =
        left.output.groupBy(_.name.toLowerCase).map { case (k, v) => k -> v.head.dataType }
      val rType: Map[String, org.apache.spark.sql.types.DataType] =
        right.output.groupBy(_.name.toLowerCase).map { case (k, v) => k -> v.head.dataType }
      // Name-based re-anchoring cannot disambiguate same-named columns
      // beyond the merged keys (the analyzed plan's qualifiers are erased)
      // — require the user to alias them apart in subqueries. The rename
      // targets (left key names) must also be free on the right side.
      val outNames =
        lCols ++ rCols.filterNot(n => mergedKeySet.contains(n.toLowerCase))
      val dupes = outNames.groupBy(_.toLowerCase).filter(_._2.size > 1).keys
      if (dupes.nonEmpty) throw new UnsupportedPlanException(
        s"join sides share non-key column name(s) ${dupes.mkString(", ")} — " +
          "alias them apart in subqueries for incremental mode")
      if (unitKey && outNames.exists(_.equalsIgnoreCase("__xk")))
        throw new UnsupportedPlanException(
          "cross join sides must not carry the internal column __xk")
      val l00 = walk(left, sources)
      val l0 = if (!unitKey) l00
        else l00.select(lCols.map(col) :+ lit(1).as("__xk"): _*)
      val l = leftOnly.map(c => l0.where(toColumn(c))).getOrElse(l0)
      val r2 = walk(right, sources)
      val r1 = if (!unitKey) r2
        else r2.select(rCols.map(col) :+ lit(1).as("__xk"): _*)
      val r0 = rightOnly.map(c => r1.where(toColumn(c))).getOrElse(r1)
      val r = if (renameMap.isEmpty) r0 else r0.select(
        rCols.map { n =>
          renameMap.get(n) match {
            case Some(nn) => col(n).as(nn)
            case None     => col(n)
          }
        }: _*)
      // Output projection: left columns as-is; right columns minus merged
      // keys, with renamed keys reconstructed (y := joined x, equal by the
      // equi condition; NULL-padded branches override per side below).
      val restoreCols: Seq[Column] =
        lCols.map(col) ++
          rCols.filterNot(n => mergedKeySet.contains(n.toLowerCase))
            .map { n =>
              renameMap.get(n) match {
                case Some(nn) => col(nn).as(n)
                case None     => col(n)
              }
            }
      def restore(j: Inc): Inc = if (renamed.isEmpty) j else j.select(restoreCols: _*)
      val inner0 = restore(keyJoin(l, r, keys))
      val innerK = residual.map(res => inner0.where(toColumn(res))).getOrElse(inner0)
      // The unit-key tag must not leak past the join itself: the padded
      // outer branches project the LOGICAL columns only, and a union of
      // tagged and untagged branches would fail to line up.
      val inner = if (!unitKey) innerK else innerK.select(outNames.map(col): _*)
      // NULL pads for the outer-join unmatched branches: the kept side's
      // columns survive (renamed keys reading their joined name), the
      // other side's columns — including its half of renamed pairs — are
      // typed NULLs. Merged same-named keys keep USING semantics (single
      // column, kept side's value).
      // Preserved-side rows with a residual-surviving match, as a weight-1
      // value set read off the inner result (only built when a residual
      // forces row-value matching; the pure-key pads below are cheaper).
      lazy val leftNames = lCols
      lazy val matchedLeftVals: Inc =
        inner.select(leftNames.map(col): _*).distinct
      // r's column names (right side post-rename) are all present in the
      // restored inner output: merged keys share the left name, renamed
      // keys read the joined key value (equal by the equi condition).
      lazy val rNames = rCols.map(n => renameMap.getOrElse(n, n))
      lazy val matchedRightVals: Inc =
        inner.select(rNames.map(col): _*).distinct
      def unmatchedAfterResidual(keep: Inc, matchedVals: Inc,
                                 valNames: Seq[String], outCols: Seq[Column]): Inc =
        keep.minus(keep.joinNullSafe(matchedVals, valNames)).select(outCols: _*)
      def padLeft: Inc = {
        val cols = lCols.map(col) ++
          rCols.filterNot(n => mergedKeySet.contains(n.toLowerCase))
            .map(n => lit(null).cast(rType(n.toLowerCase)).as(n))
        if (residualRowMatch) unmatchedAfterResidual(l, matchedLeftVals, leftNames, cols)
        else padUnmatched(l, r, keys, cols, nullSafeKeys)
      }
      def padRight: Inc = {
        val cols = lCols.map { n =>
          if (mergedKeySet.contains(n.toLowerCase)) col(n)
          else lit(null).cast(lType(n.toLowerCase)).as(n)
        } ++
          rCols.filterNot(n => mergedKeySet.contains(n.toLowerCase))
            .map { n =>
              renameMap.get(n) match {
                case Some(nn) => col(nn).as(n)
                case None     => col(n)
              }
            }
        if (residualRowMatch) unmatchedAfterResidual(r, matchedRightVals, rNames, cols)
        else padUnmatched(r, l, keys, cols, nullSafeKeys)
      }
      val joined = joinType match {
        case _: InnerLike => inner
        // Outer joins follow the reference's construction (inner result ∪
        // null-padded unmatched side, CalciteToDBSPCompiler.java:665-747),
        // composed from circuit primitives so incrementality is inherited:
        // a retraction that removes a row's last match automatically flows
        // a retraction of the inner row and an insertion of the padded row.
        case LeftOuter  => inner union padLeft
        case RightOuter => inner union padRight
        case FullOuter  => inner union padLeft union padRight
        // Semi/anti appear when compiling optimized plans (EXISTS/IN are
        // rewritten there); the reference throws Unimplemented for them
        // (:571-572) — we support them compositionally. With a residual,
        // semi = preserved rows whose VALUE has a surviving match.
        case LeftSemi if residualRowMatch => l.joinNullSafe(matchedLeftVals, leftNames)
        case LeftAnti if residualRowMatch =>
          l.minus(l.joinNullSafe(matchedLeftVals, leftNames))
        case LeftSemi =>
          keyJoin(l, r.select(keys.map(col): _*).distinct, keys)
        case LeftAnti =>
          l.minus(keyJoin(l, r.select(keys.map(col): _*).distinct, keys))
        case other => throw new UnsupportedPlanException(
          s"unsupported join type for incremental mode: $other")
      }
      // The unit-key tag is circuit-internal: project it away (for
      // semi/anti the output is the left side alone).
      if (!unitKey) joined
      else joinType match {
        case LeftSemi | LeftAnti =>
          joined.select(lCols.map(col): _*)
        case _ => joined.select(outNames.map(col): _*)
      }

    // ROLLUP / CUBE / GROUPING SETS plan as Aggregate over Expand: each
    // input row fans out to one tagged row per grouping set — a
    // weight-preserving flatMap, LINEAR in the Z-set algebra — so deltas
    // pass straight through the expand and the aggregate re-folds only
    // touched (group, grouping-id) combinations. Expand's output repeats
    // column names (child attrs + grouping copies), so the circuit uses
    // positional internal names keyed by exprId and restores the view's
    // names in a final projection.
    case Aggregate(groupExprs, aggExprs, ex: Expand, _) =>
      val rename: Map[ExprId, String] = ex.output.zipWithIndex.map {
        case (a, i) => a.exprId -> s"__e${i}_${a.name}"
      }.toMap
      val names = ex.output.zipWithIndex.map { case (a, i) => s"__e${i}_${a.name}" }
      // The expand's child is itself duplicate-prone: Spark plans
      // Project[r, i, v, r AS r, i AS i] below the Expand, so the child's
      // columns get positional internal names as well and the expand
      // projections are re-anchored onto them by exprId.
      val childNames = ex.child.output.zipWithIndex.map {
        case (a, i) => a.exprId -> s"__c${i}_${a.name}"
      }
      val childNameOf = childNames.toMap
      val childInc = ex.child match {
        case Project(projList, base) =>
          walk(base, sources).select(projList.zip(childNames).map {
            case (ne, (_, n)) => toColumn(ne).as(n)
          }: _*)
        case other =>
          walk(other, sources).select(other.output.zip(childNames).map {
            case (a, (_, n)) => col(a.name).as(n)
          }: _*)
      }
      def reChild(e: Expression): Expression = e.transform {
        case a: AttributeReference if childNameOf.contains(a.exprId) =>
          a.withName(childNameOf(a.exprId))
      }
      val expandInc = childInc.linear { df =>
        ex.projections.map { proj =>
          graft.zset.ZSet.map(df)(
            proj.zip(names).map { case (e, n) => toColumn(reChild(e)).as(n) }: _*)
        }.reduce((a, b) => graft.zset.ZSet.plus(a, b))
      }
      def re(e: Expression): Expression = e.transform {
        case a: AttributeReference if rename.contains(a.exprId) =>
          a.withName(rename(a.exprId))
      }
      val keys = groupExprs.map {
        case a: AttributeReference => rename.getOrElse(a.exprId, a.name)
        case other => throw new UnsupportedPlanException(
          s"incremental grouping-sets keys must be plain columns, got: $other")
      }
      val keySet = keys.toSet
      val aggCols = aggExprs.filter {
        case a: AttributeReference => !keySet.contains(rename.getOrElse(a.exprId, a.name))
        case _ => true
      }.map(e => toColumn(re(e)))
      val outInternal = aggExprs.map {
        case a: AttributeReference => rename.getOrElse(a.exprId, a.name)
        case ne => ne.name
      }
      // Weight-linear aggregates (COUNT/SUM/AVG) take the O(|delta|) linear
      // path; anything else re-folds touched groups exactly. Either way the
      // aggregate node's output keeps EVERY grouping key (even ones the
      // view's select list drops, e.g. the raw grouping-id behind a
      // GROUPING() marker): the node's stored trace is restricted by key to
      // retract touched groups' previous results, so the keys must be
      // present in it. The outer linear select projects to the view shape.
      linearizeAggs(aggExprs, re, keys) match {
        case Some((comps, finals)) =>
          expandInc.aggregateLinear(keys, comps).select(finals: _*)
        case None =>
          expandInc.aggregateRows(keys, aggCols, (keys ++ outInternal).distinct)
            .select(outInternal.zip(aggExprs.map(_.name)).map {
              case (i, f) => col(i).as(f)
            }: _*)
      }

    case Aggregate(groupExprs, aggExprs, child, _) =>
      // Computed grouping keys (GROUP BY b % 5) are projected below the
      // aggregate under the name the select list gives them (Calcite
      // likewise plans a Project under the Aggregate); plain columns group
      // directly.
      val childNames = child.output.map(_.name.toLowerCase).toSet
      val computed = groupExprs.zipWithIndex.collect {
        case (e, i) if !e.isInstanceOf[AttributeReference] =>
          // find the output alias whose child is this grouping expression —
          // but NOT when that alias collides with a child column name
          // (Spark auto-names `CAST(i AS BOOLEAN)` just `i`): projecting
          // the key under the colliding name next to child.output makes
          // the later groupBy(name) ambiguous at eval. The synthetic name
          // groups unambiguously and the restated-key re-alias below
          // restores the user-visible name in the output.
          val name = aggExprs.collectFirst {
            case al: Alias if al.child.semanticEquals(e) => al.name
          }.filterNot(n => childNames.contains(n.toLowerCase))
            .getOrElse(s"__gkey$i")
          e -> name
      }
      val keys = groupExprs.map {
        case a: AttributeReference => a.name
        case e => computed.find(_._1 eq e).get._2
      }
      val base = {
        val b = walk(child, sources)
        if (computed.isEmpty) b
        else b.select(child.output.map(a => col(a.name)) ++
          computed.map { case (e, n) => toColumn(e).as(n) }: _*)
      }
      val keySet = keys.map(_.toLowerCase).toSet
      val aggCols = aggExprs.filter {
        case a: AttributeReference => !keySet.contains(a.name.toLowerCase)
        case al: Alias if computed.exists(_._2 == al.name) => false
        case _ => true
      }.map {
        // an aggregate-list entry that just re-states a computed key is
        // replaced by the projected key column
        case al: Alias if computed.exists(_._1.semanticEquals(al.child)) =>
          col(computed.find(_._1.semanticEquals(al.child)).get._2).as(al.name)
        case e => toColumn(e)
      }
      val outOrder = aggExprs.map(_.name)
      // Global aggregates (SELECT COUNT(*) FROM T) use the empty-input
      // correction circuit — the single group re-folds every step and
      // empty state yields the SQL zero row (reference
      // CalciteToDBSPCompiler.java:349-381).
      // Keys stay in the aggregate node's output (its trace is key-restricted
      // for retraction) even when the select list omits them; the outer
      // select restores the view's declared shape. Weight-linear aggregates
      // (COUNT/SUM/AVG) take the O(|delta|) linear path.
      val prepPlain: Expression => Expression = e => e.transform {
        case x if computed.exists(_._1.semanticEquals(x)) =>
          UnresolvedAttribute.quoted(computed.find(_._1.semanticEquals(x)).get._2)
      }
      if (keys.isEmpty) base.aggregateRowsGlobal(aggCols, outOrder)
      else linearizeAggs(aggExprs, prepPlain, keys) match {
        case Some((comps, finals)) =>
          base.aggregateLinear(keys, comps).select(finals: _*)
        case None =>
          base.aggregateRows(keys, aggCols, (keys ++ outOrder).distinct)
            .select(outOrder.map(col): _*)
      }

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

    // UNNEST / explode (Generate) is a weight-preserving flatMap — LINEAR
    // (reference DBSPFlatMapOperator.java:34 participates in incremental
    // circuits unchanged): each source row's weight carries to each of its
    // generated rows, so deltas pass straight through.
    case g: Generate =>
      val childCols = g.child.output.map(a => col(a.name))
      val gen: Column = {
        val base = if (g.outer) GeneratorOuter(g.generator) else g.generator
        val names = g.generatorOutput.map(_.name)
        if (names.size == 1) toColumn(base).as(names.head)
        else toColumn(base).as(names)
      }
      walk(g.child, sources).linear { df =>
        graft.zset.ZSet.map(df)(childCols :+ gen: _*)
      }

    case Distinct(child) =>
      compileRecursiveDistinct(child, sources)
        .getOrElse(walk(child, sources).distinct)
    case Deduplicate(_, child) => walk(child, sources).distinct

    // Reached only when recursion is NOT wrapped in DISTINCT (set
    // semantics): UNION ALL recursion counts paths — a bag the closure
    // circuit cannot maintain, and which diverges on cyclic graphs anyway.
    case _: UnionLoop => throw new UnsupportedPlanException(
      "recursive CTEs compile incrementally only as SELECT DISTINCT over " +
        "a linear transitive-closure recursion (anchor ∪ SELECT r.c1, e.c2 " +
        "FROM ref r JOIN edges e ON r.c2 = e.c1); UNION ALL bag semantics " +
        "(path counting) has no incremental closure circuit — add DISTINCT " +
        "or use the Incremental DSL directly")

    // Set ops follow the reference's circuits (visitMinus :492-519,
    // visitIntersect :809-853): EXCEPT = distinct(distinct(a) − distinct(b));
    // EXCEPT ALL = positive part of (a − b); INTERSECT = whole-row join of
    // the distincts (bilinear, weight 1·1).
    case Except(left, right, isAll) =>
      val l = walk(left, sources)
      val r = walk(right, sources).select(renameTo(right, left): _*)
      if (isAll) l.minus(r).positivePart
      else l.distinct.minus(r.distinct).distinct
    // INTERSECT (distinct): min-circuit over the two distinct sets —
    // dl − (dl − dr)⁺. SQL set ops compare rows NULL-safely (NULL = NULL
    // inside set semantics), which Z-set row grouping gives for free; a
    // whole-row equi join here would silently drop NULL-bearing rows.
    case Intersect(left, right, false) =>
      val l = walk(left, sources).distinct
      val r = walk(right, sources).distinct.select(renameTo(right, left): _*)
      l.minus(l.minus(r).positivePart)
    // INTERSECT ALL: min(wA, wB) per row = A − (A − B)⁺ for non-negative
    // multiplicities — composed from the subtract + positive-part circuits
    // so incrementality is inherited (reference visitIntersect :809-853).
    case Intersect(left, right, true) =>
      val l = walk(left, sources)
      val r = walk(right, sources).select(renameTo(right, left): _*)
      l.minus(l.minus(r).positivePart)

    // LATERAL joins inside SUBQUERY plans (the main query's laterals are
    // decorrelated by the compile() pre-pass, where the global name-dedup
    // covers the synthesized join's ancestors): decorrelate the subtree
    // locally and pin its output names — nothing above a subquery plan
    // resolves the lateral's columns by name, so the local pin suffices.
    case lj: LateralJoin =>
      val pinned = Project(
        lj.output.map(a => Alias(a, a.name)(): NamedExpression),
        decorrelateOneLateral(lj))
      walk(dedupJoinNames(pinned), sources)

    // Views over views: inline the referenced view's plan into the circuit
    case v: View => walk(v.child, sources)

    // WITH ... CTEs are inlined by the compile() pre-pass (inlineCtes);
    // a WithCTE reaching here means compile() was bypassed — inline now.
    case w: WithCTE => walk(inlineCtes(w), sources)

    // Aggregate-OVER windows (DBSPWindowAggregateOperator): a delta only
    // affects results inside its PARTITION BY groups, so the circuit
    // re-evaluates the window over touched partitions and retracts their
    // previous rows (Inc.windowAggregate). Requires a plain-column
    // partition spec; empty partition specs would re-evaluate everything.
    case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
      // Computed PARTITION BY expressions are projected below the window
      // (the same Project-under shape Calcite plans for computed keys);
      // the helper column is dropped from the output.
      val computed = w.partitionSpec.zipWithIndex.collect {
        case (e, i) if !e.isInstanceOf[AttributeReference] => e -> s"__wkey$i"
      }
      val partKeys = w.partitionSpec.map {
        case a: AttributeReference => a.name
        case e => computed.find(_._1 eq e).get._2
      }
      val childCols = w.child.output.map(a =>
        org.apache.spark.sql.functions.col(a.name))
      // Decorrelated ordered-LIMIT laterals arrive as `row_number() OVER
      // (PARTITION BY key)` with NO orderSpec — Spark's DecorrelateInner-
      // Query leaves the ordering in a global Sort BELOW the window (the
      // optimizer never re-checks the ordered-function invariant). The
      // circuit walker treats bare Sorts as presentation and drops them,
      // so the order is SEMANTIC here: pull the underlying Sort's keys
      // into the rebuilt window spec (a global sort restricted to a
      // partition IS the per-partition order). The pull must be LOSSLESS:
      // a partial pull would rank by a strict subset of the order —
      // possibly only the tie-breaker — silently mis-numbering rows. If
      // projections between the window and the Sort dropped some keys,
      // WIDEN those projections so the keys survive to the window eval
      // (they're consumed by the rebuilt spec and dropped from the
      // output); if widening can't be done safely (name collision,
      // non-Project node in between), reject instead of partial-pulling.
      val (effChild: LogicalPlan, effOrder: Seq[SortOrder]) =
        if (w.orderSpec.nonEmpty) (w.child, w.orderSpec)
        else {
          def widen(p: LogicalPlan, missing: Seq[Attribute])
              : Option[LogicalPlan] = p match {
            case s @ Sort(_, true, _, _)
                if missing.forall(m => s.output.exists(_.exprId == m.exprId)) =>
              Some(s)
            case pr @ Project(list, c) =>
              val names = list.map(_.name.toLowerCase).toSet
              if (missing.exists(m => names.contains(m.name.toLowerCase))) None
              else widen(c, missing).map(c2 =>
                Project(list ++ missing, c2))
            case _ => None
          }
          def findSort(p: LogicalPlan): Seq[SortOrder] = p match {
            case Sort(o, true, _, _) => o
            case Project(_, c) => findSort(c)
            case _ => Nil
          }
          val childNames = w.child.output.map(_.name.toLowerCase).toSet
          val pulled = findSort(w.child)
          if (pulled.isEmpty) (w.child, Nil)
          else {
            val missing = pulled.flatMap(_.references)
              .filterNot(a => childNames.contains(a.name.toLowerCase))
              .groupBy(_.exprId).map(_._2.head).toSeq
            if (missing.isEmpty) (w.child, pulled)
            else widen(w.child, missing) match {
              case Some(wc) => (wc, pulled)
              case None => (w.child, Nil)
            }
          }
        }
      val needsOrder = w.windowExpressions.exists(_.exists {
        case _: RankLike | _: RowNumberLike | _: OffsetWindowFunction => true
        case _ => false
      })
      if (needsOrder && effOrder.isEmpty)
        throw new UnsupportedPlanException(
          "order-sensitive window function with no ORDER BY and no " +
            "pullable sort below — cannot rebuild the window eval")
      val winCols = w.windowExpressions.map { we0 =>
        // The Window NODE's partitionSpec/orderSpec are authoritative
        // post-analysis: decorrelation adds the domain key to the node
        // fields only, leaving the nested WindowSpecDefinition with its
        // pre-rewrite (often empty) spec — rebuild every spec from the
        // node fields so the re-analyzed eval executes the same window.
        val we = (we0: Expression).transform {
          case wsd: WindowSpecDefinition =>
            wsd.copy(partitionSpec = w.partitionSpec, orderSpec = effOrder)
        }
        // rank/dense_rank/percent_rank carry the spec's ORDER children
        // inside the function node; with attributes swapped to unresolved
        // ones their re-analysis trips frame validation. Reset them to
        // parser form (no order children) — the analyzer re-injects the
        // order from the window spec (ResolveWindowOrder).
        val reset = (we: Expression).transform {
          case r: org.apache.spark.sql.catalyst.expressions.RankLike =>
            r.withOrder(Nil)
        }
        toColumn(computed.foldLeft(reset) { case (acc, (e, n)) =>
          acc.transform { case x if x.semanticEquals(e) => UnresolvedAttribute.quoted(n) }
        })
      }
      // eval selects the ORIGINAL child columns — any sort keys the
      // widening appended are consumed by the window spec and dropped
      val eval = (rows: DataFrame) => rows.select(childCols ++ winCols: _*)
      val base = {
        val b = walk(effChild, sources)
        if (computed.isEmpty) b
        else {
          val extraCols = effChild.output.drop(w.child.output.size)
            .map(a => org.apache.spark.sql.functions.col(a.name))
          b.select(childCols ++ extraCols ++
            computed.map { case (e, n) => toColumn(e).as(n) }: _*)
        }
      }
      // A window without PARTITION BY has a single global partition — every
      // delta touches it, so it degrades to whole-state re-evaluation (the
      // cost such a standing window fundamentally has under retractions).
      if (partKeys.isEmpty) base.reevaluate(eval)
      else base.windowAggregate(partKeys)(eval)

    // ORDER BY ... LIMIT k views: re-evaluate the top-k over consolidated
    // state each step and retract the previous result (the reference
    // re-aggregates sorts into a sorted Vec, visitSort :980-1048). At
    // scale the eval is TakeOrderedAndProject: per-partition top-k + a
    // k-row reduce, no full sort.
    case Limit(IntegerLiteral(k), SortedChild(order, child, proj)) =>
      rankRange(k, 0, order, child, proj, sources)

    // ORDER BY ... LIMIT k OFFSET m: ranks m+1..m+k — a deterministic row
    // set under the total order, maintained the same way (the eval is a
    // per-partition top-(m+k) + reduce; the offset drops m at the sink).
    case Limit(IntegerLiteral(k),
               Offset(IntegerLiteral(m), SortedChild(order, child, proj))) =>
      rankRange(k, m, order, child, proj, sources)

    // ORDER BY ... OFFSET m without LIMIT: everything past rank m.
    case Offset(IntegerLiteral(m), SortedChild(order, child, proj)) =>
      rankRange(-1, m, order, child, proj, sources)

    case Limit(_, child) => throw new UnsupportedPlanException(
      "LIMIT without ORDER BY selects nondeterministic rows — not " +
        "maintainable incrementally; add an ORDER BY")

    // A bare ORDER BY does not change the maintained multiset — Z-sets are
    // unordered; ordering is presentation applied at the sink (the
    // reference likewise materializes the sorted Vec only at the sink).
    case Sort(_, _, child, _) => walk(child, sources)

    case other => throw new UnsupportedPlanException(
      s"unsupported plan node for incremental mode: ${other.nodeName}")
  }

  /** Try to lower every aggregate in a select list to weight-linear
    * components (the reference's linear aggregate path,
    * AggregateCompiler.java:116-288: COUNT = Σw, SUM(x) = Σ w·x, AVG =
    * Σw·x / Σw over non-null x) so the circuit can use
    * `Inc.aggregateLinear` — per-step cost O(|delta|), no child-state
    * scans. Returns the component aggregate columns plus one finalize
    * Column per output expression, or None when any aggregate needs the
    * exact re-fold path (MIN/MAX, DISTINCT aggregates, FILTER clauses,
    * decimal sums — their merge semantics differ). SUM's NULL-over-empty is
    * preserved by pairing each sum with a non-null-count component.
    * `prep` pre-rewrites expressions (internal renames / computed-key
    * substitution); finalize expressions may only reference `keyNames`,
    * the generated components, and the group-weight column `__gw`. */
  private def linearizeAggs(aggExprs: Seq[NamedExpression],
                            prep: Expression => Expression,
                            keyNames: Seq[String])
      : Option[(Seq[(String, Column)], Seq[Column])] = {
    import org.apache.spark.sql.functions.{sum, when}
    import org.apache.spark.sql.types._
    val comps = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
    def fresh(c: Column): String = {
      val n = s"__lc${comps.size}"; comps += n -> c; n
    }
    val w = col(graft.zset.ZSet.W)
    def nonNullCnt(x: Column): Column =
      sum(when(x.isNotNull, w).otherwise(lit(0L)))
    def linearType(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType => true
      case _ => false
    }
    def asExpr(c: Column): Expression =
      org.apache.spark.sql.GraftSqlBridge.toExpressionTree(c)
    var ok = true
    val finals = aggExprs.map { ne =>
      val lowered = prep(ne).transform {
        case ae: AggregateExpression =>
          if (ae.isDistinct || ae.filter.isDefined) { ok = false; ae }
          else ae.aggregateFunction match {
            case c: Count if c.children.isEmpty || c.children.forall(_.foldable) =>
              UnresolvedAttribute.quoted("__gw")
            case c: Count if c.children.size == 1 =>
              UnresolvedAttribute.quoted(
                fresh(nonNullCnt(toColumn(c.children.head))))
            case s: Sum if linearType(s.child.dataType) =>
              val x = toColumn(s.child)
              val sumN = fresh(sum(x * w))
              val cntN = fresh(nonNullCnt(x))
              // SQL SUM is NULL over zero non-null rows; a merged component
              // sum cannot tell that apart from a sum equal to 0
              asExpr(when(col(cntN) > lit(0L), col(sumN)).otherwise(lit(null)))
            case a: Average if linearType(a.child.dataType) =>
              val x = toColumn(a.child).cast("double")
              val sumN = fresh(sum(x * w))
              val cntN = fresh(nonNullCnt(x))
              // cnt = 0 → NULL via non-ANSI division, exactly AVG-over-empty
              asExpr(col(sumN) / col(cntN))
            case _ => ok = false; ae
          }
      }
      // finalize may only read grouping keys, components, and __gw
      val allowed = (keyNames ++ comps.map(_._1) :+ "__gw").map(_.toLowerCase).toSet
      val refs = lowered.collect {
        case a: AttributeReference => a.name.toLowerCase
        case u: UnresolvedAttribute => u.name.toLowerCase
      }
      if (!refs.forall(allowed.contains)) ok = false
      toColumn(lowered).as(ne.name)
    }
    if (ok) Some((comps.toSeq, finals)) else None
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitAnd(a) ++ splitAnd(b)
    case other => Seq(other)
  }

  private def splitOr(e: Expression): Seq[Expression] = e match {
    case Or(a, b) => splitOr(a) ++ splitOr(b)
    case other => Seq(other)
  }

  /** Rows of `n0` for which predicate `d` is TRUE — the recursive
    * lowering behind arbitrary AND/OR trees over subquery predicates.
    * A disjunction peels its passers off disjunct by disjunct: what
    * remains after removing every disjunct's passers failed ALL of them
    * (FALSE and UNKNOWN alike — exactly filter semantics), so the
    * disjunction's passers are `n0 − remainder`. Multiplicities are
    * preserved throughout: every branch is a per-row filter, so
    * identical rows pass or fail together and Z-set subtraction never
    * goes negative. Conjunctions inside a disjunct chain the filters;
    * leaves reuse the [NOT] IN / EXISTS circuit builders (computed
    * probes included) and plain predicates apply as `where`. */
  /** A ListQuery whose body itself references the outer query (beyond the
    * probe): `a IN (SELECT k FROM t3 WHERE v > b)`. The uncorrelated IN
    * circuits walk lq.plan directly, which would plant an un-substituted
    * OuterReference in the compiled filter — it survives analysis and
    * then kills codegen at EVAL time, so it must never reach them. */
  private def correlatedList(lq: ListQuery): Boolean =
    lq.plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[OuterReference])))

  /** Correlated [NOT] IN → the equivalent EXISTS, with the probe equality
    * pushed BELOW the subquery's projection chain (substituting projected
    * aliases) so decorrelateExists sees `innerAttr = outer(probe)` as a
    * keyable conjunct next to the body's own correlation:
    * `a IN (SELECT k FROM t3 WHERE v > b)` becomes
    * `EXISTS(t3 WHERE k = outer(a) AND v > outer(b))` — the existing
    * equality-key + inequality-residual semi-join circuit. A computed
    * subquery output (`SELECT v - 100 ...`) substitutes to a non-attribute
    * equality, which lands in the residual bucket; if NO equality pair
    * remains, decorrelateExists rejects and the record falls back. As a
    * WHERE conjunct UNKNOWN ≡ FALSE, so the null-rejecting equality is
    * exact for IN; NOT IN additionally needs both sides provably
    * non-NULL (a NULL-blocked row must fail, which NOT EXISTS over a
    * null-rejecting match cannot express) — the caller guards that. */
  private def correlatedInAsExists(vs: Seq[Expression], lq: ListQuery): Exists = {
    def peel(p: LogicalPlan, exprs: Seq[Expression])
        : (LogicalPlan, Seq[Expression]) = p match {
      case Project(list, c) =>
        val defs = list.collect { case al: Alias => al.exprId -> al.child }.toMap
        peel(c, exprs.map(_.transformUp {
          case a: AttributeReference if defs.contains(a.exprId) => defs(a.exprId)
        }))
      case s: SubqueryAlias => peel(s.child, exprs)
      case _ => (p, exprs)
    }
    val (base, outs) = peel(lq.plan, lq.plan.output)
    val eqs = outs.zip(vs).map { case (o, v) =>
      EqualTo(o, v.transform { case a: AttributeReference => OuterReference(a) })
    }
    // merge into an existing top Filter rather than stacking a new one:
    // decorrelateExists strips correlated conjuncts per Filter node, and
    // a replace-then-descend transform would skip a Filter that becomes
    // the root after its parent is stripped
    val plan2 = base match {
      case Filter(c, ch) => Filter(And(eqs.reduce(And), c), ch)
      case other => Filter(eqs.reduce(And), other)
    }
    Exists(plan2)
  }

  /** Reject-or-rewrite pass for correlated [NOT] IN conjuncts (must run
    * before the uncorrelated IN branches match). NOT IN over nullable
    * columns with a correlated body has no keyed circuit here — the
    * null-blocker exists-test (`∀i: e_i = v_i OR e_i IS NULL OR v_i IS
    * NULL`) carries no equality conjunct to key a semi join — so it
    * rejects for the spark.sql fallback instead of lowering wrongly. */
  private def rewriteCorrelatedIns(e: Expression): Expression = e.transformDown {
    case Not(InSubquery(vs, lq: ListQuery)) if correlatedList(lq) =>
      if (vs.exists(_.nullable) || lq.plan.output.exists(_.nullable))
        throw new UnsupportedPlanException(
          "correlated NOT IN over nullable columns: the 3VL null-blocker " +
            "test has no equality conjunct to key a semi join — declare " +
            "the columns NOT NULL or rewrite as NOT EXISTS")
      guardCorrUnderAgg(lq)
      Not(correlatedInAsExists(vs, lq))
    case InSubquery(vs, lq: ListQuery) if correlatedList(lq) =>
      guardCorrUnderAgg(lq)
      correlatedInAsExists(vs, lq)
  }

  /** decorrelateExists strips correlated conjuncts from ANY Filter depth;
    * under an Aggregate that would change what gets aggregated (the
    * per-outer-row aggregate becomes a global one). Reject the shape so
    * it falls back instead of lowering wrongly. */
  private def guardCorrUnderAgg(lq: ListQuery): Unit = {
    // The correlation is "below" the aggregate if it appears in the
    // Aggregate's OWN expressions (grouping keys / aggregate list — e.g.
    // `SELECT max(v + outer.b)`) just as much as in a child Filter; scan
    // both or the rewrite plants an OuterReference the semi-join lowering
    // never substitutes (eval-time failure at best, wrong rows at worst).
    val bad = lq.plan.exists {
      case a: Aggregate =>
        a.expressions.exists(_.exists(_.isInstanceOf[OuterReference])) ||
        a.child.exists(
          _.expressions.exists(_.exists(_.isInstanceOf[OuterReference])))
      case _ => false
    }
    if (bad) throw new UnsupportedPlanException(
      "correlated IN with the correlation below an aggregate: the keyed " +
        "semi-join lowering cannot preserve per-outer-row aggregation")
  }

  private def passing(n0: Inc, outerNames: Seq[String], d0: Expression,
                      sources: Map[String, String]): Inc = {
    val d = rewriteCorrelatedIns(d0)
    d match {
    case And(a, b) =>
      passing(passing(n0, outerNames, a, sources), outerNames, b, sources)
    case Or(_, _) =>
      var fail = n0
      splitOr(d).foreach { x =>
        fail = fail.minus(passing(fail, outerNames, x, sources))
      }
      n0.minus(fail)
    case InSubquery(Seq(v: AttributeReference), lq: ListQuery) =>
      n0.semiJoin(inColumn(lq, v, sources), Seq(v.name))
    case Not(InSubquery(Seq(v: AttributeReference), lq: ListQuery)) =>
      if (v.nullable || lq.plan.output.head.nullable)
        nullAwareNotIn(n0, outerNames, v, lq, sources)
      else n0.antiJoin(inColumn(lq, v, sources), Seq(v.name))
    case InSubquery(vs, lq: ListQuery)
        if vs.forall(v => !v.exists(_.isInstanceOf[SubqueryExpression])) =>
      val (n2, probes) = projectProbes(n0, outerNames, vs)
      n2.semiJoin(inColumns(lq, probes, sources), probes.map(_.name))
        .select(outerNames.map(col): _*)
    case Not(InSubquery(vs, lq: ListQuery))
        if vs.forall(v => !v.exists(_.isInstanceOf[SubqueryExpression])) =>
      val (n2, probes) = projectProbes(n0, outerNames, vs)
      if (probes.exists(_.nullable) || lq.plan.output.exists(_.nullable))
        nullAwareNotInMulti(n2, outerNames, probes, lq, sources)
      else n2.antiJoin(inColumns(lq, probes, sources), probes.map(_.name))
        .select(outerNames.map(col): _*)
    case ex: Exists =>
      existsJoin(n0, outerNames, ex, sources, negate = false)
    case Not(ex: Exists) =>
      existsJoin(n0, outerNames, ex, sources, negate = true)
    case p if !p.exists(_.isInstanceOf[SubqueryExpression]) =>
      n0.where(toColumn(p))
    case other => throw new UnsupportedPlanException(
      s"unsupported subquery shape in filter predicate: $other")
  } }

  /** Materialize computed IN-probe expressions as linear helper columns
    * (`__inpK`), returning the widened node and one probe attribute per
    * expression (existing attributes pass through untouched). Callers
    * drop the helpers by re-projecting to the original output names. */
  private def projectProbes(n0: Inc, outerNames: Seq[String],
                            vs: Seq[Expression])
      : (Inc, Seq[AttributeReference]) = {
    var k = -1
    val probes = vs.map {
      case a: AttributeReference => a
      case e =>
        k += 1
        AttributeReference(s"__inp$k", e.dataType, e.nullable)()
    }
    val extra = vs.zip(probes).collect {
      case (e, p) if !e.isInstanceOf[AttributeReference] =>
        toColumn(e).as(p.name)
    }
    if (extra.isEmpty) (n0, probes)
    else (n0.select(outerNames.map(col) ++ extra: _*), probes)
  }

  /** Filter compilation with subquery-predicate lowering: conjuncts that
    * are EXISTS / [NOT] IN subqueries become semi/anti join circuit edges;
    * the rest apply as a plain filter. */
  private def compileFilter(cond0: Expression, child: LogicalPlan,
                            sources: Map[String, String]): Inc = {
    // correlated [NOT] IN conjuncts become EXISTS before any branch can
    // route them to the uncorrelated IN circuits (which would compile the
    // OuterReference into the plan and die at eval)
    val cond = rewriteCorrelatedIns(cond0)
    var node = walk(child, sources)
    val plain = Seq.newBuilder[Expression]
    val scalarConjs = Seq.newBuilder[Expression]
    val outerNames = child.output.map(_.name)
    splitAnd(cond).foreach {
      case InSubquery(Seq(v: AttributeReference), lq: ListQuery) =>
        node = node.semiJoin(inColumn(lq, v, sources), Seq(v.name))
      case Not(InSubquery(Seq(v: AttributeReference), lq: ListQuery)) =>
        // anti join == NOT IN only under 2-valued semantics: any NULL on
        // either side flips the whole predicate to UNKNOWN in SQL. Over
        // provably non-null columns the plain anti join applies; otherwise
        // build the NULL-AWARE circuit: a row passes iff the subquery is
        // empty, OR (the probe is non-NULL AND the subquery has no NULLs
        // AND the probe misses every subquery value) — matching the
        // null-aware anti join Spark itself plans for NOT IN.
        if (v.nullable || lq.plan.output.head.nullable)
          node = nullAwareNotIn(node, outerNames, v, lq, sources)
        else node = node.antiJoin(inColumn(lq, v, sources), Seq(v.name))
      case ex: Exists =>
        node = existsJoin(node, outerNames, ex, sources, negate = false)
      case Not(ex: Exists) =>
        node = existsJoin(node, outerNames, ex, sources, negate = true)
      // multi-column (a, b) IN (SELECT x, y ...): semi join on all columns
      case InSubquery(vs, lq: ListQuery)
          if vs.forall(_.isInstanceOf[AttributeReference]) =>
        val probes = vs.map(_.asInstanceOf[AttributeReference])
        node = node.semiJoin(inColumns(lq, probes, sources), probes.map(_.name))
      case Not(InSubquery(vs, lq: ListQuery))
          if vs.forall(_.isInstanceOf[AttributeReference]) =>
        val probes = vs.map(_.asInstanceOf[AttributeReference])
        if (probes.exists(_.nullable) || lq.plan.output.exists(_.nullable))
          node = nullAwareNotInMulti(node, outerNames, probes, lq, sources)
        else
          node = node.antiJoin(inColumns(lq, probes, sources), probes.map(_.name))
      // COMPUTED probes — `a+7 IN (SELECT ...)`, `(a%6, b) NOT IN ...`:
      // project each non-attribute probe as a linear helper column
      // (__inpK), run the attribute paths against it, drop the helpers.
      // The circuits only consume a probe's (name, type, nullability), so
      // a synthetic attribute over the projected column is sufficient.
      case InSubquery(vs, lq: ListQuery)
          if vs.forall(v => !v.exists(_.isInstanceOf[SubqueryExpression])) =>
        val (node2, probes) = projectProbes(node, outerNames, vs)
        node = node2
          .semiJoin(inColumns(lq, probes, sources), probes.map(_.name))
          .select(outerNames.map(col): _*)
      case Not(InSubquery(vs, lq: ListQuery))
          if vs.forall(v => !v.exists(_.isInstanceOf[SubqueryExpression])) =>
        val (node2, probes) = projectProbes(node, outerNames, vs)
        node =
          if (probes.exists(_.nullable) || lq.plan.output.exists(_.nullable))
            // nullAwareNotInMulti's final projection drops the helpers
            nullAwareNotInMulti(node2, outerNames, probes, lq, sources)
          else node2
            .antiJoin(inColumns(lq, probes, sources), probes.map(_.name))
            .select(outerNames.map(col): _*)
      // DISJUNCTIONS over subquery predicates — `a IN (...) OR b IN (...)`
      // or `(a IN (...) AND p) OR EXISTS(...)`: recursive lowering via
      // iterative complement (see `passing`)
      case c @ Or(_, _) if c.exists(_.isInstanceOf[SubqueryExpression]) &&
          !c.exists(_.isInstanceOf[ScalarSubquery]) =>
        node = passing(node, outerNames, c, sources)
      // comparisons against scalar subqueries (WHERE x > (SELECT AVG ...)):
      // join the subquery in as a __sqN column, compare, drop the helper
      case c if c.exists(_.isInstanceOf[ScalarSubquery]) => scalarConjs += c
      // any other subquery shape would die opaquely inside Spark's
      // analyzer when the filter executes — reject it up front instead
      case c if c.exists(_.isInstanceOf[SubqueryExpression]) =>
        throw new UnsupportedPlanException(
          s"unsupported subquery shape in filter predicate: $c")
      case other => plain += other
    }
    val withScalars = scalarConjs.result()
    if (withScalars.nonEmpty) {
      val scalars = withScalars.flatMap(_.collect { case s: ScalarSubquery => s })
        .groupBy(_.exprId).map(_._2.head).toSeq
      val (node2, nameOf) = attachScalars(node, child.output.map(_.name),
        scalars, sources)
      val rewritten = withScalars.map(_.transform {
        case s: ScalarSubquery => UnresolvedAttribute.quoted(nameOf(s.exprId))
      })
      node = node2.where(rewritten.map(toColumn).reduce(_ && _))
        .select(child.output.map(a => col(a.name)): _*) // drop __sq helpers
    }
    plain.result().reduceOption(And)
      .map(c => node.where(toColumn(c))).getOrElse(node)
  }

  /** Correlated EXISTS / NOT EXISTS conjunct → semi/anti circuit. With only
    * equality correlation this is the plain key-set semi join; with an
    * inequality residual the subquery joins in on the equality keys, the
    * residual filters, and the outer ROW VALUES with ≥1 surviving match
    * form a weight-1 set joined back null-safely — semi-join semantics
    * (outer multiplicities preserved, match count irrelevant). */
  private def existsJoin(node: Inc, outerNames: Seq[String], ex: Exists,
                         sources: Map[String, String], negate: Boolean): Inc = {
    if (!ex.plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[OuterReference]))))
      return uncorrelatedExists(node, outerNames, ex, sources, negate)
    rangeExists(node, outerNames, ex, sources, negate) match {
      case Some(inc) => return inc
      case None => ()
    }
    val (sub, keys, residOpt) = decorrelateExists(ex, sources)
    residOpt match {
      case None =>
        if (negate) node.antiJoin(sub, keys) else node.semiJoin(sub, keys)
      case Some(res) =>
        val matchedVals = node.join(sub, keys).where(res)
          .select(outerNames.map(col): _*).distinct
        val semi = node.joinNullSafe(matchedVals, outerNames)
        if (negate) node.minus(semi) else semi
    }
  }

  /** Uncorrelated [NOT] EXISTS: its truth is global, so the circuit is a
    * maintained COUNT(*) over the subquery reduced to a REGIME-BIT gate —
    * a 0/1-row distinct relation holding `(1)` exactly while the verdict
    * is "pass" — bilinearly joined to every outer row on a constant key.
    * The count's Q(∅) seed row makes the empty→nonempty→empty transitions
    * exact.
    *
    * Cost: a subquery step that changes the witness COUNT but not the
    * VERDICT (5 witnesses → 3) retracts/re-inserts the counts row, but the
    * gate projects that to the same `(1)` row and the distinct Refold
    * consolidates the offsetting pair to a physically EMPTY delta — the
    * constant-key join re-emits nothing. Only a genuine regime flip
    * (exists ↔ not-exists) re-emits O(outer), which is semantically
    * required: every row's verdict changes. */
  private def uncorrelatedExists(node: Inc, outerNames: Seq[String],
                                 ex: Exists, sources: Map[String, String],
                                 negate: Boolean): Inc = {
    import org.apache.spark.sql.functions.count
    val gate = walk(ex.plan, sources)
      .select(lit(1).as("__ex1"))
      .aggregateRowsGlobal(Seq(count(lit(1)).as("__excnt")), Seq("__excnt"))
      .where(if (negate) col("__excnt") === 0 else col("__excnt") > 0)
      .select(lit(1).as("__exone"))
      .distinct
    node.select(outerNames.map(col) :+ lit(1).as("__exone"): _*)
      .join(gate, Seq("__exone"))
      .select(outerNames.map(col): _*)
  }

  /** NULL-aware NOT IN circuit (3-valued semantics, the null-aware anti
    * join Spark itself plans for NOT IN): a row passes iff the subquery is
    * empty, OR the probe is non-NULL, the subquery contains no NULL, and
    * the probe misses every subquery value. The subquery's row/NULL counts
    * are a maintained global aggregate reduced to REGIME-BIT gates, so the
    * whole circuit is incremental AND delta-proportional on non-flip
    * steps.
    *
    * The two regimes — "subquery empty" and "subquery non-empty,
    * NULL-free" — are each a 0/1-row distinct relation holding `(1)`
    * exactly while that regime is active, joined to the outer rows on a
    * constant key. A subquery step that changes the counts WITHOUT
    * flipping a regime (one more non-NULL value, say) retracts/re-inserts
    * the counts row, but the gate projection maps both to the same `(1)`
    * row and the distinct Refold consolidates the offsetting pair to a
    * physically empty delta — nothing reaches the constant-key join. Only
    * genuine regime flips (empty↔non-empty, NULL-free↔NULL-bearing)
    * re-emit O(outer), which those semantics require: every outer row's
    * verdict changes. The per-value anti join stays value-keyed and
    * delta-proportional throughout. */
  private def nullAwareNotIn(node: Inc, outerNames: Seq[String],
                             v: AttributeReference, lq: ListQuery,
                             sources: Map[String, String]): Inc = {
    import org.apache.spark.sql.functions.{count, when}
    val subName = lq.plan.output.head.name
    val sub = walk(lq.plan, sources)
    val counts = sub.select(col(subName).as("__niv"))
      .aggregateRowsGlobal(
        Seq(count(lit(1)).as("__cnt"),
            count(when(col("__niv").isNull, lit(1))).as("__ncnt")),
        Seq("__cnt", "__ncnt"))
    // subquery empty → every outer row passes (IN over ∅ is FALSE, not
    // UNKNOWN — NULL probes included)
    val emptyGate = counts.where(col("__cnt") === 0)
      .select(lit(1).as("__one")).distinct
    // subquery non-empty and NULL-free → non-NULL probes that miss every
    // value pass; everything else (NULL probe, or any NULL in the
    // subquery) is UNKNOWN → filtered
    val candGate = counts.where(col("__cnt") > 0 && col("__ncnt") === 0)
      .select(lit(1).as("__one")).distinct
    val tagged = node.select(outerNames.map(col) :+ lit(1).as("__one"): _*)
    val passEmpty = tagged.join(emptyGate, Seq("__one"))
    val candidates = tagged.join(candGate, Seq("__one"))
      .where(col(v.name).isNotNull)
    val misses = candidates.antiJoin(
      sub.where(col(subName).isNotNull).select(col(subName).as(v.name)),
      Seq(v.name))
    passEmpty.union(misses).select(outerNames.map(col): _*)
  }

  /** Multi-column NULL-aware NOT IN: `(a, b) NOT IN (SELECT x, y …)` with
    * nullable columns on either side, under exact SQL 3VL semantics — an
    * outer row passes iff EVERY subquery row differs definitely, i.e. has
    * some column where both sides are non-NULL and unequal.
    *
    * MASK-EXPANSION circuit (one bilinear join, constant node count): for
    * an outer row NULL exactly on column set P and a subquery row NULL
    * exactly on Q, the pair "maybe-matches" (blocks the outer row) iff the
    * two agree on every column of `names − (P∪Q)` — the columns where both
    * are non-NULL. Each side EXPLODES each row into one key row per
    * candidate mask M with P ⊆ M ⊆ P ∪ otherSideNullable (≤ 2^3 = 8 rows,
    * weight-preserving linear flatMap), carrying (M, the row with columns
    * in M nulled out, its own NULL-pattern bits). A single NULL-SAFE
    * bilinear join on (M, masked columns) then matches exactly the pairs
    * agreeing outside M, and a linear residual filter P∪Q = M keeps each
    * maybe-matching pair exactly once (M is forced to the pair's true
    * joint pattern). All-NULL subquery rows and the empty-subquery case
    * need no separate gate: they fall out of the M = all-nullable bucket /
    * the empty build side.
    *
    * The verdict of a probe row depends ONLY on its probe tuple, so the
    * decision runs in DISTINCT-TUPLE space: blocked tuples are
    * set-normalized and subtracted from the distinct probe tuples, and one
    * NULL-SAFE semi join carries the passing tuples back to the outer
    * rows, restoring multiplicities. Per-step work is delta-proportional
    * on BOTH sides (a subquery delta joins only its masked-key buckets —
    * no global gate flip re-emitting all tuples), and the circuit has a
    * constant 4 stateful nodes (tuple distinct, block join, blocked
    * distinct, carry join) regardless of pattern count. Mask fan-out is
    * exponential in the NULLABLE column count only — guarded at 3 per
    * side; beyond that declare columns NOT NULL. */
  private def nullAwareNotInMulti(node: Inc, outerNames: Seq[String],
                                  probes: Seq[AttributeReference],
                                  lq: ListQuery,
                                  sources: Map[String, String]): Inc = {
    import org.apache.spark.sql.functions.{array, explode, struct, when, xxhash64, filter => afilter}
    val names = probes.map(_.name)
    val nullableProbe = probes.filter(_.nullable).map(_.name).toSet
    val nullableSub = lq.plan.output.zip(names)
      .collect { case (o, n) if o.nullable => n }.toSet
    val maskable = names.filter(n => nullableProbe(n) || nullableSub(n))
    if (maskable.size > 31)
      throw new UnsupportedPlanException(
        s"NOT IN over ${maskable.size} nullable columns exceeds the " +
          "NULL-pattern bitmask width (31); declare some columns NOT NULL")
    def subsets(xs: List[String]): List[Set[String]] = xs match {
      case Nil => List(Set.empty)
      case h :: t => val ts = subsets(t); ts ++ ts.map(_ + h)
    }
    val bit: Map[String, Int] =
      maskable.zipWithIndex.map { case (n, i) => n -> (1 << i) }.toMap
    def maskOf(s: Set[String]): Int = s.foldLeft(0)(_ | bit(_))
    val keyName: Map[String, String] =
      names.zipWithIndex.map { case (n, i) => n -> s"__nk$i" }.toMap
    val subAll = inColumns(lq, probes, sources)

    /** Row's own NULL pattern as mask bits (0 for non-nullable columns). */
    def bitsOf(nullableSelf: Set[String]): Column =
      maskable.filter(nullableSelf)
        .map(n => when(col(n).isNull, lit(bit(n))).otherwise(lit(0)))
        .reduceOption(_ + _).getOrElse(lit(0))

    /** Weight-preserving linear explode of each row into its valid masks:
      * M is valid iff P ⊆ M (columns outside M are non-NULL) and
      * M ⊆ P ∪ nullableOther (columns of M outside the other side's
      * nullable set must be NULL here). `keep` rides original columns
      * through (the probe side keeps its tuple for the subtract). */
    def expand(inc: Inc, types: Seq[org.apache.spark.sql.types.DataType],
               nullableSelf: Set[String], nullableOther: Set[String],
               bitsName: String, keep: Seq[String]): Inc = inc.linear { df =>
      val masks = subsets(maskable.toList)
      val structs = masks.map { m =>
        val valid = (
          maskable.filterNot(m).filter(nullableSelf).map(col(_).isNotNull) ++
            m.toSeq.filterNot(nullableOther).map(col(_).isNull)
          ).reduceOption(_ && _).getOrElse(lit(true))
        val fields = lit(maskOf(m)).as("__mask") +:
          names.zip(types).map { case (n, t) =>
            (if (m(n)) lit(null).cast(t) else col(n)).as(keyName(n))
          } :+ bitsOf(nullableSelf).as(bitsName)
        when(valid, struct(fields: _*))
      }
      val e = graft.zset.ZSet.map(df)(keep.map(col) :+
        explode(afilter(array(structs: _*), _.isNotNull)).as("__ex"): _*)
      // One 64-bit hash of (mask, masked tuple) is the JOIN key: inside a
      // mask bucket the NULL pattern is constant (columns in M are NULL,
      // the rest provably non-NULL), so xxhash64's skip-NULL folding can't
      // conflate different tuples of the same bucket, and cross-bucket
      // conflation is impossible up to 64-bit collision — which the
      // null-safe residual below re-checks exactly. Joining on one long
      // instead of (mask + every probe column) null-safely keeps the
      // shuffle key and the join comparisons narrow (the r6 q100 finding).
      graft.zset.ZSet.map(e)(keep.map(col) ++
        (("__mask" +: names.map(keyName)) :+ bitsName)
          .map(f => col(s"__ex.$f").as(f)) :+
        xxhash64(col("__ex.__mask") +:
          names.map(n => col(s"__ex.${keyName(n)}")): _*).as("__nh"): _*)
    }

    /** PATTERN-GROUPED expansion — the many-nullable-columns path. The
      * static enumeration explodes every row into all valid masks, 2^k in
      * the nullable-column count; but the only masks that can ever match
      * are M = ownPattern ∪ Q for NULL patterns Q actually PRESENT on the
      * other side. So each side joins (unit-key bilinear) against the
      * other side's maintained distinct-pattern relation — one row per
      * pattern in the data, a handful for real mostly-non-NULL schemas —
      * and masks only those unions. Union collisions (different Q, same
      * M) are re-set-normalized by the caller's distinct, so each
      * (row, M) appears exactly once, as in the static enumeration. A
      * pattern never seen contributes nothing — exactly the rows the
      * static path exploded and never matched. Fan-out per row is
      * #present-patterns, not 2^k; a NEW pattern arriving on one side
      * re-expands the other side's tuples against just that pattern
      * delta (bilinear), so steps stay delta-proportional. */
    def expandPat(tuples: Inc,
                  types: Seq[org.apache.spark.sql.types.DataType],
                  nullableSelf: Set[String], bitsName: String,
                  keep: Seq[String], otherPatterns: Inc): Inc = {
      val withBits = tuples.select(names.map(col) :+
        bitsOf(nullableSelf).as(bitsName) :+ lit(1).as("__one"): _*)
      // Masking/keying FUSED into the join node, with the delta
      // CONSOLIDATED before materialization (weight-linear post — exact,
      // see JoinInc): distinct tuples sharing a masked image collapse to
      // ONE stored row whose weight counts them. Unfused, the sub side's
      // traced state held one row PER (tuple, mask) — the downstream
      // masked-key join then paired every probe expansion with every raw
      // witness (measured q160 sf0.1: 7.8M-row join deltas, ~52 s task
      // CPU per step); consolidated, heavy masks collapse to one row per
      // (masked image, own-pattern class), and the pair count is bounded
      // by masked-image combinations, not tuple products — the difference
      // between O(tuples²) and O(distinct images) at scale.
      withBits.joinThen(otherPatterns, Seq("__one")) { df =>
        val masked = graft.zset.ZSet.map(df)(
          names.map(col) ++ Seq(col(bitsName),
            col(bitsName).bitwiseOR(col("__opat")).as("__mask")): _*)
        val keyed = graft.zset.ZSet.map(masked)(
          (keep.map(col) :+ col("__mask")) ++
            names.zip(types).map { case (n, t) =>
              if (!bit.contains(n)) col(n).as(keyName(n))
              else when(col("__mask").bitwiseAND(lit(bit(n))) =!= 0,
                lit(null).cast(t)).otherwise(col(n)).as(keyName(n))
            } :+ col(bitsName): _*)
        // same join-key shape as the static path: one 64-bit hash of
        // (mask, masked tuple) — see the narrow-key rationale above
        graft.zset.ZSet.consolidate(graft.zset.ZSet.map(keyed)(
          (keep.map(col) :+ col("__mask")) ++
            names.map(n => col(keyName(n))) ++
            Seq(col(bitsName),
              xxhash64(col("__mask") +:
                names.map(n => col(keyName(n))): _*).as("__nh")): _*))
      }
    }

    // distinct probe tuples (weight-1 set relation; NULLs are values here)
    val probeTuples = node.select(names.map(col): _*).distinct
    // ≤3 nullable per side: static 2^k ≤ 8 mask enumeration, no extra
    // stateful nodes; beyond that, pattern-grouped (data-proportional)
    val (probeExp, subExpRaw) =
      if (math.max(nullableProbe.size, nullableSub.size) <= 3) {
        notInStrategyTL.set("static-mask")
        (expand(probeTuples, probes.map(_.dataType),
          nullableProbe, nullableSub, "__pbits", keep = names),
        expand(subAll, lq.plan.output.map(_.dataType),
          nullableSub, nullableProbe, "__qbits", keep = Nil))
      }
      else {
        notInStrategyTL.set("pattern-grouped")
        val subTuples = subAll.distinct
        val one = lit(1).as("__one")
        // Pattern relations fold DIRECTLY from the raw sides, not from the
        // distinct-tuple nodes: the trailing .distinct set-normalizes
        // regardless of input multiplicity, and skipping the tuple node
        // puts both pattern states in the SAME materialization wave as the
        // tuple distincts (each wave is one job-floor-bound Spark job at
        // small deltas — circuit DEPTH is the step cost, r11 verdict #4).
        // The fold groups a single int column, so map-side partial
        // aggregation collapses it before the shuffle at any scale.
        val subPat = subAll
          .select(bitsOf(nullableSub).as("__opat"), one).distinct
        val probePat = node
          .select(bitsOf(nullableProbe).as("__opat"), one).distinct
        // No .distinct over the expansions: a (tuple, M) pair reached via
        // k distinct other-side patterns carries weight k (k ≤ #present
        // patterns, a few dozen at most), and the final blocked.distinct
        // below set-normalizes before the subtract — two fewer stateful
        // waves per step for the same row set.
        (expandPat(probeTuples, probes.map(_.dataType),
          nullableProbe, "__pbits", keep = names, subPat),
         expandPat(subTuples, lq.plan.output.map(_.dataType),
           nullableSub, "__qbits", keep = Nil, probePat))
      }
    val subExp = subExpRaw
      .select(col("__nh") +: col("__mask").as("__smask") +:
        col("__qbits") +:
        names.zipWithIndex.map { case (n, i) => col(keyName(n)).as(s"__sk$i") }: _*)
    val residual = (col("__mask") === col("__smask")) &&
      names.zipWithIndex.map { case (n, i) => col(keyName(n)) <=> col(s"__sk$i") }
        .reduce(_ && _)
    // Residual filter + tuple projection + consolidation FUSED into the
    // witness join (weight-linear post — exact, see JoinInc): the traced
    // delta/trace hold one consolidated row per blocked TUPLE instead of
    // the full (probe-expansion × witness) pair list with its 17 carrier
    // columns. The downstream distinct's touched-group refold then scans
    // tuple-sized state.
    val blocked = probeExp.joinThen(subExp, Seq("__nh")) { df =>
      graft.zset.ZSet.consolidate(graft.zset.ZSet.map(
        df.filter(residual &&
          col("__pbits").bitwiseOR(col("__qbits")) === col("__mask")))(
        names.map(col): _*))
    }
    val pass = probeTuples.minus(blocked.distinct)
    node.joinNullSafe(pass, names).select(outerNames.map(col): _*)
  }

  /** IN-list subquery → circuit producing the single column renamed to the
    * probe attribute so the semi/anti join keys line up by name. */
  private def inColumn(lq: ListQuery, probe: AttributeReference,
                       sources: Map[String, String]): Inc = {
    val outName = lq.plan.output.head.name
    walk(lq.plan, sources).select(col(outName).as(probe.name))
  }

  /** Multi-column IN subquery → circuit with its outputs positionally
    * renamed to the probe attributes. */
  private def inColumns(lq: ListQuery, probes: Seq[AttributeReference],
                        sources: Map[String, String]): Inc = {
    require(lq.plan.output.size == probes.size, "IN arity mismatch")
    walk(lq.plan, sources).select(
      lq.plan.output.zip(probes).map { case (o, p) =>
        col(o.name).as(p.name)
      }: _*)
  }

  /** Join every scalar subquery's single-row (or per-correlation-group)
    * circuit onto `node` under a generated column name. Uncorrelated
    * subqueries join on a constant key; correlated ones decorrelate via
    * `correlatedScalar`. Returns the augmented circuit (original `carried`
    * columns plus one `__sqN` per subquery) and the name map. */
  /** Lower `SELECT DISTINCT ... FROM <recursive CTE>` to an incremental
    * closure circuit when the recursion is the linear transitive-closure
    * shape: anchor A(c1,c2) UNION ALL SELECT r.c1, e.cDst FROM ref r JOIN
    * edges e ON r.c2 = e.cSrc. The set fixpoint of that recursion is
    * A ∪ A∘E⁺ (E = π(cSrc,cDst) edges, E⁺ its transitive closure), so the
    * circuit is anchor ∪ (anchor ⋈ ClosureInc(E)) under distinct — the
    * closure node maintains E⁺ with delta-proportional insert steps.
    * DISTINCT is required: it is what makes the SQL semantics the set
    * fixpoint (Spark's native UNION ALL UnionLoop counts paths and would
    * not even terminate on cycles; the set circuit terminates and matches
    * DuckDB's UNION recursion). Returns None when `p` is not a recursion
    * (callers fall back to plain distinct compilation); throws through
    * walk's UnionLoop case with an explanation for unsupported recursive
    * shapes. */
  private def compileRecursiveDistinct(p: LogicalPlan,
                                       sources: Map[String, String])
      : Option[Inc] = {
    // strip pure-rename layers, applying them back over the closure result
    def go(pl: LogicalPlan, renames: List[Seq[NamedExpression]]): Option[Inc] =
      pl match {
        case SubqueryAlias(_, c) => go(c, renames)
        case Project(projs, c)
            if projs.forall {
              case _: AttributeReference => true
              case Alias(_: AttributeReference, _) => true
              case _ => false
            } => go(c, projs :: renames)
        case ul: UnionLoop =>
          compileUnionLoop(ul, sources).map { inc =>
            renames.foldLeft(inc)((n, projs) =>
              n.select(projs.map(toColumn): _*))
          }
        case _ => None
      }
    go(p, Nil)
  }

  /** Match one linear TC-shaped UnionLoop and build its closure circuit;
    * None if the recursion has another shape (walk then raises the
    * explanatory UnionLoop error). */
  private def compileUnionLoop(ul: UnionLoop,
                               sources: Map[String, String]): Option[Inc] = {
    if (ul.anchor.output.length != 2) return None
    // an explicit LIMIT or MAX RECURSION LEVEL bounds the native loop's
    // OUTPUT — the unbounded set closure would silently differ
    if (ul.limit.isDefined || ul.maxDepth.isDefined) return None
    // map a join side's output exprIds to UnionLoopRef column positions,
    // tolerating rename layers; None if the side is not the bare ref
    def refMap(pl: LogicalPlan): Option[Map[ExprId, Int]] = pl match {
      case SubqueryAlias(_, c) => refMap(c)
      case Project(projs, c) => refMap(c).flatMap { inner =>
        val entries = projs.map {
          case a: AttributeReference => inner.get(a.exprId).map(a.exprId -> _)
          case al @ Alias(a: AttributeReference, _) =>
            inner.get(a.exprId).map(al.exprId -> _)
          case _ => None
        }
        if (entries.forall(_.isDefined)) Some(entries.flatten.toMap) else None
      }
      case r: UnionLoopRef if r.loopId == ul.id =>
        Some(r.output.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap)
      case _ => None
    }
    def hasRef(pl: LogicalPlan): Boolean =
      pl.exists { case r: UnionLoopRef => r.loopId == ul.id; case _ => false }

    // recursion shape: Project([refC1, edgeAttr], Join(refSide, edgeSide))
    def strip(pl: LogicalPlan): LogicalPlan = pl match {
      case SubqueryAlias(_, c) => strip(c)
      case other => other
    }
    strip(ul.recursion) match {
      case Project(projs, j @ Join(l, r, _: InnerLike, Some(cond), _)) =>
        val (refSide, edgeSide) =
          if (hasRef(l) && !hasRef(r)) (l, r)
          else if (hasRef(r) && !hasRef(l)) (r, l)
          else return None
        val rm = refMap(refSide).getOrElse(return None)
        def refPos(e: Expression): Option[Int] = e match {
          case a: AttributeReference => rm.get(a.exprId)
          case _ => None
        }
        def edgeAttr(e: Expression): Option[Attribute] = e match {
          case a: AttributeReference =>
            edgeSide.output.find(_.exprId == a.exprId)
          case _ => None
        }
        // single equi condition: ref.c2 = edge.cSrc (either written order)
        val (joinEdge0, condOk) = cond match {
          case EqualTo(x, y) =>
            (refPos(x), edgeAttr(y), refPos(y), edgeAttr(x)) match {
              case (Some(1), Some(e), _, _) => (Some(e), true)
              case (_, _, Some(1), Some(e)) => (Some(e), true)
              case _ => (None, false)
            }
          case _ => (None, false)
        }
        if (!condOk) return None
        val joinEdge = joinEdge0.get
        // projection: [ref.c1, edge.cDst] (aliases allowed)
        def unalias(e: Expression): Expression = e match {
          case Alias(c, _) => c
          case other => other
        }
        if (projs.length != 2) return None
        if (!refPos(unalias(projs.head)).contains(0)) return None
        val projEdge = edgeAttr(unalias(projs(1))).getOrElse(return None)
        if (joinEdge.name == projEdge.name &&
            joinEdge.exprId != projEdge.exprId) return None // ambiguous by name
        val Seq(c1, c2) = ul.anchor.output.map(_.name)
        if (c1 == c2 ||
            Set(c1, c2).exists(n => n == "__cl_src" || n == "__cl_dst"))
          return None
        // Anchor ≡ edge relation (the plain TC query): A ∪ A∘E⁺ = E⁺, so
        // the circuit is the closure node alone — no join, no outer
        // distinct (closure output is already a set).
        val edgeRel: LogicalPlan =
          Project(Seq(joinEdge, projEdge), edgeSide)
        if (edgeRel.canonicalized == ul.anchor.canonicalized) {
          val eInc = walk(edgeSide, sources).select(
            col(joinEdge.name).as(c1), col(projEdge.name).as(c2))
          return Some(eInc.closure(c1, c2))
        }
        val eInc = walk(edgeSide, sources).select(
          col(joinEdge.name).as("__cl_src"), col(projEdge.name).as("__cl_dst"))
        val cInc = eInc.closure("__cl_src", "__cl_dst")
        val aInc = walk(ul.anchor, sources)
        val extended = aInc
          .select(col(c1), col(c2).as("__cl_src"))
          .join(cInc, Seq("__cl_src"))
          .select(col(c1), col("__cl_dst").as(c2))
        Some(aInc.union(extended).distinct)
      case _ => None
    }
  }

  /** Fallback for scalar subqueries the native lowering rejects —
    * INEQUALITY correlation (`WHERE (SELECT max(v) FROM t WHERE k < a) IS
    * NOT NULL`): decorrelate the enclosing Filter/Project subtree with
    * Spark's own PullupCorrelatedPredicates + RewriteCorrelatedScalar-
    * Subquery (the same subtree-local trick as the LATERAL lowering — the
    * domain join they emit is `<=>`-keyed, which the join case compiles
    * as a null-safe bilinear join). Returns None when the rules leave any
    * subquery expression behind (e.g. EXISTS/IN mixed in, or uncorrelated
    * non-aggregate scalars whose one-row runtime check has no logical
    * form) so the caller rethrows the native error. */
  private def decorrelateScalarFallback(p: LogicalPlan,
                                        sources: Map[String, String])
      : Option[Inc] = {
    import org.apache.spark.sql.catalyst.optimizer.{
      PullupCorrelatedPredicates, RewriteCorrelatedScalarSubquery}
    val rewritten =
      try RewriteCorrelatedScalarSubquery(PullupCorrelatedPredicates(p))
      catch { case scala.util.control.NonFatal(_) => return None }
    val clean = !rewritten.exists {
      case _: LateralJoin => true
      case n => n.expressions.exists(_.exists(_.isInstanceOf[SubqueryExpression]))
    }
    if (!clean) None
    else {
      val pinned = Project(
        p.output.map(a => Alias(a, a.name)(): NamedExpression), rewritten)
      Some(walk(dedupJoinNames(pinned), sources))
    }
  }

  private def attachScalars(node0: Inc, carried0: Seq[String],
                            scalars: Seq[ScalarSubquery],
                            sources: Map[String, String])
      : (Inc, Map[ExprId, String]) = {
    scalars.foreach { s =>
      if (!s.plan.exists {
        case Aggregate(g, _, _, _) => g.isEmpty
        case _ => false
      }) throw new UnsupportedPlanException(
        "scalar subqueries must be global aggregates (exactly one row " +
          s"on any state) for incremental mode, got: ${s.plan.nodeName}")
    }
    val nameOf = scalars.zipWithIndex.map { case (s, i) =>
      s.exprId -> s"__sq$i"
    }.toMap
    var node = node0
    var carried = carried0
    val (correlated, plainScalars) = scalars.partition(_.outerAttrs.nonEmpty)
    if (plainScalars.nonEmpty) {
      node = node.select(carried.map(col) :+ lit(1).as("__one"): _*)
      plainScalars.foreach { s =>
        val sub = walk(s.plan, sources).select(
          col(s.plan.output.head.name).as(nameOf(s.exprId)),
          lit(1).as("__one"))
        node = node.join(sub, Seq("__one"))
        carried :+= nameOf(s.exprId)
      }
    }
    correlated.foreach { s =>
      node = correlatedScalar(node, carried, s, nameOf(s.exprId), sources)
      carried :+= nameOf(s.exprId)
    }
    (node, nameOf)
  }

  /** Correlated scalar subquery → decorrelated grouped aggregate joined on
    * the correlation keys, with unmatched outer rows taking the
    * aggregate-over-empty value (COUNT → 0, MAX → NULL — exactly the SQL
    * value of the subquery when no rows match, since a global aggregate
    * always yields one row). The classic Calcite/DBSP decorrelation, in
    * circuit form: Δ to either table flows through the bilinear join. */
  private def correlatedScalar(node: Inc, carried: Seq[String],
                               s: ScalarSubquery, valName: String,
                               sources: Map[String, String]): Inc = {
    val agg = s.plan match {
      case a @ Aggregate(g, _, _, _) if g.isEmpty => a
      case other => throw new UnsupportedPlanException(
        s"correlated scalar subquery must be a global aggregate, got: ${other.nodeName}")
    }
    require(agg.aggregateExpressions.size == 1, "scalar subquery has one output")
    val aggExpr = agg.aggregateExpressions.head
    // strip the correlation equality conjuncts out of the inner plan
    var pairs = Seq.empty[(NamedExpression, NamedExpression)] // (inner, outer)
    val stripped = agg.child.transform {
      case Filter(c, ch) =>
        val (corr, rest) = splitAnd(c).partition(_.exists(_.isInstanceOf[OuterReference]))
        corr.foreach {
          case EqualTo(a: AttributeReference, OuterReference(o)) => pairs :+= (a -> o)
          case EqualTo(OuterReference(o), a: AttributeReference) => pairs :+= (a -> o)
          case other => throw new UnsupportedPlanException(
            s"scalar-subquery correlation must be equality conjuncts, got: $other")
        }
        rest.reduceOption(And).map(Filter(_, ch)).getOrElse(ch)
    }
    if (pairs.isEmpty) throw new UnsupportedPlanException(
      s"could not extract correlation keys from: ${agg.child}")
    val keys = pairs.map(_._2.name)
    // grouped sub-circuit keyed by the correlation columns, renamed to the
    // outer names so the join lines up
    val subInc = walk(stripped, sources)
      .aggregateRows(
        pairs.map(_._1.name),
        Seq(toColumn(aggExpr)),
        pairs.map(_._1.name) :+ aggExpr.name)
      .select(pairs.map { case (i, o) => col(i.name).as(o.name) } :+
        col(aggExpr.name).as(valName): _*)
    // default for outer rows with no matching group = aggregate over empty
    val spark = org.apache.spark.sql.SparkSession.active
    val emptySchema = org.apache.spark.sql.types.StructType(stripped.output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
    val default = spark
      .createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
      .groupBy().agg(toColumn(aggExpr)).head().get(0)
    val matched = node.join(subInc, keys)
      .select(carried.map(col) :+ col(valName): _*)
    val subKeys = subInc.select(keys.map(col): _*).distinct
    val padded = node.minus(node.join(subKeys, keys))
      .select(carried.map(col) :+
        lit(default).cast(aggExpr.dataType).as(valName): _*)
    matched union padded
  }

  /** Pure-inequality correlated [NOT] EXISTS of the BETWEEN shape —
    * `EXISTS (… WHERE inner.x >= lo(outer) AND inner.x <= hi(outer))`,
    * bounds in either written order, strict or inclusive — lowered to a
    * BINNED range semi-join circuit (the RangeJoin.scala strategy inside
    * the delta algebra). The reference decorrelates the same correlation
    * and compiles it as cross join + filter (RelDecorrelator,
    * CalciteCompiler.java:438-441) — quadratic; binning bounds the
    * per-step delta product by actual bin co-location instead:
    *
    *  - inner side: DISTINCT values of x (a Refold — churn that does not
    *    change the value set emits an empty consolidated delta), each
    *    mapped to its single bin — LINEAR;
    *  - outer side: each row replicated to the bins its [lo, hi] covers
    *    (weight-preserving flatMap — LINEAR; rows with lo > hi or NULL
    *    bounds match nothing and are dropped from the match side only);
    *  - ONE bilinear join on the bin id, exact residual, then outer ROW
    *    VALUES with ≥1 surviving match joined back null-safely — semi
    *    semantics (multiplicities preserved), `node − semi` for NOT.
    *
    * Bin width comes from `spark.graft.incremental.rangeBinWidth`
    * (default 3600 — epoch-seconds-by-the-hour); a row spanning more than
    * `spark.graft.incremental.rangeMaxBinsPerRow` bins (default 65536)
    * raises at execution rather than silently exploding the state. Bounds
    * and x must be integral (bin ids use exact integer floor division).
    * Returns None for shapes this lowering does not cover (equality
    * conjuncts present, single-bound correlation, non-integral types) —
    * the caller falls back to the key-join path or the explanatory
    * error. */
  private def rangeExists(node: Inc, outerNames: Seq[String], ex: Exists,
                          sources: Map[String, String],
                          negate: Boolean): Option[Inc] = {
    import org.apache.spark.sql.functions.{explode, sequence}
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    var corr = Seq.empty[Expression]
    val stripped = ex.plan.transform {
      case Filter(c, ch) =>
        val (co, rest) = splitAnd(c).partition(_.exists(_.isInstanceOf[OuterReference]))
        corr ++= co
        rest.reduceOption(And).map(Filter(_, ch)).getOrElse(ch)
    }
    if (corr.size != 2) return None
    // any equality conjunct → the key-join path owns this shape
    if (corr.exists { case EqualTo(_, _) => true; case _ => false }) return None
    val outerIds = corr.flatMap(_.collect {
      case OuterReference(o: AttributeReference) => o.exprId
    }).toSet
    def outerOnly(e: Expression): Boolean = e.collect {
      case a: AttributeReference if !outerIds.contains(a.exprId) => a
    }.isEmpty
    // classify a conjunct as a lower or upper bound on one inner attribute
    sealed trait B; case class Lo(a: AttributeReference, e: Expression) extends B
    case class Hi(a: AttributeReference, e: Expression) extends B
    def classify(c: Expression): Option[B] = c match {
      case GreaterThanOrEqual(a: AttributeReference, e)
          if !outerIds.contains(a.exprId) && outerOnly(e) => Some(Lo(a, e))
      case GreaterThan(a: AttributeReference, e)
          if !outerIds.contains(a.exprId) && outerOnly(e) => Some(Lo(a, e))
      case LessThanOrEqual(a: AttributeReference, e)
          if !outerIds.contains(a.exprId) && outerOnly(e) => Some(Hi(a, e))
      case LessThan(a: AttributeReference, e)
          if !outerIds.contains(a.exprId) && outerOnly(e) => Some(Hi(a, e))
      case GreaterThanOrEqual(e, a: AttributeReference)
          if !outerIds.contains(a.exprId) && outerOnly(e) => Some(Hi(a, e))
      case GreaterThan(e, a: AttributeReference)
          if !outerIds.contains(a.exprId) && outerOnly(e) => Some(Hi(a, e))
      case LessThanOrEqual(e, a: AttributeReference)
          if !outerIds.contains(a.exprId) && outerOnly(e) => Some(Lo(a, e))
      case LessThan(e, a: AttributeReference)
          if !outerIds.contains(a.exprId) && outerOnly(e) => Some(Lo(a, e))
      case _ => None
    }
    val (lo, hi) = (classify(corr.head), classify(corr(1))) match {
      case (Some(l: Lo), Some(h: Hi)) => (l, h)
      case (Some(h: Hi), Some(l: Lo)) => (l, h)
      case _ => return None
    }
    if (lo.a.exprId != hi.a.exprId) return None
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    if (!integral.contains(lo.a.dataType) ||
        !integral.contains(lo.e.dataType) || !integral.contains(hi.e.dataType))
      return None

    val spark = org.apache.spark.sql.SparkSession.active
    val w = confGet(spark, "spark.graft.incremental.rangeBinWidth", "3600").toLong
    val maxBins =
      confGet(spark, "spark.graft.incremental.rangeMaxBinsPerRow", "65536").toLong
    require(w > 0, "spark.graft.incremental.rangeBinWidth must be positive")
    def reOuter(e: Expression): Column = toColumn(e.transform {
      case OuterReference(o) => UnresolvedAttribute.quoted(o.name)
    })
    val bin: Column => Column = graft.operators.RangeJoin.binColumn(_, w)

    // inner: distinct values → (value, bin); NULL values match nothing
    // (explode of a NULL-bin singleton below never sees them — the bin
    // column is NULL and the equi join drops it)
    def dropProjects(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, c) => dropProjects(c)
      case other => other
    }
    val innerB = walk(dropProjects(stripped), sources)
      .select(col(lo.a.name).as("__rv")).distinct
      .select(col("__rv"), bin(col("__rv")).as("__rbin"))

    // outer: replicate each row to the bins its [lo, hi] covers (rows with
    // NULL or reversed bounds cannot match — dropped from the MATCH side
    // only; `node` itself still carries them for the anti complement).
    val loC = reOuter(lo.e)
    val hiC = reOuter(hi.e)
    val binHi = {
      import org.apache.spark.sql.functions.{concat, raise_error, when => swhen}
      swhen(bin(hiC) - bin(loC) >= maxBins, raise_error(concat(
        lit(s"incremental range EXISTS: interval covers more than $maxBins "),
        lit(s"bins at binWidth=$w — raise spark.graft.incremental."),
        lit("rangeBinWidth or rangeMaxBinsPerRow"))))
        .otherwise(bin(hiC))
    }
    val outerExp = node
      .where(loC.isNotNull && hiC.isNotNull && loC <= hiC)
      .linear { df =>
        graft.zset.ZSet.map(df)(
          outerNames.map(col) :+ explode(sequence(bin(loC), binHi)).as("__rbin"): _*)
      }
    val residual = corr.map { c =>
      toColumn(c.transform {
        case OuterReference(o) => UnresolvedAttribute.quoted(o.name)
        case a: AttributeReference if a.exprId == lo.a.exprId =>
          UnresolvedAttribute.quoted("__rv")
      })
    }.reduce(_ && _)
    val matchedVals = outerExp.join(innerB, Seq("__rbin"))
      .where(residual)
      .select(outerNames.map(col): _*).distinct
    val semi = node.joinNullSafe(matchedVals, outerNames)
    Some(if (negate) node.minus(semi) else semi)
  }

  /** Correlated EXISTS → (inner circuit, outer key names, optional residual
    * predicate). Equality correlation conjuncts `inner.a = outer.b` become
    * the semi-join keys (the decomposable form JoinConditionAnalyzer
    * handles); NON-equality correlated conjuncts (`inner.a > outer.b`, …)
    * become a residual applied after the key join — the reference
    * decorrelates arbitrary correlations the same way upstream (Calcite's
    * RelDecorrelator, CalciteCompiler.java:429-447). At least one equality
    * conjunct is required (it bounds the per-step delta join).
    *
    * With a residual, the returned circuit is projected to the keys (outer
    * names) plus every inner column the residual reads under fresh
    * `__exrN` names, and the residual Column is rewritten onto those. */
  private def decorrelateExists(ex: Exists, sources: Map[String, String])
      : (Inc, Seq[String], Option[Column]) = {
    var pairs = Seq.empty[(NamedExpression, NamedExpression)] // (inner, outer)
    var resid = Seq.empty[Expression]
    def extract(e: Expression): Option[(NamedExpression, NamedExpression)] = e match {
      case EqualTo(a: AttributeReference, OuterReference(o)) => Some(a -> o)
      case EqualTo(OuterReference(o), a: AttributeReference) => Some(a -> o)
      case _ => None
    }
    // transformUp, not transformDown: stripping a Filter replaces it with
    // its child, and a down-transform never re-applies the rule to the
    // replacement — stacked correlated Filters (which the correlated-IN
    // rewrite can synthesize) would leak an un-stripped OuterReference
    // into the compiled circuit
    val stripped = ex.plan.transformUp {
      case Filter(c, ch) =>
        val (corr, rest) = splitAnd(c).partition(_.exists(_.isInstanceOf[OuterReference]))
        corr.foreach { conj =>
          extract(conj) match {
            case Some(p) => pairs :+= p
            case None    => resid :+= conj
          }
        }
        rest.reduceOption(And).map(Filter(_, ch)).getOrElse(ch)
    }
    if (pairs.isEmpty) throw new UnsupportedPlanException(
      if (resid.isEmpty)
        "EXISTS correlation is not a recognizable filter conjunct " +
          "(uncorrelated EXISTS routes through the global count gate)"
      else
        "EXISTS correlation needs at least one equality conjunct to key " +
          "the semi join, or the two-bound BETWEEN shape " +
          "(inner.x >= lo(outer) AND inner.x <= hi(outer), integral types) " +
          "for the binned range lowering — unbounded single-sided " +
          s"correlation has no delta-bounded circuit: ${resid.mkString(" AND ")}")
    // the subquery's own projection is irrelevant to existence — drop the
    // top Project chain so the correlation keys stay visible
    def dropProjects(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, c) => dropProjects(c)
      case other => other
    }
    val innerPlan = dropProjects(stripped)
    val keyCols = pairs.map { case (i, o) => col(i.name).as(o.name) }
    if (resid.isEmpty) {
      (walk(innerPlan, sources).select(keyCols: _*), pairs.map(_._2.name), None)
    } else {
      // project the residual's inner columns under fresh names (they may
      // collide with outer names) and rewrite the residual onto outer
      // attribute names + those fresh names
      // outer attrs appear WRAPPED in OuterReference, and a plain collect
      // descends into the wrapper's child — exclude those exprIds
      val outerIds = resid.flatMap(_.collect {
        case OuterReference(o: AttributeReference) => o.exprId
      }).toSet
      val innerAttrs = resid.flatMap(_.collect {
        case a: AttributeReference if !outerIds.contains(a.exprId) => a
      }).groupBy(_.exprId).map(_._2.head).toSeq
      val freshOf: Map[ExprId, String] = innerAttrs.zipWithIndex.map {
        case (a, i) => a.exprId -> s"__exr$i"
      }.toMap
      val extraCols = innerAttrs.map(a => col(a.name).as(freshOf(a.exprId)))
      val rewritten = resid.map(_.transform {
        case OuterReference(o) => UnresolvedAttribute.quoted(o.name)
        case a: AttributeReference if freshOf.contains(a.exprId) =>
          UnresolvedAttribute.quoted(freshOf(a.exprId))
      }).reduce(And)
      val sub = walk(innerPlan, sources).select(keyCols ++ extraCols: _*)
      (sub, pairs.map(_._2.name), Some(toColumn(rewritten)))
    }
  }

  /** SortOrder → DataFrame sort Column (direction + null ordering). */
  private def toSortColumn(so: SortOrder): Column = {
    val c = toColumn(so.child)
    (so.direction, so.nullOrdering) match {
      case (Ascending, NullsFirst)  => c.asc_nulls_first
      case (Ascending, NullsLast)   => c.asc_nulls_last
      case (Descending, NullsFirst) => c.desc_nulls_first
      case (Descending, NullsLast)  => c.desc_nulls_last
    }
  }

  /** Positional re-aliasing of `from`'s columns to `to`'s names (binary
    * set ops are positional; the weighted union merges by name). */
  private def renameTo(from: LogicalPlan, to: LogicalPlan): Seq[Column] = {
    import org.apache.spark.sql.functions.col
    from.output.map(_.name).zip(to.output.map(_.name)).map {
      case (f, t) => col(f).as(t)
    }
  }

  /** Rows of `keep` with no join partner in `other`, projected to
    * `outCols` (the caller supplies kept values / typed NULL pads).
    * matched = keep ⋈ distinct(π_k other) — the bilinear join against a
    * weight-1 key set preserves each kept row's multiplicity, so
    * keep − matched is exactly the unmatched multiset. */
  private def padUnmatched(keep: Inc, other: Inc, keys: Seq[String],
                           outCols: Seq[Column],
                           nullSafe: Boolean = false): Inc = {
    val otherKeys = other.select(keys.map(col): _*).distinct
    // key semantics must mirror the inner branch's join: under null-safe
    // keys a NULL-keyed row that MATCHED must not also be padded
    val matched = if (nullSafe) keep.joinNullSafe(otherKeys, keys)
      else keep.join(otherKeys, keys)
    keep.minus(matched).select(outCols: _*)
  }

  /** Re-anchor attribute references by name so the expression resolves
    * against the circuit's delta/state DataFrames instead of the original
    * analyzed plan's exprIds. */
  private def toColumn(e: Expression): Column = {
    // Inline Catalyst `With` common-subexpression wrappers (NULLIF & co.
    // analyze to With(CommonExpressionDef…)): once attributes are replaced
    // with unresolved ones below, With.withNewChildrenInternal calls
    // dataType on the unresolved def and throws. Duplicating the def
    // expression is semantically identical (codegen re-CSEs it).
    val inlined = e.transformUp {
      case w: org.apache.spark.sql.catalyst.expressions.With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
            defs(r.id)
        }
    }
    val cleaned = inlined.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }
    GraftSqlBridge.column(cleaned match {
      case al: Alias => al
      case ne: NamedExpression => ne
      case other => other
    })
  }

  /** A global Sort, with the optional NARROWING projection Spark inserts
    * above it when ORDER BY references columns outside the select list
    * (the widened projection sits below the sort). */
  private object SortedChild {
    def unapply(p: LogicalPlan): Option[(Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
        LogicalPlan, Option[Seq[NamedExpression]])] = p match {
      case Sort(order, true, child, _) => Some((order, child, None))
      case Project(exprs, Sort(order, true, child, _)) =>
        Some((order, child, Some(exprs)))
      case _ => None
    }
  }

  /** ORDER BY ... [LIMIT k] [OFFSET m] as a maintained view: ranks
    * m+1..m+k are a deterministic row set under the total order —
    * re-evaluated over consolidated state each step with the previous
    * result retracted (the reference re-aggregates sorts into a sorted
    * Vec, visitSort :980-1048). k = -1 means no limit (OFFSET only). */
  private def rankRange(k: Int, m: Int,
                        order: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
                        child: LogicalPlan,
                        proj: Option[Seq[NamedExpression]],
                        sources: Map[String, String]): Inc = {
    val sortCols = order.map(toSortColumn)
    val base = walk(child, sources).reevaluate { df =>
      val sorted = df.sort(sortCols: _*)
      val off = if (m > 0) sorted.offset(m) else sorted
      if (k >= 0) off.limit(k) else off
    }
    proj.fold(base)(exprs => base.select(exprs.map(toColumn): _*))
  }

  /** One equi key of a join condition: the left/right attributes plus
    * whether the conjunct was NULL-SAFE (`<=>`, where NULL matches NULL —
    * Spark's subquery decorrelation emits these for domain joins). */
  private final case class EquiPair(l: AttributeReference,
                                    r: AttributeReference,
                                    nullSafe: Boolean)

  /** The CIRCUIT frame's column names for a subplan — the plan's output
    * names with every descendant inner join's merged same-named equi keys
    * collapsed to the single USING-style column the walker actually
    * produces. Plan-level `Join.output` keeps BOTH attributes (u.a and
    * w.a after `u JOIN w ON u.a = w.a`), so reading names off plan attrs
    * over-counts exactly those merges; reading them here keeps the upper
    * joins' dupe checks and projections aligned with the walked frame
    * (the r13 join.test alias-apart reject bucket). Non-join nodes pass
    * plan names through — the walker preserves them. */
  private def circuitCols(p: LogicalPlan): Seq[String] = p match {
    case Join(l, r, joinType, cond, _) =>
      joinType match {
        case LeftSemi | LeftAnti => circuitCols(l)
        case _ =>
          val merged =
            try analyzeCondition(cond, l, r)._1.collect {
              case EquiPair(a, b, _) if a.name.equalsIgnoreCase(b.name) =>
                a.name.toLowerCase
            }.toSet
            catch { case scala.util.control.NonFatal(_) => Set.empty[String] }
          circuitCols(l) ++
            circuitCols(r).filterNot(n => merged.contains(n.toLowerCase))
      }
    // pass-through nodes keep the child's circuit columns (a Filter or
    // alias over a merged join must not re-read the doubled plan attrs) —
    // every output-preserving unary node qualifies, or the shapes it
    // covers regress to the alias-apart reject this exists to close
    case f: Filter => circuitCols(f.child)
    case a: SubqueryAlias => circuitCols(a.child)
    case s: Sort => circuitCols(s.child)
    case l: GlobalLimit => circuitCols(l.child)
    case l: LocalLimit => circuitCols(l.child)
    case d: Deduplicate => circuitCols(d.child)
    case w: Window =>
      circuitCols(w.child) ++ w.windowExpressions.map(_.name)
    case other => other.output.map(_.name)
  }

  /** Decompose a join condition into (left, right) equi-column pairs plus
    * an optional residual predicate, mirroring the reference's
    * JoinConditionAnalyzer.java:48-79: each conjunct `attr = attr` or
    * `attr <=> attr` with one side from each input becomes an equi pair
    * (normalized left-first); literal TRUE conjuncts are dropped (lateral
    * rewrites emit `ON true AND ...`); every other conjunct joins the
    * residual, applied as a filter after the bilinear join. A `<=>` pair
    * counts as a KEY only when every pair is null-safe — a mixed
    * condition keeps the plain pairs as keys and the `<=>` conjuncts as
    * residual (exact under the keyed join; all-null-safe joins route
    * through the `<=>`-keyed bilinear join instead of a unit-key cross).
    * No equi pair (a CROSS JOIN, or a pure theta join) yields an empty
    * pair list — the Join case compiles those as a UNIT-KEY bilinear
    * join, the reference's own lowering (CalciteToDBSPCompiler.java:584
    * routes empty-key joins to a stream join over the unit key). */
  private def analyzeCondition(cond: Option[Expression],
                               left: LogicalPlan, right: LogicalPlan)
      : (Seq[EquiPair], Option[Expression]) = {
    val c = cond.getOrElse(return (Seq.empty, None))
    val leftAttrs = left.outputSet
    val rightAttrs = right.outputSet
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    val (equi, residual) = split(c).foldLeft(
      (Seq.empty[EquiPair], Seq.empty[Expression])) {
      case ((pairs, res), conjunct) => conjunct match {
        case Literal(true, org.apache.spark.sql.types.BooleanType) =>
          (pairs, res)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if leftAttrs.contains(a) && rightAttrs.contains(b) =>
          (pairs :+ EquiPair(a, b, nullSafe = false), res)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if leftAttrs.contains(b) && rightAttrs.contains(a) =>
          (pairs :+ EquiPair(b, a, nullSafe = false), res)
        case EqualNullSafe(a: AttributeReference, b: AttributeReference)
            if leftAttrs.contains(a) && rightAttrs.contains(b) =>
          (pairs :+ EquiPair(a, b, nullSafe = true), res)
        case EqualNullSafe(a: AttributeReference, b: AttributeReference)
            if leftAttrs.contains(b) && rightAttrs.contains(a) =>
          (pairs :+ EquiPair(b, a, nullSafe = true), res)
        case other => (pairs, res :+ other)
      }
    }
    // a null-safe pair is usable as a JOIN KEY only when the whole key
    // set is null-safe (one bilinear join, one key semantics); otherwise
    // demote <=> pairs to residual conjuncts over the plain-keyed join
    if (equi.nonEmpty && equi.exists(_.nullSafe) && !equi.forall(_.nullSafe)) {
      val (ns, plain) = equi.partition(_.nullSafe)
      (plain, (residual ++ ns.map(p => EqualNullSafe(p.l, p.r))).reduceOption(And))
    } else (equi, residual.reduceOption(And))
  }
}
