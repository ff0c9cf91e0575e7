package graft.queries

import graft.Tables
import graft.operators.Fixpoint
import graft.streaming.Incremental._
import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recursive queries — beyond-reference surface (the reference repo's
  * Calcite pipeline has no recursive-query support at all; DBSP the THEORY
  * does, via nested fixpoint circuits, which is what `Fixpoint` and the
  * `closure` Inc node implement). Three execution paths, all under the
  * DuckDB `WITH RECURSIVE` oracle:
  *
  *  - native SQL-text recursion (`spark.sql` → UnionLoop): q58, q59;
  *  - DataFrame-level semi-naive fixpoint (set semantics, cycle-safe,
  *    which UNION ALL recursion cannot express): q85;
  *  - an incrementally-maintained standing closure view (insert-only
  *    steps do delta-proportional work; retraction re-derives): q89,
  *    the same view compiled from SQL text (q86), and a min-label
  *    connected-components clustering view composed on top of the
  *    closure circuit (q151).
  *
  * Graph fixtures are derived deterministically from TPC-H keys so the
  * oracle can rebuild them: part ancestors by halving (q58), supplier
  * chains of 20 (q59), 20-cycles over suppliers (q85/q86/q89), and
  * blocks of 10 with bridge/cut edge churn (q151).
  */
object Recursive {
  type QFn = (SparkSession, String) => DataFrame

  val defs: Map[String, QFn] = Map(
    // Native WITH RECURSIVE (Spark UnionLoop): walk each part's ancestor
    // chain under node -> node DIV 2 until the root, then aggregate path
    // depth and sum. UNION ALL recursion; acyclic by construction.
    "q58_recursive_ancestors" -> ((s, d) => {
      Tables.load(s, d, "part").select(col("p_partkey"))
        .createOrReplaceTempView("rec_part")
      s.sql(
        """WITH RECURSIVE anc (pk, node, depth) AS (
             SELECT p_partkey, p_partkey, 0 FROM rec_part
             UNION ALL
             SELECT pk, node DIV 2, depth + 1 FROM anc WHERE node > 1
           )
           SELECT pk, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
                  CAST(SUM(node) AS BIGINT) AS path_sum
           FROM anc GROUP BY pk""")
    }),

    // Native WITH RECURSIVE over a data-derived edge relation: chains of
    // 20 suppliers; per-source reachable count and maximum hop depth.
    "q59_recursive_reach" -> ((s, d) => {
      Tables.load(s, d, "supplier").select(col("s_suppkey"))
        .createOrReplaceTempView("rec_supplier")
      s.sql(
        """WITH RECURSIVE e AS (
             SELECT s_suppkey AS src, s_suppkey + 1 AS dst
             FROM rec_supplier WHERE s_suppkey % 20 <> 19
           ),
           reach (src, dst, depth) AS (
             SELECT src, dst, 1 FROM e
             UNION ALL
             SELECT r.src, e.dst, r.depth + 1 FROM reach r JOIN e ON r.dst = e.src
           )
           SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reach,
                  CAST(MAX(depth) AS BIGINT) AS max_depth
           FROM reach GROUP BY src""")
    }),

    // Semi-naive set-semantics closure over a CYCLIC graph (20-cycles):
    // terminates where UNION ALL recursion would not; oracle is DuckDB's
    // UNION (distinct) recursion, which has the same cycle-safe semantics.
    "q85_fixpoint_closure" -> ((s, d) => {
      val edges = Tables.load(s, d, "supplier").select(
        col("s_suppkey").as("src"),
        when(col("s_suppkey") % 20 === 19, col("s_suppkey") - 19)
          .otherwise(col("s_suppkey") + 1).as("dst"))
      Fixpoint.transitiveClosure(edges)
    }),

    // The same standing-closure workload as q89 but compiled FROM SQL
    // TEXT: SELECT DISTINCT over a WITH RECURSIVE reachability CTE lowers
    // to anchor ∪ anchor∘ClosureInc(E) (SqlIncremental.compileUnionLoop),
    // maintained through the same insert + retract waves.
    "q86_incremental_sql_closure" -> ((s, d) => {
      val sup = Tables.load(s, d, "supplier").select(col("s_suppkey"))
      val chain = sup.filter(col("s_suppkey") % 20 =!= 19).select(
        col("s_suppkey").as("src"), (col("s_suppkey") + 1).as("dst"))
      val close = sup.filter(col("s_suppkey") % 20 === 19).select(
        col("s_suppkey").as("src"), (col("s_suppkey") - 19).as("dst"))
      chain.limit(0).createOrReplaceTempView("RE")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """WITH RECURSIVE reach (src, dst) AS (
             SELECT src, dst FROM RE
             UNION ALL
             SELECT r.src, e.dst FROM reach r JOIN RE e ON r.dst = e.src
           ) SELECT DISTINCT src, dst FROM reach""",
        Set("RE"))
      val r = new Runner(s, circuit, Map("RE" -> chain.limit(0)))
      r.step(Map("RE" -> ZSet.fromRows(chain)))
      r.step(Map("RE" -> ZSet.fromRows(close)))
      r.step(Map("RE" -> ZSet.negate(ZSet.fromRows(
        close.filter(col("src") % 40 === 19)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // INCREMENTAL CLUSTERING (connected components under edge churn): a
    // min-label-per-node view over the standing closure. Wave 2 inserts
    // bridge edges that MERGE component pairs; wave 3 retracts mid-block
    // edges, and DRed re-derivation must SPLIT the merged components —
    // the two transitions every incremental CC scheme must get right.
    // The label aggregate sits ON TOP of the closure circuit, so it
    // re-folds only groups whose reachable set changed.
    "q151_incremental_clusters" -> ((s, d) => {
      val keys = Tables.load(s, d, "supplier").select(col("s_suppkey").as("k"))
      def fwd(cond: org.apache.spark.sql.Column) =
        keys.filter(cond).as("a")
          .join(keys.as("b"), col("b.k") === col("a.k") + 1)
          .select(col("a.k").as("src"), col("b.k").as("dst"))
      def sym(df: DataFrame) = df.unionAll(
        df.select(col("dst").as("src"), col("src").as("dst")))
      val base = sym(fwd(col("k") % 10 =!= 9))
        .unionAll(keys.select(col("k").as("src"), col("k").as("dst")))
      val bridges = sym(fwd(col("k") % 20 === 9))
      val cuts = sym(fwd(col("k") % 20 === 4))
      base.limit(0).createOrReplaceTempView("DE")
      val circuit = graft.engine.SqlIncremental.compile(s,
        """WITH RECURSIVE reach (src, dst) AS (
             SELECT src, dst FROM DE
             UNION ALL
             SELECT r.src, e.dst FROM reach r JOIN DE e ON r.dst = e.src
           ), c AS (SELECT DISTINCT src, dst FROM reach)
           SELECT src AS node, MIN(dst) AS cluster_id, COUNT(*) AS n_reach
           FROM c GROUP BY src""",
        Set("DE"))
      val r = new Runner(s, circuit, Map("DE" -> base.limit(0)))
      r.step(Map("DE" -> ZSet.fromRows(base)))
      r.step(Map("DE" -> ZSet.fromRows(bridges)))
      r.step(Map("DE" -> ZSet.negate(ZSet.fromRows(cuts))))
      ZSet.toRows(ZSet.consolidate(r.output))
    }),

    // Standing transitive-closure view through the incremental Runner:
    // chain edges arrive, then the cycle-closing edges (insert-only path —
    // new pairs via semi-naive over (I∪T)∘ΔE∘(I∪T), delta-proportional),
    // then the closing edges of even blocks retract (re-derivation diff
    // path). Net graph: odd blocks are 20-cycles, even blocks are chains.
    "q89_incremental_closure" -> ((s, d) => {
      val sup = Tables.load(s, d, "supplier").select(col("s_suppkey"))
      val chain = sup.filter(col("s_suppkey") % 20 =!= 19).select(
        col("s_suppkey").as("src"), (col("s_suppkey") + 1).as("dst"))
      val close = sup.filter(col("s_suppkey") % 20 === 19).select(
        col("s_suppkey").as("src"), (col("s_suppkey") - 19).as("dst"))
      val circuit = source("E").closure("src", "dst")
      val r = new Runner(s, circuit, Map("E" -> chain.limit(0)))
      r.step(Map("E" -> ZSet.fromRows(chain)))
      r.step(Map("E" -> ZSet.fromRows(close)))
      r.step(Map("E" -> ZSet.negate(ZSet.fromRows(
        close.filter(col("src") % 40 === 19)))))
      ZSet.toRows(ZSet.consolidate(r.output))
    })
  )

  val oracles: Map[String, String] = Map(
    "q58_recursive_ancestors" ->
      """WITH RECURSIVE anc (pk, node, depth) AS (
           SELECT p_partkey, p_partkey, 0 FROM part
           UNION ALL
           SELECT pk, node // 2, depth + 1 FROM anc WHERE node > 1
         )
         SELECT pk, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
                CAST(SUM(node) AS BIGINT) AS path_sum
         FROM anc GROUP BY pk""",
    "q59_recursive_reach" ->
      """WITH RECURSIVE e AS (
           SELECT s_suppkey AS src, s_suppkey + 1 AS dst
           FROM supplier WHERE s_suppkey % 20 <> 19
         ),
         reach (src, dst, depth) AS (
           SELECT src, dst, 1 FROM e
           UNION ALL
           SELECT r.src, e.dst, r.depth + 1 FROM reach r JOIN e ON r.dst = e.src
         )
         SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reach,
                CAST(MAX(depth) AS BIGINT) AS max_depth
         FROM reach GROUP BY src""",
    "q151_incremental_clusters" ->
      """WITH RECURSIVE keys AS (SELECT s_suppkey AS k FROM supplier),
         fwd AS (
           SELECT a.k AS src, a.k + 1 AS dst
           FROM keys a JOIN keys b ON b.k = a.k + 1
           WHERE (a.k % 10 <> 9 AND a.k % 20 <> 4) OR a.k % 20 = 9),
         e AS (SELECT src, dst FROM fwd
               UNION ALL SELECT dst, src FROM fwd
               UNION ALL SELECT k, k FROM keys),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src)
         SELECT src AS node, MIN(dst) AS cluster_id, COUNT(*) AS n_reach
         FROM reach GROUP BY src""",
    "q85_fixpoint_closure" ->
      """WITH RECURSIVE e AS (
           SELECT s_suppkey AS src,
                  CASE WHEN s_suppkey % 20 = 19 THEN s_suppkey - 19
                       ELSE s_suppkey + 1 END AS dst
           FROM supplier
         ),
         reach (src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
         )
         SELECT src, dst FROM reach""",
    "q86_incremental_sql_closure" ->
      """WITH RECURSIVE e AS (
           SELECT s_suppkey AS src, s_suppkey + 1 AS dst
           FROM supplier WHERE s_suppkey % 20 <> 19
           UNION ALL
           SELECT s_suppkey AS src, s_suppkey - 19 AS dst
           FROM supplier WHERE s_suppkey % 20 = 19 AND s_suppkey % 40 <> 19
         ),
         reach (src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
         )
         SELECT src, dst FROM reach""",
    "q89_incremental_closure" ->
      """WITH RECURSIVE e AS (
           SELECT s_suppkey AS src, s_suppkey + 1 AS dst
           FROM supplier WHERE s_suppkey % 20 <> 19
           UNION ALL
           SELECT s_suppkey AS src, s_suppkey - 19 AS dst
           FROM supplier WHERE s_suppkey % 20 = 19 AND s_suppkey % 40 <> 19
         ),
         reach (src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
         )
         SELECT src, dst FROM reach""")
}
