package graft.queries

import graft.Tables
import graft.functions.SqlFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Array surface: constructor, ITEM (1-based, NULL out-of-bounds),
  * CARDINALITY, ELEMENT, UNNEST [WITH ORDINALITY].
  *
  * Reference: ExpressionCompiler.java:540-550 (ARRAY/ITEM/CARDINALITY),
  * :485-500 (ELEMENT); UNNEST → DBSPFlatmap, CalciteToDBSPCompiler.java
  * :213-292 with 1-based ordinality (ir/expression/DBSPFlatmap.java:5-31);
  * OOB→NULL golden EndToEndTests.java:105. Spark's `element_at` is 1-based
  * with NULL OOB in non-ANSI mode — exact match; explode/posexplode supply
  * UNNEST (ordinality = pos + 1).
  */
object Arrays {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val defs: Map[String, QFn] = Map(
    // ARRAY ctor + ITEM (1-based, OOB→NULL) + CARDINALITY. The constructed
    // array is rendered '|'-joined for the gate (driver pandas can't hash
    // array cells); array-typed assertions live in DomainSpec.
    "q54_array_ops" -> ((s, d) =>
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        concat_ws("|", array(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
          .cast(ArrayType(StringType))).as("arr"),
        element_at(array(col("l_partkey"), col("l_suppkey")), 2).as("item2"),
        element_at(array(col("l_partkey"), col("l_suppkey")), 5).as("item_oob"),
        size(array(col("l_partkey"), col("l_suppkey"), col("l_orderkey")))
          .cast(LongType).as("card"))),

    // Array ops over a real vector column (embeddings.embedding: float[64])
    "q55_array_embedding" -> ((s, d) =>
      T(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast(LongType).as("dim"),
        element_at(col("embedding"), 1).as("first"),
        element_at(col("embedding"), 64).as("last"),
        element_at(col("embedding"), 100).as("oob"))),

    // ELEMENT: 1-element array → scalar, empty → NULL (never >1 here)
    "q56_element" -> ((s, d) =>
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        element(when(col("l_quantity") > 49, array(col("l_partkey")))
          .otherwise(array().cast(ArrayType(LongType)))).as("elem"))),

    // UNNEST WITH ORDINALITY (1-based) via posexplode
    "q57_unnest" -> ((s, d) =>
      T(s, d, "lineitem").filter(col("l_quantity") > 48)
        .select(col("l_orderkey"), col("l_linenumber"),
          posexplode(array(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("pos") + 1).cast(LongType).as("ord"), col("col").as("val"))),

    // Series generation (DuckDB/Postgres generate_series ≡ Spark
    // sequence + explode — both inclusive at both bounds): the row-
    // multiplying primitive behind calendar frames and backfill ranges.
    "q137_generate_series" -> ((s, d) =>
      T(s, d, "orders").filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"),
          explode(sequence(lit(1L), col("o_orderkey") % 5 + 1)).as("x")))
  )

  val oracles: Map[String, String] = Map(
    "q54_array_ops" ->
      """SELECT l_orderkey, l_linenumber,
            array_to_string([l_partkey, l_suppkey, l_orderkey], '|') AS arr,
            [l_partkey, l_suppkey][2] AS item2,
            [l_partkey, l_suppkey][5] AS item_oob,
            CAST(len([l_partkey, l_suppkey, l_orderkey]) AS BIGINT) AS card
         FROM lineitem""",
    "q55_array_embedding" ->
      """SELECT vec_id,
            CAST(len(embedding) AS BIGINT) AS dim,
            embedding[1] AS first,
            embedding[64] AS last,
            embedding[100] AS oob
         FROM embeddings""",
    "q56_element" ->
      """SELECT l_orderkey, l_linenumber,
            (CASE WHEN l_quantity > 49 THEN l_partkey END) AS elem
         FROM lineitem""",
    "q57_unnest" ->
      """SELECT l_orderkey, l_linenumber,
            CAST(u.ord AS BIGINT) AS ord,
            [l_partkey, l_suppkey, l_orderkey][u.ord] AS val
         FROM lineitem, (SELECT unnest(generate_series(1, 3)) AS ord) u
         WHERE l_quantity > 48""",
    "q137_generate_series" ->
      """SELECT o_orderkey, x
         FROM orders, unnest(generate_series(1, o_orderkey % 5 + 1)) AS t(x)
         WHERE o_orderkey <= 200"""
  )
}
