package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting — the manual fallback for when
  * AQE's runtime skew splitting isn't available (e.g. the skewed side
  * feeds a non-shuffle stage) or the skew is known up front.
  *
  * The hot side's key is salted with a uniform shard id in [0, salt); the
  * other side is replicated `salt` times (explode of a literal range), so
  * each hot key's rows spread across `salt` reducers instead of one. Cost:
  * the replicated side's shuffle volume grows by `salt`× — pick the side
  * to replicate accordingly (always the smaller one).
  *
  * At 100 TB this is the difference between a stuck straggler task holding
  * a multi-TB hot key and an even spread; AQE's skewedJoin handles the
  * common case, this handles the planned case (e.g. joining events to a
  * user dimension where a few bot users dominate).
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `keys`, with `big`'s rows salted
    * across `salt` shards and `small` replicated per shard. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int = 16): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Deterministic variant: shard by a stable hash of a high-cardinality
    * discriminator column from the big side (e.g. an event id) rather than
    * rand(), so re-runs produce identical partitioning. */
  def saltedJoinBy(big: DataFrame, small: DataFrame, keys: Seq[String],
                   discriminator: Column, salt: Int = 16): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val salted = big.withColumn("__salt", pmod(xxhash64(discriminator), lit(salt)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
