package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic salted join for skewed keys.
  *
  * When one join key carries a disproportionate share of the big side
  * (hot products, null-ish sentinel keys), a plain shuffle join lands the
  * whole key on one reducer. Salting splits it: the big side gets a salt
  * in [0, n) derived by hashing its row (deterministic — no rand(), so
  * plans stay replayable), the small side is replicated n times, and the
  * join key becomes (key, salt). Results are identical to the unsalted
  * join (proven in SaltedJoinSpec); the hot key now spreads over n
  * reducers.
  *
  * AQE's skew-join handling covers sort-merge cases automatically at
  * runtime; explicit salting remains the tool when AQE can't split (e.g.
  * aggregations after the join keyed the same way, or broadcast-averse
  * cluster configs).
  */
object SaltedJoin {

  /** Inner-join `big ⋈ small` on `key`, salting `big` across `n` buckets.
    * `saltSource` must be a deterministic big-side column (any column
    * with reasonable spread — an id, a line number).
    *
    * `forceShuffle` pins the salted join to a ShuffledHashJoin even when
    * the replicated small side is under the auto-broadcast threshold —
    * the situation salting exists for is precisely the one where the
    * small side CAN'T broadcast (too big, or a broadcast-averse config),
    * so demos/specs that want to observe the salt spreading a hot key
    * across reducers must keep the exchange in the plan.
    */
  def join(big: DataFrame, small: DataFrame, key: String,
      saltSource: String, n: Int, forceShuffle: Boolean = false): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(col(saltSource)), lit(n)))
    val replicated0 = small
      .crossJoin(broadcast(
        big.sparkSession.range(n).toDF("__salt")
          .select(col("__salt").cast("int"))))
    val replicated =
      if (forceShuffle) replicated0.hint("SHUFFLE_HASH") else replicated0
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
