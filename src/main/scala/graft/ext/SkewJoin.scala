package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §7.4 100 TB notes).
  *
  * AQE's skew-join handles most cases at runtime by splitting oversized
  * shuffle partitions, but it only applies to sort-merge joins and after
  * the skewed shuffle files already exist. Salting fixes the layout
  * BEFORE the shuffle: the left (skewed) side gets a deterministic salt
  * in [0, salts), the right side is replicated once per salt value, and
  * the join key becomes (key, salt) — one hot key now spreads over
  * `salts` reducers.
  *
  * The left salt is `pmod(hash(whole row), salts)` — deterministic (no
  * rand(), which would break retry/replay semantics and oracle
  * comparisons) while still spreading rows of the same hot key, because
  * the hash covers all columns, not just the key.
  *
  * Cost model: right side is replicated ×salts, so use this shape when
  * the right side is small-ish but too big to broadcast — exactly the
  * gap between broadcast joins and well-behaved shuffle joins.
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int = 8): DataFrame = {

    val l = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
