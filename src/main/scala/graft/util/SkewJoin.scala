package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the portable skew-mitigation pattern for the case
  * AQE can't fix: a hot key on the LEFT (fact) side whose matching right
  * rows must still reach every partition holding that key.
  *
  * The left side gets a deterministic salt in [0, salts); the right side
  * is replicated once per salt value; the join key becomes (key, salt),
  * so one hot key spreads over `salts` shuffle partitions instead of
  * hammering one. Results are EXACTLY the plain join's rows (the salt
  * columns are internal), so a DuckDB oracle of the unsalted join
  * verifies it.
  *
  * Cost model at 100 TB: right side shuffles `salts`× its size — use for
  * medium dimension tables (too big to broadcast, far smaller than the
  * fact). For broadcast-able dims, broadcast; for fact×fact skew, AQE's
  * skew-join split is the first resort.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `keys`, salted `salts` ways.
    * Key columns must exist on both sides with identical names.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // deterministic, uniform-ish salt from the row's key tuple + a
    // discriminator only present on the left (hash of all key cols);
    // pmod keeps it in [0, salts)
    val l = left.withColumn("__salt",
      pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
