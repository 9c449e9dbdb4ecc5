package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed (large) side's key into
  * `salts` sub-keys and replicate the small side once per salt, so a
  * hot key's rows spread over `salts` reducers instead of one.
  *
  * Results are identical to a plain equi-join (verified by oracle in
  * q_salted_join); use when AQE's skew-join split isn't available or
  * the build side must stay a shuffle join. Deterministic salt
  * (pmod(hash(row-id))) keeps runs reproducible.
  */
object SaltedJoin {

  /** @param large     skewed probe side
    * @param small     side small enough to replicate `salts`×
    * @param key       equi-join key column name (both sides)
    * @param saltSrc   any column of `large` giving per-row spread
    * @param salts     number of sub-keys per hot key
    */
  def apply(large: DataFrame, small: DataFrame, key: String,
      saltSrc: Column, salts: Int): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(saltSrc), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
