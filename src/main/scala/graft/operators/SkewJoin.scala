package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * When one join key holds a disproportionate share of the big side
  * (a hub vertex, a hot shingle), a plain shuffle join sends that key's
  * entire partition to one task. Salting splits the hot key into
  * `salts` shards: the big side gets a random salt per row, the small
  * side is replicated once per salt value, and the join runs on
  * (key, salt). AQE's skew-join handles moderate skew automatically;
  * this is the explicit tool for the pathological cases.
  */
object SkewJoin {

  def saltedInner(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
