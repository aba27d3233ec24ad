package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual complement to AQE's
  * runtime skew splitting (SURVEY.md §4). When one join key carries a
  * disproportionate share of the left side (a hot address, a viral
  * document, a whale wallet), a plain hash join sends that key's entire
  * volume to one reducer; salting shards it N ways at the cost of
  * replicating the (small) right side N times per key.
  *
  *   left.join(right, key)  ≡  salted(left, right, key, n)
  *
  * left gets a uniform salt in [0, n); right is exploded n× with every
  * salt value; the join key becomes (key, salt). Deterministic salt
  * (hash of the full row % n) so results are reproducible.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0)
    val saltCol = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(numSalts))
    val l = left.withColumn("__salt", saltCol)
    val r = right.select(col("*"),
      explode(sequence(lit(0L), lit(numSalts - 1L))).as("__salt"))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
