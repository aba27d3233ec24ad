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
  *
  * The equivalence holds only for join types where right-side
  * duplication is invisible: inner and the left-preserving family
  * (matched right rows join exactly the one left salt; unmatched right
  * rows are dropped or irrelevant). right/full_outer would emit every
  * unmatched right row once PER SALT — rejected by construction.
  */
object SkewJoin {

  private val allowedJoinTypes = Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0)
    require(allowedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin is only equivalent to a plain join for inner/left/" +
        s"left_semi/left_anti, not '$joinType' (right-side rows are " +
        s"replicated $numSalts times)")
    // fresh salt column name — a pre-existing __salt on either input
    // must not collide with the join key
    val taken = (left.columns ++ right.columns).toSet
    val salt = Iterator.from(0)
      .map(i => if (i == 0) "__salt" else s"__salt$i")
      .find(!taken(_)).get
    val saltCol = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(numSalts))
    val l = left.withColumn(salt, saltCol)
    val r = right.select(col("*"),
      explode(sequence(lit(0L), lit(numSalts - 1L))).as(salt))
    l.join(r, Seq(key, salt), joinType).drop(salt)
  }
}
