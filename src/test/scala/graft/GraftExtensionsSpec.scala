package graft

import org.apache.spark.sql.SparkSession

/** Builds a session WITH the extensions installed (sharing the JVM's
  * SparkContext) and uses the injected functions from plain SQL with no
  * imperative registration.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions injects the native functions into SQL") {
    spark // force the shared session (and its context) to exist
    val oldDefault = SparkSession.getDefaultSession
    val oldActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne spark) // a genuinely new session, same SparkContext

      val r = s2.sql(
        """SELECT rolling_hash('hello world') AS rh,
          |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin)
        .collect()(0)
      assert(r.getLong(0) === 234728892L)
      assert(r.getDouble(1) === 11.0)

      val agg = s2.sql(
        """SELECT simhash64(h) AS sig, size(minhash128(h)) AS n
          |FROM VALUES (42L) AS t(h)""".stripMargin).collect()(0)
      assert(agg.getLong(0) === 42L) // single-feature simhash = the hash
      assert(agg.getInt(1) === 128)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      oldDefault.foreach(SparkSession.setDefaultSession)
      oldActive.foreach(SparkSession.setActiveSession)
    }
  }
}
