package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.{CustomFunctions, JsonGetLong}

/** Pins json_get_long's envelope against from_json(js, 'k LONG')['k'] —
  * the semantics q35 relies on: both must agree on every well-formed
  * document (and on the malformed ones both null out). Duplicate keys
  * follow Jackson's last-wins; values outside long range, floats,
  * strings, booleans, arrays and objects under the key all null.
  */
class JsonGetLongSpec extends SparkSpec {
  import org.apache.spark.unsafe.types.UTF8String

  private def direct(js: String, key: String = "k"): java.lang.Long =
    JsonGetLong.extract(UTF8String.fromString(js),
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def viaFromJson(docs: Seq[String]): Seq[java.lang.Long] = {
    import spark.implicits._
    CustomFunctions.register(spark)
    docs.toDF("js")
      .select(from_json(col("js"), StructType.fromDDL("k LONG"))
        .getField("k").as("k"))
      .collect().map(r => if (r.isNullAt(0)) null else Long.box(r.getLong(0))).toSeq
  }

  private def viaExpr(docs: Seq[String]): Seq[java.lang.Long] = {
    import spark.implicits._
    CustomFunctions.register(spark)
    docs.toDF("js")
      .select(call_function("json_get_long", col("js"), lit("k")).as("k"))
      .collect().map(r => if (r.isNullAt(0)) null else Long.box(r.getLong(0))).toSeq
  }

  test("agrees with from_json across the pinned envelope") {
    val docs = Seq(
      """{"k": 76}""",
      """{"k":0}""",
      """{"k": -42}""",
      """{ "k" : 123456789012345 }""",
      s"""{"k": ${Long.MaxValue}}""",
      s"""{"k": ${Long.MinValue}}""",
      """{"k": null}""",
      """{}""",
      """{"other": 5}""",
      """{"a": 1, "k": 7}""",
      """{"k": 1, "b": 2}""",
      """{"kk": 9, "k": 3}""",          // longer key must not prefix-match
      """{"K": 9}""",                   // case-sensitive
      """{"a": {"k": 99}, "k": 4}""",   // nested "k" must not match
      """{"a": [1, {"k": 99}], "k": 5}""",
      """{"a": "has \" and \\ and {braces}", "k": 6}""",
      """{"a": "x", "b": true, "c": false, "d": null, "e": 1.5, "k": 8}""",
      """{"k": 1, "k": 2}""",           // duplicate: Jackson last-wins
      """{"k": 2, "k": null}""",
      """  {"k": 11}  trailing ignored by both""",
      """{"k": 3.5}""",                 // float -> null
      """{"k": 1e3}""",
      """{"k": "5"}""",                 // string -> null (no coercion)
      """{"k": true}""",
      """{"k": [1]}""",
      """{"k": {"v": 1}}""",
      """{"k": 99999999999999999999}""", // > 2^63: overflow -> null
      s"""{"k": -9223372036854775809}""", // < -2^63
      """not json at all""",
      """[1, 2, 3]""",                  // root not an object
      """42""",
      """""",
      """{"k": 01}""",                  // leading zero: malformed
      """{"k"""",                       // truncated
      """{"k":""",
      """{"k": 1""")                    // missing closing brace
    val a = viaExpr(docs)
    val b = viaFromJson(docs)
    docs.indices.foreach { i =>
      assert(a(i) === b(i), s"doc ${i}: ${docs(i)} -> expr=${a(i)} fromJson=${b(i)}")
    }
  }

  test("matches from_json on every real events.props document") {
    import spark.implicits._
    val docs = graft.io.Tables.table(spark, "/root/testdata/sf0.01", "events")
      .select("props").as[String].collect().toSeq
    assert(docs.nonEmpty)
    assert(viaExpr(docs) === viaFromJson(docs))
  }

  test("null input, interpreted eval, and non-literal key rejection") {
    assert(direct("""{"k": 5}""") === 5L)
    assert(direct("""{"k": 5}""", "missing") === null)
    // interpreted (non-codegen) eval path agrees with codegen
    val e = JsonGetLong(org.apache.spark.sql.catalyst.expressions.Literal(
      UTF8String.fromString("""{"a":1,"k":-7}"""),
      org.apache.spark.sql.types.StringType), "k")
    assert(e.eval(null) === -7L)
    intercept[IllegalArgumentException] {
      JsonGetLong.fromExprs(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString("{}"),
          org.apache.spark.sql.types.StringType)))
    }
  }

  test("q35 result is unchanged by the json_get_long swap") {
    val viaFast = ops.ExtendedQueries.q35.fn(spark, sf).collect()
    CustomFunctions.register(spark)
    val viaJackson = graft.io.Tables.table(spark, sf, "events")
      .select(col("user_id"), col("value"),
        from_json(col("props"), StructType.fromDDL("k LONG"))
          .getField("k").as("k"))
      .groupBy(expr("k div 10").as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        min("k").as("min_k"), max("k").as("max_k"),
        graft.functions.Functions.microsDouble(
          sum(graft.functions.Functions.decMicros(col("value")))).as("sum_value"))
      .orderBy("k_bucket")
      .collect()
    assert(viaFast.toSeq === viaJackson.toSeq)
  }
}
