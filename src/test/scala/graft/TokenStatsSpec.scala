package graft

import org.apache.spark.sql.functions._

import graft.functions.{CustomFunctions, WordRedact}

/** Pins the single-pass text-scan expressions against the builtin
  * compositions they replace:
  *
  *   - `token_stats(text)` ≡ (size(split(text, ' ')),
  *     size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))
  *     — whitespace-token and BPE-ish token counts, including the
  *     empty-string, trailing-space, uppercase, and multi-byte-UTF-8
  *     edges.
  *   - `word_redact(text, patterns, replacements)` ≡ the sequential
  *     regexp_replace chain + per-pattern regexp_count on the original
  *     text — on the \b-word fast-path grammar AND on fallback
  *     patterns the grammar rejects (character classes, `$`-group
  *     replacements), which must route through the compiled-regex
  *     path with identical semantics.
  */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  private val tokRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  private val corpusEdges = Seq(
    "",
    " ",
    "  ",
    "hello world",
    "hello  world ",
    "abc123def",
    "a1b2 c3",
    "UPPER Case mIxEd",
    "punct!!! and, (parens)",
    "tab\tand\nnewline",
    "unicode: héllo wörld — em—dash",
    "数字123と text",
    "_underscore_run_",
    "7",
    "trailing space ",
    " leading",
    "a" * 300 + " " + "9" * 50)

  test("token_stats matches size(split)/size(regexp_extract_all) on edge cases") {
    CustomFunctions.register(spark)
    val df = corpusEdges.toDF("text").select(
      col("text"),
      size(split(col("text"), " ")).cast("long").as("ws_ref"),
      size(regexp_extract_all(col("text"), lit(tokRe), lit(0))).cast("long").as("re_ref"),
      call_function("token_stats", col("text")).as("ts"))
    df.collect().foreach { r =>
      assert(r.getStruct(3).getLong(0) === r.getLong(1),
        s"ws_tokens mismatch on '${r.getString(0)}'")
      assert(r.getStruct(3).getLong(1) === r.getLong(2),
        s"re_tokens mismatch on '${r.getString(0)}'")
    }
  }

  test("token_stats: null text yields null struct") {
    CustomFunctions.register(spark)
    val row = Seq[Option[String]](None).toDF("text")
      .select(call_function("token_stats", col("text")).as("ts"))
      .collect()(0)
    assert(row.isNullAt(0))
  }

  // ------------------------------------------------------------------
  // passages generator
  // ------------------------------------------------------------------

  test("passages matches the split/transform/slice/array_join composition") {
    CustomFunctions.register(spark)
    val texts = Seq(
      "",
      " ",
      "   ",
      "one",
      (1 to 19).map(i => s"t$i").mkString(" "),
      (1 to 20).map(i => s"t$i").mkString(" "),
      (1 to 21).map(i => s"t$i").mkString(" "),
      (1 to 40).map(i => s"t$i").mkString(" "),
      (1 to 95).map(i => s"t$i").mkString(" "),
      "a  double  spaced   text " + (1 to 50).map(_.toString).mkString(" "),
      "héllo wörld " + (1 to 30).map(i => s"ünïcode$i").mkString(" "),
      (1 to 25).map(_ => "x").mkString(" ") + " ")
    val k = 20
    val df = texts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val ref = df.select(col("doc_id"), posexplode(transform(
        sequence(lit(0),
          ceil(size(split(col("text"), " ")) / lit(k.toDouble)).cast("int") - 1),
        i => array_join(slice(split(col("text"), " "), i * k + 1, lit(k)), " "))))
      .toDF("doc_id", "i", "passage")
      .orderBy("doc_id", "i").collect()
    val got = df.select(col("doc_id"), call_function("passages", col("text"), lit(k)))
      .orderBy("doc_id", "i").collect()
    assert(got.length === ref.length)
    got.zip(ref).foreach { case (g, r) =>
      assert(g.getInt(0) === r.getInt(0))
      assert(g.getInt(1) === r.getInt(1), s"doc ${g.getInt(0)}")
      assert(g.getString(2) === r.getString(2),
        s"doc ${g.getInt(0)} passage ${g.getInt(1)}")
    }
    // row count identity the d08 totals side relies on
    val counts = df.select(col("doc_id"),
      ceil(call_function("token_stats", col("text")).getField("ws_tokens")
        / lit(k.toDouble)).cast("long").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val emitted = got.groupBy(_.getInt(0)).view.mapValues(_.length.toLong).toMap
    counts.foreach { case (d, n) => assert(emitted(d) === n, s"doc $d") }
  }

  // ------------------------------------------------------------------
  // word_redact
  // ------------------------------------------------------------------

  test("parseWords accepts the registry grammar and rejects real regexes") {
    assert(WordRedact.parseWords("\\bcustomer\\b").map(_.length) === Some(1))
    assert(WordRedact.parseWords("\\b(key|hash)\\b").map(_.length) === Some(2))
    assert(WordRedact.parseWords("\\b(?:a|b_2|C9)\\b").map(_.length) === Some(3))
    assert(WordRedact.parseWords("\\b[0-9]{3}\\b") === None)
    assert(WordRedact.parseWords("\\b(a|)\\b") === None)
    assert(WordRedact.parseWords("customer") === None)
    assert(WordRedact.parseWords("\\b(a.c)\\b") === None)
    assert(WordRedact.parseWords("\\b(hé)\\b") === None)
  }

  private val redactTexts = Seq(
    "",
    "customer",
    "customer key hash",
    "customers key_ hash9 nothashed",
    "the customer paid the customer twice",
    "key",
    "KEY Key key",
    "a key, a hash; a (customer)",
    "hash-hash hash_hash hashhash",
    "keyhash key hash",
    "edge customer",
    "customer edge",
    "x" * 200 + " customer " + "y" * 200)

  private def chainVsNative(patterns: Seq[(String, String)], texts: Seq[String]): Unit = {
    CustomFunctions.register(spark)
    val base = texts.toDF("text")
    val redactedRef = patterns.foldLeft(col("text")) {
      case (acc, (pat, repl)) => regexp_replace(acc, pat, repl)
    }
    val countRefs = patterns.zipWithIndex.map { case ((pat, _), i) =>
      regexp_count(col("text"), lit(pat)).cast("long").as(s"c$i")
    }
    val wr = call_function("word_redact", col("text"),
      array(patterns.map(p => lit(p._1)): _*),
      array(patterns.map(p => lit(p._2)): _*))
    val rows = base.select(Seq(col("text"), redactedRef.as("red_ref")) ++
      countRefs :+ wr.as("w"): _*).collect()
    rows.foreach { r =>
      val w = r.getStruct(2 + patterns.length)
      assert(w.getString(0) === r.getString(1),
        s"redacted mismatch on '${r.getString(0)}'")
      val counts = w.getSeq[Long](1)
      patterns.indices.foreach { i =>
        assert(counts(i) === r.getLong(2 + i),
          s"count[$i] mismatch on '${r.getString(0)}'")
      }
    }
  }

  test("word_redact fast path matches the regexp_replace/regexp_count chain") {
    chainVsNative(
      Seq("\\bcustomer\\b" -> "[NAME]", "\\b(key|hash)\\b" -> "[ID]"),
      redactTexts)
  }

  test("word_redact fallback patterns match the chain (grammar-rejected regexes)") {
    // character class + quantifier: rejected by parseWords, must run
    // through java.util.regex with identical results
    chainVsNative(
      Seq("[0-9]{2,}" -> "[NUM]", "\\b(key|hash)\\b" -> "[ID]"),
      Seq("ab 12 345 6 key", "99hash99 key12", "", "12 34 key hash"))
  }

  test("word_redact $-group replacement routes to fallback with Matcher semantics") {
    chainVsNative(
      Seq("\\b(key|hash)\\b" -> "<$1>"),
      Seq("key and hash", "keyed hash"))
  }

  test("word_redact sequential semantics: later patterns see earlier replacements") {
    // first pattern rewrites 'ab' to 'key'; the second pattern then
    // matches the INSERTED token — sequential, not combined, exactly
    // like the chained regexp_replace
    chainVsNative(
      Seq("\\bab\\b" -> "key", "\\b(key|hash)\\b" -> "[ID]"),
      Seq("ab key", "ab", "abab ab"))
  }

  test("word_redact null text yields null struct") {
    CustomFunctions.register(spark)
    val row = Seq[Option[String]](None).toDF("text")
      .select(call_function("word_redact", col("text"),
        array(lit("\\bx\\b")), array(lit("[X]"))).as("w"))
      .collect()(0)
    assert(row.isNullAt(0))
  }

  test("word_redact rejects non-literal or misaligned registries") {
    CustomFunctions.register(spark)
    val df = Seq("x").toDF("text")
    intercept[Exception] {
      df.select(call_function("word_redact", col("text"),
        array(lit("a"), lit("b")), array(lit("[A]")))).collect()
    }
    intercept[Exception] {
      df.select(call_function("word_redact", col("text"),
        array(col("text")), array(lit("[A]")))).collect()
    }
  }
}
