package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Tables.{table, tableFan}
import graft.functions.CustomFunctions

/** Text-analysis operator family over the `documents` table — the
  * quality/filtering surface of a training-data pipeline: language ID,
  * quality scoring, token counting, and content fingerprinting. All
  * pure codegen'd builtins (plus the native RollingHash expression), so
  * each op is a single scan-project with no shuffle except the final
  * presentation ORDER BY — the shape that runs at 100 TB as a map-only
  * pass over the corpus.
  */
object TextQueries {

  /** Session-scoped memo of the per-document term-count relation
    * `(doc_id, tok, cnt)` — the round-12 replacement for the exploded
    * (doc_id, tok) token stream that t05/t06/t07/t11 previously shared.
    * The `ngram_counts(w, 1)` generator collapses each document's
    * duplicate tokens MAP-SIDE (one (tok, multiplicity) row per
    * distinct token per doc, in one codegen'd pass over the token
    * array), so every downstream shuffle moves per-doc-DISTINCT rows
    * instead of every token instance: t11's tf stage — previously its
    * own corpus-wide (doc_id, tok) shuffle — falls out of the generator
    * with NO shuffle at all, t05/t06's vocabulary pass and t07's
    * vocab + scoring join shrink to the distinct stream (documents
    * repeat tokens heavily; the instance stream is the multiple), and
    * the cached relation itself is proportionally smaller. Exactness:
    * SUM(cnt) per token ≡ COUNT(*) over instances (long arithmetic),
    * so every oracle stays hash-identical. Same contract as
    * DedupQueries.sharedGrams: the dir's parquet is assumed immutable
    * for the session; [[invalidateCaches]] releases the cached blocks.
    */
  private val tokCountsMemo =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]

  def sharedTokCounts(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    tokCountsMemo.getOrElseUpdate((spark, dir), {
      graft.functions.CustomFunctions.register(spark)
      tableFan(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), call_function("ngram_counts", col("w"), lit(1)))
        .select(col("doc_id"), col("ngram").as("tok"), col("cnt"))
        .cache()
    })

  /** Session-scoped memo of the deterministic split assignment
    * `(doc_id, bucket, split)` — the narrow relation p02 reports and
    * p06's decontamination consumes. Cached for two reasons: it is
    * genuinely SHARED (two queries), and p02's presentation ORDER BY
    * otherwise pays the md5 of the whole corpus twice — a global sort
    * range-partitions, and the range sampler executes the exchange's
    * child in a separate pass, so an uncached child re-hashes every
    * document just to pick 32 partition bounds (measured at sf10:
    * sort over the uncached projection 2.9 s vs 0.9 s for the same
    * plan unsorted). At 100 TB the split table is persisted once and
    * every consumer reads it — this memo is that table's session form.
    */
  private val splitMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), org.apache.spark.sql.DataFrame]

  def sharedSplit(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    splitMemo.getOrElseUpdate((spark, dir),
      table(spark, dir, "documents")
        .select(col("doc_id"), bucketCol(spark).as("bucket"))
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 205, "train")
            .when(col("bucket") < 230, "val")
            .otherwise("test").as("split"))
        .cache())

  def invalidateCaches(): Unit = {
    Seq(tokCountsMemo, splitMemo).foreach { m =>
      m.values.foreach(df => try df.unpersist() catch { case _: Throwable => () })
      m.clear()
    }
  }

  /** Marker-token profiles for the n-gram/stopword language-ID
    * heuristic. Calibrated to the synthetic testdata vocabulary (the
    * corpus is OLAP word salad in every `lang`) — a real deployment
    * plugs real per-language stopword tables into the same operator.
    * Order = deterministic tie-break priority.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data", "value", "row"),
    "es" -> Seq("query", "table", "column", "line"),
    "de" -> Seq("scan", "sort", "merge", "group"),
    "fr" -> Seq("join", "key", "hash", "part"),
    "zh" -> Seq("stream", "batch", "window", "spark"))

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Fraction of tokens contained in `markers` (occurrence-weighted, not
    * distinct): one membership-count pass over the token array (native
    * codegen'd ArrayCountIn — a `filter` lambda would run interpreted
    * per token), one division. Callers must have
    * `CustomFunctions.register`ed the session.
    */
  private def markerRatio(w: Column, markers: Seq[String]): Column =
    call_function("array_count_in", w, array(markers.map(lit): _*))
      .cast("double") / size(w)

  private def markerRatioSql(markers: Seq[String]): String =
    s"CAST(len(list_filter(w, t -> list_contains(${sqlList(markers)}, t))) AS DOUBLE) / len(w)"

  // ---------------------------------------------------------------------
  // t01 — language identification: marker-token ratio per language
  // profile, argmax with a fixed priority order on ties. A single
  // map-only pass; the per-language scores are one lambda filter each.
  // ---------------------------------------------------------------------
  val t01 = Q("t01_lang_id", {
    val scores = langProfiles
      .map { case (l, ws) => s"  ${markerRatioSql(ws)} AS score_$l" }
      .mkString(",\n")
    val langs = langProfiles.map(_._1)
    val cases = langs.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1)
      if (later.isEmpty) s"ELSE '$l'"
      else s"WHEN ${later.map(o => s"score_$l >= score_$o").mkString(" AND ")} THEN '$l'"
    }.mkString(" ")
    s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |scored AS (SELECT doc_id, lang,
       |$scores
       |FROM toks)
       |SELECT doc_id, lang, CASE $cases END AS predicted,
       |  ${langs.map(l => s"score_$l").mkString(", ")}
       |FROM scored ORDER BY doc_id""".stripMargin
  }) { (spark, dir) =>
    CustomFunctions.register(spark)
    val langs = langProfiles.map(_._1)
    val withScores = tableFan(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .select(Seq(col("doc_id"), col("lang")) ++ langProfiles.map {
        case (l, ws) => markerRatio(col("w"), ws).as(s"score_$l")
      }: _*)
    // argmax with fixed priority: first lang whose score >= all later ones
    val predicted = langs.zipWithIndex.init.foldLeft(when(lit(false), "")) {
      case (acc, (l, i)) =>
        val later = langs.drop(i + 1)
        acc.when(later.map(o => col(s"score_$l") >= col(s"score_$o"))
          .reduce(_ && _), l)
    }.otherwise(langs.last)
    withScores
      .select(Seq(col("doc_id"), col("lang"), predicted.as("predicted")) ++
        langs.map(l => col(s"score_$l")): _*)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // t02 — quality scoring: token count, mean token length, stopword
  // ratio, distinct-token ratio, and a weighted score. All integer
  // counts + fixed-shape double arithmetic (bit-identical cross-engine).
  // The filter threshold a pipeline would use is exposed as a flag.
  // ---------------------------------------------------------------------
  private val stop = langProfiles.head._2

  /** The weighted quality score over a token array — shared by t02 and
    * the corpus-cleaning pipeline (p01) so both compute the identical
    * expression shape.
    */
  def qualityExpr(w: Column): Column =
    (size(array_distinct(w)).cast("double") / size(w)) * 0.5 +
      markerRatio(w, stop) * 0.3 +
      when(size(w) >= 20, 1.0).otherwise(0.0) * 0.2

  /** DuckDB mirror of [[qualityExpr]] over a list column named `w`. */
  def qualitySqlExpr: String =
    s"(CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 0.5 " +
      s"+ ${markerRatioSql(stop)} * 0.3 " +
      s"+ (CASE WHEN len(w) >= 20 THEN 1.0 ELSE 0.0 END) * 0.2"

  val qualityThreshold = 0.3
  val t02 = Q("t02_quality_score",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w, len(text) AS n FROM documents)
       |SELECT doc_id, len(w) AS n_tokens,
       |  CAST(n - (len(w) - 1) AS DOUBLE) / len(w) AS mean_tok_len,
       |  ${markerRatioSql(stop)} AS stop_ratio,
       |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio,
       |  $qualitySqlExpr AS quality,
       |  CAST(CASE WHEN ($qualitySqlExpr) >= $qualityThreshold
       |    THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM toks ORDER BY doc_id""".stripMargin
  ) { (spark, dir) =>
    CustomFunctions.register(spark)
    val df = tableFan(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"),
        length(col("text")).cast("long").as("n"))
    val nTok = size(col("w"))
    val meanTokLen = (col("n") - (nTok - 1)).cast("double") / nTok
    val stopRatio = markerRatio(col("w"), stop)
    val distinctRatio = size(array_distinct(col("w"))).cast("double") / nTok
    val quality = qualityExpr(col("w"))
    df.select(col("doc_id"), nTok.cast("long").as("n_tokens"),
        meanTokLen.as("mean_tok_len"), stopRatio.as("stop_ratio"),
        distinctRatio.as("distinct_ratio"), quality.as("quality"),
        when(quality >= qualityThreshold, 1L).otherwise(0L).as("keep"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // t03 — token counting: whitespace tokens and a BPE-ish regex
  // tokenizer (alpha runs | digit runs | single non-alphanumeric), the
  // two token-budget estimators a data pipeline carries. The regex is
  // engine-portable (same semantics in Java regex and RE2).
  // ---------------------------------------------------------------------
  private val tokRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  val t03 = Q("t03_token_count",
    s"""SELECT doc_id, len(text) AS n_chars,
       |  len(string_split(text, ' ')) AS ws_tokens,
       |  len(regexp_extract_all(text, '$tokRe')) AS re_tokens
       |FROM documents ORDER BY doc_id""".stripMargin
  ) { (spark, dir) =>
    // token_stats: one allocation-free byte scan for both counts — the
    // builtin composition runs a regex engine AND materializes every
    // match string into an array per document just to take its length
    // (TokenStatsSpec pins equality with that composition).
    CustomFunctions.register(spark)
    tableFan(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        call_function("token_stats", col("text")).as("ts"))
      .select(col("doc_id"), col("n_chars"),
        col("ts.ws_tokens").as("ws_tokens"), col("ts.re_tokens").as("re_tokens"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // t04 — document fingerprinting: whole-text polynomial rolling hash
  // (native codegen'd RollingHash expression) plus the minimum
  // trigram-shingle fingerprint (winnowing-style content anchor that
  // survives local edits). Oracle mirrors both via DuckDB list_reduce.
  // ---------------------------------------------------------------------
  val t04 = Q("t04_fingerprint",
    s"""WITH ${DedupQueries.trigramCte},
       |gh AS (
       |  SELECT doc_id,
       |    min(list_reduce(list_prepend(CAST(7 AS BIGINT),
       |      [CAST(ascii(c) AS BIGINT) FOR c IN split(g, '')]),
       |      (acc, x) -> (acc * 31 + x) % 1000000007)) AS min_gram_fp,
       |    count(*) AS n_grams
       |  FROM grams GROUP BY 1)
       |SELECT d.doc_id,
       |  list_reduce(list_prepend(CAST(7 AS BIGINT),
       |    [CAST(ascii(c) AS BIGINT) FOR c IN split(d.text, '')]),
       |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp,
       |  gh.min_gram_fp, gh.n_grams
       |FROM documents d JOIN gh ON gh.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  ) { (spark, dir) =>
    CustomFunctions.register(spark)
    val docs = tableFan(spark, dir, "documents")
    val gramFp = DedupQueries.sharedGrams(spark, dir)
      .groupBy("doc_id")
      .agg(min(call_function("rolling_hash", col("g"))).as("min_gram_fp"),
        count(lit(1)).as("n_grams"))
    docs
      .select(col("doc_id"), call_function("rolling_hash", col("text")).as("fp"))
      .join(gramFp, "doc_id")
      .select("doc_id", "fp", "min_gram_fp", "n_grams")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // p01 — the corpus-cleaning pipeline flagship: the composition a
  // training-data run actually executes — language filter → quality
  // filter (t02's score) → exact dedup keeping the lowest doc_id (d01's
  // groupBy) → cleaned corpus with per-survivor stats. Each stage is a
  // narrow map or one hash shuffle; the whole pipeline is two shuffles
  // (dedup groupBy + final ORDER BY) regardless of corpus size.
  // ---------------------------------------------------------------------
  val p01 = Q("p01_corpus_clean",
    s"""WITH toks AS (
       |  SELECT doc_id, text, lang, string_split(text, ' ') AS w FROM documents),
       |kept AS (
       |  SELECT doc_id, text, lang, $qualitySqlExpr AS quality
       |  FROM toks
       |  WHERE lang IN ('en', 'es') AND ($qualitySqlExpr) >= $qualityThreshold),
       |dedup AS (
       |  SELECT md5(text) AS content_hash, min(doc_id) AS doc_id,
       |    count(*) AS n_copies
       |  FROM kept GROUP BY 1)
       |SELECT k.doc_id, k.lang, k.quality, d.n_copies, d.content_hash
       |FROM dedup d JOIN kept k ON k.doc_id = d.doc_id
       |ORDER BY k.doc_id""".stripMargin
  ) { (spark, dir) =>
    CustomFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    // ONE evaluation of the quality expression, ONE pass over the
    // corpus. The previous agg + join-back-on-doc_id form recomputed
    // the scan+quality subtree on both join sides, and the final ORDER
    // BY's range-partitioning sample pass re-executed the broadcast
    // join's streamed side (no shuffle barrier to reuse) — ~4
    // evaluations of the expensive filter per run, the super-linear
    // stage the sf3 scaling curve caught (solo, best-of-3: sf3 8.0 →
    // 2.70 s, sf1 1.59 → 1.20 s — 5.0× growth back to a sub-linear
    // 2.25×; output bit-identical). Here the dedup group's
    // survivor pick and copy count are two window functions over ONE
    // content_hash shuffle, the quality column is projected before the
    // filter so codegen computes it once, and everything expensive sits
    // behind the window exchange, which the sort's sampling reuses.
    val w = Window.partitionBy("content_hash")
    table(spark, dir, "documents")
      .filter(col("lang").isin("en", "es"))
      .select(col("doc_id"), col("lang"),
        qualityExpr(split(col("text"), " ")).as("quality"),
        md5(col("text")).as("content_hash"))
      .filter(col("quality") >= qualityThreshold)
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("keep_id", min("doc_id").over(w))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("lang"), col("quality"), col("n_copies"),
        col("content_hash"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // p02 — deterministic corpus split: every training-data pipeline needs
  // a reproducible train/val/test assignment that is (a) stable across
  // runs and engines, (b) a pure map over the data (no shuffle, no
  // global state), and (c) consistent for duplicate documents (same
  // text → same split, so dedup order doesn't leak test into train).
  // Mechanism: bucket = low byte of the md5 digest's lower 64 bits
  // (0..255); train < 205 (~80%), val < 230 (~10%), test otherwise.
  // At 100 TB this is a narrow map the scan fuses into codegen — the
  // only correct way to split a corpus that doesn't fit a driver-side
  // shuffle-and-slice.
  //
  // Round 11: the bucket moved from the hex-string path
  // (conv(substring(md5(text),1,2),16,10) — materializes a 32-char
  // string + substring + base parse per row, and DuckDB's mirror was a
  // per-row list_reduce lambda) to the native 64-bit digest:
  // md5_lower64(text) & 255 on the Spark side (one MD5, no string,
  // codegen static call — CustomExpressions.Md5Lower64) and
  // md5_number_lower(text) & 255 in DuckDB — the same bit-for-bit
  // twin d04 already relies on. Same determinism contract (a fixed
  // byte of the same digest), ~uniform 0..255; the assignment of
  // individual docs changes once, here, with the oracle updated in the
  // same commit. Measured at sf10: 3.75 → ~1.3 s (the md5-hex
  // string path was p02's entire cost over the scan).
  // ---------------------------------------------------------------------
  /** DuckDB mirror of the md5 lower-64 low byte. `md5_number_lower`
    * returns UBIGINT; the & 255 result is cast to BIGINT to match
    * Spark's long bucket.
    */
  private val md5BucketSql: String =
    "CAST(md5_number_lower(text) & 255 AS BIGINT)"

  /** The Spark-side bucket column: low byte of [[graft.functions.Md5Lower64]]. */
  private def bucketCol(spark: SparkSession): Column = {
    graft.functions.CustomFunctions.register(spark)
    call_function("md5_lower64", col("text")).bitwiseAND(lit(255L))
  }


  private val splitSqlCase =
    "CASE WHEN bucket < 205 THEN 'train' WHEN bucket < 230 THEN 'val' ELSE 'test' END"

  val p02 = Q("p02_corpus_split",
    s"""WITH b AS (
       |  SELECT doc_id, $md5BucketSql AS bucket
       |  FROM documents)
       |SELECT doc_id, bucket, $splitSqlCase AS split
       |FROM b ORDER BY doc_id""".stripMargin
  ) { (spark, dir) =>
    sharedSplit(spark, dir).orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // p06 — test-set decontamination: flag every train/val document that
  // shares at least one word-trigram shingle with any held-out (test)
  // document — the n-gram-overlap decontamination pass every serious
  // pretraining pipeline runs (the GPT-3 appendix-C shape, with the
  // shingle width as the knob). Held-out membership is p02's
  // deterministic md5 split, so the whole check is reproducible with no
  // side input. Plan: one shingle explode (the SHARED cached trigram
  // relation — same one d02-d06 consume), the distinct test-shingle set,
  // one shuffled-hash join shingle-to-shingle (build = the test-shingle
  // side), a per-doc count.
  //
  // Round 11: the static broadcast() hint on the test-shingle set is
  // GONE — it was the exact driver-OOM shape the round-10 hint audit
  // purged elsewhere, mislabeled "bounded benchmark set": p06's held-out
  // set is p02's md5 split of the CORPUS ITSELF, so its distinct-shingle
  // relation grows linearly with the corpus (~10% of all postings —
  // ~18M strings at sf30, unbounded at 100 TB): the driver collect +
  // rebroadcast grows without bound — the OOM mode, flagged when p06
  // was the round-11 sf30 suite's only >5× row (4.8 → 24.7 s for 3×
  // data). The hint is now `shuffle_hash` on the test side (d02's
  // postings-join treatment): the build is per-partition (scales with
  // the cluster, not the driver) and there is no sort of the
  // corpus-sized probe side. Local price, measured same-session
  // interleaved best-of-3 at sf30: broadcast 31.5 s / shuffle_hash
  // 33.3 s / unhinted-AQE 38.1 s — ~6% over the in-JVM broadcast
  // (local[32] broadcasts are a free in-process reference; a real
  // cluster pays the driver collect + N-executor fan-out), solo sf10
  // 4.3 s. The forms are row-identical (same inner join); only the
  // physical build side moves. A df-cut (d02's dfCutJaccardJoin knob)
  // applies unchanged if the test set itself carries boilerplate.
  // ---------------------------------------------------------------------
  val p06 = Q("p06_decontaminate",
    s"""WITH ${DedupQueries.trigramCte},
       |b AS (SELECT doc_id, $md5BucketSql AS bucket FROM documents),
       |s AS (SELECT doc_id, $splitSqlCase AS split FROM b),
       |tg AS (SELECT DISTINCT g FROM grams JOIN s USING (doc_id)
       |       WHERE s.split = 'test'),
       |hits AS (
       |  SELECT grams.doc_id, count(*) AS n
       |  FROM grams JOIN s USING (doc_id) JOIN tg USING (g)
       |  WHERE s.split <> 'test' GROUP BY 1)
       |SELECT s.doc_id, s.split,
       |  COALESCE(hits.n, CAST(0 AS BIGINT)) AS n_shared_grams,
       |  CAST(CASE WHEN s.split <> 'test' AND COALESCE(hits.n, 0) > 0
       |       THEN 1 ELSE 0 END AS BIGINT) AS contaminated
       |FROM s LEFT JOIN hits USING (doc_id)
       |ORDER BY s.doc_id""".stripMargin
  ) { (spark, dir) =>
    val splits = sharedSplit(spark, dir).select("doc_id", "split")
    val grams = DedupQueries.sharedGrams(spark, dir).join(splits, "doc_id")
    val testGrams = grams.filter(col("split") === "test")
      .select("g").distinct()
    // sharedGrams is per-doc DISTINCT, so count(*) here is the number of
    // DISTINCT shingles each doc shares with the held-out set
    val hits = grams.filter(col("split") =!= "test")
      .join(testGrams.hint("shuffle_hash"), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
    splits.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("split"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        when(col("split") =!= "test" && coalesce(col("n_shared_grams"), lit(0L)) > 0, 1L)
          .otherwise(0L).as("contaminated"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // p07 — domain mixture sampling: draw a corpus whose SOURCE composition
  // matches declared mixture weights (the static data-mixing step behind
  // every pretraining recipe — "50% web, 30% wiki, 20% events" — and the
  // deterministic skeleton DoReMi-style learned weights plug into). The
  // largest feasible total T respecting every stratum's supply is
  // T = min_s floor(n_s · W / w_s); stratum s then contributes
  // k_s = floor(w_s · T / W) documents, drawn in md5-of-content order
  // (reproducible across runs/engines, no RNG — p04's trick). ALL
  // integer arithmetic → bit-identical cross-engine. Plan: a tiny
  // per-source count (broadcast back), one rank window partitioned by
  // source — the same single-shuffle shape as p04.
  // ---------------------------------------------------------------------
  /** Integer mixture weights per source (sum = total parts). Sources
    * match the synthetic corpus domains; unlisted sources get weight 0
    * (excluded), exactly how a mixing manifest treats unvetted domains.
    */
  val mixtureWeights: Seq[(String, Long)] =
    Seq("src0" -> 5L, "src1" -> 3L, "src2" -> 2L)

  val p07 = Q("p07_domain_mixture", {
    val wCase = mixtureWeights
      .map { case (s, w) => s"WHEN source = '$s' THEN CAST($w AS BIGINT)" }
      .mkString("CASE ", " ", " ELSE CAST(0 AS BIGINT) END")
    val wSum = mixtureWeights.map(_._2).sum
    s"""WITH weighted AS (
       |  SELECT doc_id, source, text, $wCase AS w FROM documents),
       |counts AS (
       |  SELECT source, w, count(*) AS n FROM weighted
       |  WHERE w > 0 GROUP BY 1, 2),
       |t AS (SELECT min(n * $wSum // w) AS total FROM counts),
       |quota AS (SELECT source, w * (SELECT total FROM t) // $wSum AS k
       |          FROM counts),
       |ranked AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
       |  FROM weighted WHERE w > 0)
       |SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS rn
       |FROM ranked r JOIN quota q ON r.source = q.source AND r.rn <= q.k
       |ORDER BY r.doc_id""".stripMargin
  }) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wSum = mixtureWeights.map(_._2).sum
    val wCol = mixtureWeights.foldLeft(when(lit(false), 0L)) {
      case (acc, (s, w)) => acc.when(col("source") === s, w)
    }.otherwise(0L)
    val weighted = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"), wCol.as("w"))
      .filter(col("w") > 0)
    val counts = weighted.groupBy("source", "w").agg(count(lit(1)).as("n"))
    // scalar: the largest total respecting every stratum's supply
    val total = counts.select(min(floor(col("n") * wSum / col("w")).cast("long")))
      .collect()(0).getLong(0)
    val quota = counts.select(col("source"),
      floor(col("w") * total / wSum).cast("long").as("k"))
    val rn = row_number().over(
      Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id")))
    weighted
      .withColumn("rn", rn.cast("long"))
      .join(broadcast(quota), "source")
      .filter(col("rn") <= col("k"))
      .select("doc_id", "source", "rn")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // p12 — temperature mixture sampling: p07 with weights derived FROM
  // the supply instead of declared — w_s ∝ n_s^(1/T), the standard
  // temperature-sampling rule (T=1 proportional, T→∞ uniform) that
  // up-samples rare domains; multilingual/multi-source pretraining
  // recipes use T≈2-5 so tail languages aren't drowned. T=2 here:
  // w_s = floor(sqrt(n_s)) — sqrt is IEEE-correctly-rounded in BOTH
  // engines, and flooring it to BIGINT makes every downstream step
  // (largest feasible total, per-stratum quotas, rank cut) pure integer
  // arithmetic → bit-identical cross-engine, no transcendental drift.
  // Same single-shuffle plan as p07: tiny per-source count (collected —
  // bounded by |sources|, ~3), quota broadcast back, one rank window
  // partitioned by source. At 100 TB the counts come from table stats
  // and the window is per-source-shard — nothing global.
  // ---------------------------------------------------------------------
  val p12 = Q("p12_temperature_mixture",
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n FROM documents GROUP BY 1),
       |w AS (SELECT source, n,
       |        CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
       |      FROM counts),
       |ws AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM w),
       |t AS (SELECT min(n * (SELECT wsum FROM ws) // w) AS total FROM w),
       |quota AS (SELECT source,
       |            w * (SELECT total FROM t) // (SELECT wsum FROM ws) AS k
       |          FROM w),
       |ranked AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
       |  FROM documents)
       |SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS rn
       |FROM ranked r JOIN quota q ON r.source = q.source AND r.rn <= q.k
       |ORDER BY r.doc_id""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = table(spark, dir, "documents")
    // per-source supply → integer temperature weights; |sources| rows
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .select(col("source"), col("n"),
        floor(sqrt(col("n").cast("double"))).cast("long").as("w"))
      .collect()
    val wsum = counts.map(_.getLong(2)).sum
    // largest total T with every stratum's quota ≤ its supply:
    // T = min_s floor(n_s·W / w_s) (w_s ≥ 1 since n_s ≥ 1)
    val total = counts.map(r => r.getLong(1) * wsum / r.getLong(2)).min
    val quota = counts.map(r => (r.getString(0), r.getLong(2) * total / wsum))
    val quotaCol = quota.foldLeft(when(lit(false), 0L)) {
      case (acc, (s, k)) => acc.when(col("source") === s, k)
    }.otherwise(0L)
    val rn = row_number().over(
      Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id")))
    docs
      .withColumn("rn", rn.cast("long"))
      .filter(col("rn") <= quotaCol)
      .select("doc_id", "source", "rn")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // p03 — sequence packing (concat-then-chunk): pretraining packs the
  // token stream of a corpus shard into fixed-size context windows,
  // documents spanning window boundaries. The relational form: a
  // running token total per shard (ONE window shuffle, partitioned by
  // the shard key — a single global ORDER BY window would serialize the
  // corpus through one task at 100 TB, so packing is always per-shard),
  // then each document's first/last window index by integer arithmetic
  // on the running total. Output: where every document lands in the
  // packed stream — the manifest a loader needs to slice windows.
  // ---------------------------------------------------------------------
  val packBudget = 256L // tokens per context window (small, fits testdata)

  val p03 = Q("p03_sequence_pack",
    s"""WITH t AS (
       |  SELECT doc_id, lang, len(string_split(text, ' ')) AS tokens
       |  FROM documents),
       |c AS (
       |  SELECT *, SUM(tokens) OVER (
       |    PARTITION BY lang ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT doc_id, lang, CAST(tokens AS BIGINT) AS tokens,
       |  CAST(cum - tokens AS BIGINT) AS start_tok,
       |  CAST(floor((cum - tokens) / $packBudget) AS BIGINT) AS first_chunk,
       |  CAST(floor((cum - 1) / $packBudget) AS BIGINT) AS last_chunk
       |FROM c ORDER BY doc_id""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tableFan(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      .withColumn("cum", sum("tokens").over(w))
      .select(col("doc_id"), col("lang"), col("tokens"),
        (col("cum") - col("tokens")).as("start_tok"),
        floor((col("cum") - col("tokens")) / packBudget).as("first_chunk"),
        floor((col("cum") - 1) / packBudget).as("last_chunk"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // t05 — corpus heavy hitters: the top-20 most frequent tokens, the
  // boilerplate-detection primitive (the tokens a df-cut or stopword
  // list would be built from). Plan: explode → hash-agg with MAP-SIDE
  // partial counts (each partition reduces to its distinct tokens
  // before the shuffle) → 20-row TakeOrderedAndProject. The canonical
  // word-count; at 100 TB this exact plan holds while distinct tokens
  // fit the aggregate hash maps — past that, a count-min sketch
  // replaces the exact counts, same two-phase shape.
  // ---------------------------------------------------------------------
  val t05 = Q("t05_heavy_hitters",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
      |ORDER BY freq DESC, tok LIMIT 20""".stripMargin
  ) { (spark, dir) =>
    // SUM of per-doc multiplicities ≡ COUNT(*) over instances, but the
    // shuffle moves per-doc-distinct rows (see sharedTokCounts)
    sharedTokCounts(spark, dir)
      .groupBy("tok").agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("tok"))
      .limit(20)
  }

  // ---------------------------------------------------------------------
  // t06 — Count-Min sketch frequency estimation: the sketch that answers
  // "how often does token X occur?" without materializing the full
  // token→count table — the overflow path t05's scaladoc points to, and
  // the third sketch family in the engine (after HLL q20 and
  // MinHash/SimHash d03/d04). The sketch is materialized RELATIONALLY:
  // d=5 hash rows × w=4096 buckets as a (row, bucket, count) relation —
  // a hash groupBy with map-side partial aggregation whose key space is
  // bounded at d·w regardless of corpus size; estimates are a probe
  // join + MIN. Buckets come from `md5_lower64 & (w-1)` — w is a power
  // of two so the signed Spark value and DuckDB's unsigned
  // `md5_number_lower` mask identically — making the WHOLE sketch
  // oracle-recomputable and hash-matched (rounds ≤ 4 used Spark's
  // opaque `count_min_sketch` bytes → rows-only). Same guarantees:
  // est ≥ true, P(est ≤ true + ε·N) high, ε ≈ e/w < 0.001; the spec
  // pins both bounds. Output: exact top-20 tokens, true + estimated
  // frequency.
  // ---------------------------------------------------------------------
  val cmEps = 0.001
  val cmDepth = 5
  val cmWidth = 4096 // power of two: signed & unsigned masks agree

  val t06 = Q("t06_count_min",
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |hashed AS (
       |  SELECT ii.i AS i,
       |    CAST(md5_number_lower(CAST(ii.i AS VARCHAR) || ':' || tok)
       |         & ${cmWidth - 1} AS BIGINT) AS bucket
       |  FROM toks CROSS JOIN (SELECT unnest(range(0, $cmDepth)) AS i) ii),
       |sketch AS (SELECT i, bucket, count(*) AS c FROM hashed GROUP BY 1, 2),
       |top AS (SELECT tok, count(*) AS freq FROM toks GROUP BY 1
       |        ORDER BY freq DESC, tok LIMIT 20),
       |probes AS (
       |  SELECT tok, freq, ii.i AS i,
       |    CAST(md5_number_lower(CAST(ii.i AS VARCHAR) || ':' || tok)
       |         & ${cmWidth - 1} AS BIGINT) AS bucket
       |  FROM top CROSS JOIN (SELECT unnest(range(0, $cmDepth)) AS i) ii)
       |SELECT p.tok, p.freq, MIN(s.c) AS cm_estimate
       |FROM probes p JOIN sketch s USING (i, bucket)
       |GROUP BY 1, 2 ORDER BY freq DESC, tok""".stripMargin
  ) { (spark, dir) =>
    CustomFunctions.register(spark)
    def bucket(i: Column, tok: Column): Column =
      call_function("md5_lower64",
        concat(i.cast("string"), lit(":"), tok))
        .bitwiseAND(lit((cmWidth - 1).toLong))
    // Aggregate to the vocabulary FIRST: a bucket's count is the sum of
    // its tokens' corpus frequencies, so the sketch needs |V|·depth
    // hashes over the vocabulary relation — not tokens·depth over every
    // instance (the instance-exploded form md5-hashes the same token
    // once per occurrence per depth; at corpus scale that is the entire
    // query). One token shuffle (map-side-combined groupBy) feeds the
    // sketch, the heavy-hitter list, and the probes; bucket counts are
    // bit-identical (long sums, same per-(i, tok) hash).
    val vocab = sharedTokCounts(spark, dir)
      .groupBy("tok").agg(sum(col("cnt")).as("freq"))
    val sketch = vocab
      .select(col("tok"), col("freq"),
        explode(sequence(lit(0), lit(cmDepth - 1))).as("i"))
      .select(col("i"), bucket(col("i"), col("tok")).as("bucket"), col("freq"))
      .groupBy("i", "bucket").agg(sum(col("freq")).as("c"))
    val top = vocab
      .orderBy(col("freq").desc, col("tok"))
      .limit(20)
    top
      .select(col("tok"), col("freq"),
        explode(sequence(lit(0), lit(cmDepth - 1))).as("i"))
      .withColumn("bucket", bucket(col("i"), col("tok")))
      .join(sketch, Seq("i", "bucket"))
      .groupBy("tok", "freq").agg(min(col("c")).as("cm_estimate"))
      .orderBy(col("freq").desc, col("tok"))
  }

  // ---------------------------------------------------------------------
  // t07 — corpus-LM token-frequency scoring: the unigram stand-in for
  // LM-based quality filtering (the CCNet/perplexity-bucket shape): a
  // vocabulary pass counts every token's corpus frequency, then each
  // document is scored by how common its tokens are (sum of corpus
  // frequencies) and how many are rare (freq ≤ 2 — hapax/dis
  // legomena). Rare-token-heavy docs are OCR garbage or boilerplate
  // candidates; the two-phase build-vocab-then-score shape is exactly
  // how a real LM filter deploys (model pass, then scoring pass).
  // Deliberately transcendental-free (counts, not log-probs): libm
  // log() differs across engines in the last ulp, while integer
  // frequency sums are exact in both — same filtering power, bitwise
  // oracle match.
  //
  // 100 TB posture: tokens shuffle once to build the vocab and once to
  // score (join on token); the vocab relation is Zipf-bounded (grows
  // sublinearly with the corpus) and the join key is the token — an
  // ordinary hash shuffle, skew-bounded because stopword posting rows
  // join 1:1 against a single vocab row (no pair blowup).
  // ---------------------------------------------------------------------
  val rareFreqMax = 2

  val t07 = Q("t07_unigram_freq",
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |             FROM documents),
       |vocab AS (SELECT tok, count(*) AS freq FROM toks GROUP BY 1)
       |SELECT t.doc_id, count(*) AS n_toks,
       |  CAST(CAST(SUM(CAST(v.freq AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_tok_freq,
       |  CAST(SUM(CASE WHEN v.freq <= $rareFreqMax THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
       |FROM toks t JOIN vocab v ON t.tok = v.tok
       |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    // freq is an integer count: LONG partial sums are already exact,
    // and casting the exact integer total long→double rounds identically
    // to the oracle's DECIMAL(38,6)→double (both correctly rounded from
    // the same value) — no decimal accumulator needed at all.
    // Round 12: both the vocab pass and the scoring join consume the
    // per-doc term counts — the instance stream never exists. Per-doc
    // totals weight by cnt: n_toks = Σ cnt, sum_tok_freq = Σ cnt·freq,
    // n_rare = Σ cnt over rare terms (each instance of a rare token
    // counted once, exactly the instance-join semantics).
    // Measured, rejected (R12Profile): freq via window-sum over
    // partitionBy(tok) — one tok exchange instead of agg + probe
    // re-exchange, but the window must SORT the term stream by tok
    // where the hash agg + hash join don't sort anything, and the
    // vocab probe side is Zipf-small (AQE broadcasts it at gate SFs):
    // sf0.1 0.236 → 0.274 s, sf10 2.10 → 2.27 s. groupBy+join stands.
    val tc = sharedTokCounts(spark, dir)
    val vocab = tc.groupBy("tok").agg(sum(col("cnt")).as("freq"))
    tc.join(vocab, "tok")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_toks"),
        sum(col("cnt") * col("freq")).cast("double").as("sum_tok_freq"),
        sum(when(col("freq") <= rareFreqMax, col("cnt")).otherwise(0L)).as("n_rare"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // p04 — stratified sampling: exact per-stratum fractions (⌈n_s·f⌉
  // docs from every `source`), deterministic under a content-hash
  // order — the balanced-subset op behind data mixing / ablation
  // sampling, where a naive uniform sample over- or under-draws small
  // strata. One shuffle: both windows (per-stratum rank and size)
  // share the `source` partitioning; the hash order makes the draw
  // reproducible across runs and engines with no RNG.
  //
  // 100 TB posture: the per-stratum sort is the only wide work and
  // partitions by stratum; a skewed giant stratum sorts in parallel
  // within its partition range (it's a window, not a single-reducer
  // global sort). At extreme skew you'd sample-and-rank per stratum
  // hierarchically; the declared plan is the standard one.
  // ---------------------------------------------------------------------
  val sampleFraction = 0.1

  val p04 = Q("p04_stratified_sample",
    s"""WITH ordered AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM documents)
       |SELECT doc_id, source FROM ordered
       |WHERE rn <= CEIL(n * $sampleFraction) ORDER BY doc_id""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val bySource = Window.partitionBy("source")
    table(spark, dir, "documents")
      .withColumn("rn", row_number().over(
        bySource.orderBy(md5(col("text")), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(bySource))
      .filter(col("rn") <= ceil(col("n") * sampleFraction))
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // t08 — repetition metrics (the Gopher repetition-filter family,
  // Rae et al. 2021 §A1.1): per document, the fraction of all word
  // bigrams occupied by the single most frequent bigram, plus bigram
  // counts. Documents dominated by one repeated phrase (boilerplate,
  // keyword stuffing, degenerate OCR) score high and get flagged. The
  // fraction is ONE division of two exact integers — bit-identical
  // cross-engine.
  //
  // 100 TB posture: one explode linear in corpus tokens and one
  // (doc_id, bigram) groupBy followed by a doc_id groupBy — both hash
  // shuffles keyed by doc-scoped keys, so cardinality scales with the
  // corpus and no key is hotter than the longest single document.
  // ---------------------------------------------------------------------
  val repetitionThreshold = 0.09

  val t08 = Q("t08_repetition",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |bi AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
       |       FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i)),
       |cnt AS (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2),
       |m AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |        count(*) AS n_distinct_bigrams, max(c) AS top_cnt
       |      FROM cnt GROUP BY 1)
       |SELECT d.doc_id,
       |  COALESCE(m.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
       |  COALESCE(m.n_distinct_bigrams, CAST(0 AS BIGINT)) AS n_distinct_bigrams,
       |  COALESCE(CAST(m.top_cnt AS DOUBLE) / m.n_bigrams, CAST(0 AS DOUBLE)) AS top_bigram_frac,
       |  CAST(CASE WHEN CAST(m.top_cnt AS DOUBLE) / m.n_bigrams
       |              > CAST($repetitionThreshold AS DOUBLE)
       |       THEN 1 ELSE 0 END AS BIGINT) AS repetitive
       |FROM documents d LEFT JOIN m USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  ) { (spark, dir) =>
    CustomFunctions.register(spark)
    // Repetition is a PER-DOCUMENT property, so it never needs to leave
    // the map side: the native ngram_stats expression computes (total,
    // distinct, top multiplicity) in one pass over each doc's token
    // array — same bigram strings as the ngrams generator, so the
    // three aggregates equal the explode → GROUP BY (doc, bg) → GROUP
    // BY doc composition (ExpressionPropertiesSpec pins it) — and the
    // only shuffle left in the query is the presentation ORDER BY. The
    // composed form shuffles every bigram string in the corpus to
    // compute these same three numbers.
    val frac = col("top_cnt").cast("double") / col("n_bigrams")
    tableFan(spark, dir, "documents")
      .select(col("doc_id"),
        call_function("ngram_stats", split(col("text"), " "), lit(2)).as("st"))
      .select(col("doc_id"), col("st.n_ngrams").as("n_bigrams"),
        col("st.n_distinct").as("n_distinct_bigrams"), col("st.top_cnt").as("top_cnt"))
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        coalesce(frac, lit(0.0)).as("top_bigram_frac"),
        coalesce(when(frac > repetitionThreshold, 1L).otherwise(0L), lit(0L))
          .as("repetitive"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // t09 — PII redaction: rewrite every match of each pattern in a
  // registry to its placeholder tag and count redactions per type — the
  // scrubbing pass a corpus takes before training. The registry here
  // carries STAND-IN word patterns calibrated to the synthetic corpus
  // (it contains no real emails/phones/SSNs — TESTDATA.md); a real
  // deployment plugs the standard PII regexes into the same operator.
  // Patterns are word-boundary anchored and dialect-portable (Java
  // regex on the Spark side, RE2 in the DuckDB oracle — \b and
  // alternation agree on this subset).
  //
  // 100 TB posture: map-only scan-project (regexp_replace +
  // regexp_count are codegen'd builtins) — no shuffle except the
  // presentation sort; the exact shape that runs as one pass over the
  // corpus alongside t01/t02/t03.
  // ---------------------------------------------------------------------
  /** (tag, pattern, replacement) — applied in order. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("name", "\\bcustomer\\b", "[NAME]"),
    ("id", "\\b(key|hash)\\b", "[ID]"))

  val t09 = Q("t09_pii_redact", {
    val redacted = piiPatterns.foldLeft("text") { case (acc, (_, pat, repl)) =>
      s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }
    val counts = piiPatterns
      .map { case (tag, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$tag" }
      .mkString(",\n  ")
    s"""SELECT doc_id,
       |  $counts,
       |  $redacted AS redacted
       |FROM documents ORDER BY doc_id""".stripMargin
  }) { (spark, dir) =>
    // word_redact: the whole registry in one operator — counts on the
    // original text plus the sequential redaction chain, with the
    // \b-word patterns running as tokenize+set-membership byte scans
    // instead of 2 regex-engine passes per entry (replace + count).
    // WordRedactSpec pins equality with the regexp_replace/regexp_count
    // chain on both the fast-path and fallback grammars.
    CustomFunctions.register(spark)
    val wr = call_function("word_redact", col("text"),
      array(piiPatterns.map { case (_, pat, _) => lit(pat) }: _*),
      array(piiPatterns.map { case (_, _, repl) => lit(repl) }: _*))
    val counts = piiPatterns.zipWithIndex.map { case ((tag, _, _), i) =>
      col("w.counts").getItem(i).as(s"n_$tag")
    }
    tableFan(spark, dir, "documents")
      .select(col("doc_id"), wr.as("w"))
      .select(Seq(col("doc_id")) ++ counts :+ col("w.redacted").as("redacted"): _*)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // t10 — corpus-level bigram collocations: the top 20 word bigrams by
  // global occurrence count (ties by bigram), each with its document
  // frequency — the collocation/boilerplate-phrase statistic next to
  // t05's unigram heavy hitters. The n-gramming runs through the native
  // NGramExplode Catalyst Generator (the custom-UDTF rung of the
  // extension ladder): one Generate stage, no per-document n-gram array
  // materialized on the heap and no interpreted lambda — vs t08's
  // transform(sequence)+explode composition, which builds each
  // document's full bigram array before exploding it. All-integer
  // counts → exact oracle.
  //
  // 100 TB posture: generate is map-side and linear in corpus tokens;
  // the (bigram) groupBy partial-aggregates map-side, so the shuffle
  // carries one row per distinct bigram per partition, and the top-20 is
  // a TakeOrderedAndProject.
  // ---------------------------------------------------------------------
  val t10 = Q("t10_bigram_colloc",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bg AS (SELECT doc_id, w[x.i] || ' ' || w[x.i+1] AS bigram
      |       FROM w CROSS JOIN LATERAL (SELECT unnest(range(1, len(w))) AS i) x)
      |SELECT bigram, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS df
      |FROM bg GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin
  ) { (spark, dir) =>
    CustomFunctions.register(spark)
    // ngram_counts emits each doc's DISTINCT bigrams with their counts,
    // so per-bigram totals and document frequencies are ONE ordinary
    // partial-aggregated groupBy (cnt = SUM of within-doc counts, df =
    // COUNT of rows — one row per (doc, bigram) by construction). The
    // instance-explode + COUNT(DISTINCT doc_id) form needs Spark's
    // two-phase distinct aggregate over every bigram instance to
    // establish a distinctness that is already true row-locally.
    tableFan(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), call_function("ngram_counts", col("w"), lit(2)))
      .groupBy(col("ngram").as("bigram"))
      .agg(sum(col("cnt")).as("cnt"), count(lit(1)).as("df"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(20)
  }

  // ---------------------------------------------------------------------
  // p08 — per-source document cap (the "domain cap" stage of a crawl
  // pipeline: no single domain may contribute more than K documents,
  // best-quality-first): rank each source's docs by t02's quality score
  // (ties by doc_id) and keep the top K. The Spark side uses the native
  // TopKAgg bounded-heap aggregate, NOT the oracle's window idiom: the
  // window sorts and shuffles every row of the corpus; topk_agg partial-
  // aggregates each partition down to ≤ K entries per source BEFORE the
  // shuffle, so only K·sources rows move — at 100 TB with ~10⁷ domains
  // that is the difference between shuffling the corpus and shuffling
  // the (bounded) result. Quality is t02's exact expression, so the
  // score itself is oracle-pinned elsewhere.
  // ---------------------------------------------------------------------
  val sourceCap = 20

  val p08 = Q("p08_source_cap",
    s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |scored AS (SELECT doc_id, source, $qualitySqlExpr AS quality FROM toks),
       |ranked AS (SELECT *, row_number() OVER (
       |    PARTITION BY source ORDER BY quality DESC, doc_id) AS rk
       |  FROM scored)
       |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, quality
       |FROM ranked WHERE rk <= $sourceCap
       |ORDER BY source, rk""".stripMargin
  ) { (spark, dir) =>
    CustomFunctions.register(spark)
    tableFan(spark, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), qualityExpr(col("w")).as("quality"))
      .groupBy("source")
      .agg(call_function("topk_agg",
        struct(col("quality").as("ord"), col("doc_id").as("id")),
        lit(sourceCap)).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("doc_id"), col("col.ord").as("quality"))
      .orderBy("source", "rk")
  }

  // ---------------------------------------------------------------------
  // p09 — data-quality constraint report (the deequ-style validation
  // gate a pipeline runs before training): completeness, key
  // uniqueness, metadata-consistency (n_chars must equal the actual
  // text length), domain membership, and range checks — ALL computed in
  // ONE aggregation pass over the corpus (each constraint is a
  // conditional aggregate of the same scan; a naive validator runs one
  // scan per rule). The scalar report row is then unpivoted to
  // (check, metric, pass) rows — the shape monitoring systems ingest.
  // Ratios are exact integer quotients; everything hash-matches.
  // ---------------------------------------------------------------------
  val p09 = Q("p09_data_quality",
    """WITH m AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(COUNT(text) AS DOUBLE) AS text_nonnull,
      |    CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS distinct_ids,
      |    CAST(SUM(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS DOUBLE)
      |      AS nchars_consistent,
      |    CAST(SUM(CASE WHEN lang IN ('en','es','de','fr','zh') THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS lang_in_domain,
      |    CAST(SUM(CASE WHEN n_chars BETWEEN 1 AND 100000 THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS nchars_in_range
      |  FROM documents)
      |SELECT chk, metric, CAST(CASE WHEN metric >= 1.0 THEN 1 ELSE 0 END AS BIGINT) AS pass
      |FROM (
      |  SELECT 'completeness_text' AS chk, text_nonnull / n AS metric FROM m
      |  UNION ALL SELECT 'uniqueness_doc_id', distinct_ids / n FROM m
      |  UNION ALL SELECT 'consistency_n_chars', nchars_consistent / n FROM m
      |  UNION ALL SELECT 'domain_lang', lang_in_domain / n FROM m
      |  UNION ALL SELECT 'range_n_chars', nchars_in_range / n FROM m)
      |ORDER BY chk""".stripMargin
  ) { (spark, dir) =>
    val langs = Seq("en", "es", "de", "fr", "zh")
    // COUNT(DISTINCT) rides a SEPARATE aggregate over the pruned
    // doc_id-only scan (round 11, measured at sf10: 0.58 → 0.38 s —
    // the text-scan floor): a distinct aggregate mixed into a plain
    // aggregate makes Catalyst EXPAND every input row (one copy per
    // aggregate group), doubling the rows carrying the text-derived
    // flags through the partial aggregate. Split, the text-bearing
    // aggregate stays expand-free and the distinct count scans one
    // int64 column; the two 1-row results cross-join for free.
    val m1 = table(spark, dir, "documents")
      .agg(count(lit(1)).cast("double").as("n"),
        count(col("text")).cast("double").as("text_nonnull"),
        sum(when(col("n_chars") === length(col("text")), 1L).otherwise(0L))
          .cast("double").as("nchars_consistent"),
        sum(when(col("lang").isin(langs: _*), 1L).otherwise(0L))
          .cast("double").as("lang_in_domain"),
        sum(when(col("n_chars").between(1L, 100000L), 1L).otherwise(0L))
          .cast("double").as("nchars_in_range"))
    val m2 = table(spark, dir, "documents")
      .agg(count_distinct(col("doc_id")).cast("double").as("distinct_ids"))
    val m = m1.crossJoin(m2)
      .select((col("text_nonnull") / col("n")).as("completeness_text"),
        (col("distinct_ids") / col("n")).as("uniqueness_doc_id"),
        (col("nchars_consistent") / col("n")).as("consistency_n_chars"),
        (col("lang_in_domain") / col("n")).as("domain_lang"),
        (col("nchars_in_range") / col("n")).as("range_n_chars"))
    m.unpivot(Array.empty, "chk", "metric")
      .select(col("chk"), col("metric"),
        when(col("metric") >= 1.0, 1L).otherwise(0L).as("pass"))
      .orderBy("chk")
  }

  // ---------------------------------------------------------------------
  // p11 — seeded GLOBAL SHUFFLE + shard assignment: the training-order
  // step every pretraining pipeline runs last — a reproducible
  // pseudo-random permutation of the corpus, materialized as numbered
  // shards. Key = md5(seed ‖ doc_id) (a keyed hash IS the deterministic
  // permutation — stable across runs, engines, and corpus partitioning);
  // shard = first hex nibble of the key mod `numShards` (uniform — each
  // of the 16 nibble values is equiprobable); position within the shard
  // = rank by (key, doc_id). The global order a reader reconstructs is
  // (shard, pos) — exactly how sharded training data is consumed, one
  // writer/reader per shard.
  //
  // 100 TB posture: this deliberately AVOIDS the single global
  // row_number() (one total-order window = one task no matter the
  // cluster) — the only shuffle is the shard-partitioned rank window,
  // numShards-way parallel with ~N/numShards rows each, and in a real
  // deployment the shard is also the write partition
  // (partitionBy(shard)), so the sort feeds the writer directly.
  // ---------------------------------------------------------------------
  val numShards = 8

  /** p11's seeded shard assignment as a reusable column: first hex
    * nibble of md5(seed ‖ ":" ‖ doc_id) mod `n`. Shared by the batch
    * query and [[graft.streaming.StreamPipeline.shardedSink]] so the
    * streaming writer's layout is bit-identical to the batch
    * permutation's.
    */
  def shardOf(id: Column, seed: String, n: Int): Column =
    (conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 1),
      16, 10).cast("long") % n)

  val p11 = Q("p11_shard_shuffle", {
    // one hex nibble parsed arithmetically (no strtol in DuckDB)
    val nibble = "CASE WHEN substring(key, 1, 1) >= 'a' " +
      "THEN ascii(substring(key, 1, 1)) - 87 " +
      "ELSE ascii(substring(key, 1, 1)) - 48 END"
    s"""WITH k AS (
       |  SELECT doc_id, md5('s42:' || CAST(doc_id AS VARCHAR)) AS key
       |  FROM documents),
       |s AS (SELECT doc_id, key,
       |    CAST($nibble % $numShards AS BIGINT) AS shard FROM k)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
       |    AS BIGINT) AS pos
       |FROM s ORDER BY doc_id""".stripMargin
  }) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val keyed = table(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit("s42:"), col("doc_id").cast("string"))).as("key"))
      .withColumn("shard", shardOf(col("doc_id"), "s42", numShards))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("key", "doc_id")).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // t11 — TF-IDF keyword extraction: each document's top-3 terms by
  // tf · (N/df) — the inverse-document-frequency keyword score (the
  // ratio variant rather than ln(N/df): ln differs in ULPs between
  // libm and the JVM, while tf·N is integer-exact in a double and the
  // single division is correctly rounded in both engines, keeping the
  // compare bitwise). The per-corpus document-frequency table is the
  // same relation an IDF-weighted quality filter or keyword indexer
  // consumes.
  //
  // 100 TB posture: tf is a (doc, term) groupBy, df a term-keyed
  // groupBy OVER tf (already doc-distinct — no two-phase distinct
  // aggregate), the scalar N is a 1-row broadcast cross join (q41's
  // sanctioned pattern), and the top-3 rank windows per document —
  // group size bounded by document vocabulary, never corpus-wide.
  // ---------------------------------------------------------------------
  val keywordK = 3

  val t11 = Q("t11_keywords_tfidf",
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |             FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |scored AS (
       |  SELECT t.doc_id, t.tok,
       |    CAST(t.tf * n.n AS DOUBLE) / CAST(d.df AS DOUBLE) AS score
       |  FROM tf t JOIN df d USING (tok) CROSS JOIN n),
       |ranked AS (SELECT doc_id, tok, score,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank
       |  FROM scored)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok AS term, score
       |FROM ranked WHERE rank <= $keywordK ORDER BY doc_id, rank""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    // Round 12: tf ≡ the per-doc term counts — it falls out of the
    // ngram_counts generator map-side; the (doc_id, tok) shuffle that
    // built it (previously this query's widest stage) is gone entirely.
    val tf = sharedTokCounts(spark, dir)
      .select(col("doc_id"), col("tok"), col("cnt").as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = tableFan(spark, dir, "documents").groupBy().count().select(col("count").as("n"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
        ((col("tf") * col("n")).cast("double") / col("df").cast("double")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= keywordK)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("tok").as("term"), col("score"))
      .orderBy("doc_id", "rank")
  }

  val all: Seq[Q] = Seq(t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11,
    p01, p02, p03, p04, p06, p07, p08, p09, p11, p12)
}
