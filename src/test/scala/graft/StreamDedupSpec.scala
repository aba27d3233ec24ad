package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.CustomFunctions
import graft.ops.DedupQueries
import graft.streaming.{StreamDedup, StreamDoc}

/** Streaming MinHash-LSH near-dedup twin: the per-row signature/banding
  * math is bit-identical to the batch d03 aggregate, candidates
  * accumulate ACROSS micro-batches from band-bucket state, and the
  * stream-static verification reproduces d03's exact output.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("per-row signature/banding equals the batch minhash128 band keys") {
    CustomFunctions.register(spark)
    val d = docs()
    val sigs = DedupQueries.wordTrigrams(d).groupBy("doc_id")
      .agg(call_function("minhash128", xxhash64(col("g"))).as("sig"))
    val batch = DedupQueries.bandKeys(sigs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val perRow = d.as[(Long, String)].collect().iterator
      .flatMap { case (id, text) => StreamDedup.bandObservations(StreamDoc(id, text)) }
      .map(o => (o.doc_id, o.band, o.bh)).toSet
    assert(perRow === batch)
    assert(batch.nonEmpty)
  }

  test("per-row signature/banding equals batch on adversarial generated text") {
    CustomFunctions.register(spark)
    val rnd = new scala.util.Random(20260814L)
    val words = Vector("a", "bb", "ccc", "θ", "日本", "😀", "x" * 50, "", " ")
    def doc(): String = (0 until rnd.nextInt(12))
      .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    val texts = Seq("", " ", "  ", "a b", "a b c", "a a a a", "a  b c") ++
      (0 until 300).map(_ => doc())
    val d = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sigs = DedupQueries.wordTrigrams(d).groupBy("doc_id")
      .agg(call_function("minhash128", xxhash64(col("g"))).as("sig"))
    val batch = DedupQueries.bandKeys(sigs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val perRow = texts.zipWithIndex.iterator
      .flatMap { case (t, i) =>
        graft.streaming.StreamDedup.bandObservations(
          graft.streaming.StreamDoc(i.toLong, t)) }
      .map(o => (o.doc_id, o.band, o.bh)).toSet
    assert(perRow === batch)
    // the generator really exercised both arms: some docs banded,
    // some (under 3 words) produced nothing
    assert(perRow.map(_._1).size < texts.size)
    assert(perRow.nonEmpty)
  }

  test("streaming candidates across micro-batches + verification equal batch d03") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val all = docs().as[(Long, String)].collect()
        .map { case (id, t) => StreamDoc(id, t) }.sortBy(_.doc_id)
      val (first, second) = all.splitAt(all.length / 2)

      val source = MemoryStream[StreamDoc]
      val q = StreamDedup.candidates(source.toDS())
        .writeStream.format("memory").queryName("sd_cands")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(250))
        .start()
      def rows(): Set[(Long, Long)] =
        spark.table("sd_cands").as[(Long, Long)].collect().toSet
      def awaitSink(pred: Set[(Long, Long)] => Boolean): Unit = {
        val t0 = System.currentTimeMillis()
        while (!pred(rows()) && System.currentTimeMillis() - t0 < 120000)
          Thread.sleep(200)
        assert(pred(rows()), s"sink never reached expectation; got ${rows().size} pairs")
      }
      try {
        // batch-path expectation: the bucket self-join's distinct pairs
        CustomFunctions.register(spark)
        val sigs = DedupQueries.wordTrigrams(docs()).groupBy("doc_id")
          .agg(call_function("minhash128", xxhash64(col("g"))).as("sig"))
        val bands = DedupQueries.bandKeys(sigs).cache()
        val expected = bands.toDF("a", "band", "bh")
          .join(bands.toDF("b", "band2", "bh2"),
            col("band") === col("band2") && col("bh") === col("bh2") &&
              col("a") < col("b"))
          .select("a", "b").distinct()
          .as[(Long, Long)].collect().toSet
        assert(expected.nonEmpty, "fixture produced no candidate pairs")

        // pairs WITHIN the first half arrive in batch 1...
        val within = expected.filter { case (a, b) =>
          first.exists(_.doc_id == a) && first.exists(_.doc_id == b) }
        source.addData(first.toIndexedSeq: _*)
        awaitSink(r => within.subsetOf(r))
        // ...and batch-1 state pairs batch-2 arrivals with batch-1 docs:
        // the full candidate set appears, and nothing beyond it
        source.addData(second.toIndexedSeq: _*)
        awaitSink(r => r == expected)

        // stream-static verification reproduces the batch d03 answer
        val verified = StreamDedup.verified(
            spark.table("sd_cands").as[(Long, Long)]
              .map { case (a, b) => graft.streaming.CandidatePair(a, b) },
            DedupQueries.sharedGramSets(spark, sf))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val d03 = DedupQueries.d03.fn(spark, sf).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(verified === d03)
        assert(d03.nonEmpty)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
