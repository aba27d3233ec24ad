package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.CustomFunctions
import graft.ops.{DedupQueries, TextQueries}
import graft.streaming.{StreamCorpusDoc, StreamPipeline}

/** Online corpus intake (stream p01→d01→d03 front half): the gate
  * reuses the batch column expressions verbatim, exact dedup holds
  * across micro-batches, and near-dup candidates among the survivors
  * equal the batch bucket join.
  */
class StreamPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val stateKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def corpus() = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"))

  /** The batch p01 `kept` relation: gated docs + content hash. */
  private def batchKept() = { CustomFunctions.register(spark); corpus() }
    .withColumn("w", split(col("text"), " "))
    .filter(col("lang").isin("en", "es") &&
      TextQueries.qualityExpr(col("w")) >= TextQueries.qualityThreshold)
    .select(col("doc_id"), col("text"), col("lang"),
      TextQueries.qualityExpr(col("w")).as("quality"),
      md5(col("text")).as("content_hash"))

  test("intake gates and exact-dedups across micro-batches like batch p01") {
    implicit val sqlCtx = spark.sqlContext
    val all = corpus().as[(Long, String, String)].collect()
      .map { case (id, t, l) => StreamCorpusDoc(id, t, l) }.sortBy(_.doc_id)
    val (first, second) = all.splitAt(all.length / 2)
    // a byte-identical cross-batch duplicate of a batch-1 survivor must
    // NOT survive (state carries batch-1 hashes forward)
    val kept = batchKept().as[(Long, String, String, Double, String)].collect()
    val seed = kept.minBy(_._1)
    val dupOfSeed = StreamCorpusDoc(999999L, seed._2, seed._3)

    val source = MemoryStream[StreamCorpusDoc]
    val q = StreamPipeline.intake(source.toDS())
      .writeStream.format("memory").queryName("sp_intake")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(250))
      .start()
    def rows(): Seq[(Long, String, Double, String)] =
      spark.table("sp_intake")
        .select("doc_id", "lang", "quality", "content_hash")
        .as[(Long, String, Double, String)].collect().toSeq
    def awaitSink(pred: Seq[(Long, String, Double, String)] => Boolean): Unit = {
      val t0 = System.currentTimeMillis()
      while (!pred(rows()) && System.currentTimeMillis() - t0 < 120000)
        Thread.sleep(200)
      assert(pred(rows()), s"sink never reached expectation; got ${rows().size} rows")
    }
    try {
      val expectedHashes = kept.map(_._5).toSet
      source.addData(first.toIndexedSeq: _*)
      val firstHashes = kept.filter(k => k._1 < second.head.doc_id).map(_._5).toSet
      awaitSink(r => r.map(_._4).toSet == firstHashes)
      source.addData((second :+ dupOfSeed).toIndexedSeq: _*)
      awaitSink(r => r.map(_._4).toSet == expectedHashes)

      val out = rows()
      // exactly one survivor per content hash, none for gated-out docs
      assert(out.map(_._4).distinct.size === out.size)
      // the injected duplicate lost to the batch-1 original
      assert(!out.exists(_._1 == 999999L))
      // per-hash lang/quality match the batch relation (identical text
      // ⇒ identical score, so survivor choice cannot change them)
      val byHash = kept.map(k => k._5 -> ((k._3, k._4))).toMap
      out.foreach { case (_, lang, quality, h) =>
        assert(byHash(h) === ((lang, quality)), s"hash $h mismatch")
      }
    } finally q.stop()
  }

  test("shardedSink lands intake survivors as per-shard parquet across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val all = corpus().as[(Long, String, String)].collect()
      .map { case (id, t, l) => StreamCorpusDoc(id, t, l) }.sortBy(_.doc_id)
    val (first, second) = all.splitAt(all.length / 2)
    val outDir = java.nio.file.Files.createTempDirectory("graft-shardout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-shardck").toString
    val expectedHashes = batchKept().select("content_hash")
      .as[String].collect().toSet
    val firstHashes = batchKept().filter(col("doc_id") < second.head.doc_id)
      .select("content_hash").as[String].collect().toSet

    val source = MemoryStream[StreamCorpusDoc]
    val q = StreamPipeline.shardedSink(source.toDS(), outDir, ckpt)
    try {
      source.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      // first micro-batch landed (files on disk, correct survivor set)
      val afterFirst = spark.read.parquet(outDir)
        .select("content_hash").as[String].collect().toSet
      assert(afterFirst === firstHashes)
      source.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.parquet(outDir).cache()
    // union of both micro-batches = the batch p01 survivor hash set,
    // one row per hash (cross-batch dedup held through the sink)
    assert(back.select("content_hash").as[String].collect().toSet
      === expectedHashes)
    assert(back.count() === expectedHashes.size)
    // layout: hive-style shard=K directories exist…
    val shardDirs = new java.io.File(outDir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard=")).toSet
    assert(shardDirs.nonEmpty && shardDirs.subsetOf(
      (0 until TextQueries.numShards).map(i => s"shard=$i").toSet))
    // …and every row sits in the shard the batch p11 assignment gives
    // its doc_id (stream/batch shard parity)
    val mismatches = back
      .withColumn("expected",
        TextQueries.shardOf(col("doc_id"), "s42", TextQueries.numShards))
      .filter(col("shard") =!= col("expected")).count()
    assert(mismatches === 0L)
    back.unpersist()
  }

  test("shardedSink recovers from its checkpoint: stop after batch 1, restart, output equals an uninterrupted run") {
    implicit val sqlCtx = spark.sqlContext
    val all = corpus().as[(Long, String, String)].collect()
      .map { case (id, t, l) => StreamCorpusDoc(id, t, l) }.sortBy(_.doc_id)
    val (first, second) = all.splitAt(all.length / 2)
    val outDir = java.nio.file.Files.createTempDirectory("graft-recovout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-recovck").toString
    val expectedHashes = batchKept().select("content_hash")
      .as[String].collect().toSet
    val firstHashes = batchKept().filter(col("doc_id") < second.head.doc_id)
      .select("content_hash").as[String].collect().toSet
    // a byte-identical duplicate of a BATCH-1 survivor, arriving only
    // after the restart: it survives iff the dedup state was NOT
    // restored from the checkpoint — the recovery property itself
    val kept = batchKept().as[(Long, String, String, Double, String)].collect()
    val seed = kept.minBy(_._1)
    val dupOfSeed = StreamCorpusDoc(888888L, seed._2, seed._3)

    val source = MemoryStream[StreamCorpusDoc]
    val q1 = StreamPipeline.shardedSink(source.toDS(), outDir, ckpt)
    try {
      source.addData(first.toIndexedSeq: _*)
      q1.processAllAvailable()
    } finally q1.stop() // stop mid-stream, batch 1 committed
    assert(spark.read.parquet(outDir).select("content_hash")
      .as[String].collect().toSet === firstHashes)

    // crash-restart stand-in: a NEW query on the SAME checkpoint and
    // source; data that arrived while the query was down is waiting
    source.addData((second :+ dupOfSeed).toIndexedSeq: _*)
    val q2 = StreamPipeline.shardedSink(source.toDS(), outDir, ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val back = spark.read.parquet(outDir).cache()
    // ≡ uninterrupted run: the batch p01 survivor hash set, exactly
    // once — batch 1 was not replayed into the sink (offsets recovered)
    // and the injected duplicate lost to restored dedup state
    assert(back.select("content_hash").as[String].collect().toSet
      === expectedHashes)
    assert(back.count() === expectedHashes.size)
    assert(back.filter(col("doc_id") === 888888L).count() === 0L)
    // shard layout parity with the uninterrupted run (same seeded
    // assignment, so recovery cannot have moved rows between shards)
    val mismatches = back
      .withColumn("expected",
        TextQueries.shardOf(col("doc_id"), "s42", TextQueries.numShards))
      .filter(col("shard") =!= col("expected")).count()
    assert(mismatches === 0L)
    back.unpersist()
  }

  test("near-dup candidates among intake survivors equal the batch bucket join") {
    val prev = spark.conf.getOption(stateKey)
    spark.conf.set(stateKey, rocks)
    try {
      implicit val sqlCtx = spark.sqlContext
      // deduped gated corpus (min doc_id per hash) — no exact dups, so
      // the intake survivor set is deterministic
      val uniq = batchKept()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("content_hash").orderBy("doc_id")))
        .filter(col("rn") === 1).drop("rn").cache()
      val docs = uniq.select("doc_id", "text", "lang")
        .as[(Long, String, String)].collect()
        .map { case (id, t, l) => StreamCorpusDoc(id, t, l) }.sortBy(_.doc_id)
      val (first, second) = docs.splitAt(docs.length / 2)

      CustomFunctions.register(spark)
      val sigs = DedupQueries.wordTrigrams(uniq.select("doc_id", "text"))
        .groupBy("doc_id")
        .agg(call_function("minhash128", xxhash64(col("g"))).as("sig"))
      val bands = DedupQueries.bandKeys(sigs).cache()
      val expected = bands.toDF("a", "band", "bh")
        .join(bands.toDF("b", "band2", "bh2"),
          col("band") === col("band2") && col("bh") === col("bh2") &&
            col("a") < col("b"))
        .select("a", "b").distinct().as[(Long, Long)].collect().toSet
      assert(expected.nonEmpty, "deduped fixture produced no candidate pairs")

      val source = MemoryStream[StreamCorpusDoc]
      val q = StreamPipeline.nearDupCandidates(source.toDS())
        .writeStream.format("memory").queryName("sp_cands")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(250))
        .start()
      def rows(): Set[(Long, Long)] =
        spark.table("sp_cands").as[(Long, Long)].collect().toSet
      def awaitSink(pred: Set[(Long, Long)] => Boolean): Unit = {
        val t0 = System.currentTimeMillis()
        while (!pred(rows()) && System.currentTimeMillis() - t0 < 120000)
          Thread.sleep(200)
        assert(pred(rows()), s"sink never reached expectation; got ${rows().size} pairs")
      }
      try {
        source.addData(first.toIndexedSeq: _*)
        source.addData(second.toIndexedSeq: _*)
        awaitSink(_ == expected)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(stateKey, v)
      case None => spark.conf.unset(stateKey)
    }
  }
}
