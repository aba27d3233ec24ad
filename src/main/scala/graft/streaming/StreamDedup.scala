package graft.streaming

import java.time.Duration

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.MinHashAgg
import graft.ops.DedupQueries

/** Streaming twin of the d03 MinHash-LSH near-dedup
  * (graft.ops.DedupQueries.d03): documents arrive as a stream and
  * near-duplicate CANDIDATE PAIRS are emitted incrementally, across
  * micro-batches, from band-bucket state — the online-ingest shape of
  * the batch pipeline (reference ingest loop:
  * /root/reference/ogmios_parquet.py:652-700 is the same
  * continuous-arrival posture for chain data).
  *
  * The signature/banding math is BIT-IDENTICAL to the batch path — the
  * same word-trigram shingles, the same `xxhash64` base hash (seed 42,
  * via the engine's own [[XxHash64Function]]), the same
  * [[MinHashAgg.mix]] permutations and the same 32×4 band-key hash —
  * so a document's band keys are equal whether it flows through the
  * batch aggregate or this per-row computation
  * ([[StreamDedupSpec]] pins that equality, and pins streaming
  * candidates == batch bucket-join candidates on the same corpus).
  *
  * Scale shape: the stream shuffles once on (band, bucket-hash) — the
  * same key the batch self-join shuffles on — and per-bucket state is
  * the doc_id list of PRIOR members, so per-key work is O(bucket size)
  * per arrival, never all-pairs. Two guards bound the hot-bucket /
  * stale-state risks at 100 TB ingest: `maxBucket` caps a bucket's
  * stored members (the streaming analogue of the batch ladder's df
  * cut — beyond the cap, new members still pair against the stored
  * prefix but stop growing the quadratic frontier), and the TTL
  * retires buckets no arrival has touched (RocksDB-backed, so state is
  * disk-resident and incrementally checkpointed).
  */
object StreamDedup {

  /** Per-doc MinHash signature — the per-row equivalent of the batch
    * `minhash128(xxhash64(g))` aggregate over [[DedupQueries.wordTrigrams]]:
    * sig(i) = min over distinct word-trigrams of mix_i(xxhash64(gram)).
    * Returns null for docs with fewer than 3 words (the batch path
    * filters them out before the aggregate).
    */
  def signature(text: String, numHashes: Int = 128): Array[Long] = {
    val w = text.split(" ", -1)
    if (w.length < 3) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val seen = mutable.HashSet.empty[String]
    var i = 0
    while (i <= w.length - 3) {
      val g = w(i) + " " + w(i + 1) + " " + w(i + 2)
      if (seen.add(g)) {
        val x = XxHash64Function.hash(UTF8String.fromString(g), StringType, 42L)
        var k = 0
        while (k < numHashes) {
          val h = MinHashAgg.mix(x, k)
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    sig
  }

  /** The batch band-key hash: xxhash64 (seed 42) over the band's r
    * signature values rendered as a comma-joined decimal string —
    * byte-identical to the batch plan's
    * `xxhash64(concat_ws(",", transform(slice(sig, b*r+1, r), cast string)))`.
    */
  def bandHash(sig: Array[Long], band: Int, rowsPerBand: Int): Long = {
    val s = new StringBuilder
    var k = band * rowsPerBand
    val end = k + rowsPerBand
    while (k < end) {
      if (s.nonEmpty) s.append(',')
      s.append(sig(k))
      k += 1
    }
    XxHash64Function.hash(UTF8String.fromString(s.toString), StringType, 42L)
  }

  /** Stateless fan-out: one [[BandObs]] per (doc, band). */
  def bandObservations(doc: StreamDoc,
      numBands: Int = DedupQueries.numBands,
      rowsPerBand: Int = DedupQueries.rowsPerBand): Iterator[BandObs] = {
    val sig = signature(doc.text, numBands * rowsPerBand)
    if (sig == null) Iterator.empty
    else (0 until numBands).iterator
      .map(b => BandObs(b, bandHash(sig, b, rowsPerBand), doc.doc_id))
  }

  /** The streaming LSH candidate operator: shingle→minhash→band
    * stateless, then one keyed stateful stage on (band, bucket hash)
    * pairing each arrival against the bucket's prior members. Pairs are
    * canonical (doc_a < doc_b) and may repeat across bands — exactly
    * the batch bucket-join's pre-`distinct()` relation;
    * [[candidates]] adds the streaming distinct.
    */
  def rawCandidates(docs: Dataset[StreamDoc],
      ttl: Duration = Duration.ofHours(24),
      maxBucket: Int = 10000): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    docs.flatMap(bandObservations(_))
      .groupByKey(o => (o.band, o.bh))
      .transformWithState(new BandBucket(ttl, maxBucket),
        TimeMode.ProcessingTime(), OutputMode.Append(),
        Encoders.product[CandidatePair])
  }

  /** [[rawCandidates]] with cross-band duplicate suppression (streaming
    * dropDuplicates state; at unbounded ingest, prefer
    * `dropDuplicatesWithinWatermark` keyed on an event-time column so
    * the pair-dedup state is watermark-bounded like the bucket TTL).
    */
  def candidates(docs: Dataset[StreamDoc],
      ttl: Duration = Duration.ofHours(24),
      maxBucket: Int = 10000): Dataset[CandidatePair] =
    rawCandidates(docs, ttl, maxBucket).dropDuplicates("doc_a", "doc_b")

  /** Exact-Jaccard verification of a candidate stream by stream-static
    * join against a gram-set relation (e.g.
    * [[DedupQueries.sharedGramSets]] over the corpus-so-far snapshot) —
    * the same [[DedupQueries.exactJaccard]] the batch path verifies
    * with, so LSH false positives die here identically.
    */
  def verified(cands: Dataset[CandidatePair], gramSets: DataFrame,
      threshold: Double = 0.8): DataFrame =
    DedupQueries.exactJaccard(
      cands.toDF("a", "b"), gramSets)
      .filter(col("jaccard") >= threshold)
}

/** One streamed document. */
case class StreamDoc(doc_id: Long, text: String)

/** One (band, bucket) observation of a document. */
case class BandObs(band: Int, bh: Long, doc_id: Long)

/** A canonical near-duplicate candidate pair (doc_a < doc_b). */
case class CandidatePair(doc_a: Long, doc_b: Long)

/** Keyed state: the doc_ids already seen in this (band, bucket). Each
  * arrival emits one pair per stored member, then joins the bucket
  * (until `maxBucket` caps the quadratic frontier). TTL retires
  * untouched buckets.
  */
class BandBucket(ttl: Duration, maxBucket: Int)
    extends StatefulProcessor[(Int, Long), BandObs, CandidatePair] {

  @transient private var members: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState[Long](
      "members", Encoders.scalaLong, TTLConfig(ttl))

  override def handleInputRows(key: (Int, Long), rows: Iterator[BandObs],
      timerValues: TimerValues): Iterator[CandidatePair] = {
    val seen = mutable.LinkedHashSet.empty[Long]
    members.get().foreach(seen += _)
    val out = mutable.ArrayBuffer.empty[CandidatePair]
    // beyond the cap, arrivals still pair against the stored prefix but
    // are not stored — `paired` (batch-local) keeps a capped bucket from
    // re-emitting for a doc observed twice in one batch
    val paired = mutable.HashSet.empty[Long]
    rows.foreach { r =>
      if (!seen.contains(r.doc_id) && paired.add(r.doc_id)) {
        seen.foreach { m =>
          out += (if (m < r.doc_id) CandidatePair(m, r.doc_id)
                  else CandidatePair(r.doc_id, m))
        }
        if (seen.size < maxBucket) {
          members.appendValue(r.doc_id)
          seen += r.doc_id
        }
      }
    }
    out.iterator
  }
}
