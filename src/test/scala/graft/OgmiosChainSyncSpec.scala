package graft

import java.io.{ByteArrayInputStream, DataInputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ChainPoints
import graft.sources.{NdjsonSink, OgmiosChainSync, WebSocketTransport}
import graft.sources.OgmiosChainSync._

/** Drives the chain-sync protocol against a scripted transcript — no
  * network — mirroring the reference's batching and rollback behavior
  * (ogmios_parquet.py:671-675 pipelines batch_size requests before
  * reading; :676-687 handles forward/backward). The WebSocket frame
  * codec is pinned separately (RFC 6455 vectors) since the live socket
  * path is unreachable in this sandbox.
  */
class OgmiosChainSyncSpec extends AnyFunSuite {

  /** Replays canned results; echoes each request's id back (Ogmios
    * responds in order on one connection). Records the send/receive
    * interleaving so pipelining is assertable.
    */
  private final class Scripted(results: Seq[String]) extends MessageTransport {
    val ops = mutable.Buffer.empty[String]
    val sent = mutable.Buffer.empty[String]
    private val pendingIds = mutable.Queue.empty[String]
    private val it = results.iterator
    override def send(msg: String): Unit = {
      ops += "S"; sent += msg
      val m = """"id":(\d+)""".r.findFirstMatchIn(msg)
      pendingIds += m.get.group(1)
    }
    override def receive(): String = {
      ops += "R"
      it.next().replace("@ID@", pendingIds.dequeue())
    }
    override def close(): Unit = ()
  }

  private def fwd(slot: Long, tip: Long = 1000L): String =
    s"""{"jsonrpc":"2.0","result":{"direction":"forward","block":{"slot":$slot,"id":"b$slot","transactions":[]},"tip":{"slot":$tip,"id":"t"}},"id":@ID@}"""
  private def bwd(slot: Long): String =
    s"""{"jsonrpc":"2.0","result":{"direction":"backward","point":{"slot":$slot,"id":"p$slot"},"tip":{"slot":1000,"id":"t"}},"id":@ID@}"""

  test("findIntersection sends the cursor points and parses point + tip") {
    val t = new Scripted(Seq(
      """{"jsonrpc":"2.0","result":{"intersection":{"slot":4492799,"id":"f808"},"tip":{"slot":1000000,"id":"tt"}},"id":@ID@}"""))
    val client = new OgmiosChainSync(t, batchSize = 3)
    val (point, tip) = client.findIntersection(
      Seq(ChainPoints.Presets("last_byron"), ChainPoints.Origin))
    assert(point === Some(ChainPoints.ChainPoint(4492799L, "f808")))
    assert(tip === ChainPoints.ChainPoint(1000000L, "tt"))
    assert(t.sent.head.contains(""""method":"findIntersection""""))
    assert(t.sent.head.contains(""""slot":4492799"""))
    assert(t.sent.head.contains(""""origin"""))
  }

  test("sync pipelines batchSize requests before the first read and handles rollback") {
    val t = new Scripted(Seq(
      fwd(10), fwd(20), bwd(5), fwd(15), fwd(30), fwd(40)))
    val client = new OgmiosChainSync(t, batchSize = 3)
    val events = mutable.Buffer.empty[ChainEvent]
    val n = client.sync(stopSlot = 30L, events += _)
    assert(n === 5) // the drained 6th response is not emitted
    assert(events.collect { case RollForward(_, s, _) => s } === Seq(10L, 20L, 15L, 30L))
    assert(events.collect { case RollBackward(p) => p.slot } === Seq(5L))
    // the whole first batch is in flight before any response is read
    assert(t.ops.take(4) === Seq("S", "S", "S", "R"))
    // batches alternate: 3 sends, 3 receives, 3 sends, then the reads
    assert(t.ops === Seq("S", "S", "S", "R", "R", "R", "S", "S", "S", "R", "R", "R"))
    assert(t.sent.tail.forall(_.contains(""""method":"nextBlock"""")))
  }

  test("NdjsonSink writes the landing-file line convention the pipeline consumes") {
    val f = Files.createTempFile("graft-landing", ".ndjson")
    val sink = new NdjsonSink(f.toString)
    sink(RollForward("""{"slot":10,"id":"b10","transactions":[]}""", 10L, 1000L))
    sink(RollBackward(ChainPoints.ChainPoint(5L, "p5")))
    sink(RollForward("""{"slot":12,"id":"b12","transactions":[]}""", 12L, 1000L))
    sink.close()
    val lines = Files.readAllLines(f)
    assert(lines.size() === 3)
    assert(lines.get(0) === """{"slot":10,"id":"b10","transactions":[]}""")
    assert(lines.get(1) === """{"rollback":{"slot":5}}""")
    assert(lines.get(2) === """{"slot":12,"id":"b12","transactions":[]}""")
  }

  test("frame codec: masked/unmasked roundtrip across length-encoding boundaries") {
    for (len <- Seq(0, 1, 125, 126, 65535, 65536, 70000); mask <- Seq(true, false)) {
      val payload = Array.tabulate[Byte](len)(i => (i % 251).toByte)
      val bytes = WebSocketTransport.encodeFrame(WebSocketTransport.OpText, payload, mask)
      val (op, got) = WebSocketTransport.readFrame(
        new DataInputStream(new ByteArrayInputStream(bytes)))
      assert(op === WebSocketTransport.OpText, s"len=$len mask=$mask")
      assert(got.toSeq === payload.toSeq, s"len=$len mask=$mask")
    }
  }

  test("frame codec: control frames pass through; accept key matches RFC 6455 vector") {
    val ping = WebSocketTransport.encodeFrame(
      WebSocketTransport.OpPing, "hi".getBytes(StandardCharsets.UTF_8), mask = false)
    val (op, payload) = WebSocketTransport.readFrame(
      new DataInputStream(new ByteArrayInputStream(ping)))
    assert(op === WebSocketTransport.OpPing)
    assert(new String(payload, StandardCharsets.UTF_8) === "hi")
    // RFC 6455 §1.3 handshake example
    assert(WebSocketTransport.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ===
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }
}
