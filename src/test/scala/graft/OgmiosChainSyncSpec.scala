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

  test("loopback socket: handshake, echo, fragmentation with interleaved ping, close") {
    import java.io.{DataInputStream => DIS, DataOutputStream => DOS}
    import WebSocketTransport._
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    @volatile var serverErr: Throwable = null
    val gotPong = new java.util.concurrent.CountDownLatch(1)
    val gotClose = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DIS(s.getInputStream)
        val out = new DOS(s.getOutputStream)
        // --- HTTP upgrade: read request, answer 101 with the accept key
        val req = new StringBuilder
        while (!req.endsWith("\r\n\r\n")) req.append(in.readByte().toChar)
        val key = req.toString.linesIterator
          .find(_.toLowerCase.startsWith("sec-websocket-key:"))
          .map(l => l.substring(l.indexOf(':') + 1).trim).get
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n\r\n")
          .getBytes(StandardCharsets.UTF_8))
        out.flush()
        // --- echo the client's (masked) text frame
        val (fin1, op1, p1) = readRawFrame(in)
        assert(fin1 && op1 == OpText)
        out.write(encodeFrame(OpText, p1, mask = false)); out.flush()
        // --- fragmented message with a ping interjected between the
        // fragments (RFC 6455 §5.4/§5.5) — the Ogmios big-block case
        out.write(encodeRawFrame(fin = false, OpText,
          "big ".getBytes(StandardCharsets.UTF_8), mask = false))
        out.flush()
        out.write(encodeFrame(OpPing, "k33p".getBytes(StandardCharsets.UTF_8),
          mask = false))
        out.flush()
        out.write(encodeRawFrame(fin = false, OpCont,
          "block ".getBytes(StandardCharsets.UTF_8), mask = false))
        out.flush()
        out.write(encodeRawFrame(fin = true, OpCont,
          "payload".getBytes(StandardCharsets.UTF_8), mask = false))
        out.flush()
        // client must answer the ping with a pong carrying its payload
        val (finP, opP, pP) = readRawFrame(in)
        assert(finP && opP == OpPong &&
          new String(pP, StandardCharsets.UTF_8) == "k33p")
        gotPong.countDown()
        // --- close handshake initiated by the client
        val (_, opC, _) = readRawFrame(in)
        assert(opC == OpClose)
        out.write(encodeFrame(OpClose, Array.emptyByteArray, mask = false))
        out.flush()
        gotClose.countDown()
        s.close()
      } catch { case e: Throwable => serverErr = e }
    })
    t.start()
    try {
      val ws = new WebSocketTransport("127.0.0.1", server.getLocalPort)
      ws.send("ping me back")
      assert(ws.receive() === "ping me back")
      // the interleaved ping must not corrupt or drop the fragments
      assert(ws.receive() === "big block payload")
      assert(gotPong.await(5, java.util.concurrent.TimeUnit.SECONDS))
      ws.close()
      assert(gotClose.await(5, java.util.concurrent.TimeUnit.SECONDS))
      t.join(5000)
      assert(serverErr == null, s"server thread failed: $serverErr")
    } finally server.close()
  }

  test("NdjsonSink propagates write failures instead of swallowing them") {
    val dir = Files.createTempDirectory("graft-sink")
    val f = dir.resolve("x.ndjson")
    val sink = new NdjsonSink(f.toString)
    sink(RollForward("""{"slot":1}""", 1L, 10L))
    sink.close()
    // writes after close must fail loudly (PrintWriter would have
    // silently set an internal flag instead)
    intercept[java.io.IOException] {
      sink(RollForward("""{"slot":2}""", 2L, 10L))
      sink.close()
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
