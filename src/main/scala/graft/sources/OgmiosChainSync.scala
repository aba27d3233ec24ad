package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper

import graft.ingest.ChainPoints.ChainPoint

/** Ogmios chain-sync client — the `ws://` transport seam for the S9
  * block source (/root/reference/ogmios_parquet.py:635-651 connects and
  * resolves the intersection; :671-675 pipelines `batch_size` nextBlock
  * requests before reading responses — the latency-hiding trick this
  * client reproduces).
  *
  * The protocol layer ([[OgmiosChainSync]]) is pure request/response
  * logic over an abstract [[MessageTransport]], so it unit-tests
  * against a scripted transcript with no network; the real RFC 6455
  * WebSocket client ([[WebSocketTransport]]) plugs into the same seam
  * for live deployments (untestable in this sandbox — no egress).
  * Events feed the existing surfaces: [[NdjsonSink]] writes the same
  * one-JSON-per-line landing files `BlockJsonSource` scans and
  * `StreamIngest.start` tails, including the `{"rollback":{"slot":N}}`
  * convention for roll-backward events.
  */
object OgmiosChainSync {

  /** One chain-sync response (ogmios_parquet.py:676-687's
    * direction=forward/backward branches).
    */
  sealed trait ChainEvent
  final case class RollForward(blockJson: String, slot: Long, tipSlot: Long)
      extends ChainEvent
  final case class RollBackward(point: ChainPoint) extends ChainEvent

  /** Minimal message transport: ordered, blocking, one text message per
    * call — the WebSocket contract chain-sync needs, and nothing more.
    */
  trait MessageTransport extends AutoCloseable {
    def send(msg: String): Unit
    def receive(): String
  }
}

final class OgmiosChainSync(transport: OgmiosChainSync.MessageTransport,
    batchSize: Int = 100) {
  import OgmiosChainSync._

  private val mapper = new ObjectMapper()
  private var nextId = 0L

  private def request(method: String, params: String): Long = {
    val id = nextId
    nextId += 1
    val p = if (params.isEmpty) "" else s""","params":$params"""
    transport.send(
      s"""{"jsonrpc":"2.0","method":"$method"$p,"id":$id}""")
    id
  }

  private def pointJson(p: ChainPoint): String =
    if (p == graft.ingest.ChainPoints.Origin) "\"origin\""
    else s"""{"slot":${p.slot},"id":"${p.id}"}"""

  private def parsePoint(node: com.fasterxml.jackson.databind.JsonNode): ChainPoint =
    if (node == null || node.isNull) graft.ingest.ChainPoints.Origin
    else if (node.isTextual) graft.ingest.ChainPoints.Origin // "origin"
    else ChainPoint(node.path("slot").asLong(),
      node.path("id").asText(""))

  /** Resolve the sync cursor (ogmios find_intersection): returns the
    * intersection point (None = origin miss) and the current tip.
    */
  def findIntersection(points: Seq[ChainPoint]): (Option[ChainPoint], ChainPoint) = {
    val id = request("findIntersection",
      s"""{"points":[${points.map(pointJson).mkString(",")}]}""")
    val resp = mapper.readTree(transport.receive())
    require(resp.path("id").asLong(-1) == id,
      s"findIntersection response id ${resp.path("id")} != $id")
    val res = resp.path("result")
    val inter = res.path("intersection")
    val tip = parsePoint(res.path("tip"))
    (if (inter.isMissingNode || inter.isNull) None else Some(parsePoint(inter)),
      tip)
  }

  /** Pipelined chain-sync loop: keep `batchSize` nextBlock requests in
    * flight (send the whole batch, then drain the responses —
    * ogmios_parquet.py:671-675), emitting one [[ChainEvent]] per
    * response, until a forward block reaches `stopSlot` or the tip.
    * Returns the number of events emitted.
    */
  def sync(stopSlot: Long, sink: ChainEvent => Unit): Long = {
    var emitted = 0L
    var done = false
    while (!done) {
      val ids = (1 to batchSize).map(_ => request("nextBlock", ""))
      val it = ids.iterator
      while (it.hasNext && !done) {
        val id = it.next()
        val resp = mapper.readTree(transport.receive())
        require(resp.path("id").asLong(-1) == id,
          s"nextBlock response id ${resp.path("id")} != $id")
        val res = resp.path("result")
        res.path("direction").asText() match {
          case "forward" =>
            val block = res.path("block")
            val slot = block.path("slot").asLong(0L)
            val tipSlot = res.path("tip").path("slot").asLong(Long.MaxValue)
            sink(RollForward(mapper.writeValueAsString(block), slot, tipSlot))
            emitted += 1
            if (slot >= stopSlot || slot >= tipSlot) done = true
          case "backward" =>
            sink(RollBackward(parsePoint(res.path("point"))))
            emitted += 1
          case other =>
            throw new IllegalStateException(s"unknown direction '$other'")
        }
      }
      // drain the remaining in-flight responses of the final batch so
      // the connection closes cleanly (the reference just disconnects;
      // draining keeps the transport reusable)
      while (it.hasNext) { transport.receive(); it.next() }
    }
    emitted
  }
}

/** Writes chain events as the one-JSON-per-line landing format the rest
  * of the pipeline already consumes: forward blocks verbatim (the
  * `BlockJsonSource` line shape), roll-backwards as
  * `{"rollback":{"slot":N}}` (the `StreamIngest` truncation message).
  */
final class NdjsonSink(path: String) extends AutoCloseable {
  // a raw BufferedWriter, NOT PrintWriter: PrintWriter swallows
  // IOExceptions (println/close never throw), so a disk-full landing
  // file would be silently truncated and the downstream readers would
  // consume an incomplete chain with no failure signal
  private val out = java.nio.file.Files.newBufferedWriter(
    java.nio.file.Paths.get(path), StandardCharsets.UTF_8)
  private def line(s: String): Unit = { out.write(s); out.write('\n') }
  def apply(e: OgmiosChainSync.ChainEvent): Unit = e match {
    case OgmiosChainSync.RollForward(json, _, _) => line(json)
    case OgmiosChainSync.RollBackward(p) =>
      line(s"""{"rollback":{"slot":${p.slot}}}""")
  }
  override def close(): Unit = out.close()
}

/** Blocking RFC 6455 client over a plain socket: HTTP/1.1 upgrade
  * handshake, masked client text frames, ping→pong, close handshake.
  * Only what chain-sync needs — no fragmentation on send, no
  * extensions, no TLS (Ogmios deployments front TLS with a proxy; the
  * reference's `ogmios.Client` is plain ws:// too).
  *
  * The frame codec lives on the companion so it is unit-testable
  * without a socket; the live path is exercised only in deployments
  * with network access.
  */
final class WebSocketTransport(host: String, port: Int, path: String = "/")
    extends OgmiosChainSync.MessageTransport {
  import WebSocketTransport._

  private val socket = new Socket(host, port)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)
  handshake()

  private def handshake(): Unit = {
    val keyBytes = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(keyBytes)
    val key = Base64.getEncoder.encodeToString(keyBytes)
    val req = s"GET $path HTTP/1.1\r\nHost: $host:$port\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n"
    out.write(req.getBytes(StandardCharsets.UTF_8))
    out.flush()
    val sb = new StringBuilder
    while (!sb.endsWith("\r\n\r\n")) sb.append(in.readByte().toChar)
    val resp = sb.toString()
    require(resp.startsWith("HTTP/1.1 101"), s"upgrade refused: ${resp.linesIterator.next()}")
    val expect = acceptKey(key)
    require(resp.linesIterator.exists(l =>
      l.toLowerCase.startsWith("sec-websocket-accept:") &&
        l.substring(l.indexOf(':') + 1).trim == expect),
      "Sec-WebSocket-Accept mismatch")
  }

  override def send(msg: String): Unit = {
    out.write(encodeFrame(OpText, msg.getBytes(StandardCharsets.UTF_8), mask = true))
    out.flush()
  }

  /** Assemble one complete data message. The fragment accumulator lives
    * in this loop, so control frames interleaved between continuation
    * fragments (RFC 6455 §5.4/§5.5 explicitly permits them — and large
    * Ogmios block responses are exactly the messages likely to fragment)
    * are answered with ONLY their own payload while reassembly resumes
    * with the buffered fragments intact.
    */
  override def receive(): String = {
    var dataOp = -1 // opcode of the in-flight fragmented message, if any
    val acc = mutable.ArrayBuffer.empty[Byte]
    while (true) {
      val (fin, op, payload) = readRawFrame(in)
      op match {
        case OpText | OpBinary | OpCont =>
          if (op == OpCont)
            require(dataOp >= 0, "continuation frame with no message in flight")
          else {
            require(dataOp < 0, "new data frame inside a fragmented message")
            dataOp = op
          }
          acc ++= payload
          if (fin) return new String(acc.toArray, StandardCharsets.UTF_8)
        case OpPing =>
          out.write(encodeFrame(OpPong, payload, mask = true)); out.flush()
        case OpPong => () // unsolicited — ignore
        case OpClose =>
          out.write(encodeFrame(OpClose, payload, mask = true)); out.flush()
          throw new java.io.EOFException("websocket closed by peer")
        case other => throw new IllegalStateException(s"unexpected opcode $other")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def close(): Unit = {
    try { out.write(encodeFrame(OpClose, Array.emptyByteArray, mask = true)); out.flush() }
    catch { case _: Throwable => () }
    socket.close()
  }
}

object WebSocketTransport {
  val OpCont = 0x0
  val OpText = 0x1
  val OpBinary = 0x2
  val OpClose = 0x8
  val OpPing = 0x9
  val OpPong = 0xa

  private[graft] def acceptKey(key: String): String =
    Base64.getEncoder.encodeToString(MessageDigest.getInstance("SHA-1")
      .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
        .getBytes(StandardCharsets.UTF_8)))

  /** One unfragmented frame (FIN set). Client frames MUST mask. */
  private[graft] def encodeFrame(op: Int, payload: Array[Byte],
      mask: Boolean): Array[Byte] =
    encodeRawFrame(fin = true, op, payload, mask)

  /** One frame with explicit FIN — lets tests build fragmented
    * messages (FIN=0 first fragment, OpCont continuations).
    */
  private[graft] def encodeRawFrame(fin: Boolean, op: Int,
      payload: Array[Byte], mask: Boolean): Array[Byte] = {
    val buf = mutable.ArrayBuffer.empty[Byte]
    buf += ((if (fin) 0x80 else 0x00) | op).toByte
    val maskBit = if (mask) 0x80 else 0x00
    val n = payload.length
    if (n <= 125) buf += (maskBit | n).toByte
    else if (n <= 0xffff) {
      buf += (maskBit | 126).toByte
      buf += ((n >> 8) & 0xff).toByte += (n & 0xff).toByte
    } else {
      buf += (maskBit | 127).toByte
      (7 to 0 by -1).foreach(i => buf += ((n.toLong >> (8 * i)) & 0xff).toByte)
    }
    if (mask) {
      val key = new Array[Byte](4)
      new java.security.SecureRandom().nextBytes(key)
      buf ++= key
      payload.indices.foreach(i => buf += (payload(i) ^ key(i % 4)).toByte)
    } else buf ++= payload
    buf.toArray
  }

  /** Read exactly ONE frame (no reassembly): (FIN, opcode, unmasked
    * payload). Message-level reassembly belongs to the caller
    * ([[WebSocketTransport.receive]]) so control frames interjected
    * between fragments (RFC 6455 §5.4) never touch the data buffer.
    */
  private[graft] def readRawFrame(in: DataInputStream): (Boolean, Int, Array[Byte]) = {
    val b0 = in.readUnsignedByte()
    val fin = (b0 & 0x80) != 0
    val op = b0 & 0x0f
    // control frames MUST NOT be fragmented (RFC 6455 §5.5)
    require(op < 0x8 || fin, s"fragmented control frame $op")
    val b1 = in.readUnsignedByte()
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) len = in.readUnsignedShort().toLong
    else if (len == 127) len = in.readLong()
    require(len <= Int.MaxValue, s"frame too large: $len")
    val key = if (masked) {
      val k = new Array[Byte](4); in.readFully(k); k
    } else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) payload.indices.foreach(i =>
      payload(i) = (payload(i) ^ key(i % 4)).toByte)
    (fin, op, payload)
  }

  /** One complete unfragmented unit — kept for codec roundtrip tests;
    * the transport reads [[readRawFrame]] directly.
    */
  private[graft] def readFrame(in: DataInputStream): (Int, Array[Byte]) = {
    val (fin, op, payload) = readRawFrame(in)
    require(fin, "readFrame expects an unfragmented frame")
    (op, payload)
  }
}
