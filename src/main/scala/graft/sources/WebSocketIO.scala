package graft.sources

import java.io.{BufferedReader, DataInputStream, EOFException, InputStream, InputStreamReader, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

/** Minimal RFC-6455 WebSocket framing — handshake + text/control frames —
  * implemented directly over streams so the tick source's LIVE transport
  * matches the reference's actual edge (`main.py:30-35` connects to a
  * WebSocket feed), with zero dependencies beyond the JDK.
  *
  * Covered (the parts a feed client needs):
  *  - opening handshake both ways: HTTP/1.1 Upgrade with
  *    Sec-WebSocket-Key → 101 + Sec-WebSocket-Accept =
  *    base64(SHA-1(key ++ RFC GUID)), verified by the client;
  *  - frame encode/decode: FIN/opcode byte, 7/16/64-bit payload lengths,
  *    client-to-server MASKING (required by the RFC; servers send
  *    unmasked), fragmented text messages reassembled across
  *    continuation frames;
  *  - control frames inside a fragmented sequence: PING answered with
  *    PONG (payload echoed) transparently inside `readText`; CLOSE
  *    answered with CLOSE and surfaced as end-of-stream (None).
  *
  * Out of scope (documented, not needed for the parity goal): TLS (wss://
  * — wrap the socket with SSLSocketFactory, framing is unchanged),
  * permessage-deflate, and subprotocol negotiation.
  */
object WebSocketIO {

  private val Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  private val OpCont = 0x0
  private val OpText = 0x1
  private val OpClose = 0x8
  private val OpPing = 0x9
  private val OpPong = 0xA

  def acceptKeyFor(secKey: String): String = {
    val sha = MessageDigest.getInstance("SHA-1")
      .digest((secKey + Guid).getBytes(UTF_8))
    Base64.getEncoder.encodeToString(sha)
  }

  // ---- handshake ---------------------------------------------------------

  /** Client side: send the Upgrade request, verify the 101 + accept key.
    * Throws on anything but a correct handshake.
    */
  def clientHandshake(in: InputStream, out: OutputStream, host: String,
      path: String = "/", rnd: java.util.Random = new java.security.SecureRandom()): Unit = {
    val keyBytes = new Array[Byte](16)
    rnd.nextBytes(keyBytes)
    val secKey = Base64.getEncoder.encodeToString(keyBytes)
    val req =
      s"GET $path HTTP/1.1\r\n" +
        s"Host: $host\r\n" +
        "Upgrade: websocket\r\n" +
        "Connection: Upgrade\r\n" +
        s"Sec-WebSocket-Key: $secKey\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n"
    out.write(req.getBytes(UTF_8))
    out.flush()
    val headers = readHttpHeaders(in)
    require(headers.headOption.exists(_.contains(" 101 ")),
      s"WebSocket upgrade refused: ${headers.headOption.getOrElse("<empty>")}")
    val accept = headerValue(headers, "sec-websocket-accept")
    require(accept.contains(acceptKeyFor(secKey)),
      s"Sec-WebSocket-Accept mismatch: got $accept")
  }

  /** Server side: read the Upgrade request, answer 101 with the computed
    * accept key. Throws if the request is not a WebSocket upgrade.
    */
  def serverHandshake(in: InputStream, out: OutputStream): Unit = {
    val headers = readHttpHeaders(in)
    require(headers.exists(_.toLowerCase.startsWith("upgrade: websocket")),
      "not a WebSocket upgrade request")
    val key = headerValue(headers, "sec-websocket-key")
      .getOrElse(throw new IllegalArgumentException("missing Sec-WebSocket-Key"))
    val resp =
      "HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\n" +
        "Connection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${acceptKeyFor(key)}\r\n\r\n"
    out.write(resp.getBytes(UTF_8))
    out.flush()
  }

  /** Bounds against a broken/hostile peer: a handshake header block or a
    * single frame larger than these is a protocol violation for a tick
    * feed, and failing fast beats buffering it into driver heap.
    */
  private val MaxHeaderBytes = 64 * 1024
  private val MaxFrameBytes = 16 * 1024 * 1024

  private def readHttpHeaders(in: InputStream): Seq[String] = {
    // header section is ISO-8859-1 per HTTP; byte-at-a-time until CRLFCRLF
    // (no BufferedReader: it would read-ahead past the header block and
    // swallow the first frames)
    val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    var last4 = 0
    var b = in.read()
    while (b != -1 && last4 != 0x0d0a0d0a) {
      buf += b.toByte
      require(buf.size <= MaxHeaderBytes, "HTTP header block exceeds 64 KiB")
      last4 = ((last4 << 8) | b) & 0xffffffff
      if (last4 != 0x0d0a0d0a) b = in.read()
    }
    new String(buf.toArray, StandardCharsets_ISO).split("\r\n").toSeq
  }
  private val StandardCharsets_ISO = java.nio.charset.StandardCharsets.ISO_8859_1

  private def headerValue(headers: Seq[String], name: String): Option[String] =
    headers.collectFirst {
      case h if h.toLowerCase.startsWith(name + ":") =>
        h.substring(name.length + 1).trim
    }

  // ---- frames ------------------------------------------------------------

  private def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte],
      mask: Boolean, rnd: java.util.Random): Unit = {
    val header = new java.io.ByteArrayOutputStream()
    header.write(0x80 | opcode) // FIN always set (we never fragment sends)
    val maskBit = if (mask) 0x80 else 0x00
    val n = payload.length
    if (n < 126) header.write(maskBit | n)
    else if (n < 65536) {
      header.write(maskBit | 126)
      header.write((n >>> 8) & 0xff); header.write(n & 0xff)
    } else {
      header.write(maskBit | 127)
      var i = 56
      while (i >= 0) { header.write(((n.toLong >>> i) & 0xff).toInt); i -= 8 }
    }
    val body =
      if (!mask) payload
      else {
        val key = new Array[Byte](4)
        rnd.nextBytes(key)
        header.write(key)
        val masked = new Array[Byte](n)
        var i = 0
        while (i < n) { masked(i) = (payload(i) ^ key(i % 4)).toByte; i += 1 }
        masked
      }
    out.synchronized {
      out.write(header.toByteArray)
      out.write(body)
      out.flush()
    }
  }

  /** Client→server text message (masked, as the RFC requires). */
  def writeMaskedText(out: OutputStream, text: String,
      rnd: java.util.Random = new java.security.SecureRandom()): Unit =
    writeFrame(out, OpText, text.getBytes(UTF_8), mask = true, rnd)

  /** Server→client text message (unmasked). */
  def writeText(out: OutputStream, text: String): Unit =
    writeFrame(out, OpText, text.getBytes(UTF_8), mask = false, null)

  /** Read one complete TEXT message, reassembling continuations, answering
    * PING with PONG on `out`, and answering CLOSE with CLOSE. Returns None
    * on CLOSE or EOF — the peer is done. `maskReplies` must be true when
    * the CALLER is the client (every client→server frame, control replies
    * included, must be masked per the RFC).
    */
  def readText(in: InputStream, out: OutputStream,
      maskReplies: Boolean = false): Option[String] = {
    val replyRnd = if (maskReplies) new java.security.SecureRandom() else null
    val din = new DataInputStream(in)
    val message = new java.io.ByteArrayOutputStream()
    var inMessage = false
    while (true) {
      val b0 = in.read()
      if (b0 == -1) return None
      val fin = (b0 & 0x80) != 0
      val opcode = b0 & 0x0f
      val b1 = din.readUnsignedByte()
      val masked = (b1 & 0x80) != 0
      val len: Long = (b1 & 0x7f) match {
        case 126 => din.readUnsignedShort().toLong
        case 127 => din.readLong()
        case n => n.toLong
      }
      require(len <= MaxFrameBytes, s"frame too large: $len (cap $MaxFrameBytes)")
      val maskKey = if (masked) {
        val k = new Array[Byte](4); din.readFully(k); k
      } else null
      val payload = new Array[Byte](len.toInt)
      din.readFully(payload)
      if (masked) {
        var i = 0
        while (i < payload.length) {
          payload(i) = (payload(i) ^ maskKey(i % 4)).toByte; i += 1
        }
      }
      opcode match {
        case OpText | OpCont =>
          require((opcode == OpText) ^ inMessage,
            if (inMessage) "new TEXT frame inside an unfinished message"
            else "CONTINUATION with no message in progress")
          message.write(payload)
          if (fin) return Some(new String(message.toByteArray, UTF_8))
          inMessage = true
        case OpPing => writeFrame(out, OpPong, payload, maskReplies, replyRnd)
        case OpPong => // unsolicited pong: ignore
        case OpClose =>
          try writeFrame(out, OpClose, Array.emptyByteArray, maskReplies, replyRnd)
          catch { case _: java.io.IOException => }
          return None
        case other => throw new EOFException(s"unsupported opcode $other")
      }
    }
    None // unreachable
  }
}
