package graft.tools

/** Loopback tick-feed server speaking `sources.TickSocketProvider`'s RESUME
  * protocol: each client connects, sends `RESUME <seq>\n`, and receives the
  * deterministic tick stream (sources.TickGen formula — the same rows every
  * other generator in the repo emits) as reference-framed TSV lines
  * (`main.py:61-67` field order) starting at that sequence number.
  *
  * This is the egress-free twin of the reference's exchange WebSocket
  * (`main.py:30-35`): sequence-addressed replay is exactly what trade ids
  * give a real consumer. Used by TickSocketSpec to prove kill/restart
  * recovery; also runnable as a manual demo endpoint.
  */
final class TickSocketServer(
    startMs: Long = 1710000000000L,
    msPerTick: Long = 10L,
    throttleEveryN: Int = 500,
    throttleMs: Long = 1L,
    fixedPort: Int = 0,
    ws: Boolean = false,
    // (keystorePath, password): serve `wss` — WS framing over TLS. The
    // TLS handshake happens lazily on the accepted SSLSocket's first IO,
    // inside the per-connection thread, so a failed handshake (untrusting
    // client) never wedges the acceptor.
    tlsKeyStore: Option[(String, String)] = None) extends AutoCloseable {

  private val server = tlsKeyStore match {
    case Some((path, password)) => graft.sources.Tls.serverSocket(path, password, fixedPort)
    case None =>
      val s = new java.net.ServerSocket()
      s.setReuseAddress(true) // restart-on-same-port (upstream-failure specs)
      s.bind(new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, fixedPort), 8)
      s
  }
  @volatile private var closed = false
  /** Last RESUME sequence any client requested (observability for specs). */
  @volatile var lastResume: Long = -1L

  def port: Int = server.getLocalPort

  private def tsv(i: Long): String = {
    val (bid, sym, price, qty, t, maker) = graft.sources.TickGen.at(i, startMs, msPerTick)
    s"$bid\t$sym\t$price\t$qty\t$t\t${if (maker) "1" else "0"}"
  }

  private val acceptor = new Thread(() => {
    while (!closed) {
      try {
        val conn = server.accept()
        val t = new Thread(() => {
          try {
            if (ws) {
              // RFC-6455 mode: HTTP upgrade, masked RESUME text message in,
              // one unmasked text frame per tick out — the reference
              // transport (main.py:30-35) end to end (with tlsKeyStore set
              // this is full `wss`: the streams below are TLS streams)
              val rawIn = conn.getInputStream
              val rawOut = new java.io.BufferedOutputStream(conn.getOutputStream)
              graft.sources.WebSocketIO.serverHandshake(rawIn, rawOut)
              val req = graft.sources.WebSocketIO.readText(rawIn, rawOut).orNull
              var seq = if (req != null && req.startsWith("RESUME "))
                req.substring("RESUME ".length).trim.toLong else 0L
              lastResume = seq
              while (!closed) {
                graft.sources.WebSocketIO.writeText(rawOut, tsv(seq))
                seq += 1
                if (throttleEveryN > 0 && seq % throttleEveryN == 0) {
                  rawOut.flush()
                  Thread.sleep(throttleMs)
                }
              }
            } else {
              val in = new java.io.BufferedReader(new java.io.InputStreamReader(
                conn.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
              val out = new java.io.PrintWriter(new java.io.BufferedWriter(
                new java.io.OutputStreamWriter(conn.getOutputStream,
                  java.nio.charset.StandardCharsets.UTF_8)), false)
              val req = in.readLine()
              var seq = if (req != null && req.startsWith("RESUME "))
                req.substring("RESUME ".length).trim.toLong else 0L
              lastResume = seq
              while (!closed && !out.checkError()) {
                out.println(tsv(seq))
                seq += 1
                if (throttleEveryN > 0 && seq % throttleEveryN == 0) {
                  out.flush()
                  Thread.sleep(throttleMs)
                }
              }
            }
          } catch {
            case _: java.io.IOException | _: InterruptedException => // client gone
          } finally conn.close()
        }, s"ticksocket-server-conn-${conn.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: java.io.IOException => // server closed
      }
    }
  }, "ticksocket-server-accept")

  def start(): TickSocketServer = { acceptor.setDaemon(true); acceptor.start(); this }

  override def close(): Unit = { closed = true; server.close() }
}
