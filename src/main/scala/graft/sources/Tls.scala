package graft.sources

import java.io.File
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket, SSLSocket, TrustManagerFactory}

/** TLS layer for the live tick source's `wss` transport — the reference feed
  * is `wss://stream...` (reference `main.py:30-35`), i.e. RFC-6455 framing
  * over TLS. `WebSocketIO` is stream-level, so the whole upgrade is: hand it
  * an [[SSLSocket]]'s streams instead of a plaintext socket's. JDK-only
  * (JSSE), no dependencies.
  *
  * Verification posture: endpoint identification (hostname-vs-SAN, the
  * HTTPS rules) is ALWAYS on for clients — a feed client that skips it is
  * MITM-able, and the spec proves the strict path works against a SAN-bearing
  * certificate rather than punching an "insecure" escape hatch. Trust comes
  * from either the JVM's default trust anchors (real exchange endpoints) or
  * an explicit `trustStore` option (private/self-signed deployments, and the
  * in-container spec).
  */
object Tls {

  /** Client SSLContext: default JVM trust anchors, or the given
    * keystore file (type auto-detected: PKCS12/JKS) as the only anchors.
    */
  def clientContext(trustStore: Option[String], password: String): SSLContext =
    trustStore match {
      case None => SSLContext.getDefault
      case Some(path) =>
        val ks = KeyStore.getInstance(new File(path), password.toCharArray)
        val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ks)
        val ctx = SSLContext.getInstance("TLS")
        ctx.init(null, tmf.getTrustManagers, null)
        ctx
    }

  /** Connect + handshake a verified TLS client socket. Endpoint
    * identification runs under HTTPS rules (SAN match against `host`), so a
    * certificate for a different host — or an untrusted chain — fails here,
    * before any application byte moves.
    */
  def clientSocket(host: String, port: Int, trustStore: Option[String],
      password: String): SSLSocket = {
    val s = clientContext(trustStore, password).getSocketFactory
      .createSocket(host, port).asInstanceOf[SSLSocket]
    val p = s.getSSLParameters
    p.setEndpointIdentificationAlgorithm("HTTPS")
    s.setSSLParameters(p)
    s.startHandshake()
    s
  }

  /** Server socket bound on loopback from a keystore holding the server's
    * key + certificate (test/standalone-feed side; the engine itself is a
    * client). Unbound-then-bind so callers control the port.
    */
  def serverSocket(keyStore: String, password: String, port: Int): SSLServerSocket = {
    val ks = KeyStore.getInstance(new File(keyStore), password.toCharArray)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    val s = ctx.getServerSocketFactory.createServerSocket()
      .asInstanceOf[SSLServerSocket]
    s.setReuseAddress(true)
    s.bind(new java.net.InetSocketAddress(
      java.net.InetAddress.getLoopbackAddress, port), 8)
    s
  }
}
