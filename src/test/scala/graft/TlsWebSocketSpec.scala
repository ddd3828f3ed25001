package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tls
import graft.tools.TickSocketServer

/** `transport=wss` — the reference's ACTUAL scheme (`main.py:30-35` connects
  * to a `wss://` endpoint): RFC-6455 framing over verified TLS. The cert
  * material is generated in-test with `keytool` (self-signed, SAN =
  * IP:127.0.0.1), so the STRICT client path — chain validation + HTTPS
  * hostname rules, no insecure escape hatch — runs end to end with zero
  * egress. Three pins:
  *   1. a client without the right trust anchors is REFUSED at handshake
  *      (proves verification is actually on);
  *   2. the trusted client streams ticks over wss;
  *   3. kill/restart recovery (the TickSocketSpec contract) holds over wss —
  *      reconnects re-handshake TLS every time.
  */
class TlsWebSocketSpec extends AnyFunSuite {
  import TestSpark._

  private val storePass = "tickstore"

  /** keystore (server key+cert) and truststore (cert only) for SAN=127.0.0.1. */
  private lazy val (keyStore, trustStore): (String, String) = {
    val dir = tmpDir("tickcert")
    val ks = s"$dir/server.p12"
    val cert = s"$dir/server.crt"
    val ts = s"$dir/trust.p12"
    def run(args: String*): Unit = {
      val p = new ProcessBuilder((Seq("keytool") ++ args): _*)
        .redirectErrorStream(true).start()
      val outTxt = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"keytool ${args.head} failed:\n$outTxt")
    }
    run("-genkeypair", "-alias", "tick", "-keyalg", "EC", "-groupname", "secp256r1",
      "-dname", "CN=tickfeed", "-ext", "SAN=IP:127.0.0.1,DNS:localhost",
      "-validity", "2", "-storetype", "PKCS12",
      "-keystore", ks, "-storepass", storePass)
    run("-exportcert", "-alias", "tick", "-keystore", ks, "-storepass", storePass,
      "-file", cert)
    run("-importcert", "-alias", "tick", "-file", cert, "-noprompt",
      "-storetype", "PKCS12", "-keystore", ts, "-storepass", storePass)
    (ks, ts)
  }

  test("untrusting client is refused at the TLS handshake (verification is on)") {
    val server = new TickSocketServer(ws = true,
      tlsKeyStore = Some((keyStore, storePass))).start()
    try {
      // default JVM anchors do not contain our self-signed cert → must throw
      // during startHandshake, before any WS byte moves. Under full-suite
      // host load the JSSE failure can surface as a different SSLException
      // subtype (e.g. a wrapped socket error mid-handshake) — any
      // SSLException before the first WS byte is the refusal we require.
      intercept[javax.net.ssl.SSLException] {
        Tls.clientSocket("127.0.0.1", server.port, None, storePass)
      }
      // sanity: the same endpoint IS reachable with the right anchors
      val ok = Tls.clientSocket("127.0.0.1", server.port, Some(trustStore), storePass)
      ok.close()
    } finally server.close()
  }

  private def sinkCount(out: String): Long =
    try spark.read.parquet(out).count()
    catch { case _: Throwable => 0L }

  private def runUntil(port: Int, out: String, ck: String, minRows: Long): Unit = {
    val stream = spark.readStream.format("graft.sources.TickSocketProvider")
      .option("port", port.toString)
      .option("transport", "wss")
      .option("trustStore", trustStore)
      .option("trustStorePassword", storePass)
      .option("maxPerTrigger", "500")
      .option("numPartitions", "4")
      .load()
    val q = stream.writeStream
      .trigger(Trigger.ProcessingTime(50))
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch=$id")
      }
      .start()
    try {
      // 240 s: the nominal rate (500 rows / 50 ms trigger) crosses minRows in
      // seconds, but full-suite runs on the shared host have shown >120 s
      // stalls under CPU-starvation spikes; the deadline only bounds a hang
      val deadline = System.currentTimeMillis() + 240000
      while (sinkCount(out) < minRows && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        q.exception.foreach(throw _)
      }
      assert(sinkCount(out) >= minRows, s"sink never reached $minRows rows")
    } finally q.stop()
  }

  test("WSS transport: kill mid-stream + restart from checkpoint = no dup, no loss") {
    val base = tmpDir("tickwss")
    val (out, ck) = (s"$base/out", s"$base/ck")

    val s1 = new TickSocketServer(ws = true,
      tlsKeyStore = Some((keyStore, storePass))).start()
    try runUntil(s1.port, out, ck, minRows = 1200) finally s1.close()

    val s2 = new TickSocketServer(ws = true,
      tlsKeyStore = Some((keyStore, storePass))).start()
    try {
      runUntil(s2.port, out, ck, minRows = 3000)
      assert(s2.lastResume > 0, "restarted WSS source did not resume mid-stream")
    } finally s2.close()

    val got = spark.read.parquet(out)
    val stats = got.agg(
      count(lit(1)).as("n"),
      countDistinct(col("tradeId")).as("nd"),
      min(col("tradeId")).as("lo"),
      max(col("tradeId")).as("hi")).collect().head
    val (n, nd, lo, hi) = (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    assert(n == nd, s"duplicates after WSS restart: $n rows, $nd distinct")
    assert(lo == 0L && hi == n - 1, s"gap/offset in WSS-recovered stream: lo=$lo hi=$hi n=$n")
    assert(n >= 3000)
  }
}
