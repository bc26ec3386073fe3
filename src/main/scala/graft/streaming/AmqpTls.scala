package graft.streaming

import java.io.FileInputStream
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS plumbing for the `amqps://` transport — the AMQP 1.0 framing of
  * `amqp10://` carried inside a TLS session (AMQP spec §5.2's
  * "pure TLS" profile: the whole connection, header included, is
  * wrapped; no STARTTLS upgrade). Hardening beyond the reference,
  * which is plaintext-only through Vert.x Proton defaults
  * (AMQPReceiver.scala:70-78 in /root/reference configures only SASL).
  *
  * Key material is standard JSSE: a keystore (PKCS12/JKS) holding the
  * server identity, a truststore holding the peer certificates a
  * client accepts. Client endpoints resolve trust from the
  * `graft.amqps.truststore` / `graft.amqps.truststorePassword` system
  * properties (set once per JVM — executors inherit spark-submit's
  * `--conf spark.executor.extraJavaOptions`), falling back to the
  * JVM's default trust anchors for CA-signed brokers.
  */
object AmqpTls {

  /** Server-side context from a keystore holding the identity key. */
  def serverContext(keystorePath: String, password: String): SSLContext = {
    val ks = load(keystorePath, password)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client-side context trusting the certificates in `truststorePath`. */
  def clientContext(truststorePath: String, password: String): SSLContext = {
    val ts = load(truststorePath, password)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ts)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Client context for `amqps://` endpoints resolved from system
    * properties; JVM default trust anchors when unset. */
  def clientFromSysProps(): SSLContext =
    sys.props.get("graft.amqps.truststore") match {
      case Some(path) =>
        clientContext(path, sys.props.getOrElse("graft.amqps.truststorePassword", ""))
      case None => SSLContext.getDefault
    }

  private def load(path: String, password: String): KeyStore = {
    val ks = KeyStore.getInstance(
      if (path.endsWith(".jks")) "JKS" else "PKCS12")
    val in = new FileInputStream(path)
    try ks.load(in, password.toCharArray) finally in.close()
    ks
  }
}
