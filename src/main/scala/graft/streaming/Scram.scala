package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.{Mac, SecretKeyFactory}

/** SCRAM-SHA-256 primitives (RFC 5802 mechanics, RFC 7677 parameters) —
  * the salted-challenge SASL mechanism that never puts the password on
  * the wire and authenticates BOTH peers (the client proves possession
  * of ClientKey, the server proves possession of ServerKey). Pure
  * JDK crypto: PBKDF2WithHmacSHA256 + HmacSHA256 + SHA-256.
  *
  * The reference stack stops at SASL PLAIN/ANONYMOUS
  * (AMQPReceiver.scala:70-78 in /root/reference); this module is the
  * hardening layer beyond parity. Message grammar (RFC 5802 §7):
  *   client-first: "n,," gs2 header + "n=<user>,r=<cnonce>"
  *   server-first: "r=<cnonce><snonce>,s=<b64 salt>,i=<iterations>"
  *   client-final: "c=biws,r=<nonces>,p=<b64 proof>"
  *   server-final: "v=<b64 server signature>"
  * The whole exchange is verified against RFC 7677's published test
  * vector in Amqp10Spec.
  */
object Scram {

  val Mechanism = "SCRAM-SHA-256"
  val Iterations = 4096

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data)
  }

  private def h(data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(data)

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** Hi(password, salt, i): PBKDF2-HMAC-SHA256, 32-byte output. */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def clientKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Client Key".getBytes(UTF_8))
  def storedKey(clientKey: Array[Byte]): Array[Byte] = h(clientKey)
  def serverKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Server Key".getBytes(UTF_8))

  /** RFC 5802 §5.1 saslname escaping: '=' → "=3D", ',' → "=2C". */
  def saslName(user: String): String =
    user.replace("=", "=3D").replace(",", "=2C")

  def clientFirstBare(user: String, cnonce: String): String =
    s"n=${saslName(user)},r=$cnonce"

  /** gs2 header for no-channel-binding ("n,,"); "biws" is its base64. */
  val Gs2Header = "n,,"
  val Gs2B64 = Base64.getEncoder.encodeToString(Gs2Header.getBytes(UTF_8)) // "biws"

  def clientFirst(user: String, cnonce: String): String =
    Gs2Header + clientFirstBare(user, cnonce)

  def serverFirst(combinedNonce: String, salt: Array[Byte], iterations: Int): String =
    s"r=$combinedNonce,s=${Base64.getEncoder.encodeToString(salt)},i=$iterations"

  def clientFinalWithoutProof(combinedNonce: String): String =
    s"c=$Gs2B64,r=$combinedNonce"

  def authMessage(clientFirstBare: String, serverFirst: String,
      clientFinalWithoutProof: String): String =
    s"$clientFirstBare,$serverFirst,$clientFinalWithoutProof"

  /** ClientProof = ClientKey XOR HMAC(StoredKey, AuthMessage). */
  def clientProof(salted: Array[Byte], authMsg: String): Array[Byte] = {
    val ck = clientKey(salted)
    xor(ck, hmac(storedKey(ck), authMsg.getBytes(UTF_8)))
  }

  /** ServerSignature = HMAC(ServerKey, AuthMessage). */
  def serverSignature(salted: Array[Byte], authMsg: String): Array[Byte] =
    hmac(serverKey(salted), authMsg.getBytes(UTF_8))

  /** Server-side proof check WITHOUT learning the password: recover
    * ClientKey' = proof XOR ClientSignature and compare H(ClientKey')
    * to StoredKey (RFC 5802 §3). Constant-time compare. */
  def verifyClientProof(stored: Array[Byte], authMsg: String,
      proof: Array[Byte]): Boolean = {
    val sig = hmac(stored, authMsg.getBytes(UTF_8))
    val recovered = h(xor(proof, sig))
    java.security.MessageDigest.isEqual(recovered, stored)
  }

  /** Parse "k1=v1,k2=v2,…" attribute lists (values may contain '='
    * past the first, e.g. base64 padding). */
  def parseAttrs(msg: String): Map[String, String] =
    msg.split(",").iterator.filter(_.length >= 2).map { kv =>
      kv.charAt(0).toString -> kv.drop(2)
    }.toMap

  def b64(bytes: Array[Byte]): String = Base64.getEncoder.encodeToString(bytes)
  def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** Printable nonce (RFC 5802: printable chars except ','). */
  def freshNonce(): String = {
    val rnd = new java.security.SecureRandom()
    val bytes = new Array[Byte](18)
    rnd.nextBytes(bytes)
    Base64.getEncoder.encodeToString(bytes)
  }
}
