package graft.functions

import org.apache.spark.sql.SparkSession

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import javax.crypto.{Cipher, Mac}

/** Token-exact Fernet framing (the PUBLIC spec at
  * github.com/fernet/spec): the reference encrypts PII with
  * `cryptography.fernet.Fernet` (healthcare-data-pipeline-main.py:
  * 44-50); q34 covers the AES semantics with Spark's builtin
  * `aes_encrypt`, and this module closes the remaining gap — the exact
  * token layout, so ciphertext written by this engine is consumable by
  * any Fernet implementation:
  *
  *   base64url( 0x80 ‖ ts(8,BE) ‖ IV(16) ‖ AES128-CBC/PKCS7(ct)
  *              ‖ HMAC-SHA256(signKey, preceding bytes) )
  *
  * with the 32-byte key split per spec: bytes 0–15 sign, 16–31 encrypt.
  *
  * One deliberate, documented divergence for the VERIFIED path:
  * [[deriveIv]] derives the IV from a KEYED PRF —
  * HMAC-SHA256(signKey, plaintext ‖ ts)[0..16] — instead of the spec's
  * random IV, making encrypted columns reproducible across runs/engines
  * (determinism is non-negotiable for verified queries — SURVEY.md
  * §7.3). The PRF MUST be keyed: an unkeyed digest of the plaintext
  * would publish a plaintext commitment in the clear-text IV bytes of
  * every token, letting anyone confirm plaintext guesses offline — a
  * dictionary-attack break for low-entropy PII (names, SSNs). With the
  * keyed form, nothing about the plaintext is computable without the
  * key; the remaining (documented) tradeoff is only SIV-style
  * determinism: equal (plaintext, ts) pairs yield equal tokens.
  * Interoperability is unaffected: any Fernet decrypts these tokens;
  * [[decrypt]] accepts random-IV tokens all the same.
  *
  * A plain Scala UDF, not a Catalyst expression, per SURVEY.md §7.2:
  * crypto is not a codegen hot path.
  */
object Fernet {

  private val Version: Byte = 0x80.toByte

  private def keys(keyB64: String): (Array[Byte], Array[Byte]) = {
    val k = Base64.getUrlDecoder.decode(keyB64)
    require(k.length == 32, s"Fernet key must be 32 bytes, got ${k.length}")
    (k.slice(0, 16), k.slice(16, 32))
  }

  /** Deterministic keyed IV: HMAC-SHA256(signKey, plaintext ‖ ts)
    * truncated to 16 bytes. Keyed so the IV leaks nothing about the
    * plaintext without the key (see the class doc's attack note); uses
    * the key's signing half — the IV is public framing, like the HMAC
    * tag, never key material the encryption half depends on.
    */
  def deriveIv(keyB64: String, plaintext: Array[Byte], ts: Long): Array[Byte] = {
    val (signKey, _) = keys(keyB64)
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(signKey, "HmacSHA256"))
    mac.update(plaintext)
    mac.update(ByteBuffer.allocate(8).putLong(ts).array())
    mac.doFinal().take(16)
  }

  def encrypt(keyB64: String, plaintext: Array[Byte], ts: Long,
              iv: Array[Byte]): String = {
    require(iv.length == 16, "IV must be 16 bytes")
    val (signKey, encKey) = keys(keyB64)
    val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(encKey, "AES"),
      new IvParameterSpec(iv))
    val ct = cipher.doFinal(plaintext)
    val body = ByteBuffer.allocate(1 + 8 + 16 + ct.length)
      .put(Version).putLong(ts).put(iv).put(ct).array()
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(signKey, "HmacSHA256"))
    val tag = mac.doFinal(body)
    Base64.getUrlEncoder.encodeToString(body ++ tag)
  }

  /** Decrypt + authenticate; throws on bad version, bad HMAC, or a
    * malformed token (the reference surfaces Fernet's InvalidToken the
    * same way, healthcare-data-pipeline-main.py:48-50).
    */
  def decrypt(keyB64: String, token: String): Array[Byte] = {
    val (signKey, encKey) = keys(keyB64)
    val raw = Base64.getUrlDecoder.decode(token)
    require(raw.length >= 1 + 8 + 16 + 16 + 32, "token too short")
    require(raw(0) == Version, f"bad version byte 0x${raw(0)}%02x")
    val (body, tag) = raw.splitAt(raw.length - 32)
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(signKey, "HmacSHA256"))
    require(MessageDigest.isEqual(mac.doFinal(body), tag), "HMAC mismatch")
    val iv = body.slice(9, 25)
    val ct = body.drop(25)
    val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(encKey, "AES"),
      new IvParameterSpec(iv))
    cipher.doFinal(ct)
  }

  /** Extract the embedded timestamp (for TTL policies) without
    * decrypting — spec layout bytes 1–8.
    */
  def timestamp(token: String): Long =
    ByteBuffer.wrap(Base64.getUrlDecoder.decode(token), 1, 8).getLong

  /** Session registration of `fernet_encrypt(plain, key, ts)` /
    * `fernet_decrypt(token, key)` as Spark SQL functions (deterministic
    * IV derivation → stable under retries and re-runs). Idempotent.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier("fernet_encrypt"))) {
      spark.udf.register("fernet_encrypt",
        (plain: String, key: String, ts: Long) => {
          val pb = plain.getBytes("UTF-8")
          encrypt(key, pb, ts, deriveIv(key, pb, ts))
        })
      spark.udf.register("fernet_decrypt",
        (token: String, key: String) =>
          new String(decrypt(key, token), "UTF-8"))
    }
}
