package graft.functions

import graft.SparkSpec

import java.util.Base64

/** [[Fernet]] — token layout must match the public spec byte-for-byte:
  * version 0x80, big-endian timestamp, 16-byte IV, CBC ciphertext,
  * trailing 32-byte HMAC; authentication must reject tampering.
  */
class FernetSpec extends SparkSpec {

  private val key = Base64.getUrlEncoder.encodeToString(
    (0 until 32).map(_.toByte).toArray)

  test("round-trip: decrypt(encrypt(p)) == p") {
    val p = "patient-042 é世界".getBytes("UTF-8")
    val tok = Fernet.encrypt(key, p, 1700000000L, Fernet.deriveIv(key, p, 1700000000L))
    assert(Fernet.decrypt(key, tok).toSeq === p.toSeq)
  }

  test("token layout: version byte, BE timestamp, exact length") {
    val p = "abc".getBytes("UTF-8")
    val ts = 1700000123L
    val raw = Base64.getUrlDecoder.decode(
      Fernet.encrypt(key, p, ts, Fernet.deriveIv(key, p, ts)))
    assert(raw(0) === 0x80.toByte)
    assert(Fernet.timestamp(Base64.getUrlEncoder.encodeToString(raw)) === ts)
    // 1 version + 8 ts + 16 iv + one padded CBC block + 32 hmac
    assert(raw.length === 1 + 8 + 16 + 16 + 32)
  }

  test("tampering with any region breaks authentication") {
    val p = "sensitive".getBytes("UTF-8")
    val tok = Fernet.encrypt(key, p, 1L, Fernet.deriveIv(key, p, 1L))
    val raw = Base64.getUrlDecoder.decode(tok)
    for (i <- Seq(0, 5, 12, raw.length - 40, raw.length - 1)) {
      val bad = raw.clone(); bad(i) = (bad(i) ^ 0x01).toByte
      intercept[Exception] {
        Fernet.decrypt(key, Base64.getUrlEncoder.encodeToString(bad))
      }
    }
  }

  test("wrong key fails authentication before decryption") {
    val p = "x".getBytes("UTF-8")
    val tok = Fernet.encrypt(key, p, 1L, Fernet.deriveIv(key, p, 1L))
    val other = Base64.getUrlEncoder.encodeToString(
      (100 until 132).map(_.toByte).toArray)
    val e = intercept[IllegalArgumentException](Fernet.decrypt(other, tok))
    assert(e.getMessage.contains("HMAC"))
  }

  test("deterministic IV derivation makes tokens reproducible") {
    val p = "same plaintext".getBytes("UTF-8")
    val t1 = Fernet.encrypt(key, p, 42L, Fernet.deriveIv(key, p, 42L))
    val t2 = Fernet.encrypt(key, p, 42L, Fernet.deriveIv(key, p, 42L))
    assert(t1 === t2)
    // different ts → different IV → different token
    val t3 = Fernet.encrypt(key, p, 43L, Fernet.deriveIv(key, p, 43L))
    assert(t1 !== t3)
  }

  test("IV derivation is keyed: no plaintext commitment without the key") {
    val p = "low-entropy-name".getBytes("UTF-8")
    // an attacker holding the token (hence the IV + ts) but not the key
    // must not be able to recompute the IV from a plaintext guess: the
    // IV must differ under a different key, and must not equal the
    // unkeyed SHA-256(plaintext ‖ ts) prefix the attack would try
    val otherKey = Base64.getUrlEncoder.encodeToString(
      (32 until 64).map(_.toByte).toArray)
    val iv = Fernet.deriveIv(key, p, 5L)
    assert(iv.toSeq !== Fernet.deriveIv(otherKey, p, 5L).toSeq)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(p)
    md.update(java.nio.ByteBuffer.allocate(8).putLong(5L).array())
    assert(iv.toSeq !== md.digest().take(16).toSeq)
  }

  test("SQL surface: fernet_encrypt/fernet_decrypt round-trip on a column") {
    import spark.implicits._
    Fernet.register(spark)
    Fernet.register(spark) // idempotent
    val df = Seq("alice", "bob", "").toDF("name")
      .selectExpr(s"name", s"fernet_decrypt(fernet_encrypt(name, '$key', 7L), '$key') AS rt")
    assert(df.filter($"name" =!= $"rt").count() === 0)
  }
}
