package graft.security

import graft.SparkSpec

/** [[Jwt]] — issue/verify must round-trip the reference's claim shapes,
  * reject tampering and expiry, and gate roles like the reference's
  * `require_role` (healthcare-api-main.py:162-176).
  */
class JwtSpec extends SparkSpec {

  private val secret = "unit-test-secret"
  private val claims = Map(
    "user_id" -> "researcher-7", "role" -> "analyst", "exp" -> "2000000000")

  test("issue → verify round-trips claims (and is deterministic)") {
    val tok = Jwt.issue(secret, claims)
    assert(tok === Jwt.issue(secret, claims))
    assert(Jwt.verify(secret, tok, now = 1700000000L) === Some(claims))
  }

  test("token structure: three base64url segments, standard JWT header") {
    val parts = Jwt.issue(secret, claims).split('.')
    assert(parts.length === 3)
    val header = new String(
      java.util.Base64.getUrlDecoder.decode(parts(0)), "UTF-8")
    assert(header === """{"alg":"HS256","typ":"JWT"}""")
  }

  test("expired token is rejected; unexpired passes at the boundary") {
    val tok = Jwt.issue(secret, claims)
    assert(Jwt.verify(secret, tok, now = 2000000000L).isEmpty) // exp == now
    assert(Jwt.verify(secret, tok, now = 1999999999L).isDefined)
  }

  test("tampered payload or signature is rejected") {
    val Array(h, p, sig) = Jwt.issue(secret, claims).split('.')
    val forged = Jwt.issue(secret, claims + ("role" -> "admin")).split('.')(1)
    assert(Jwt.verify(secret, s"$h.$forged.$sig", 0L).isEmpty)
    assert(Jwt.verify(secret, s"$h.$p.${sig.reverse}", 0L).isEmpty)
    assert(Jwt.verify("other-secret", s"$h.$p.$sig", 0L).isEmpty)
    assert(Jwt.verify(secret, "not-a-token", 0L).isEmpty)
  }

  test("role gate mirrors require_role") {
    val ok = Jwt.verify(secret, Jwt.issue(secret, claims), 0L).get
    assert(Jwt.hasRole(ok, Set("analyst", "admin")))
    assert(!Jwt.hasRole(ok, Set("admin")))
    assert(!Jwt.hasRole(ok - "role", Set("analyst")))
  }

  test("claims with JSON-hostile characters survive the codec") {
    val nasty = Map("user_id" -> "a\"b\\c\nd", "role" -> "viewer",
      "exp" -> "2000000000")
    val tok = Jwt.issue(secret, nasty)
    assert(Jwt.verify(secret, tok, 0L) === Some(nasty))
  }

  test("PyJWT-style JSON escapes decode to control characters, not letters") {
    // json.dumps emits \n for a newline — it must parse back as \n
    assert(Jwt.parseFlat("""{"a":"x\ny","b":"t\tz"}""") ===
      Some(Map("a" -> "x\ny", "b" -> "t\tz")))
  }

  test("non-numeric or overflowing exp yields None, never an exception") {
    assert(Jwt.verify(secret,
      Jwt.issue(secret, Map("exp" -> "not-a-number")), 0L).isEmpty)
    assert(Jwt.verify(secret,
      Jwt.issue(secret, Map("exp" -> "")), 0L).isEmpty)
    assert(Jwt.verify(secret,
      Jwt.issue(secret, Map("exp" -> "99999999999999999999")), 0L).isEmpty)
  }

  test("nbf gates validity: not-yet-valid tokens are rejected (RFC 7519 §4.1.5)") {
    val tok = Jwt.issue(secret, Map("role" -> "admin", "nbf" -> "1000"))
    assert(Jwt.verify(secret, tok, now = 999L).isEmpty)   // before nbf
    assert(Jwt.verify(secret, tok, now = 1000L).isDefined) // at nbf
    // malformed nbf is an invalid token, same as exp
    assert(Jwt.verify(secret,
      Jwt.issue(secret, Map("nbf" -> "soon")), 0L).isEmpty)
  }

  test("digit-looking string claims stay strings (no retyping, no bad JSON)") {
    val c = Map("user_id" -> "007", "role" -> "viewer", "exp" -> "2000000000")
    val tok = Jwt.issue(secret, c)
    val payload = new String(
      java.util.Base64.getUrlDecoder.decode(tok.split('.')(1)), "UTF-8")
    assert(payload.contains("\"user_id\":\"007\"")) // quoted — 007 bare is invalid JSON
    assert(payload.contains("\"exp\":2000000000"))  // registered claim: number
    assert(Jwt.verify(secret, tok, 0L) === Some(c))
  }

  test("q82 access-audit executes and partitions all events") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = SecurityQueries.q82.build(spark, SparkSpec.Sf0001)
      .select($"access_flag").as[String].collect().toSet
    // flags drawn only from the documented taxonomy
    assert(got.subsetOf(
      Set("After Hours", "High Volume", "No Relationship", "Normal")))
    val total = SecurityQueries.q82.build(spark, SparkSpec.Sf0001)
      .agg(sum($"n_events")).as[Long].head()
    assert(total === graft.Tables.load(spark, SparkSpec.Sf0001, "events").count())
  }
}
