package graft.security

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** HS256 JWT issue/verify — the reference's API authentication surface
  * (`generate_token`/`verify_token`,
  * healthcare-data-pipeline-main.py:56-70; bearer verification + RBAC,
  * healthcare-api-main.py:149-176). Engine-side this is a utility, not
  * an operator: batch jobs that publish to the reference's API tier (or
  * validate tokens embedded in ingested audit feeds) need the same
  * token math, nothing more. Rate limiting (healthcare-api-main.py:
  * 178-206) stays out — it is request-path state with no analog in a
  * batch/stream engine.
  *
  * Claims are a flat String→String map (the reference uses user_id,
  * role, exp). `exp`/`iat` are epoch seconds. No external JSON
  * dependency: the claim values the reference uses are scalar, so a
  * minimal escaped-string codec suffices and keeps the module
  * dependency-free.
  */
object Jwt {

  private val HeaderB64 = b64(
    """{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))

  private def b64(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def sign(secret: String, signingInput: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    mac.doFinal(signingInput.getBytes(UTF_8))
  }

  /** Registered numeric claims (RFC 7519 §4.1) — the only keys emitted
    * as JSON numbers, and only when the value is a canonical ASCII
    * integer (no leading zeros, fits a Long). Everything else is a JSON
    * string: a digit-looking user_id like "007" must NOT be retyped
    * (PyJWT would decode it as an int — or reject the leading-zero
    * literal outright).
    */
  private val NumericClaims = Set("exp", "iat", "nbf")
  private def canonicalLong(v: String): Boolean =
    v.matches("0|[1-9][0-9]{0,18}") &&
      (v.length < 19 || BigInt(v).isValidLong)

  /** Issue a token: sorted-key JSON payload (deterministic), HS256
    * signature. exp/iat/nbf are emitted as JSON numbers (what PyJWT
    * produces for the reference's payload); all other claims are
    * strings.
    */
  def issue(secret: String, claims: Map[String, String]): String = {
    val body = claims.toSeq.sortBy(_._1).map { case (k, v) =>
      val vj =
        if (NumericClaims(k) && canonicalLong(v)) v
        else "\"" + esc(v) + "\""
      "\"" + esc(k) + "\":" + vj
    }.mkString("{", ",", "}")
    val signingInput = HeaderB64 + "." + b64(body.getBytes(UTF_8))
    signingInput + "." + b64(sign(secret, signingInput))
  }

  /** Verify signature + expiry; returns the claims, or None for ANY
    * invalid token (the reference maps all failures to a single 401,
    * healthcare-api-main.py:154-159).
    *
    * @param now epoch seconds for the `exp` check — injectable so
    *            policies and tests are deterministic
    */
  def verify(secret: String, token: String, now: Long): Option[Map[String, String]] =
    token.split('.') match {
      case Array(h, p, sig) if h == HeaderB64 =>
        val signingInput = h + "." + p
        val expect = sign(secret, signingInput)
        val got =
          try Base64.getUrlDecoder.decode(sig)
          catch { case _: IllegalArgumentException => Array.empty[Byte] }
        if (!MessageDigest.isEqual(expect, got)) None
        else {
          val claims =
            try parseFlat(new String(Base64.getUrlDecoder.decode(p), UTF_8))
            catch { case _: IllegalArgumentException => None } // bad base64
          claims match {
            // a present-but-non-numeric (or overflowing) exp/nbf is an
            // invalid token, not an exception — the single-401 contract
            case Some(c) =>
              def timeOk(key: String, ok: Long => Boolean): Boolean =
                c.get(key) match {
                  case None => true
                  case Some(v) => v.toLongOption.exists(ok)
                }
              val live = timeOk("exp", _ > now) && // expired at exp
                timeOk("nbf", _ <= now) // not valid before nbf (RFC 7519 §4.1.5)
              if (live) Some(c) else None
            case None => None
          }
        }
      case _ => None
    }

  /** RBAC gate (healthcare-api-main.py:162-176): does the token's role
    * claim appear in the allowed set?
    */
  def hasRole(claims: Map[String, String], allowed: Set[String]): Boolean =
    claims.get("role").exists(allowed)

  /** Minimal flat-object JSON parse (string or integer values only —
    * the shapes [[issue]] emits). Returns None on anything else.
    */
  private[security] def parseFlat(json: String): Option[Map[String, String]] = {
    val t = json.trim
    if (!t.startsWith("{") || !t.endsWith("}")) return None
    val inner = t.substring(1, t.length - 1).trim
    if (inner.isEmpty) return Some(Map.empty)
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*(?:"((?:[^"\\]|\\.)*)"|(-?\d+))"""
    val re = (pair + """\s*(?:,|$)""").r
    val ms = re.findAllMatchIn(inner).toSeq
    val consumed = ms.map(_.matched.length).sum
    if (ms.isEmpty || consumed != inner.length) None
    else Some(ms.map { m =>
      unesc(m.group(1)) -> (if (m.group(3) != null) m.group(3)
                            else unesc(m.group(2)))
    }.toMap)
  }

  private def unesc(s: String): String =
    """\\(u[0-9a-fA-F]{4}|.)""".r.replaceAllIn(s, m => {
      val g = m.group(1)
      // the full JSON escape table — \n must become a newline, not the
      // letter n (PyJWT's json.dumps emits these for control chars)
      val out = g match {
        case "n" => "\n"
        case "t" => "\t"
        case "r" => "\r"
        case "b" => "\b"
        case "f" => "\f"
        case "/" => "/"
        case other if other.startsWith("u") =>
          Integer.parseInt(other.drop(1), 16).toChar.toString
        case other => other // \" \\
      }
      java.util.regex.Matcher.quoteReplacement(out)
    })
}
