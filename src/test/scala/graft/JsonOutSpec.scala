package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[JsonOut]] — the one escape/format helper every artifact-writing
  * harness shares. Each case here is a corruption one of the old
  * per-file copies allowed into a committed artifact.
  */
class JsonOutSpec extends AnyFunSuite {

  test("control characters in exception text escape to valid JSON") {
    val s = "line1\nline2\ttab\rcr \u0001bell"
    val lit = JsonOut.jstr(s)
    assert(lit == "\"line1\\nline2\\ttab\\rcr \\u0001bell\"")
    // round-trips through a real JSON parser (Jackson ships with Spark)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readValue(lit, classOf[String]) == s)
  }

  test("quotes and backslashes escape (the original two-replace set)") {
    assert(JsonOut.jstr("""a"b\c""") == "\"a\\\"b\\\\c\"")
  }

  test("jnum is locale-fixed: '.' decimal point under a comma locale") {
    // No Locale.setDefault here: mutating the JVM-global default could
    // make a concurrently-running suite that formats numbers observe
    // GERMANY transiently and flake. jnum pins Locale.ROOT explicitly,
    // so the default locale is irrelevant by construction; the hazard
    // it guards against is shown with an explicit-locale formatter.
    assert(JsonOut.jnum(12.345, 1) == "12.3")
    assert(JsonOut.jnum(0.5, 3) == "0.500")
    // the f-interpolator this replaced really does emit a comma under
    // a comma-decimal locale
    assert(String.format(java.util.Locale.GERMANY, "%.1f",
      Double.box(12.345)) == "12,3")
  }
}
