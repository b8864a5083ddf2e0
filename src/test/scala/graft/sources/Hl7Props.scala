package graft.sources

import org.scalacheck.{Gen, Prop, Properties, Test => ScTest}

/** HL7 escape-decoding invariant: for ANY value, encoding the five
  * delimiter characters per the v2 rules and decoding must round-trip
  * — the adjacency case (`\E\F\E\` = literal `\F\`) that sequential
  * String.replace corrupts is just one instance of this property.
  */
object Hl7Props extends Properties("hl7") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(200)

  private val d = Hl7.Delims('|', '^', '~', '\\', '&')

  /** The v2 encoder: each delimiter char becomes its escape sequence. */
  private def escape(v: String): String = v.flatMap { c =>
    if (c == d.field) s"${d.esc}F${d.esc}"
    else if (c == d.comp) s"${d.esc}S${d.esc}"
    else if (c == d.sub) s"${d.esc}T${d.esc}"
    else if (c == d.rep) s"${d.esc}R${d.esc}"
    else if (c == d.esc) s"${d.esc}E${d.esc}"
    else c.toString
  }

  private val hl7ish: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b', ' ', '|', '^', '~', '&', '\\', 'F', 'E'))
      .map(_.mkString)

  property("unescape(escape(v)) == v") = Prop.forAll(hl7ish) { v =>
    Hl7.unescape(escape(v), d) == v
  }

  property("escape-free strings pass through unescape unchanged") =
    Prop.forAll(Gen.asciiPrintableStr.map(_.filter(_ != '\\'))) { v =>
      Hl7.unescape(v, d) == v
    }
}
