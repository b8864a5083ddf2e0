package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** [[HtmlText]] — pure scalar logic, no Spark: block segmentation,
  * RAWTEXT skipping, entity decoding, and the jusText-style
  * structural filters.
  */
class HtmlTextSpec extends AnyFunSuite {

  private val page =
    """<!DOCTYPE html>
      |<html><head><title>Ignored Title</title>
      |<style>body { color: red; } /* < not a tag */</style>
      |<script>if (1 < 2) { document.write("<p>injected</p>"); }</script>
      |</head>
      |<body>
      |<header><h1>Site Banner</h1></header>
      |<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact page link</a></nav>
      |<main>
      |<h2>Article heading stays</h2>
      |<p>This is the first real paragraph of the article, with enough
      |characters to clear the minimum block length threshold easily.</p>
      |<p>The second paragraph mentions Q&amp;A and uses &lt;angle&gt;
      |brackets plus a&nbsp;non-breaking space and copyright &#169; mark.</p>
      |<p><a href="x">one</a> <a href="y">two</a> <a href="z">three four five six seven</a></p>
      |</main>
      |<aside><p>Related links and promotional material live here in the sidebar.</p></aside>
      |<footer><p>Copyright 2024 Example Corp. All rights reserved worldwide.</p></footer>
      |</body></html>""".stripMargin

  test("extract keeps main prose, drops nav/header/footer/aside and link-dense blocks") {
    val out = HtmlText.extract(page)
    assert(out.contains("first real paragraph"))
    assert(out.contains("second paragraph"))
    assert(!out.contains("Site Banner"), "header content leaked")
    assert(!out.contains("Home"), "nav content leaked")
    assert(!out.contains("sidebar"), "aside content leaked")
    assert(!out.contains("All rights reserved"), "footer content leaked")
    assert(!out.contains("Ignored Title"), "RAWTEXT title leaked")
    assert(!out.contains("injected"), "script body leaked")
    assert(!out.contains("color: red"), "style body leaked")
    // the all-anchor paragraph is link-density filtered
    assert(!out.contains("three four five"), "link-dense block leaked")
  }

  test("entities decode and whitespace collapses inside blocks") {
    val out = HtmlText.extract(page)
    assert(out.contains("Q&A"))
    assert(out.contains("<angle> brackets"))
    assert(out.contains("a non-breaking space"))
    assert(out.contains("copyright © mark"))
  }

  test("short blocks drop; the threshold is configurable") {
    assert(HtmlText.extract("<p>tiny</p>") === "")
    assert(HtmlText.extract("<p>tiny</p>", minBlockChars = 1) === "tiny")
  }

  test("blocks reports link density and container flags") {
    val bs = HtmlText.blocks(
      "<nav><p>menu item text</p></nav><p>body <a href=x>link</a> text</p>")
    assert(bs.length === 2)
    assert(bs(0).inBoilerplateContainer && bs(0).text == "menu item text")
    assert(!bs(1).inBoilerplateContainer)
    assert(bs(1).linkChars === 4)
  }

  test("malformed markup degrades gracefully, never throws") {
    assert(HtmlText.extract("<p>unclosed paragraph with plenty of text to keep around here")
      .contains("unclosed paragraph"))
    assert(HtmlText.extract("text with a stray < left angle and more words to pass the bar",
      minBlockChars = 10).contains("stray < left angle"))
    assert(HtmlText.extract("<div", minBlockChars = 1) === "")
    assert(HtmlText.extract("<script>never closed", minBlockChars = 1) === "")
  }

  test("quoted attributes containing '>' do not end the tag") {
    val out = HtmlText.extract(
      """<p data-x="a>b">attribute angle bracket did not split this block</p>""",
      minBlockChars = 10)
    assert(out === "attribute angle bracket did not split this block")
  }

  test("svg subtrees contribute no text") {
    val out = HtmlText.extract(
      "<p>before svg content here with words</p><svg><text>vector label</text></svg>",
      minBlockChars = 10)
    assert(out.contains("before svg"))
    assert(!out.contains("vector label"))
  }
}
