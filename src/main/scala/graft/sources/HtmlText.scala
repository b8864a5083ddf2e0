package graft.sources

/** Dependency-free HTML → main-text extraction for raw-WARC ingestion
  * (the step that turns a crawl's `response` records into the
  * `documents`-table contract — WET files are exactly this, computed
  * by the crawl producer; this lets the pipeline start from raw WARC
  * when no WET twin exists).
  *
  * Two public stages:
  *
  *  1. [[blocks]] — a single-pass tag scanner segmenting the page into
  *     text blocks at block-level tag boundaries, tracking per block
  *     the anchor-text share and whether it sat inside a structural
  *     boilerplate container (`nav`/`header`/`footer`/`aside`/`form`).
  *     `script`/`style`/`head` etc. content is skipped as RAWTEXT
  *     (scan to the literal close tag — script bodies legally contain
  *     `<`), comments and doctypes are skipped, entities are decoded,
  *     whitespace is collapsed.
  *  2. [[extract]] — block classification in the published jusText /
  *     CCNet spirit (Pomikálek 2011 "Removing boilerplate and
  *     duplicate content from web corpora"; Wenzek et al. 2020 CCNet):
  *     a block survives iff it is NOT inside a boilerplate container,
  *     carries at least `minBlockChars` of text (short blocks are
  *     menus/captions/copyright lines), and its link density (anchor
  *     chars / total chars) is at most `maxLinkDensity` (link-dense
  *     blocks are navigation). No stopword lists: the reference
  *     corpora are multilingual and the downstream quality gates
  *     ([[graft.text.QualityRules]], [[graft.text.EncodingNoise]])
  *     already score lexical quality language-aware; this stage only
  *     removes STRUCTURAL boilerplate.
  *
  * Scale: pure per-record scalar logic — called from the same
  * file-per-task flatMap as the WARC parser itself, so it adds zero
  * shuffles; cost is one linear scan of the page.
  */
object HtmlText {

  /** One segmented text block. `linkChars` counts characters that were
    * inside an `<a>` element; `inBoilerplateContainer` is true if the
    * block's text accumulated inside nav/header/footer/aside/form.
    */
  final case class Block(text: String, linkChars: Int,
                         inBoilerplateContainer: Boolean) {
    def linkDensity: Double =
      if (text.isEmpty) 0.0 else linkChars.toDouble / text.length
  }

  /** Tags whose open/close ends the current block. (br/hr are void but
    * still break blocks.)
    */
  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "thead", "tbody", "tr", "td", "th", "section", "article",
    "header", "footer", "nav", "aside", "blockquote", "pre", "br", "hr",
    "form", "main", "figure", "figcaption", "dl", "dt", "dd", "address",
    "fieldset", "legend", "details", "summary", "body")

  /** Elements whose content is raw text to be skipped entirely — HTML
    * treats these as RAWTEXT/RCDATA, so the only terminator is the
    * literal close tag (a `<` inside a script body is NOT markup).
    */
  private val RawTextDropTags: Set[String] =
    Set("script", "style", "noscript", "template", "textarea", "title")

  /** Structural boilerplate containers: text inside them is kept as
    * blocks but flagged, and [[extract]] drops it.
    */
  private val ContainerTags: Set[String] =
    Set("nav", "header", "footer", "aside", "form")

  /** Segment `html` into text blocks. Never throws on malformed
    * markup: unclosed tags, stray `<`, or mis-nesting degrade to
    * conservative text accumulation (crawled HTML is routinely
    * invalid; strictness belongs to the charset layer, not the tag
    * soup).
    */
  def blocks(html: String): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    val buf = new java.lang.StringBuilder
    var blockLinkChars = 0
    var blockInContainer = false
    var aDepth = 0
    var containerDepth = 0
    var svgDepth = 0 // svg/math subtrees: vector text, not prose
    var i = 0
    val n = html.length
    lazy val lower = html.toLowerCase // for RAWTEXT close-tag scans

    def flush(): Unit = {
      val t = buf.toString.trim
      if (t.nonEmpty) out += Block(t, math.min(blockLinkChars, t.length),
        blockInContainer)
      buf.setLength(0)
      blockLinkChars = 0
      blockInContainer = containerDepth > 0
    }

    def appendText(s: String): Unit = {
      if (containerDepth > 0) blockInContainer = true
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        if (Character.isWhitespace(c)) {
          if (buf.length > 0 && buf.charAt(buf.length - 1) != ' ') {
            buf.append(' ')
            if (aDepth > 0) blockLinkChars += 1
          }
        } else {
          buf.append(c)
          if (aDepth > 0) blockLinkChars += 1
        }
        j += 1
      }
    }

    /** index just past the closing '>' of the tag starting at `start`
      * (which points at '<'), honoring quoted attribute values that
      * may contain '>'.
      */
    def tagEnd(start: Int): Int = {
      var j = start + 1
      var quote: Char = 0
      while (j < n) {
        val c = html.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return j + 1
        j += 1
      }
      n // unterminated tag: consume the rest
    }

    def tagNameAt(j: Int): String = {
      var k = j
      val sb = new java.lang.StringBuilder
      while (k < n && (Character.isLetterOrDigit(html.charAt(k)))) {
        sb.append(Character.toLowerCase(html.charAt(k))); k += 1
      }
      sb.toString
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e == -1) n else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e == -1) n else e + 3
        } else if (i + 1 < n &&
                   (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          i = tagEnd(i) // doctype / processing instruction
        } else if (i + 1 < n && (Character.isLetter(html.charAt(i + 1)) ||
                                 html.charAt(i + 1) == '/')) {
          val closing = html.charAt(i + 1) == '/'
          val name = tagNameAt(if (closing) i + 2 else i + 1)
          val afterTag = tagEnd(i)
          if (name.isEmpty) { i = afterTag }
          else if (!closing && RawTextDropTags(name)) {
            // RAWTEXT: skip to the literal close tag, case-insensitive
            val found = lower.indexOf("</" + name, afterTag)
            i = if (found == -1) n else tagEnd(found)
          } else {
            if (name == "svg" || name == "math") {
              if (closing) svgDepth = math.max(0, svgDepth - 1)
              else svgDepth += 1
            } else if (svgDepth == 0) {
              if (name == "a") {
                if (closing) aDepth = math.max(0, aDepth - 1)
                else aDepth += 1
              }
              if (BlockTags(name)) flush()
              if (ContainerTags(name)) {
                if (closing) containerDepth = math.max(0, containerDepth - 1)
                else containerDepth += 1
                blockInContainer = containerDepth > 0
              }
              // img alt text is prose-adjacent but not body text; skip.
            }
            i = afterTag
          }
        } else {
          appendText("<"); i += 1 // stray '<': literal text
        }
      } else {
        val next = html.indexOf('<', i)
        val end = if (next == -1) n else next
        if (svgDepth == 0) appendText(decodeEntities(html.substring(i, end)))
        i = end
      }
    }
    flush()
    out.result()
  }

  /** Main-text extraction: concatenate the blocks that pass the
    * structural filters, newline-separated. See the object doc for the
    * rule provenance; defaults follow jusText's published
    * length-threshold ballpark.
    */
  def extract(html: String, minBlockChars: Int = 25,
              maxLinkDensity: Double = 0.5): String =
    blocks(html).iterator
      .filter(b => !b.inBoilerplateContainer &&
        b.text.length >= minBlockChars &&
        b.linkDensity <= maxLinkDensity)
      .map(_.text)
      .mkString("\n")

  /** Decode the HTML entities crawled prose actually contains: the
    * XML five + nbsp and numeric (dec and hex) references. Unknown
    * named entities pass through verbatim — mangling `&foo;` to a
    * replacement char would corrupt text the noise gate then has to
    * judge.
    */
  private[sources] def decodeEntities(s: String): String = {
    if (s.indexOf('&') == -1) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi == -1 || semi - i > 12) { sb.append(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val repl: String = name match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ if name.startsWith("#x") || name.startsWith("#X") =>
              try String.valueOf(Character.toChars(
                Integer.parseInt(name.substring(2), 16)))
              catch { case _: Exception => null }
            case _ if name.startsWith("#") =>
              try String.valueOf(Character.toChars(
                Integer.parseInt(name.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (repl == null) { sb.append(c); i += 1 }
          else { sb.append(repl); i = semi + 1 }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
