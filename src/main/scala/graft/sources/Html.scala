package graft.sources

import scala.collection.mutable
import scala.util.matching.Regex

/** Minimal HTML DOM for the report-scrape sources (SURVEY §2 S1-S3).
  *
  * The reference parses the CDMX report page with BeautifulSoup+lxml
  * (/root/reference/scrapper.py:77-110,29-75). We have no HTML library
  * on the classpath (Spark jars only), and the subset of HTML we must
  * understand is tiny — tags, attributes, nesting, text — so this is a
  * ~100-line tolerant tag-soup parser: single pass, a stack for
  * nesting, void elements auto-closed, mismatched closers popped to
  * the nearest match, comments and script/style bodies skipped.
  *
  * The parser is a pure serializable function, so it runs equally on
  * the driver (one page per micro-batch, the reference's cadence) or
  * inside `Dataset.flatMap` when fanning out over millions of archived
  * pages — the 100 TB path needs no new code, just a different caller.
  */
final case class HtmlNode(
    tag: String,
    attrs: Map[String, String],
    children: Vector[HtmlNode],
    ownText: Vector[String]) {

  def attr(name: String): Option[String] = attrs.get(name)

  /** Text runs are stored as "#text" pseudo-children so document order
    * is preserved; element navigation uses `elems`. */
  def isText: Boolean = tag == "#text"

  /** Element children only (document order). */
  def elems: Vector[HtmlNode] = children.filterNot(_.isText)

  /** Depth-first descendants (this node included). */
  def all: Iterator[HtmlNode] = Iterator(this) ++ children.iterator.flatMap(_.all)

  def byId(id: String): Option[HtmlNode] = all.find(_.attrs.get("id").contains(id))

  def byTag(t: String): Seq[HtmlNode] = all.filter(_.tag == t).toSeq

  /** Concatenated descendant text in document order, whitespace-collapsed. */
  def text: String = {
    val sb = new StringBuilder
    def walk(n: HtmlNode): Unit = {
      n.ownText.foreach { t => sb.append(t); sb.append(' ') }
      n.children.foreach(walk)
    }
    walk(this)
    sb.toString.replaceAll("\\s+", " ").trim
  }
}

object Html {
  private val VoidTags = Set("img", "br", "hr", "meta", "link", "input", "area",
    "base", "col", "embed", "source", "track", "wbr")
  private val RawTextTags = Set("script", "style")

  private val TagRx: Regex =
    """(?s)<!--.*?-->|<![^>]*>|<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:"[^"]*"|'[^']*'|[^>"'])*)(/?)>""".r
  private val AttrRx: Regex =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+)))?""".r

  // The named entities the CDMX report page actually uses (Spanish
  // accents) plus the XML core set; numeric refs decoded generically.
  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ",
    "aacute" -> "á", "eacute" -> "é", "iacute" -> "í", "oacute" -> "ó",
    "uacute" -> "ú", "ntilde" -> "ñ", "uuml" -> "ü",
    "Aacute" -> "Á", "Eacute" -> "É", "Iacute" -> "Í", "Oacute" -> "Ó",
    "Uacute" -> "Ú", "Ntilde" -> "Ñ", "Uuml" -> "Ü", "deg" -> "°")

  private val EntityRx: Regex = """&(#x?[0-9a-fA-F]+|[a-zA-Z]+);""".r

  private def unescape(s: String): String =
    if (!s.contains('&')) s
    else EntityRx.replaceAllIn(s, m => {
      val body = m.group(1)
      val repl = scala.util.Try {
        if (body.startsWith("#x") || body.startsWith("#X"))
          new String(Character.toChars(Integer.parseInt(body.drop(2), 16)))
        else if (body.startsWith("#"))
          new String(Character.toChars(body.drop(1).toInt))
        else Entities.getOrElse(body, m.matched)
      }.getOrElse(m.matched)
      Regex.quoteReplacement(repl)
    })

  private final class Builder(val tag: String, val attrs: Map[String, String]) {
    val children = mutable.ArrayBuffer.empty[HtmlNode]
    val texts = mutable.ArrayBuffer.empty[String]
    def build: HtmlNode = HtmlNode(tag, attrs, children.toVector, texts.toVector)
  }

  private def parseAttrs(s: String): Map[String, String] =
    AttrRx.findAllMatchIn(s).map { m =>
      val v = Option(m.group(2)).orElse(Option(m.group(3))).orElse(Option(m.group(4))).getOrElse("")
      m.group(1).toLowerCase -> unescape(v)
    }.toMap

  /** Parse an HTML document (or fragment) into a synthetic root node. */
  def parse(html: String): HtmlNode = {
    val root = new Builder("#root", Map.empty)
    val stack = mutable.Stack[Builder](root)
    var pos = 0
    var skipRawUntil: Option[String] = None

    def addText(endExclusive: Int): Unit = {
      if (endExclusive > pos) {
        val t = html.substring(pos, endExclusive)
        if (t.exists(!_.isWhitespace) && skipRawUntil.isEmpty)
          stack.top.children += HtmlNode("#text", Map.empty, Vector.empty,
            Vector(unescape(t).replace(' ', ' ')))
      }
    }

    TagRx.findAllMatchIn(html).foreach { m =>
      val isTag = m.group(2) != null
      if (isTag) {
        val name = m.group(2).toLowerCase
        val closing = m.group(1) == "/"
        skipRawUntil match {
          case Some(raw) if !(closing && name == raw) => // swallow raw content
          case _ =>
            addText(m.start)
            if (closing) {
              if (skipRawUntil.contains(name)) skipRawUntil = None
              if (stack.exists(_.tag == name)) {
                var done = false
                while (!done && stack.size > 1) {
                  val b = stack.pop()
                  stack.top.children += b.build
                  done = b.tag == name
                }
              } // stray closer: ignore
            } else {
              val selfClosing = m.group(4) == "/" || VoidTags(name)
              val b = new Builder(name, parseAttrs(m.group(3)))
              if (selfClosing) stack.top.children += b.build
              else {
                stack.push(b)
                if (RawTextTags(name)) skipRawUntil = Some(name)
              }
            }
        }
        pos = m.end
      } else { // comment / doctype / malformed — drop it
        if (skipRawUntil.isEmpty) addText(m.start)
        pos = m.end
      }
    }
    addText(html.length)
    while (stack.size > 1) { val b = stack.pop(); stack.top.children += b.build }
    root.build
  }

  /** One parsed table cell: collapsed text plus the first img src, if
    * any — the air-quality level lives in an <img src=".../buena.svg">
    * (/root/reference/scrapper.py:100-102). */
  final case class Cell(text: String, imgSrc: Option[String])

  /** All <tr> rows of the first <table> under div#id, as cells. */
  def tableRows(doc: HtmlNode, divId: String): Seq[Seq[Cell]] =
    (for {
      div <- doc.byId(divId)
      table <- div.byTag("table").headOption
    } yield table.byTag("tr").map { tr =>
      tr.children.filter(c => c.tag == "td" || c.tag == "th").map { td =>
        Cell(td.text, td.byTag("img").headOption.flatMap(_.attr("src")))
      }.toSeq
    }).getOrElse(Seq.empty)
}
