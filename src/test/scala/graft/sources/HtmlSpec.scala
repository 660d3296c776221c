package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {

  test("basic nesting, ids, text collapsing") {
    val doc = Html.parse(
      """<html><body><div id="a"> Hello <b>wor</b>ld </div></body></html>""")
    assert(doc.byId("a").map(_.text).contains("Hello wor ld"))
  }

  test("entities: named (Spanish), numeric, nbsp") {
    val doc = Html.parse("""<div id="x">&Aacute;lvaro Obreg&oacute;n&nbsp;&#241;&#xF3;</div>""")
    assert(doc.byId("x").map(_.text).contains("Álvaro Obregón ñó"))
  }

  test("script/style bodies are not parsed as markup") {
    val doc = Html.parse(
      """<div id="t"><script>var x = "<td>fake</td>";</script><table>
        |<tr><td>real</td></tr></table></div>""".stripMargin)
    val rows = Html.tableRows(doc, "t")
    assert(rows == Seq(Seq(Html.Cell("real", None))))
  }

  test("void elements and attributes; img src captured per cell") {
    val doc = Html.parse(
      """<div id="t"><table>
        |<tr><td>a</td><td><img src="/x/buena.svg" alt=buena></td></tr>
        |</table></div>""".stripMargin)
    val rows = Html.tableRows(doc, "t")
    assert(rows.head(1).imgSrc.contains("/x/buena.svg"))
    assert(rows.head.head.imgSrc.isEmpty)
  }

  test("unclosed and mismatched tags do not lose following content") {
    val doc = Html.parse("""<div id="a"><p>one<p>two</div><div id="b">three</div>""")
    assert(doc.byId("b").map(_.text).contains("three"))
    assert(doc.byId("a").exists(_.text.contains("two")))
  }

  test("comments and doctype are skipped") {
    val doc = Html.parse("<!DOCTYPE html><!-- <div id='c'>no</div> --><div id='c'>yes</div>")
    assert(doc.byId("c").map(_.text).contains("yes"))
  }
}
