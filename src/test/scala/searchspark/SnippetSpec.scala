package searchspark

import org.scalatest.funsuite.AnyFunSuite

import searchspark.query.Snippets

/** Golden snippet cases (FIXTURES.md §5; reference C10 semantics,
  * SearchingServiceImpl.java:135-162). */
class SnippetSpec extends AnyFunSuite {

  private def words(n: Int, prefix: String = "word"): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("match in first 14 words: window clamps to start") {
    val text = ("hit " + words(40).mkString(" ")).trim
    val s = Snippets.snippet(text, Set("hit"))
    assert(s.startsWith("<b>hit</b>"))
    // window = max(0, 0-14) .. 0+15 → 15 words
    assert(s.split(" ").length == 15)
  }

  test("match mid-document: ±14/+15 word window") {
    val pre = words(30, "a").mkString(" ")
    val post = words(30, "b").mkString(" ")
    val s = Snippets.snippet(s"$pre hit $post", Set("hit"))
    val toks = s.split(" ")
    assert(toks.length == 14 + 1 + 14) // 14 before, the hit, 14 after
    assert(toks(14) == "<b>hit</b>")
  }

  test("multiple matches: all wrapped inside window, scan stops +15") {
    val text = "hit one two hit three " + words(40).mkString(" ") + " hit"
    val s = Snippets.snippet(text, Set("hit"))
    assert(s.split(" ").count(_ == "<b>hit</b>") == 2) // third is past the window
  }

  test("inflected surface form matches via lemmatizer, keeps original") {
    val s = Snippets.snippet("the tables are ready", Set("table"))
    assert(s.contains("<b>tables</b>"))
  }

  test("punctuation-attached word still matches and keeps punctuation") {
    val s = Snippets.snippet("see Table, then go", Set("table"))
    assert(s.contains("<b>Table,</b>"))
  }

  test("stopword in query set never matches (analyzer filters apply)") {
    assert(Snippets.snippet("the cat sat", Set("the")) == "")
  }

  test("no surface match → empty snippet (reference would NPE)") {
    assert(Snippets.snippet("nothing to see here", Set("absent")) == "")
    assert(Snippets.snippet("", Set("x")) == "")
    assert(Snippets.snippet(null, Set("x")) == "")
    assert(Snippets.snippet("text", Set.empty) == "")
  }
}
