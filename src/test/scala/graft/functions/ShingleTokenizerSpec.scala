package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the hand-rolled whitespace scan [[ShingleTokenizer.splitWs]] to
  * `Pattern.compile("\\s+").split(s, -1)` — the exact reference form the
  * composable `split(lower(text), "\\s+")` chains ran. The end-to-end
  * kernel pins in HashingSpec cover the fused expressions; this one
  * attacks the splitter directly with the cases where a scan could
  * diverge from Java regex `\s`:
  *
  *  - Unicode whitespace-LIKE code points Java `\s` does NOT match
  *    (NBSP U+00A0, OGHAM U+1680, LINE SEP U+2028, IDEOGRAPHIC U+3000,
  *    NEL U+0085, ZWSP U+200B) must stay INSIDE tokens;
  *  - the full ASCII class [ \t\n\x0B\f\r] must split, alone and in
  *    mixed runs;
  *  - limit -1 semantics: leading/trailing separator runs produce empty
  *    tokens; the empty string produces [""]. */
class ShingleTokenizerSpec extends AnyFunSuite {

  private def ref(s: String): Array[String] =
    ShingleTokenizer.ws.split(s, -1)

  test("splitWs equals Pattern.split(\\s+, -1) on edges and unicode") {
    val cases = Seq(
      "", " ", "  ", "a", " a", "a ", " a ", "a b", "a  b",
      "a\tb", "a\nb", "ab", "a\fb", "a\rb", "a \t\r\n b",
      "\t\n\f\r", "end with run   ",
      // unicode whitespace-like chars \s does NOT match: one token
      "a b", "a b", "a b", "a　b", "ab",
      "a​b", " ", "x  y",
      // non-BMP content around separators
      "😀 emoji\ttail", "中文 字\r\n符")
    cases.foreach { s =>
      assert(ShingleTokenizer.splitWs(s).toSeq == ref(s).toSeq, s"case '$s'")
    }
  }

  test("splitWs equals Pattern.split on randomized mixed documents") {
    val rng = new scala.util.Random(13)
    val seps = Array(" ", "  ", "\t", "\n", "\r\n", "  ", "\f", "")
    val frag = Array("word", "a", "", " ", "中文", "W9", " ")
    (1 to 2000).foreach { _ =>
      val sb = new StringBuilder
      (0 until rng.nextInt(40)).foreach { _ =>
        sb.append(frag(rng.nextInt(frag.length)))
        sb.append(seps(rng.nextInt(seps.length)))
      }
      val s = sb.toString
      assert(ShingleTokenizer.splitWs(s).toSeq == ref(s).toSeq,
        s"random case '${s.take(60)}'")
    }
  }
}
