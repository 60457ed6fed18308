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

  // independent reference for HashedShingles: Pattern.split the
  // lowercased toString (replacement-char semantics for malformed
  // UTF-8, exactly the composable split), build shingle STRINGS, hash
  // through a fresh MessageDigest — no shared code with the kernel's
  // byte path.
  private def refHashedShingles(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int, hexChars: Int): Seq[Long] = {
    if (text == null) return Seq.empty
    val toks = ShingleTokenizer.ws.split(text.toLowerCase.toString, -1)
    if (toks.length < k) return Seq.empty
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (0 to toks.length - k).map { i =>
      md.reset()
      val dig = md.digest(
        toks.slice(i, i + k).mkString(" ")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (0 until hexChars).foldLeft(0L) { (v, p) =>
        val b = dig(p >> 1)
        (v << 4) | (if ((p & 1) == 0) (b >> 4) & 0xf else b & 0xf)
      }
    }
  }

  test("HashedShingles byte path and malformed-UTF-8 fallback equal the reference") {
    import org.apache.spark.unsafe.types.UTF8String
    def run(u: UTF8String, k: Int, hex: Int): Seq[Long] =
      HashedShingles.compute(u, k, hex).toLongArray().toSeq
    val valid = Seq("", "one", "one two three", "  lead", "trail  ",
      "a\tb\nc", "UPPER MiXeD case", "héllo wörld é中文 tokens",
      "a" * 300 + " tail", (1 to 400).map(i => s"w$i").mkString(" "))
    for (s <- valid; k <- Seq(1, 2, 3); hex <- Seq(7, 15)) {
      val u = UTF8String.fromString(s)
      assert(run(u, k, hex) == refHashedShingles(u, k, hex),
        s"valid '$s' k=$k hex=$hex")
    }
    // malformed UTF-8 (a lone continuation byte, a truncated 2-byte
    // sequence, an overlong-ish lead) must take the String path whose
    // replacement-char re-encoding the reference reproduces
    val bad = Seq(
      Array[Byte]('a', 0x80.toByte, ' ', 'b'),
      Array[Byte](0xC3.toByte, ' ', 'x', ' ', 'y'),
      Array[Byte]('a', ' ', 0xE2.toByte, 0x80.toByte),
      Array[Byte](0xFF.toByte, 0xFE.toByte))
    for (b <- bad; k <- Seq(1, 2)) {
      val u = UTF8String.fromBytes(b)
      assert(run(u, k, 7) == refHashedShingles(u, k, 7),
        s"malformed ${b.mkString(",")} k=$k")
    }
    // null text -> empty
    assert(run(null, 2, 7).isEmpty)
  }

  // independent reference for WsTokens: Pattern.split the lowercased
  // toString — exactly what the composable split(lower(text), "\s+")
  // computes, replacement-char semantics included.
  private def refTokens(text: org.apache.spark.unsafe.types.UTF8String): Seq[String] =
    ShingleTokenizer.ws.split(text.toLowerCase.toString, -1).toSeq

  test("WsTokens byte path and malformed-UTF-8 fallback equal split(lower(text))") {
    import org.apache.spark.unsafe.types.UTF8String
    def run(u: UTF8String): Seq[String] =
      WsTokens.compute(u).array.map(_.toString).toSeq
    val valid = Seq("", " ", "  ", "one", "one two three", "  lead",
      "trail  ", "a\tbc\nd", "UPPER MiXeD case",
      "héllo wörld é中文 tokens", "a b c", "😀 emoji\ttail",
      "a" * 300 + " tail", (1 to 400).map(i => s"W$i").mkString(" "))
    valid.foreach { s =>
      val u = UTF8String.fromString(s)
      assert(run(u) == refTokens(u), s"valid '$s'")
    }
    // malformed UTF-8 must take the String path whose replacement-char
    // re-encoding the reference reproduces
    val bad = Seq(
      Array[Byte]('a', 0x80.toByte, ' ', 'b'),
      Array[Byte](0xC3.toByte, ' ', 'x', ' ', 'y'),
      Array[Byte]('a', ' ', 0xE2.toByte, 0x80.toByte),
      Array[Byte](0xFF.toByte, 0xFE.toByte))
    bad.foreach { b =>
      val u = UTF8String.fromBytes(b)
      assert(run(u) == refTokens(u), s"malformed ${b.mkString(",")}")
    }
    // randomized sweep, uppercase + multi-byte content mixed in
    val rng = new scala.util.Random(41)
    val seps = Array(" ", "  ", "\t", "\n", "\r\n", "\f", "")
    val frag = Array("Word", "A", "", "中文", "W9", "éÉ", " ")
    (1 to 2000).foreach { _ =>
      val sb = new StringBuilder
      (0 until rng.nextInt(40)).foreach { _ =>
        sb.append(frag(rng.nextInt(frag.length)))
        sb.append(seps(rng.nextInt(seps.length)))
      }
      val u = UTF8String.fromString(sb.toString)
      assert(run(u) == refTokens(u), s"random '${sb.toString.take(60)}'")
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
