package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.{C4Counts, C4KeptText, GopherCounts, WordWrap}

/** Pins the fused rule kernels (GopherCounts / C4Counts / C4KeptText /
  * WordWrap) value-identical to the composable higher-order forms they
  * replace — the same twin discipline as HashingSpec: the composable
  * expression is restated HERE, evaluated by Spark's own
  * filter/transform/aggregate machinery, and compared row-by-row on a
  * fixture that exercises every `\s`/trim/lower/code-point edge the
  * kernels hand-roll. */
class RuleKernelsSpec extends SparkTestBase {
  import spark.implicits._

  private val stops = graft.operators.TextAnalysis.gopherStopwords

  // the edge fixture: nulls, empties, exotic whitespace, surrogate
  // pairs, locale-trap case folds, bullet/ellipsis/sentence boundaries
  private lazy val docs = Seq(
    (1L, null.asInstanceOf[String]),
    (2L, ""),
    (3L, " \t\n\f\r "),                       // every Java-regex \s char
    (4L, "the THE the to of and that have with duplicate the"),
    (5L, "emoji 😀😀 pair and Straße café"),
    (6L, "• bullet line\n  - dashed\n*starred\nplain - not bullet\n" +
      "ends with dots...\nends with dots...  \ndots.... \nno dots"),
    (7L, "## # hash ## marks . .. ... .... ..... ......"),
    (8L, "This line has at least five words.\nshort line.\n" +
      "no terminal punctuation here at all\n" +
      "This JavaScript line would otherwise be kept.\n" +
      "This JAVAKscript line tests the Kelvin fold.\n" +
      "Quoted line with five good words\"\n" +
      "Tab\tseparated\tfive\tword\tline!\t\n" +
      "\t\nlorem IPSUM\nbrace { here"),
    (9L, "One. Two! Three? Four\tfive .  . \t."),
    (10L, "Tİtled ıstanbul Σοφός " +
      "Σ ends"),
    (11L, "a\n\n\nb\n \n\t\n"),
    (12L, "single"),
    // round-6 ratio boundaries for the keep6 gate (nw >= 50 so r1 holds)
    (13L, Seq.fill(50)("abc").mkString(" ")),          // mwl exactly 3.0 -> keep
    (14L, (Seq.fill(45)("abc") ++ Seq.fill(5)("#")).mkString(" ")),  // hash ratio exactly 0.1
    (15L, Seq.fill(50)("ab").mkString(" ")),           // mwl 2.0 -> drop
    (16L, Seq.fill(49)("abc").mkString(" ")),          // nw 49 -> r1 drop
    (17L, (Seq.fill(40)("abc") ++ Seq.fill(10)("...")).mkString(" ")) // ell ratio 0.2 -> drop
  ).toDF("doc_id", "text")

  private def check(name: String, native: Column, twin: Column): Unit = {
    val diff = docs.select(col("doc_id"), native.as("k"), twin.as("c"))
      .filter(!(col("k") <=> col("c")))
      .collect()
    assert(diff.isEmpty, s"$name diverges from the composable twin: " +
      diff.mkString("; "))
  }

  test("GopherCounts fields == the composable word/line/char expressions") {
    val t = col("text")
    val words = filter(split(t, "\\s+"), w => w =!= "")
    val lines = filter(split(t, "\n"), l => l =!= "")
    val g = GopherCounts(t, stops)
    check("nw", g.getField("nw"), size(words).cast("long"))
    // no coalesce here: the production composable form wrapped the fold
    // in coalesce(_, 0L), which only fires on NULL text — where the
    // kernel yields a null struct instead. Observationally identical:
    // every consumer routes wchars through ratio(wchars, nw) with nw
    // null, which is null either way (mean_word_len stays null, the
    // gate drops the row). The pin below is the exact kernel contract.
    check("wchars", g.getField("wchars"),
      aggregate(transform(words, w => length(w).cast("long")),
        lit(0L), (a, v) => a + v))
    check("alpha", g.getField("alpha"),
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long"))
    check("nl", g.getField("nl"), size(lines).cast("long"))
    check("bul", g.getField("bul"),
      size(filter(lines, l => l.rlike("^\\s*[•\\-\\*]"))).cast("long"))
    check("elll", g.getField("elll"),
      size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast("long"))
    check("hash", g.getField("hash"),
      (length(t) - length(regexp_replace(t, "#", ""))).cast("long"))
    check("ell", g.getField("ell"),
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
        .cast("long"))
    check("stops", g.getField("stops"),
      size(array_intersect(array_distinct(split(lower(t), "\\s+")),
        typedLit(stops))).cast("long"))
  }

  test("keep6 == the composable r1-r6 conjunction over round-6 ratios") {
    val t = col("text")
    val words = filter(split(t, "\\s+"), w => w =!= "")
    val lines = filter(split(t, "\n"), l => l =!= "")
    val nw = size(words).cast("long")
    val nl = size(lines).cast("long")
    def ratio(num: Column, den: Column): Column =
      round(when(den === 0, 0.0).otherwise(num.cast("double") / den), 6)
    val wchars = coalesce(aggregate(transform(words,
      w => length(w).cast("long")), lit(0L), (a, v) => a + v), lit(0L))
    val alpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val bul = size(filter(lines, l => l.rlike("^\\s*[•\\-\\*]"))).cast("long")
    val elll = size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast("long")
    val hsh = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val ell = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
      .cast("long")
    val twin = (nw.between(50L, 100000L) &&
      ratio(wchars, nw).between(3.0, 10.0) &&
      ratio(hsh, nw) <= 0.1 && ratio(ell, nw) <= 0.1 &&
      ratio(bul, nl) <= 0.9 && ratio(elll, nl) <= 0.3 &&
      ratio(alpha, nw) >= 0.8).cast("long")
    check("keep6", GopherCounts(t, stops).getField("keep6"), twin)
  }

  // the composable C4 line predicate, restated
  private def keptLines(t: Column): Column = {
    val lines = filter(split(t, "\n"), l => trim(l) =!= "")
    filter(lines, l =>
      l.rlike("[.!?\"]\\s*$") &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= 5 &&
        !lower(l).contains("javascript"))
  }

  test("C4Counts fields == the composable line/sentence/flag expressions") {
    val t = col("text")
    val lines = filter(split(t, "\n"), l => trim(l) =!= "")
    val c = C4Counts(t)
    check("nl", c.getField("nl"), size(lines).cast("long"))
    check("kept", c.getField("kept"), size(keptLines(t)).cast("long"))
    check("sent", c.getField("sent"),
      size(filter(split(t, "[.!?]"), s => trim(s) =!= "")).cast("long"))
    check("lorem", c.getField("lorem"),
      lower(t).contains("lorem ipsum").cast("long"))
    check("brace", c.getField("brace"), t.contains("{").cast("long"))
    check("keep", c.getField("keep"),
      (size(filter(split(t, "[.!?]"), x => trim(x) =!= "")) >= 3 &&
        !lower(t).contains("lorem ipsum") && !t.contains("{") &&
        size(keptLines(t)) >= 1).cast("long"))
  }

  test("C4KeptText == array_join of the composable kept lines") {
    check("keptText", C4KeptText(col("text")),
      array_join(keptLines(col("text")), "\n"))
  }

  test("WordWrap == the composable sequence/slice/array_join wrap") {
    for (w <- Seq(1, 4, 5, 7)) {
      val words = filter(split(col("text"), "\\s+"), x => x =!= "")
      val ns = ceil(size(words).cast("double") / w.toDouble).cast("int")
      val twin = when(size(words) === 0, lit("")).otherwise(
        array_join(transform(sequence(lit(0), ns - 1), i =>
          concat(array_join(slice(words, lit(i * w + 1), lit(w)), " "), lit("."))),
          "\n"))
      check(s"wrap$w", WordWrap(col("text"), lit(w)), twin)
    }
    // and the per-doc-varying width the C4 composition uses
    val wpl = (lit(4) + pmod(col("doc_id"), lit(4))).cast("int")
    val words = filter(split(col("text"), "\\s+"), x => x =!= "")
    val ns = ceil(size(words).cast("double") / wpl.cast("double")).cast("int")
    val twin = when(size(words) === 0, lit("")).otherwise(
      array_join(transform(sequence(lit(0), ns - 1), i =>
        concat(array_join(slice(words, i * wpl + 1, wpl), " "), lit("."))),
        "\n"))
    check("wrapVarying", WordWrap(col("text"), wpl), twin)
  }

  test("BpeCounts fields == the composable sentinel-space merge chain") {
    // extra BPE-traffic rows on top of the shared edge fixture: words
    // the merge table actually rewrites, adjacent-repeat pairs (the
    // replace-twice contract), and mixed-case folds the lower() catches
    val bpeDocs = docs.union(Seq(
      (100L, "value queue sterling therapy banana bubble"),
      (101L, "ab abab ababab abababab thethethe"),
      (102L, "VALUE Queue vAlUe antler interest")
    ).toDF("doc_id", "text"))
    val merges = graft.operators.TextAnalysis.bpeMerges
    val t = col("text")
    val words = filter(split(lower(t), "\\s+"), w => w =!= "")
    def spaced(w: Column): Column =
      concat(lit(" "), trim(regexp_replace(w, "(.)", "$1 ")), lit(" "))
    def merged(w: Column): Column =
      merges.foldLeft(spaced(w)) { case (c, (p, r)) =>
        val pat = lit(s" $p ")
        val rep = lit(s" $r ")
        replace(replace(c, pat, rep), pat, rep) }
    val k = graft.functions.BpeCounts(t, merges)
    def check2(name: String, native: Column, twin: Column): Unit = {
      val diff = bpeDocs.select(col("doc_id"), native.as("k"), twin.as("c"))
        .filter(!(col("k") <=> col("c")))
        .collect()
      assert(diff.isEmpty, s"$name diverges from the composable twin: " +
        diff.mkString("; "))
    }
    check2("n_words", k.getField("n_words"), size(words).cast("long"))
    check2("n_subwords", k.getField("n_subwords"),
      aggregate(transform(words, w => size(split(trim(merged(w)), " "))),
        lit(0L), (a, b) => a + b))
    check2("n_chars", k.getField("n_chars"),
      aggregate(transform(words, w => length(w)), lit(0L), (a, b) => a + b))
  }
}
