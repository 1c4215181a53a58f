package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(s).toDF("s").select(TextNorm.normalize(col("s"), form)).head.getString(0)

  private def fold(s: String): String =
    Seq(s).toDF("s").select(TextNorm.foldText(col("s"))).head.getString(0)

  test("NFC composes decomposed accents to the precomposed form") {
    assert(norm("café", "NFC") == "café")
    assert(norm("niño", "NFC") == "niño")
  }

  test("NFC is idempotent and identity on already-composed / ASCII input") {
    assert(norm("café", "NFC") == "café")
    assert(norm("plain ascii", "NFC") == "plain ascii")
  }

  test("NFD decomposes; NFKC folds compatibility forms NFC leaves alone") {
    assert(norm("café", "NFD") == "café")
    // ﬁ ligature: NFC preserves, NFKC expands
    assert(norm("ﬁle", "NFC") == "ﬁle")
    assert(norm("ﬁle", "NFKC") == "file")
  }

  test("null passes through; bad form is rejected loudly") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(TextNorm.normalize(col("s"), "NFC")).head
    assert(r.isNullAt(0))
    intercept[Exception] { norm("x", "NFX") }
  }

  test("foldText: composed and decomposed spellings collapse to one key") {
    assert(fold("Café  NiÑO") == "cafe nino")
    assert(fold("café niño") == "cafe nino")
  }

  test("foldText: non-decomposable letters survive, marks do not") {
    // ø has no canonical decomposition (utf8proc strip_accents keeps it too)
    assert(fold("ølsen Über") == "ølsen uber")
    // U+0130 lowercases to i + combining dot; the mark strip folds it to plain i
    assert(fold("İstanbul") == "istanbul")
  }

  test("foldText collapses runs of whitespace and trims") {
    assert(fold("  a\t\tb \n c  ") == "a b c")
  }

  test("soundex: canonical NARA values, H/W rule, and the fixture invariances") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def sdx(names: String*): Seq[String] =
      names.toDF("n").select(TextNorm.soundex(col("n"))).as[String].collect().toSeq
    // the canonical hard set (H/W collapse, Pfister first-code drop)
    assert(sdx("Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister",
      "Honeyman", "Washington", "Lee") ==
      Seq("R163", "R163", "A261", "T522", "P236", "H555", "W252", "L000"))
    // q212's planted-misspelling invariances
    assert(sdx("Tymczak", "Tymczakk", "Tymczakey").distinct.size == 1)
    assert(sdx("Gutierrez", "Gutierrezz", "Gutierrezey").distinct.size == 1)
    // non-letters stripped; letterless input → null
    assert(sdx("O'Connor-2") == sdx("OConnor"))
    val nulls = Seq("123", "").toDF("n")
      .select(TextNorm.soundex(col("n"))).collect().map(_.isNullAt(0)).toSeq
    assert(nulls == Seq(true, true))
  }
}
