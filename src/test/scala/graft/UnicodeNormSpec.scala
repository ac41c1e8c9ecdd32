package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** What t32's literal-replace normalization tier MISSES against a full
  * Unicode (NFKD) reference — the r11 ask, the t19b recall-monitor
  * convention applied to text cleaning: the literal tier is the right
  * oracle-able core (every mapping a fixed string pair both engines
  * replay bit-for-bit); this spec runs a JDK-Normalizer NFKD tier over a
  * fixture corpus and PINS the divergence, so the gap is a measured,
  * named set of cases instead of an unstated assumption.
  *
  * Reference tier = NFKD decomposition (folds compatibility forms:
  * fullwidth letters, ligatures, superscripts, NBSP) -> strip combining
  * marks (accent folding for EVERY accent, precomposed or combining) ->
  * the same typographic-punctuation policy map (curly quotes/dashes are
  * policy, not normalization — no NFKC form touches them) -> strip
  * format chars (zero-width/BOM) -> lowercase -> collapse whitespace.
  */
class UnicodeNormSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local("4")
  import spark.implicits._

  // doc ids coprime to 3/5/7 so t32's deterministic dirt augmentation
  // stays out of the comparison (aug == text for every fixture row)
  private val fixture: Seq[(Long, String)] = Seq(
    1L -> "plain ascii stays put",
    2L -> "curly ‘quotes’ and “dashes” — fine",
    4L -> "zero​width and nbsp ﻿mark",
    8L -> "café déjà zürich naïve", // precomposed accents: covered
    11L -> "café déjà vu", // COMBINING accents: literal tier leaves the marks
    13L -> "the ﬁnest ﬂight", // ligatures fi/fl: NFKD folds, literal keeps
    16L -> "ＭＩＸＥＤ width", // fullwidth letters: NFKD folds, literal keeps
    17L -> "x² plus y³", // superscripts: NFKD folds to digits, literal keeps
    19L -> "UPPER ÉCLAT ok", // uppercase accent: lower() + table covers it
    22L -> "sørlandet blød") // ø has NO decomposition: BOTH tiers keep it

  /** The reference tier (driver-side, JDK only). */
  private def nfkdTier(s: String): String = {
    val punct = Seq(
      "’" -> "'", "‘" -> "'", "“" -> "\"", "”" -> "\"",
      "—" -> "-", "–" -> "-")
    val decomposed = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
    val folded = punct.foldLeft(decomposed) { case (t, (a, b)) => t.replace(a, b) }
    folded
      .replaceAll("\\p{Mn}", "")
      .replaceAll("\\p{Cf}", "")
      .toLowerCase
      .replaceAll("[ \t\n\r]+", " ")
      .trim
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString

  test("t32 vs NFKD reference: the literal tier's gap is exactly the four compat/combining cases") {
    val dir = java.nio.file.Files.createTempDirectory("graft_norm_fix").toString
    fixture.toDF("doc_id", "text")
      .select(
        col("doc_id"), col("text"), lit("en").as("lang"), lit("fix").as("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    val literal = queries.DocQueries
      .textNormalize(spark, dir)
      .select("doc_id", "norm_md5")
      .as[(Long, String)].collect().toMap
    assert(literal.keySet == fixture.map(_._1).toSet)
    val divergent = fixture.collect {
      case (id, text) if literal(id) != md5Hex(nfkdTier(text)) => id
    }.toSet
    // PINNED divergence: combining accents (11), ligatures (13),
    // fullwidth letters (16), superscripts (17) — the compatibility-form
    // and combining-mark cases only a real Unicode normalizer folds.
    // Everything the literal tier CLAIMS (precomposed accents,
    // typographic punctuation, zero-width/NBSP, uppercase accents via
    // lower(), plain ASCII) matches the reference bit-for-bit, and the
    // undecomposable ø is a shared, honest miss of both tiers.
    assert(divergent == Set(11L, 13L, 16L, 17L),
      s"literal-tier divergence drifted: $divergent")
  }
}
