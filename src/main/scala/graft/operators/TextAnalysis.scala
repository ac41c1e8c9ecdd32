package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, word shingles, MinHash signatures, SimHash, language-ID
  * scoring, quality features, fingerprints.
  *
  * Everything here is a pure `Column` expression (codegen-friendly
  * built-ins + higher-order array functions) — no UDFs, no shuffles. The
  * shuffling operators that consume these live in [[Dedup]].
  *
  * Determinism note: all hashing is md5-based (same lowercase hex in every
  * engine), so results are reproducible across engines and partitionings —
  * this is what lets the DuckDB oracle check these operators exactly.
  */
object TextAnalysis {

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles; empty array when the doc has fewer than n words.
    * (The explicit guard matters: `sequence(1, 0)` would COUNT DOWN.)
    */
  def shingles(words: Column, n: Int): Column =
    when(
      size(words) >= n,
      transform(
        sequence(lit(1), size(words) - lit(n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
      .otherwise(array())

  /** MinHash signature component i: min over shingles of md5(i || shingle)
    * (Broder's min-wise independent permutations, approximated by seeded
    * cryptographic hashing). Lexicographic min over fixed-width hex ==
    * numeric min over 128 bits. Full signatures are built by
    * [[Dedup.minhashBandCandidates]] from the exploded shingle set, which
    * is the efficient form; this array-HOF form serves single-component
    * uses like [[fingerprint]].
    */
  def minhashComponent(shingleSet: Column, i: Int): Column =
    array_min(transform(shingleSet, s => md5(concat(lit(s"$i|"), s).cast("binary"))))

  /** 16-bit token hash: first 4 hex nibbles of md5(token) via a
    * position-in-alphabet decode that has an identical SQL spelling in
    * DuckDB (`instr`), avoiding engine-specific hex-to-int builtins.
    */
  val simhashTokenValueSql: String = {
    val nib = (i: Int) => s"(instr('0123456789abcdef', substring(md5(tok), ${i + 1}, 1)) - 1)"
    s"(((${nib(0)} * 16 + ${nib(1)}) * 16 + ${nib(2)}) * 16 + ${nib(3)})"
  }

  /** Per-bit +-1 contribution columns c0..c15 from the 16-bit token value
    * (MSB first). Summed per doc and sign-thresholded by [[Dedup.simhash16]].
    * Bit test is modulo-only (`v % 2^(16-j) >= 2^(15-j)`) — pure integer
    * arithmetic with identical semantics in every SQL dialect, dodging
    * cast-truncation-vs-rounding divergence.
    */
  def simhashContribs(v16: Column): Seq[Column] =
    (0 until 16).map { j =>
      val m = 1 << (16 - j)
      val h = 1 << (15 - j)
      when((v16 % lit(m)) >= lit(h), lit(1L)).otherwise(lit(-1L)).as(s"c$j")
    }

  /** Tiny stopword profiles for heuristic language-ID scoring. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "en", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** Number of tokens contained in a profile's stopword set. */
  def profileScore(words: Column, profile: Seq[String]): Column =
    size(filter(words, t => t.isInCollection(profile))).cast("long")

  /** Character-trigram language profiles (most-frequent trigrams per
    * language, including word-boundary spaces — the classic Cavnar-Trenkle
    * n-gram heuristic, truncated to a handful of high-signal grams).
    */
  val charTrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", " th", "ing", "and", " of"),
    "es" -> Seq(" de", "os ", " la", "ión", "ent", " el"),
    "de" -> Seq("en ", "er ", "ch", " de", "ein", "sch"),
    "fr" -> Seq(" de", "es ", "le ", "ent", " le", "que"))

  /** Count of profile n-gram occurrences in the raw text (overlapping,
    * via substring containment scan over each gram).
    */
  def charNgramScore(text: Column, grams: Seq[String]): Column =
    grams
      .map(g => (length(text) - length(replace(text, lit(g), lit("")))) / lit(g.length))
      .reduce(_ + _)
      .cast("long")

  /** English-ish stopwords for the quality-score ratio. */
  val qualityStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Sum of token lengths (exact integer — basis for mean token length). */
  def sumTokenLength(words: Column): Column =
    aggregate(transform(words, t => length(t)), lit(0), (acc, x) => acc + x).cast("long")

  /** Rolling-hash document fingerprint: min md5 over 5-gram shingles,
    * falling back to md5(text) for very short docs.
    */
  def fingerprint(text: Column): Column =
    coalesce(
      minhashComponent(graft.functions.WordShingles.wordShingles(text, 5), 0),
      md5(text.cast("binary")))
}
