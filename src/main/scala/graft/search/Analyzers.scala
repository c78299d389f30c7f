package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable full-text analyzers — the seam the reference exposes as
  * per-namespace analyzer configuration
  * (bigdata-core/bigdata/src/java/com/bigdata/search/
  * ConfigurableAnalyzerFactory.java:110, DefaultAnalyzerFactory.java):
  * Blazegraph picks a Lucene analyzer per language tag, with
  * configurable stopwords, so `bds:search` works on non-Latin corpora.
  * Graft's analyzers are Column transforms (text → array of terms)
  * built entirely from codegen'd SQL functions — no UDFs — so the
  * tokenize stage stays inside whole-stage codegen at any scale.
  *
  * [[Analyzer.Latin]] reproduces the previous behavior (lowercased
  * alnum runs). [[Analyzer.Cjk]] emits overlapping character bigrams
  * over Han/Hiragana/Katakana/Hangul runs (the Lucene CJKAnalyzer
  * strategy — CJK scripts have no word delimiters, so a [a-z0-9]+
  * tokenizer silently returns nothing) and still tokenizes embedded
  * Latin runs as words, so mixed-script documents index fully. Both
  * take a stopword set, applied post-tokenize like Lucene stop
  * filters. [[Analyzer.forLanguage]] is the per-language registry. */
trait Analyzer extends Serializable {
  /** text column → array<string> of index/query terms */
  def tokenize(c: Column): Column

  /** driver-side tokenization of a QUERY string — must agree with
    * [[tokenize]] so `bds:query "分布式数据库"` turns into the same
    * bigrams the index holds. Query strings are tiny; this never runs
    * on data. */
  def tokenizeLocal(s: String): Seq[String]
}

object Analyzer {

  private def dropStops(terms: Column, stopwords: Set[String]): Column =
    if (stopwords.isEmpty) terms
    else {
      val stops = array(stopwords.toSeq.sorted.map(lit): _*)
      filter(terms, t => !array_contains(stops, t))
    }

  /** Lowercased [a-z0-9]+ runs — the default analyzer (and exactly the
    * tokenization every existing oracle replays). */
  case class Latin(stopwords: Set[String] = Set.empty) extends Analyzer {
    def tokenize(c: Column): Column =
      dropStops(filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0),
        stopwords)
    def tokenizeLocal(s: String): Seq[String] =
      s.toLowerCase.split("[^a-z0-9]+").toSeq
        .filter(t => t.nonEmpty && !stopwords(t))
  }

  private val CjkRun = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]+"

  /** CJK bigram analyzer: each maximal CJK-script run of length n
    * yields its n−1 overlapping bigrams (a length-1 run yields the
    * single character); Latin runs inside the same text tokenize as
    * [[Latin]] words. Overlapping bigrams make substring search work
    * without dictionaries: a query phrase tokenizes into bigrams that
    * all occur in any document containing the phrase. */
  case class Cjk(stopwords: Set[String] = Set.empty) extends Analyzer {
    def tokenize(c: Column): Column = {
      val runs = regexp_extract_all(c, lit(CjkRun), lit(0))
      val bigrams = flatten(transform(runs, r =>
        when(length(r) < 2, array(r))
          .otherwise(transform(sequence(lit(1), length(r) - 1),
            i => substring(r, i, lit(2))))))
      val latin = filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)
      dropStops(concat(bigrams, latin), stopwords)
    }
    def tokenizeLocal(s: String): Seq[String] = {
      val runs = CjkRun.r.findAllIn(s).toSeq
      val bigrams = runs.flatMap(r =>
        if (r.length < 2) Seq(r) else r.sliding(2).toSeq)
      val latin = s.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)
      (bigrams ++ latin).filterNot(stopwords)
    }
  }

  /** Language-tag registry, the ConfigurableAnalyzerFactory analog: CJK
    * languages get the bigram analyzer, everything else Latin. A
    * deployment overrides per namespace by passing an Analyzer
    * directly to [[FullText]]. */
  def forLanguage(lang: String, stopwords: Set[String] = Set.empty): Analyzer =
    lang.toLowerCase.takeWhile(_ != '-') match {
      case "zh" | "ja" | "ko" => Cjk(stopwords)
      case _                  => Latin(stopwords)
    }

  /** `bds:analyzer` option values: an analyzer name or a language tag. */
  def byName(name: String, stopwords: Set[String] = Set.empty): Analyzer =
    name.toLowerCase match {
      case "cjk"   => Cjk(stopwords)
      case "latin" => Latin(stopwords)
      case lang    => forLanguage(lang, stopwords)
    }
}
