package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Porter's suffix-stripping stemmer (Porter 1980, "An algorithm for
  * suffix stripping" — the algorithm behind Lucene's EnglishAnalyzer,
  * which the reference wires as its default English analyzer:
  * bigdata-core/bigdata/src/java/com/bigdata/search/
  * DefaultAnalyzerFactory.java:69). Stemming at BOTH index and query
  * time makes "databases" match "database" — the everyday-recall gap
  * a surface-form index has.
  *
  * Operates only on pure a-z tokens (post-lowercase); anything else —
  * digits, CJK bigrams, diacritics — passes through unchanged, so the
  * stemmer composes safely behind any tokenizer. Pure JVM code: it is
  * invoked from inside the [[AnalyzeText]] codegen expression, never
  * as an interpreted per-token lambda.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length < 3) return word
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word
      i += 1
    }
    val s = new Stem(word.toCharArray)
    s.run()
    new String(s.b, 0, s.k + 1)
  }

  /** One stem evaluation over a char buffer; `k` is the index of the
    * last live char, `j` the candidate stem end set by `ends`. */
  private final class Stem(val b: Array[Char]) {
    var k: Int = b.length - 1
    private var j: Int = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y'                         => if (i == 0) true else !cons(i - 1)
      case _                           => true
    }

    /** measure: number of vowel→consonant transitions in b[0..j] */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return 0
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1; n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** consonant–vowel–consonant ending, last consonant not w/x/y:
      * the "short word" test that restores a trailing e (hop→hope). */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val c = b(i)
      c != 'w' && c != 'x' && c != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
      j = k - l
      true
    }

    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    /** plurals and -ed/-ing */
    private def step1(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          val c = b(k)
          if (c != 'l' && c != 's' && c != 'z') k -= 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    /** terminal y → i when another vowel is in the stem */
    private def step2(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** double suffixes → single (ization → ize, ational → ate, …) */
    private def step3(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' => if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble")
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' => if (ends("logi")) r("log")
        case _   =>
      }
    }

    /** -ic-, -full, -ness */
    private def step4(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' => if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' => if (ends("ness")) r("")
      case _   =>
    }

    /** drop -ant, -ence, … when the measure is high enough */
    private def step5(): Unit = {
      if (k == 0) return
      val hit = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _   => false
      }
      if (hit && m() > 1) k = j
    }

    /** final -e and -ll cleanup */
    private def step6(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }

    def run(): Unit = {
      if (k <= 1) return
      step1(); step2(); step3(); step4(); step5(); step6()
    }
  }
}

/** Light stemmers for German / French / Spanish / Russian / Italian /
  * Portuguese / Dutch — Savoy-style suffix-and-diacritic
  * normalization (Savoy 2006, "Light stemming approaches…"; the
  * recall tier the reference gets from its per-language Lucene
  * analyzers, DefaultAnalyzerFactory.java:69 and
  * ConfigurableAnalyzerFactory.java:50, which wire the full Lucene
  * natural-language set incl. ru/it/pt/nl).
  * Deliberately SHALLOW: plural/case/gender markers and diacritic
  * folding only, no morphological analysis — light stemming is the
  * documented sweet spot for European-language retrieval (full
  * Snowball gains little and overstems). Each stemmer folds its
  * language's diacritics first so inflected and folded surface forms
  * meet at the same term (Häuser/hauser → haus).
  *
  * All operate on lowercased tokens; tokens containing digits pass
  * through untouched (product codes, versions). Applied identically
  * at index and query time through the one [[Tokenize]] body. */
object LightStemmer {

  // per-language fold tables hoisted to vals: fold runs per token per
  // row inside the AnalyzeText codegen hot path, so it must not
  // allocate a Map per call
  private val deFold = Map('ä' -> "a", 'ö' -> "o", 'ü' -> "u", 'ß' -> "ss")
  private val frFold = Map('à' -> "a", 'â' -> "a", 'ç' -> "c", 'é' -> "e",
    'è' -> "e", 'ê' -> "e", 'ë' -> "e", 'î' -> "i", 'ï' -> "i",
    'ô' -> "o", 'û' -> "u", 'ù' -> "u", 'ü' -> "u")
  private val esFold = Map('á' -> "a", 'é' -> "e", 'í' -> "i", 'ó' -> "o",
    'ú' -> "u", 'ü' -> "u", 'ñ' -> "n")

  private def fold(w: String, m: Map[Char, String]): String = {
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      m.get(c) match {
        case Some(r) => sb.append(r)
        case None    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def hasDigit(w: String): Boolean = w.exists(c => c >= '0' && c <= '9')

  /** umlaut folding + plural/case suffixes (-ern/-em/-en/-er/-es,
    * then a single -e/-n/-s), stem floor 4 chars. */
  def de(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, deFold)
    val long = Seq("ern", "em", "en", "er", "es")
    long.find(s => w.length - s.length >= 4 && w.endsWith(s)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        if (w.length >= 5 && (w.endsWith("e") || w.endsWith("n") || w.endsWith("s")))
          w = w.dropRight(1)
    }
    w
  }

  /** -aux→al, plural -es/-s/-x, mute final -e, final double-consonant
    * reduction (chattes → chatte → chatt → chat), stem floor 4. */
  def fr(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, frFold)
    if (w.length >= 6 && w.endsWith("aux")) w = w.dropRight(3) + "al"
    else {
      if (w.length >= 5 && (w.endsWith("s") || w.endsWith("x"))) w = w.dropRight(1)
      if (w.length >= 5 && w.endsWith("e")) w = w.dropRight(1)
      if (w.length >= 5 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
          !"aeiou".contains(w.charAt(w.length - 1)))
        w = w.dropRight(1)
    }
    w
  }

  /** accent folding, -ces→z (luces→luz), plural -es/-s, gender/theme
    * vowel -o/-a/-e, stem floor 4. */
  def es(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, esFold)
    if (w.length >= 5 && w.endsWith("ces")) w = w.dropRight(3) + "z"
    else {
      if (w.length >= 6 && w.endsWith("es")) w = w.dropRight(2)
      else if (w.length >= 5 && w.endsWith("s")) w = w.dropRight(1)
      if (w.length >= 5 && "oae".contains(w.charAt(w.length - 1)))
        w = w.dropRight(1)
    }
    w
  }

  private val ruFold = Map('ё' -> "е")
  // adjective + noun case endings, longest-first; one suffix strips
  // per word (light), stem floor 3 chars
  private val ruSuffixes = Seq(
    "иями", "оями",
    "ами", "ями", "ией", "иям", "иях", "оям", "оях",
    "его", "ого", "ему", "ому", "ыми", "ими",
    "ая", "яя", "ое", "ее", "ие", "ые", "ой", "ей", "ий", "ый",
    "ам", "ям", "ем", "им", "ом", "ым", "ах", "ях", "ов", "ев",
    "ую", "юю", "ью",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "э", "ю", "я")

  /** ё-folding + one adjective/noun case ending (longest-first),
    * residual soft sign; stem floor 3 chars. книги/книгами → книг,
    * красивый/красивая → красив. */
  def ru(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, ruFold)
    ruSuffixes.find(s => w.length - s.length >= 3 && w.endsWith(s)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None    =>
    }
    if (w.length >= 4 && w.endsWith("ь")) w = w.dropRight(1)
    w
  }

  private val itFold = Map('à' -> "a", 'á' -> "a", 'è' -> "e", 'é' -> "e",
    'ì' -> "i", 'í' -> "i", 'ò' -> "o", 'ó' -> "o", 'ù' -> "u", 'ú' -> "u")

  /** accent folding + final theme/plural vowel (-a/-e/-i/-o), stem
    * floor 4. libri/libro → libr, ragazzi/ragazza → ragazz. */
  def it(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, itFold)
    if (w.length >= 5 && "aeio".contains(w.charAt(w.length - 1)))
      w = w.dropRight(1)
    w
  }

  private val ptFold = Map('á' -> "a", 'â' -> "a", 'ã' -> "a", 'é' -> "e",
    'ê' -> "e", 'í' -> "i", 'ó' -> "o", 'ô' -> "o", 'õ' -> "o",
    'ú' -> "u", 'ç' -> "c")

  /** accent/cedilla folding, -ões→-ão plural restore, consonant-stem
    * plural -es, plural -s, final theme vowel; stem floor 4.
    * canções/canção → canca, flores/flor → flor, livros/livro → livr. */
  def pt(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, ptFold)
    if (w.length >= 6 && w.endsWith("oes")) w = w.dropRight(3) + "ao"
    else if (w.length >= 5 && w.endsWith("es") &&
             "rslz".contains(w.charAt(w.length - 3))) w = w.dropRight(2)
    else if (w.length >= 5 && w.endsWith("s") && !w.endsWith("ss"))
      w = w.dropRight(1)
    if (w.length >= 5 && "aoe".contains(w.charAt(w.length - 1)))
      w = w.dropRight(1)
    w
  }

  private val svFold = Map('å' -> "a", 'ä' -> "a", 'ö' -> "o", 'é' -> "e")

  /** Scandinavian genitive -s, then one definite/plural/comparative
    * ending longest-first (Savoy's Swedish light-stemmer suffix
    * classes), stem floor 3. bilar/bilarna → bil, huset → hus,
    * flickorna → flick. */
  def sv(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, svFold)
    if (w.length >= 5 && w.endsWith("s") && !w.endsWith("ss")) w = w.dropRight(1)
    val sufs = Seq("heterna", "heten", "heter", "arna", "erna", "orna",
      "ande", "arne", "aste", "aren", "are", "ast", "het",
      "ar", "er", "or", "en", "at", "te", "et")
    sufs.find(s => w.length - s.length >= 3 && w.endsWith(s)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        if (w.length >= 4 && "taen".contains(w.charAt(w.length - 1)))
          w = w.dropRight(1)
    }
    w
  }

  private val noFold = Map('å' -> "a", 'æ' -> "a", 'ø' -> "o", 'é' -> "e")

  /** Norwegian (Bokmål) light: genitive -s, -het(en/er) nominals, then
    * definite/plural endings (-ene/-ane/-en/-et/-er/-a/-e), stem
    * floor 3. boken/bokene → bok, huset/husene → hus. */
  def no(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, noFold)
    if (w.length >= 5 && w.endsWith("s") && !w.endsWith("ss")) w = w.dropRight(1)
    val sufs = Seq("hetene", "hetens", "heten", "heter", "het",
      "ene", "ane", "en", "et", "er", "a", "e")
    sufs.find(s => w.length - s.length >= 3 && w.endsWith(s)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None    =>
    }
    w
  }

  private val daFold = Map('å' -> "a", 'æ' -> "a", 'ø' -> "o", 'é' -> "e")

  /** Danish light: genitive -s, then one definite/plural ending
    * (-erne/-ende/-ene/-er/-en/-et/-es/-e), stem floor 3.
    * bilerne/biler → bil, husene/huset → hus. */
  def da(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, daFold)
    if (w.length >= 5 && w.endsWith("s") && !w.endsWith("ss")) w = w.dropRight(1)
    val sufs = Seq("erne", "ende", "ene", "er", "en", "et", "es", "e")
    sufs.find(s => w.length - s.length >= 3 && w.endsWith(s)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None    =>
    }
    w
  }

  private val fiFold = Map('ä' -> "a", 'ö' -> "o")

  /** Finnish light (case-ending tier of an agglutinative language):
    * vowel-harmony folding (ä/ö → a/o so -ssa/-ssä collapse), then ONE
    * case/number ending longest-first — plural locatives (-issa/-ista/
    * -illa/-ilta/-ille), singular locatives (-ssa/-sta/-lla/-lta/-lle),
    * translative -ksi, essive -na; otherwise a bare genitive -n
    * (floor 4) or plural -t (floor 5). Stem floor 3 on the case
    * endings. Partitive -a is deliberately NOT stripped: a bare
    * trailing -a is usually part of the stem (kirja), and the
    * false-merge cost outweighs the recall on this shallow tier.
    * talossa/taloissa/talon → talo, kirjasta/kirjalla → kirja. */
  def fi(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, fiFold)
    val sufs = Seq("issa", "ista", "illa", "ilta", "ille", "iksi", "ina",
      "ssa", "sta", "lla", "lta", "lle", "ksi", "na")
    sufs.find(s => w.length - s.length >= 3 && w.endsWith(s)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        if (w.length >= 4 && w.endsWith("n")) w = w.dropRight(1)
        else if (w.length >= 5 && w.endsWith("t")) w = w.dropRight(1)
    }
    w
  }

  /** Czech light (Dolamic–Savoy case-ending tier, diacritics KEPT —
    * háčky are phonemic and the palatalized stem must still match):
    * one noun/adjective case ending longest-first, stem floor 3.
    * hradem/hrady/hradů → hrad, města/městě → měst,
    * nového/novému → nov. */
  def cs(word: String): String = {
    if (hasDigit(word)) return word
    var w = word
    val sufs = Seq("atech", "atům", "ými", "ami", "emi", "ěmi", "ové", "ovi",
      "ého", "ému", "ách", "ata", "aty", "ých", "ích", "ího", "ímu",
      "ech", "ich", "ími",
      "em", "ém", "ím", "ům", "át", "ám", "ým", "mi", "ou", "es", "os", "us",
      "e", "i", "í", "ě", "u", "y", "ů", "a", "o", "á", "é", "ý")
    sufs.find(s => w.length - s.length >= 3 && w.endsWith(s)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None    =>
    }
    w
  }

  private val nlFold = Map('ä' -> "a", 'ë' -> "e", 'ï' -> "i", 'ö' -> "o",
    'ü' -> "u", 'é' -> "e", 'è' -> "e")

  /** diaeresis/accent folding, diminutive -(t)je(s), plural -en with
    * final-consonant undoubling (katten → kat), plural -s, final -e;
    * stem floor 4. boeken → boek, huisje/huis → huis. */
  def nl(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, nlFold)
    if (w.length >= 7 && w.endsWith("tjes")) w = w.dropRight(4)
    else if (w.length >= 6 && w.endsWith("jes")) w = w.dropRight(3)
    else if (w.length >= 6 && w.endsWith("je")) w = w.dropRight(2)
    else if (w.length >= 6 && w.endsWith("en")) {
      w = w.dropRight(2)
      if (w.length >= 4 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
          !"aeiou".contains(w.charAt(w.length - 1))) w = w.dropRight(1)
    }
    else if (w.length >= 5 && w.endsWith("s") && !w.endsWith("ss"))
      w = w.dropRight(1)
    else if (w.length >= 5 && w.endsWith("e")) w = w.dropRight(1)
    w
  }

  // tonos/dialytika folding + final-sigma normalization (ς→σ) so
  // word-final and word-internal sigma conflate before suffix checks
  private val elFold = Map('ά' -> "α", 'έ' -> "ε", 'ή' -> "η", 'ί' -> "ι",
    'ό' -> "ο", 'ύ' -> "υ", 'ώ' -> "ω", 'ϊ' -> "ι", 'ϋ' -> "υ",
    'ΐ' -> "ι", 'ΰ' -> "υ", 'ς' -> "σ")
  // noun/adjective case+number endings, longest-first; -μα neuters
  // keep their stem (γράμματα/γράμματος → γραμ); one strip per word
  private val elSuffixes = Seq(
    "ματων", "ματοσ", "ματα",
    "ουσ", "εισ", "εων", "ιου", "ιων",
    "ων", "ου", "οι", "αι", "ια", "ιο", "εσ", "ασ", "ησ", "οσ", "υσ",
    "α", "ε", "η", "ι", "ο", "υ", "ω")

  /** Greek light stemmer (the GreekAnalyzer recall tier,
    * ConfigurableAnalyzerFactory.java:144): accent folding, final-sigma
    * normalization, one case/number ending longest-first; stem floor 3.
    * καλός/καλή/καλές → καλ, βιβλίο/βιβλία → βιβλι. */
  def el(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, elFold)
    elSuffixes.find(s => w.length - s.length >= 3 && w.endsWith(s)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None    =>
    }
    w
  }

  // Arabic orthographic normalization table (the Lucene
  // ArabicNormalizer character set): alef variants آ/أ/إ fold to bare
  // alef, dotless ya ى → ya ي, teh marbuta ة → ha ه, tatweel (kashida)
  // drops, and the harakat/tashkeel diacritics (U+064B–U+0652) drop —
  // vowelized, hamza-carried and elongated spellings of one word meet
  // at one term
  private val arFold: Map[Char, String] =
    (Seq('آ' -> "ا", 'أ' -> "ا", 'إ' -> "ا",
      'ى' -> "ي", 'ة' -> "ه", 'ـ' -> "") ++
      ('ً' to 'ْ').map(_ -> "")).toMap

  /** Arabic normalization pass — folding ONLY, deliberately no
    * stemming (Arabic templatic morphology makes suffix stripping
    * wrong more often than right at the light tier; the reference's
    * ArabicAnalyzer pairs this exact normalizer with a root stemmer a
    * deployment can choose to forgo). Opt-in via
    * `byName("ar-norm")`; the plain `ar` tag keeps surface-form
    * Unicode indexing, the documented default. */
  def ar(word: String): String = {
    if (hasDigit(word)) return word
    fold(word, arFold)
  }

  // Turkish folding: dotless ı meets i — the TurkishLowerCaseFilter
  // hazard resolved at the STEM layer, where both the index and the
  // query path pass: the tokenizer's locale-generic lowercase maps
  // 'I' → 'i' (never 'ı'), so folding ı → i is the one assignment
  // that makes correctly-written ısparta and all-caps ISPARTA meet at
  // a single term. Circumflexed loan vowels fold bare.
  private val trFold = Map('ı' -> "i", 'â' -> "a", 'î' -> "i", 'û' -> "u")

  /** Turkish light stemmer (the TurkishAnalyzer recall tier, light
    * suffix classes per Can et al. 2008's light tier): one OUTERMOST
    * inflection block strips — a plural-group compound (lar/ler plus
    * any attached possessive/case, stem floor 2: evler → ev,
    * arabaların → araba, kitaplardan → kitap), else one case/
    * possessive ending longest-first (floor 3), else one final
    * vowel (floor 3 — the accusative/possessive tail: evleri →
    * evler), and any bare plural left under a stripped ending goes
    * too. Suffix tables are written POST-fold (ı already folded to
    * i). Consonant mutation (kitabı → kitab vs kitap) is out of the
    * light tier's scope — both index and query stem identically, so
    * recall holds; the trade is the same one the de/fr/sv tiers
    * document. */
  def tr(word: String): String = {
    if (hasDigit(word)) return word
    var w = fold(word, trFold)
    val plural = Seq("larindan", "lerinden", "larinda", "lerinde",
      "larini", "lerini", "larin", "lerin", "lardan", "lerden",
      "larda", "lerde", "lara", "lere", "lari", "leri", "lar", "ler")
    // no early return: the plural-stripped word continues through the
    // case/vowel passes so the inflected and BARE forms of one root
    // stem identically (arabalar → araba → arab == araba → arab)
    plural.find(s => w.length - s.length >= 2 && w.endsWith(s))
      .foreach(s => w = w.dropRight(s.length))
    val cases = Seq("indan", "inden", "undan", "ünden",
      "inda", "inde", "unda", "ünde", "imiz", "umuz", "ümüz",
      "dan", "den", "tan", "ten", "nin", "nun", "nün",
      "in", "un", "ün", "da", "de", "ta", "te",
      "si", "su", "sü", "im", "um", "üm")
    cases.find(s => w.length - s.length >= 3 && w.endsWith(s)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        if (w.length >= 4 && "iuüae".contains(w.charAt(w.length - 1)))
          w = w.dropRight(1)
    }
    Seq("lar", "ler").find(s => w.length - s.length >= 2 && w.endsWith(s))
      .foreach(s => w = w.dropRight(s.length))
    w
  }
}

/** The single tokenizer implementation shared by the [[AnalyzeText]]
  * codegen expression (index path, runs on data) and
  * `Analyzer.tokenizeLocal` (query path, runs on the driver) — one
  * body of code, so index-time and query-time tokenization can never
  * drift (the reference enforces the same invariant by using one
  * Lucene analyzer instance for both:
  * bigdata-core/bigdata/src/java/com/bigdata/search/FullTextIndex.java).
  *
  * Modes:
  *  - LATIN: lowercased a-z0-9 runs (the default analyzer's contract);
  *  - CJK: bigrams over Han/Hiragana/Katakana/Hangul runs of the raw
  *    text, then the LATIN tokens — bit-parity with the previous
  *    higher-order-function column formulation, but in ONE codegen
  *    call instead of an interpreted CodegenFallback lambda tree;
  *  - UNICODE: lowercased runs of Unicode letters/digits across ALL
  *    scripts — Cyrillic, Arabic, Greek, Hebrew, Devanagari, Thai …
  *    tokenize instead of silently producing zero terms; CJK segments
  *    inside a run still emit bigrams (no word delimiters to split on).
  *
  * Scans by CODEPOINT (supplementary Han stays whole); stopwords drop
  * before stemming (the Lucene EnglishAnalyzer filter order).
  */
object Tokenize {
  final val LATIN = 0
  final val CJK = 1
  final val UNICODE = 2
  final val THAI = 3

  private def isCjkCp(cp: Int): Boolean = {
    val s = Character.UnicodeScript.of(cp)
    (s eq Character.UnicodeScript.HAN) || (s eq Character.UnicodeScript.HIRAGANA) ||
      (s eq Character.UnicodeScript.KATAKANA) || (s eq Character.UnicodeScript.HANGUL)
  }

  // Thai script has no word delimiters AND writes vowels/tones as
  // combining marks — a letter-run tokenizer both fails to split words
  // and SPLITS INSIDE them (ข้อมูล breaks at the ้/ู marks). A Thai
  // "character" for run purposes is any Thai-script letter or mark.
  private def isThaiCp(cp: Int): Boolean =
    (Character.UnicodeScript.of(cp) eq Character.UnicodeScript.THAI) && {
      val t = Character.getType(cp)
      Character.isLetterOrDigit(cp) ||
        t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK
    }

  // the JDK's dictionary-based Thai word BreakIterator (the same
  // segmentation engine Lucene's ThaiTokenizer wraps); BreakIterator
  // is stateful → one per executor thread
  private val thaiBreak = new ThreadLocal[java.text.BreakIterator] {
    override def initialValue(): java.text.BreakIterator =
      java.text.BreakIterator.getWordInstance(new java.util.Locale("th"))
  }

  /** dictionary word segmentation of one maximal Thai-script run */
  private def thaiWords(seg: String, out: ArrayBuffer[String]): Unit = {
    val bi = thaiBreak.get()
    bi.setText(seg)
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      if (end > start) out += seg.substring(start, end)
      start = end
      end = bi.next()
    }
  }

  /** [[unicodeRuns]] with Thai-script runs dictionary-segmented — the
    * Lucene ThaiAnalyzer strategy (the reference's default for `tha`,
    * ConfigurableAnalyzerFactory.java:149). Pure segmentation: every
    * token is a substring of the lowercased text. */
  private def thaiRuns(text: String, out: ArrayBuffer[String]): Unit = {
    val t = text.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder   // current non-CJK non-Thai segment
    val cjk = new java.lang.StringBuilder  // current CJK segment
    val th = new java.lang.StringBuilder   // current Thai segment
    def flushWord(): Unit =
      if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
    def flushCjk(): Unit = if (cjk.length > 0) {
      cjkBigrams(cjk.toString, out); cjk.setLength(0)
    }
    def flushThai(): Unit = if (th.length > 0) {
      thaiWords(th.toString, out); th.setLength(0)
    }
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      if (isThaiCp(cp)) { flushWord(); flushCjk(); th.appendCodePoint(cp) }
      else if (Character.isLetter(cp) || Character.isDigit(cp)) {
        if (isCjkCp(cp)) { flushWord(); flushThai(); cjk.appendCodePoint(cp) }
        else { flushCjk(); flushThai(); sb.appendCodePoint(cp) }
      } else { flushWord(); flushCjk(); flushThai() }
      i += Character.charCount(cp)
    }
    flushWord(); flushCjk(); flushThai()
  }

  private def latinRuns(text: String, out: ArrayBuffer[String]): Unit = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= text.length) {
      val c = if (i < text.length) text.charAt(i) else ' '
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
  }

  /** ASCII-only uppercase needs the full lowercase pass the SQL
    * `lower()` does (e.g. İ lowercases to i + combining dot, keeping
    * the i); run it before extracting a-z0-9 runs for parity with the
    * previous `split(lower(c), …)` column. */
  private def latinRunsLowered(text: String, out: ArrayBuffer[String]): Unit =
    latinRuns(text.toLowerCase(java.util.Locale.ROOT), out)

  /** bigrams of each maximal CJK run (length-1 run → the single char) */
  private def cjkBigrams(text: String, out: ArrayBuffer[String]): Unit = {
    val run = new ArrayBuffer[Int](16)
    def flush(): Unit = {
      if (run.length == 1) out += new String(Character.toChars(run(0)))
      else {
        var i = 0
        while (i + 1 < run.length) {
          out += new String(Character.toChars(run(i))) +
            new String(Character.toChars(run(i + 1)))
          i += 1
        }
      }
      run.clear()
    }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (isCjkCp(cp)) run += cp
      else if (run.nonEmpty) flush()
      i += Character.charCount(cp)
    }
    if (run.nonEmpty) flush()
  }

  /** lowercased letter/digit runs over ALL scripts; CJK segments
    * inside a run emit bigrams, everything else emits the run text */
  private def unicodeRuns(text: String, out: ArrayBuffer[String]): Unit = {
    val t = text.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder // current non-CJK segment
    val cjk = new java.lang.StringBuilder // current CJK segment
    def flushWord(): Unit =
      if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
    def flushCjk(): Unit = if (cjk.length > 0) {
      cjkBigrams(cjk.toString, out); cjk.setLength(0)
    }
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      if (Character.isLetter(cp) || Character.isDigit(cp)) {
        if (isCjkCp(cp)) { flushWord(); cjk.appendCodePoint(cp) }
        else { flushCjk(); sb.appendCodePoint(cp) }
      } else { flushWord(); flushCjk() }
      i += Character.charCount(cp)
    }
    flushWord(); flushCjk()
  }

  /** Stemmer ids for [[tokenizeJava]]'s `stemmer` parameter. */
  final val NoStem = ""
  final val Porter = "porter"

  private def stemFn(stemmer: String): String => String = stemmer match {
    case NoStem => identity
    case Porter => PorterStemmer.stem
    case "de"   => LightStemmer.de
    case "fr"   => LightStemmer.fr
    case "es"   => LightStemmer.es
    case "ru"   => LightStemmer.ru
    case "it"   => LightStemmer.it
    case "pt"   => LightStemmer.pt
    case "nl"   => LightStemmer.nl
    case "sv"   => LightStemmer.sv
    case "no"   => LightStemmer.no
    case "da"   => LightStemmer.da
    case "fi"   => LightStemmer.fi
    case "cs"   => LightStemmer.cs
    case "el"   => LightStemmer.el
    case "ar"   => LightStemmer.ar
    case "tr"   => LightStemmer.tr
    case other  => sys.error(s"unknown stemmer '$other'")
  }

  def tokenizeJava(mode: Int, stemmer: String, stops: Set[String],
                   text: String): Array[String] = {
    val out = new ArrayBuffer[String](32)
    mode match {
      case LATIN => latinRunsLowered(text, out)
      case CJK   => cjkBigrams(text, out); latinRunsLowered(text, out)
      case UNICODE => unicodeRuns(text, out)
      case THAI  => thaiRuns(text, out)
      case other => sys.error(s"unknown tokenizer mode $other")
    }
    val kept = if (stops.isEmpty) out else out.filterNot(stops)
    val res = if (stemmer == NoStem) kept else kept.map(stemFn(stemmer))
    res.toArray
  }
}

/** Native codegen tokenizer expression: text → array<string> of index
  * terms in ONE generated call. Replaces the
  * transform/flatten/sequence higher-order-function formulation, which
  * is CodegenFallback — an interpreted lambda tree evaluated per row
  * (§6.5: anything per-token belongs in a native codegen expression).
  * The per-token work runs as plain JVM code inside the generated
  * consume(), so the scan stage keeps its WholeStageCodegen span. */
case class AnalyzeText(child: Expression, mode: Int, stemmer: String,
                       stopwords: Set[String]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"analyze_text needs STRING, got ${child.dataType}")

  /** Executor-side tokenize (also the codegen target via reference obj). */
  def run(s: UTF8String): ArrayData = {
    val toks = Tokenize.tokenizeJava(mode, stemmer, stopwords, s.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(v: Any): Any = run(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("analyzeText", this, classOf[AnalyzeText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.run($c);")
  }

  override protected def withNewChildInternal(c: Expression): AnalyzeText =
    copy(child = c)
}

object AnalyzeText {
  def analyze_text(c: Column, mode: Int, stemmer: String,
                   stopwords: Set[String]): Column =
    Shim.column(AnalyzeText(Shim.expression(c), mode, stemmer, stopwords))
}

/** Term-completion tokenizer (reference:
  * bigdata/src/java/com/bigdata/search/TermCompletionAnalyzer.java —
  * drop-down completion over technical vocabularies): each
  * `wordBoundary`-separated word emits the word itself plus the
  * suffix after every `subWord` boundary match, so a prefix query
  * `tim*` finds "half-time" and `Ana*` finds "TermCompletionAnalyzer"
  * (with subWord = a case-change pattern). With `soft` hyphens given,
  * a term containing them ALSO emits the hyphen-discarded form
  * ("halft*" finds "half-time" via "halftime"); terms stay verbatim
  * otherwise (no lowercasing — the reference pairs this with a
  * KeywordAnalyzer query tag). Empty suffixes are skipped. */
object TermComplete {
  def terms(wordB: java.util.regex.Pattern, subB: java.util.regex.Pattern,
            soft: Option[java.util.regex.Pattern],
            text: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String]
    def emit(t: String): Unit = if (t.nonEmpty) {
      soft match {
        case Some(p) =>
          val m = p.matcher(t)
          if (m.find()) {
            val clean = m.replaceAll("")
            if (clean.nonEmpty) out += clean
          }
          out += t
        case None => out += t
      }
    }
    for (w <- wordB.split(text) if w.nonEmpty) {
      emit(w)
      val m = subB.matcher(w)
      var from = 1
      while (from < w.length && m.find(from)) {
        val pos = m.end()
        if (pos < w.length) emit(w.substring(pos))
        // next search starts AFTER the match end (the reference's
        // find(charPos+1) progression) — also guarantees progress on
        // zero-width boundaries like a case-change lookahead
        from = pos + 1
      }
    }
    out
  }
}

/** Native codegen expression for [[TermComplete]] — same
  * reference-object pattern as [[AnalyzeText]], so the index build
  * stays inside WholeStageCodegen. Patterns compile once per
  * (serialized) instance. */
case class TermCompleteText(child: Expression, subWord: String,
                            soft: Option[String],
                            wordBoundary: String = "\\s+") extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_complete needs STRING, got ${child.dataType}")

  @transient private lazy val wordB = java.util.regex.Pattern.compile(wordBoundary)
  @transient private lazy val subB = java.util.regex.Pattern.compile(subWord)
  @transient private lazy val softP = soft.map(java.util.regex.Pattern.compile)

  def run(s: UTF8String): ArrayData = {
    val toks = TermComplete.terms(wordB, subB, softP, s.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(v: Any): Any = run(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termComplete", this, classOf[TermCompleteText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.run($c);")
  }

  override protected def withNewChildInternal(c: Expression): TermCompleteText =
    copy(child = c)
}

object TermCompleteText {
  def term_complete(c: Column, subWord: String, soft: Option[String],
                    wordBoundary: String = "\\s+"): Column =
    Shim.column(TermCompleteText(Shim.expression(c), subWord, soft, wordBoundary))
}
