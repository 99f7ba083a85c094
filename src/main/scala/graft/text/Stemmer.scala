package graft.text

/** Porter2 ("Snowball English") stemmer, implemented from the published
  * algorithm description at snowballstem.org/algorithms/english/stemmer.html.
  *
  * Mirrors the behavior of the reference's rust-stemmers English stemmer
  * used by `text_to_stem_array` (lantern_extras/src/stemmers.rs:95-116),
  * e.g. "jumps" -> "jump", "lazy" -> "lazi".
  *
  * Thread-safe, allocation-light; called from Catalyst expression codegen,
  * so keep it a static pure function.
  */
object Stemmer {

  private val vowels = "aeiouy".toSet
  private val doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val validLiEnding = "cdeghkmnrt".toSet

  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2: Set[String] =
    Set("inning", "outing", "canning", "herring", "earring",
      "proceed", "exceed", "succeed")

  private def isVowel(w: String, i: Int): Boolean = vowels.contains(w(i))

  /** True if w(i) is a short syllable ending at i (inclusive). */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w, 0) && !isVowel(w, 1)
    else if (n >= 3) {
      val c = w(n - 1)
      !isVowel(w, n - 3) && isVowel(w, n - 2) &&
        !vowels.contains(c) && c != 'w' && c != 'x' && c != 'Y'
    } else false
  }

  /** Compute R1 start index, with special prefixes per the algorithm. */
  private def r1Of(w: String): Int = {
    if (w.startsWith("gener")) 5
    else if (w.startsWith("commun")) 6
    else if (w.startsWith("arsen")) 5
    else regionAfterVowelNonVowel(w, 0)
  }

  private def regionAfterVowelNonVowel(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w, i)) i += 1
    while (i < w.length && isVowel(w, i)) i += 1
    if (i < w.length) i + 1 else w.length
  }

  def stem(input: String): String = {
    if (input.length <= 2) return input
    var w = input
    if (w.startsWith("'")) w = w.substring(1)
    exceptions1.get(w) match {
      case Some(s) => return s
      case None =>
    }
    if (w.length <= 2) return w

    // Initial y, and y after a vowel, are consonants: mark as Y
    // ('Y' is not in `vowels`, so subsequent tests treat it as such).
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb(0) == 'y') sb(0) = 'Y'
    var i = 1
    while (i < sb.length) {
      if (sb(i) == 'y' && vowels.contains(sb(i - 1))) sb(i) = 'Y'
      i += 1
    }
    w = sb.toString

    val r1 = r1Of(w)
    val r2 = regionAfterVowelNonVowel(w, math.min(r1, w.length))

    // Step 0: drop longest of ' / 's / 's'
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("us") || w.endsWith("ss")) {
      // leave
    } else if (w.endsWith("s")) {
      // delete if the preceding part contains a vowel not immediately
      // before the s
      val stemPart = w.dropRight(1)
      var hasV = false
      var j = 0
      while (j < stemPart.length - 1 && !hasV) {
        if (vowels.contains(stemPart(j))) hasV = true
        j += 1
      }
      if (hasV) w = stemPart
    }

    if (exceptions2.contains(w)) return w.replace('Y', 'y')

    def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2

    // Step 1b
    val step1bDone: Boolean = {
      if (w.endsWith("eedly")) {
        if (inR1(5)) w = w.dropRight(3); true
      } else if (w.endsWith("eed")) {
        if (inR1(3)) w = w.dropRight(1); true
      } else false
    }
    if (!step1bDone) {
      val suf = Seq("ingly", "edly", "ing", "ed").find(w.endsWith(_))
      suf match {
        case Some(s) =>
          val stemPart = w.dropRight(s.length)
          if (stemPart.exists(vowels.contains)) {
            w = stemPart
            if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) {
              w = w + "e"
            } else if (w.length >= 2 && doubles.contains(w.takeRight(2))) {
              w = w.dropRight(1)
            } else if (r1 >= w.length && endsShortSyllable(w)) {
              // word is short: R1 empty and ends in short syllable
              w = w + "e"
            }
          }
        case None =>
      }
    }

    // Step 1c: y/Y -> i if preceded by a non-vowel which is not first char
    if ((w.endsWith("y") || w.endsWith("Y")) && w.length > 2 &&
        !vowels.contains(w(w.length - 2))) {
      w = w.dropRight(1) + "i"
    }

    // Step 2 (longest suffix, in R1)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    locally {
      var done = false
      val it = step2.iterator
      while (!done && it.hasNext) {
        val (suf, rep) = it.next()
        if (w.endsWith(suf)) {
          done = true
          if (inR1(suf.length)) {
            if (suf == "ogi") {
              if (w.length > 3 && w(w.length - 4) == 'l') w = w.dropRight(3) + rep
            } else if (suf == "li") {
              if (w.length > 2 && validLiEnding.contains(w(w.length - 3))) {
                w = w.dropRight(2)
              }
            } else {
              w = w.dropRight(suf.length) + rep
            }
          }
        }
      }
    }

    // Step 3 (longest suffix, in R1)
    {
      val step3: Seq[(String, String)] = Seq(
        "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
        "icate" -> "ic", "iciti" -> "ic", "ical" -> "ic",
        "ative" -> "", "ful" -> "", "ness" -> "")
      var done = false
      val it = step3.iterator
      while (!done && it.hasNext) {
        val (suf, rep) = it.next()
        if (w.endsWith(suf)) {
          done = true
          if (inR1(suf.length)) {
            if (suf == "ative") {
              if (inR2(5)) w = w.dropRight(5)
            } else {
              w = w.dropRight(suf.length) + rep
            }
          }
        }
      }
    }

    // Step 4 (longest suffix, in R2)
    {
      val step4: Seq[String] = Seq(
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic")
      var done = false
      val it = step4.iterator
      while (!done && it.hasNext) {
        val suf = it.next()
        if (w.endsWith(suf)) {
          done = true
          if (inR2(suf.length)) {
            if (suf == "ion") {
              val p = w.length - 4
              if (p >= 0 && (w(p) == 's' || w(p) == 't')) w = w.dropRight(3)
            } else {
              w = w.dropRight(suf.length)
            }
          }
        }
      }
    }

    // Step 5
    if (w.endsWith("e")) {
      if (inR2(1)) w = w.dropRight(1)
      else if (inR1(1) && !endsShortSyllable(w.dropRight(1))) w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (inR2(1) && w.length >= 2 && w(w.length - 2) == 'l') w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }

  /** The reference's 33 stopwords (lantern_extras/src/stemmers.rs:99-103),
    * applied to stems. */
  val stopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")

  /** Full `text_to_stem_array` pipeline: lowercase, non-alphanumeric to
    * space, split, stem each token, drop stopwords (post-stem, as the
    * reference does). */
  def stemTokens(input: String): Array[String] =
    stemTokens(input, stopWords)

  /** Same pipeline with a caller-supplied stopword set (the reference's
    * `set_user_stopwords` replaces the dictionary's stopword file —
    * lantern_extras/src/stemmers.rs:24-63). */
  def stemTokens(input: String, stops: Set[String]): Array[String] = {
    val cleaned = input.toLowerCase.map(c => if (c.isLetterOrDigit) c else ' ')
    cleaned.split("\\s+").iterator
      .filter(_.nonEmpty)
      .map(stem)
      .filterNot(stops.contains)
      .toArray
  }

  /** Tokenize without stemming/stopwords (building block for the
    * SQL-oracle-checkable text ops). */
  def tokens(input: String): Array[String] = {
    val cleaned = input.toLowerCase.map(c => if (c.isLetterOrDigit) c else ' ')
    cleaned.split("\\s+").filter(_.nonEmpty)
  }
}
