package graft.tokenize

/** Pure-Scala implementation of the Snowball "english" (Porter2) stemmer,
  * from the published algorithm at snowballstem.org/algorithms/english —
  * the same algorithm PyStemmer's `Stemmer("english")` runs, which the
  * reference harness applies to unique tokens (reference:
  * utils/__init__.py:104-126; stemmer constructed at
  * benchmark/on_bm25s.py:75 and benchmark/on_rank_bm25.py:96).
  *
  * No Lucene/snowball jar ships in this offline environment, so the
  * algorithm is re-implemented from its public specification and validated
  * against published vocabulary/output vectors in SnowballEnStemmerSpec.
  */
object SnowballEnStemmer {

  private val vowels = "aeiouy"
  @inline private def isVowel(c: Char): Boolean = vowels.indexOf(c) >= 0
  private val doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt"

  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  /** Stem one already-lowercased token. Thread-safe, allocation-light. */
  def stem(word0: String): String = {
    if (word0.length <= 2) return word0
    var w = word0
    // strip leading apostrophe (both ASCII and typographic forms are
    // normalized by Snowball's own test harness to ASCII ')
    if (w.charAt(0) == '\'') w = w.substring(1)
    exceptions1.get(w) match {
      case Some(s) => return s
      case None =>
    }
    if (w.length <= 2) return w

    // Mark consonant-y as 'Y': y at start, or y after a vowel.
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    def computeR1(s: String): Int = {
      // gener-, commun-, arsen- prefix exception
      for (p <- Seq("gener", "commun", "arsen"))
        if (s.startsWith(p)) return p.length
      var j = 0
      while (j < s.length && !isVowel(s.charAt(j))) j += 1
      while (j < s.length && isVowel(s.charAt(j))) j += 1
      if (j < s.length) j + 1 else s.length
    }
    def regionFrom(s: String, start: Int): Int = {
      var j = start
      while (j < s.length && !isVowel(s.charAt(j))) j += 1
      while (j < s.length && isVowel(s.charAt(j))) j += 1
      if (j < s.length) j + 1 else s.length
    }
    var r1 = computeR1(w)
    var r2 = regionFrom(w, r1)

    @inline def inR1(s: String, suffixLen: Int): Boolean = s.length - suffixLen >= r1
    @inline def inR2(s: String, suffixLen: Int): Boolean = s.length - suffixLen >= r2

    def containsVowel(s: String, from: Int, until: Int): Boolean = {
      var j = from
      while (j < until) { if (isVowel(s.charAt(j))) return true; j += 1 }
      false
    }

    /** Short syllable ending at position `end` (exclusive). */
    def endsShortSyllable(s: String): Boolean = {
      val n = s.length
      if (n == 2) isVowel(s.charAt(0)) && !isVowel(s.charAt(1))
      else if (n >= 3) {
        val c = s.charAt(n - 1)
        isVowel(s.charAt(n - 2)) && !isVowel(s.charAt(n - 3)) &&
          !isVowel(c) && c != 'w' && c != 'x' && c != 'Y'
      } else false
    }
    def isShortWord(s: String): Boolean = endsShortSyllable(s) && r1 >= s.length

    // ---- Step 0: longest of  '  's  's'
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // ---- Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("us") || w.endsWith("ss")) { /* no-op */ }
    else if (w.endsWith("s")) {
      // delete if the preceding part contains a vowel NOT immediately
      // before the s
      if (containsVowel(w, 0, w.length - 2)) w = w.dropRight(1)
    }

    if (exceptions2.contains(w)) return w.replace('Y', 'y')

    // ---- Step 1b
    val eedly = w.endsWith("eedly")
    val eed = !eedly && w.endsWith("eed")
    if (eedly || eed) {
      val sl = if (eedly) 5 else 3
      if (inR1(w, sl)) w = w.dropRight(sl) + "ee"
    } else {
      val sfx = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
      sfx.foreach { s =>
        if (containsVowel(w, 0, w.length - s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && doubles.contains(w.takeRight(2))) w = w.dropRight(1)
          else if (isShortWord(w)) w += "e"
        }
      }
    }

    // ---- Step 1c: y/Y -> i if preceded by a non-vowel which is not the
    // first letter of the word
    if (w.length > 2) {
      val last = w.charAt(w.length - 1)
      if ((last == 'y' || last == 'Y') && !isVowel(w.charAt(w.length - 2)))
        w = w.dropRight(1) + "i"
    }

    // ---- Step 2 (longest suffix, condition: in R1)
    {
      val rules: Seq[(String, String => String)] = Seq(
        "ization" -> (s => s.dropRight(7) + "ize"),
        "ational" -> (s => s.dropRight(7) + "ate"),
        "fulness" -> (s => s.dropRight(4)),
        "ousness" -> (s => s.dropRight(4)),
        "iveness" -> (s => s.dropRight(4)),
        "tional" -> (s => s.dropRight(2)),
        "biliti" -> (s => s.dropRight(6) + "ble"),
        "lessli" -> (s => s.dropRight(2)),
        "entli" -> (s => s.dropRight(2)),
        "ation" -> (s => s.dropRight(5) + "ate"),
        "alism" -> (s => s.dropRight(3)),
        "aliti" -> (s => s.dropRight(3)),
        "ousli" -> (s => s.dropRight(2)),
        "iviti" -> (s => s.dropRight(5) + "ive"),
        "fulli" -> (s => s.dropRight(2)),
        "enci" -> (s => s.dropRight(4) + "ence"),
        "anci" -> (s => s.dropRight(4) + "ance"),
        "abli" -> (s => s.dropRight(4) + "able"),
        "izer" -> (s => s.dropRight(1)),
        "ator" -> (s => s.dropRight(4) + "ate"),
        "alli" -> (s => s.dropRight(2)),
        "bli" -> (s => s.dropRight(3) + "ble"),
        "ogi" -> identity, // special: only if preceded by l
        "li" -> identity // special: valid li-ending
      )
      // longest matching suffix wins; apply only if in R1
      val hit = rules.sortBy(-_._1.length).find { case (sfx, _) => w.endsWith(sfx) }
      hit.foreach { case (sfx, f) =>
        if (inR1(w, sfx.length)) {
          if (sfx == "ogi") {
            if (w.length > 3 && w.charAt(w.length - 4) == 'l') w = w.dropRight(1)
          } else if (sfx == "li") {
            if (w.length > 2 && liEnding.indexOf(w.charAt(w.length - 3)) >= 0)
              w = w.dropRight(2)
          } else w = f(w)
        }
      }
    }

    // ---- Step 3 (longest suffix, in R1)
    {
      val hit = Seq("ational", "tional", "alize", "icate", "iciti",
        "ative", "ical", "ness", "ful").find(w.endsWith)
      hit.foreach { sfx =>
        if (inR1(w, sfx.length)) sfx match {
          case "ational" => w = w.dropRight(7) + "ate"
          case "tional" => w = w.dropRight(2)
          case "alize" => w = w.dropRight(3)
          case "icate" | "iciti" => w = w.dropRight(3)
          case "ical" => w = w.dropRight(2)
          case "ness" | "ful" => w = w.dropRight(sfx.length)
          case "ative" => if (inR2(w, 5)) w = w.dropRight(5)
        }
      }
    }

    // ---- Step 4 (longest suffix, in R2)
    {
      val suffixes = Seq("ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
        "al", "er", "ic")
      val hit = suffixes.sortBy(-_.length).find(w.endsWith)
      hit.foreach { sfx =>
        if (inR2(w, sfx.length)) {
          if (sfx == "ion") {
            val prev = w.charAt(w.length - 4)
            if (prev == 's' || prev == 't') w = w.dropRight(3)
          } else w = w.dropRight(sfx.length)
        }
      }
    }

    // ---- Step 5
    if (w.endsWith("e")) {
      if (inR2(w, 1)) w = w.dropRight(1)
      else if (inR1(w, 1) && !endsShortSyllable(w.dropRight(1))) w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (inR2(w, 1) && w.length >= 2 && w.charAt(w.length - 2) == 'l')
        w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }
}
