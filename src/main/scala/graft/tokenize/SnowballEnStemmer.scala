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

  // Step-2 suffix table, longest-first (static — allocated once, not per
  // call). Codes: how to rewrite once the suffix matched in R1.
  private val step2Suffixes: Array[String] = Array(
    "ization", "ational", "fulness", "ousness", "iveness", "tional",
    "biliti", "lessli", "entli", "ation", "alism", "aliti", "ousli",
    "iviti", "fulli", "enci", "anci", "abli", "izer", "ator", "alli",
    "bli", "ogi", "li")

  private val step3Suffixes: Array[String] = Array(
    "ational", "tional", "alize", "icate", "iciti", "ative", "ical",
    "ness", "ful")

  private val step4Suffixes: Array[String] = Array(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")

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
      if (s.startsWith("gener")) return 5
      if (s.startsWith("commun")) return 6
      if (s.startsWith("arsen")) return 5
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
      val sl =
        if (w.endsWith("ingly")) 5
        else if (w.endsWith("edly")) 4
        else if (w.endsWith("ing")) 3
        else if (w.endsWith("ed")) 2
        else 0
      if (sl > 0 && containsVowel(w, 0, w.length - sl)) {
        w = w.dropRight(sl)
        val n = w.length
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) &&
          "bdfgmnprt".indexOf(w.charAt(n - 1)) >= 0) w = w.dropRight(1)
        else if (isShortWord(w)) w += "e"
      }
    }

    // ---- Step 1c: y/Y -> i if preceded by a non-vowel which is not the
    // first letter of the word
    if (w.length > 2) {
      val last = w.charAt(w.length - 1)
      if ((last == 'y' || last == 'Y') && !isVowel(w.charAt(w.length - 2)))
        w = w.dropRight(1) + "i"
    }

    // ---- Step 2 (longest suffix, condition: in R1; table is static and
    // pre-sorted longest-first — no per-call allocation)
    {
      var hi = 0
      var hit: String = null
      while (hi < step2Suffixes.length && hit == null) {
        if (w.endsWith(step2Suffixes(hi))) hit = step2Suffixes(hi)
        hi += 1
      }
      if (hit != null && inR1(w, hit.length)) hit match {
        case "ization" => w = w.dropRight(7) + "ize"
        case "ational" => w = w.dropRight(7) + "ate"
        case "fulness" | "ousness" | "iveness" => w = w.dropRight(4)
        case "tional" => w = w.dropRight(2)
        case "biliti" => w = w.dropRight(6) + "ble"
        case "lessli" => w = w.dropRight(2)
        case "entli" => w = w.dropRight(2)
        case "ation" => w = w.dropRight(5) + "ate"
        case "alism" | "aliti" => w = w.dropRight(3)
        case "ousli" => w = w.dropRight(2)
        case "iviti" => w = w.dropRight(5) + "ive"
        case "fulli" => w = w.dropRight(2)
        case "enci" => w = w.dropRight(4) + "ence"
        case "anci" => w = w.dropRight(4) + "ance"
        case "abli" => w = w.dropRight(4) + "able"
        case "izer" => w = w.dropRight(1)
        case "ator" => w = w.dropRight(4) + "ate"
        case "alli" => w = w.dropRight(2)
        case "bli" => w = w.dropRight(3) + "ble"
        case "ogi" =>
          if (w.length > 3 && w.charAt(w.length - 4) == 'l') w = w.dropRight(1)
        case "li" =>
          if (w.length > 2 && liEnding.indexOf(w.charAt(w.length - 3)) >= 0)
            w = w.dropRight(2)
      }
    }

    // ---- Step 3 (longest suffix, in R1)
    {
      var hi = 0
      var hit0: String = null
      while (hi < step3Suffixes.length && hit0 == null) {
        if (w.endsWith(step3Suffixes(hi))) hit0 = step3Suffixes(hi)
        hi += 1
      }
      Option(hit0).foreach { sfx =>
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

    // ---- Step 4 (longest suffix, in R2; static longest-first table)
    {
      var hi = 0
      var hit0: String = null
      while (hi < step4Suffixes.length && hit0 == null) {
        if (w.endsWith(step4Suffixes(hi))) hit0 = step4Suffixes(hi)
        hi += 1
      }
      Option(hit0).foreach { sfx =>
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
