package graft.util

import graft.model.SourceFile

/** Deterministic synthetic source-code corpus, shaped per BASELINE.json
  * `input_hint` — (repo, path, commit, lang, content) — for tests and
  * benchmarks (FIXTURES.md §3). Pure function of indices via splitmix64
  * hash mixing: no RNG state, no wall clock, stable across JVMs.
  *
  * Content is pseudo-source assembled from a fixed code-token vocabulary
  * with Zipf-ish frequencies, guaranteeing: ultra-high-df terms (skew /
  * salting tests), mid-df discriminative terms (ranking), df=1 uniques,
  * stopwords + 1-char tokens (tokenizer-filter tests), unicode identifiers
  * (regex-parity), and intra-doc duplicates (tf > 1).
  */
object SynthCorpus {

  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // high-df "keyword" pool (every doc draws several) — includes stopwords
  // and 1-char tokens the tokenizer must drop
  private val keywords = Array(
    "def", "class", "return", "import", "val", "var", "public", "void",
    "int", "string", "self", "new", "if", "for", "i", "x", "the")
  // mid-df discriminative pool
  private val mids = Array(
    "binary", "search", "tree", "parse", "index", "merge", "sort", "hash",
    "query", "token", "shard", "vector", "graph", "cache", "stream",
    "buffer", "kernel", "matrix", "lambda", "tensor", "socket", "thread",
    "mutex", "regex", "parser", "lexer", "heap", "queue", "stack", "trie")
  private val exts = Array("scala", "py", "java", "md")
  private val langs = Array("scala", "py", "java", "md")

  def docOf(r: Int, f: Int): SourceFile = {
    val h0 = mix(r.toLong * 1000003L + f)
    val lang = langs(math.floorMod(f, 4))
    val sb = new StringBuilder
    // length 20..80 tokens, hash-driven
    val nTok = 20 + math.floorMod(h0, 61).toInt
    var h = h0
    var j = 0
    while (j < nTok) {
      h = mix(h + j)
      val sel = math.floorMod(h, 100)
      val tok =
        if (sel < 45) keywords(math.floorMod(h >>> 8, keywords.length).toInt)
        else if (sel < 85) mids(math.floorMod(h >>> 8, mids.length).toInt)
        else if (sel < 93) s"node${math.floorMod(h >>> 16, 500)}" // low-df ids
        else if (sel < 96) s"uniq_${r}_${f}_$j" // df=1 terms
        else if (sel < 98) "café" // unicode identifier
        else "running" // stemming probe
      sb.append(tok)
      sb.append(if (math.floorMod(h >>> 24, 7) == 0L) "\n" else " ")
      j += 1
    }
    SourceFile(
      repo = s"org/repo-$r",
      path = s"src/pkg${math.floorMod(f, 7)}/File$f.${exts(math.floorMod(f, 4))}",
      commit = f"${mix(h0 + 7) & 0xffffffffL}%08x",
      lang = lang,
      content = sb.toString)
  }

  def gen(nRepos: Int, filesPerRepo: Int): Seq[SourceFile] =
    for (r <- 0 until nRepos; f <- 0 until filesPerRepo) yield docOf(r, f)

  /** ~50 fixed query strings mixing high/mid/low-df, OOV, all-stopword and
    * duplicate-term queries (FIXTURES.md §3).
    */
  def queries: Seq[(String, String)] = {
    val qs = Seq(
      "binary search tree",
      "hash index merge",
      "parse query token",
      "the binary the binary", // duplicate terms + stopwords
      "a the of to", // all stopwords -> empty
      "zzz_oov_term qqq_missing", // all OOV
      "vector matrix tensor kernel",
      "stream buffer socket thread",
      "mutex lock", // lock is OOV
      "running runner", // stemming probe
      "café unicode",
      "def class return",
      "node1 node2 node3",
      "heap queue stack trie",
      "sort merge sort merge sort", // heavy duplicates
      "regex lexer parser",
      "import public void",
      "shard cache graph",
      "search search search search",
      "binary") ++
      (0 until 30).map(i => s"query $i: ${mids(i % mids.length)} ${mids((i * 7 + 3) % mids.length)}")
    qs.zipWithIndex.map { case (q, i) => (f"q$i%03d", q) }
  }
}
