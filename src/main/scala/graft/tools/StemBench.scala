package graft.tools
object StemBench {
  def main(args: Array[String]): Unit = {
    val words = Array("running", "nationalization", "merge", "tokenizer", "buffer", "café", "generously", "happiness", "x1234", "uniq_3_4_5")
    var s = 0
    for (_ <- 0 until 200000; w <- words) s += graft.tokenize.SnowballEnStemmer.stem(w).length
    val t0 = System.nanoTime
    for (_ <- 0 until 200000; w <- words) s += graft.tokenize.SnowballEnStemmer.stem(w).length
    val dt = (System.nanoTime - t0)/1e9
    println(f"2M stems in $dt%.2f s = ${2e6/dt/1e6}%.2f M stems/s (sink=$s)")
    // tokenizer scalar twin over a synthetic doc
    val doc = graft.util.SynthCorpus.docOf(3, 7).content
    val t1 = System.nanoTime
    var n = 0
    for (_ <- 0 until 40000) n += graft.tokenize.Tokenizer.tokenizeScalar(doc).size
    val dt2 = (System.nanoTime - t1)/1e9
    println(f"40k docs tokenized+stemmed scalar in $dt2%.2f s (tokens=$n)")
  }
}
