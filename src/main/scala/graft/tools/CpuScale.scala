package graft.tools
object CpuScale {
  def work(n: Int): Long = {
    var h = 1469598103934665603L
    var i = 0
    while (i < n) {
      val s = graft.tokenize.SnowballEnStemmer.stem("nationalization" + (i & 7))
      h ^= s.length; h *= 1099511628211L
      i += 1
    }
    h
  }
  def run(threads: Int, perThread: Int): Double = {
    val t0 = System.nanoTime
    val ts = (0 until threads).map { _ => new Thread { override def run(): Unit = work(perThread) } }
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    work(200000) // warmup
    val total = 48000000
    for (t <- Seq(1, 8, 32)) {
      val sec = run(t, total / t)
      println(f"[cpu] threads=$t%2d wall=$sec%.2f s throughput=${total / sec / 1e6}%.1f M/s")
    }
  }
}
