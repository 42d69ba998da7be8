package graft.bench

/** Named pause/resume timing accumulators — the contract of the reference's
  * `utils/benchmark.py` Timer, which times scoring separately from top-k
  * selection inside one retrieval loop (benchmark/on_rank_bm25.py:135-154):
  * start/pause/resume/stop per name, `elapsed` accumulates only the running
  * spans. Monotonic nanoTime (the reference uses wall time; monotonic is
  * strictly better for spans), driver-side by design — executors report
  * their timings through Spark metrics/Observations, not this class.
  */
final class Timer(precision: Int = 4) {

  private final class Entry {
    var elapsedNanos: Long = 0L
    var last: Long = System.nanoTime()
    var running: Boolean = true
  }

  private val entries = scala.collection.mutable.LinkedHashMap.empty[String, Entry]

  def start(name: String): String = {
    require(!entries.contains(name), s"Timer '$name' already started")
    entries(name) = new Entry
    name
  }

  def pause(name: String): Unit = {
    val e = entry(name)
    require(e.running, s"Timer '$name' is not running")
    e.elapsedNanos += System.nanoTime() - e.last
    e.running = false
  }

  def resume(name: String): Unit = {
    val e = entry(name)
    require(!e.running, s"Timer '$name' is already running")
    e.last = System.nanoTime()
    e.running = true
  }

  /** Stop and return the accumulated elapsed seconds. */
  def stop(name: String): Double = {
    val e = entry(name)
    if (e.running) { e.elapsedNanos += System.nanoTime() - e.last; e.running = false }
    elapsed(name)
  }

  /** Accumulated running time in seconds, rounded to `precision`. */
  def elapsed(name: String): Double = {
    val e = entry(name)
    val live = if (e.running) System.nanoTime() - e.last else 0L
    BigDecimal((e.elapsedNanos + live) / 1e9)
      .setScale(precision, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  def results: Map[String, Double] = entries.keys.map(n => n -> elapsed(n)).toMap

  private def entry(name: String) =
    entries.getOrElse(name, throw new IllegalArgumentException(s"Timer '$name' not started"))
}
