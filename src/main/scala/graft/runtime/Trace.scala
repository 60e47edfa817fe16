package graft.runtime

/** Opt-in superstep tracing (GRAFT_TRACE=1): one stderr line per round with
  * wall time, so per-round overhead is attributable without a profiler.
  * Off by default — zero cost in production paths.
  *
  * Stage COLLECTION (VERDICT r4 next #1b): `Bench` turns on the in-memory
  * collector so instrumented stages (ngram shingle/cap/pair joins, CC
  * rounds, Pregel supersteps) land in the bench JSON per query — a 10×
  * outlier run becomes attributable to a stage instead of a mystery.
  * Collection is independent of GRAFT_TRACE (the bench always collects;
  * stderr lines stay opt-in). */
object Trace {
  val enabled: Boolean = sys.env.get("GRAFT_TRACE").exists(_.nonEmpty)
  def log(msg: => String): Unit = if (enabled) System.err.println(s"[trace] $msg")

  @volatile private var collecting = false
  private val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]

  /** Record a completed stage's wall time (collector + stderr). */
  def record(label: String, sec: Double): Unit = {
    if (collecting) stages.add((label, sec))
    log(f"stage $label sec=$sec%.2f")
  }

  /** Time `f` as a named stage. Near-zero cost when neither the collector
    * nor GRAFT_TRACE is on (one nanoTime pair). */
  def stage[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (collecting || enabled) record(label, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** Start (or reset) in-memory stage collection. */
  def startCollecting(): Unit = { stages.clear(); collecting = true }

  /** Stop collection and drop anything queued — call at phase boundaries
    * once the last drain happened, or every later superstep's record()
    * accumulates unread in the process-wide queue for the JVM's life. */
  def stopCollecting(): Unit = { collecting = false; stages.clear() }

  /** Drain collected (label, sec) entries in arrival order. */
  def drain(): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var e = stages.poll()
    while (e != null) { out += e; e = stages.poll() }
    out.toSeq
  }
}
