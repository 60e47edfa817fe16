package graft.runtime

/** Opt-in superstep tracing (GRAFT_TRACE=1): one stderr line per round with
  * wall time, so per-round overhead is attributable without a profiler.
  * Off by default — zero cost in production paths. */
object Trace {
  val enabled: Boolean = sys.env.get("GRAFT_TRACE").exists(_.nonEmpty)
  def log(msg: => String): Unit = if (enabled) System.err.println(s"[trace] $msg")
}
