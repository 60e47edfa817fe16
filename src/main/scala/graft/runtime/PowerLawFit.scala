package graft.runtime

/** Least-squares power-law fit for the scale-trend harness: given
  * (size, seconds) measurements, fit `sec ~ c * size^exponent` by linear
  * regression of ln(sec) on ln(size) and report the slope (the scaling
  * exponent: 1.0 = linear, 2.0 = quadratic) together with the fit's r²
  * — how much of the log-time variance a single power law explains. A
  * two-point "fit" is just the ratio of its endpoints, so r² is
  * definitionally 1 there; with three or more sizes r² < 1 exposes
  * overhead-dominated or noise-dominated rows instead of letting a
  * ratio masquerade as a trend (see BENCH.md round-5 SCC row).
  */
object PowerLawFit {
  final case class Fit(exponent: Double, r2: Double)

  /** Fit over (size, seconds) points. Returns None when no slope is
    * identifiable: fewer than two points, any non-positive coordinate
    * (log-space is undefined there), or all sizes identical.
    */
  def fit(points: Seq[(Double, Double)]): Option[Fit] = {
    if (points.size < 2 || points.exists(p => p._1 <= 0.0 || p._2 <= 0.0))
      return None
    val xs = points.map(p => math.log(p._1))
    val ys = points.map(p => math.log(p._2))
    val n = points.size
    val xm = xs.sum / n
    val ym = ys.sum / n
    val sxx = xs.map(x => (x - xm) * (x - xm)).sum
    if (sxx == 0.0) return None
    val sxy = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum
    val syy = ys.map(y => (y - ym) * (y - ym)).sum
    val slope = sxy / sxx
    // syy == 0 means constant time across sizes: slope 0 explains all of
    // the (zero) variance, so the power law is a perfect fit
    val r2 = if (syy == 0.0) 1.0 else sxy * sxy / (sxx * syy)
    Some(Fit(slope, r2))
  }
}
