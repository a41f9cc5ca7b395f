package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed incremental moment aggregator (Welford/Chan): single-pass,
  * mergeable mean/variance state — the SURVEY §7.3 opt-in custom for
  * exact incremental z-score over streams (a `GroupState` can carry the
  * buffer across micro-batches, giving exact running σ without
  * recomputing history like the reference's per-request full recompute,
  * spark_stream.py:95-156).
  *
  * The merge step uses the parallel-variance (Chan et al.) formula, so
  * the aggregator is associative over partitions — safe as a
  * `TypedColumn` in any Dataset agg at any parallelism.
  */
object WelfordAggregator {

  case class Moments(n: Long, mean: Double, m2: Double) {
    def variancePop: Double = if (n == 0) Double.NaN else m2 / n
    def stddevPop: Double = math.sqrt(variancePop)
    def zscore(x: Double): Double = (x - mean) / stddevPop
  }

  val zero: Moments = Moments(0L, 0.0, 0.0)

  def update(s: Moments, x: Double): Moments = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    Moments(n, mean, s.m2 + d * (x - mean))
  }

  def merge(a: Moments, b: Moments): Moments = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      Moments(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  /** Dataset-facing typed aggregator over a Double column. */
  class MomentsAgg extends Aggregator[Double, Moments, Moments] {
    override def zero: Moments = WelfordAggregator.zero
    override def reduce(b: Moments, a: Double): Moments = update(b, a)
    override def merge(b1: Moments, b2: Moments): Moments = WelfordAggregator.merge(b1, b2)
    override def finish(r: Moments): Moments = r
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  def moments: MomentsAgg = new MomentsAgg
}
