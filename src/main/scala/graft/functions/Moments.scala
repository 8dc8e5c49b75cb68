package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Streaming-moments UDAF (SURVEY.md §2.12.3): single-pass count /
  * mean / M2 via Chan's parallel Welford merge — the numerically stable
  * way to get variance/stddev in one distributed pass. Backs the
  * reference's describe()/probplot statistics (NB cells 20/22) with a
  * mergeable sketch: partials combine associatively across partitions,
  * so only 3 doubles per group cross the shuffle.
  */
case class Moments(n: Long, mean: Double, m2: Double) {
  def variance: Double = if (n < 2) Double.NaN else m2 / (n - 1)
  def stddev: Double = math.sqrt(variance)
}

object MomentsAgg extends Aggregator[Double, Moments, Moments] {
  override def zero: Moments = Moments(0L, 0.0, 0.0)

  override def reduce(b: Moments, x: Double): Moments = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    Moments(n, mean, b.m2 + delta * (x - mean))
  }

  override def merge(a: Moments, b: Moments): Moments = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      Moments(n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n)
    }
  }

  override def finish(m: Moments): Moments = m
  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
