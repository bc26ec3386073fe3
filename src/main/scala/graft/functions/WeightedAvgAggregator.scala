package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (the reference's converter lambdas are its whole
  * UDF surface — SURVEY.md §2.3; this is the aggregate generalization):
  * exact weighted average. Both running sums are BigDecimal (encoded as
  * DECIMAL(38,18) in the aggregation buffer), so partial aggregation and
  * merge order cannot perturb the result — the single double division
  * happens once, in finish(). That makes the UDAF safe under Spark's
  * partial/final split at any partitioning, and lets a DuckDB oracle
  * reproduce it bit-exactly as CAST(sum_num AS DOUBLE)/CAST(sum_den AS
  * DOUBLE).
  */
case class WavgIn(v: BigDecimal, w: BigDecimal)
case class WavgBuf(num: BigDecimal, den: BigDecimal)

object WeightedAvgAggregator extends Aggregator[WavgIn, WavgBuf, Double] {
  override def zero: WavgBuf = WavgBuf(BigDecimal(0), BigDecimal(0))
  override def reduce(b: WavgBuf, a: WavgIn): WavgBuf =
    WavgBuf(b.num + a.v * a.w, b.den + a.w)
  override def merge(x: WavgBuf, y: WavgBuf): WavgBuf =
    WavgBuf(x.num + y.num, x.den + y.den)
  override def finish(b: WavgBuf): Double =
    if (b.den.signum == 0) 0.0 else b.num.toDouble / b.den.toDouble
  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
