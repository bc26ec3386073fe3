package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector primitives over `array<double>` embedding columns.
  *
  * Built on higher-order functions (zip_with / aggregate), i.e. pure
  * per-row projections: no shuffle, no UDF serialization, scale linearly
  * with rows. Dot products run left-to-right in double precision so the
  * same expression in another engine produces bit-identical values.
  */
object VectorFunctions {

  /** Cast a float embedding column to array<double> (all math in f64). */
  def toDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Left-to-right dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity given precomputed norms (one division). */
  def cosine(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** Deterministic pseudo-random hyperplane weight for (plane i, dim d),
    * in [-1, 1): ((i*73856093 + d*19349663) mod 1000003) / 500001.5 - 1.
    * Derived from the classic spatial-hash multipliers; fixed by formula
    * so executors, the planner, and any oracle agree without shipping a
    * weight matrix. */
  def planeWeight(i: Column, d: Column): Column =
    ((i * lit(73856093L) + d * lit(19349663L)) % lit(1000003L)).cast(DoubleType) /
      lit(500001.5) - lit(1.0)

  /** `nBits`-bit random-hyperplane (SimHash for vectors) signature of an
    * embedding: bit i = sign(emb · plane_i). The standard LSH for cosine
    * similarity — collision probability 1 - angle/pi per bit.
    *
    * One zip_with per plane (array children evaluated once — never
    * element_at inside a lambda, see HashFunctions.shingles). */
  def hyperplaneSignature(emb: Column, dims: Int, nBits: Int): Column =
    (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(1), lit(dims)),
          (x, dd) => x * planeWeight(lit(i.toLong), dd)),
        lit(0.0), (s, x) => s + x)
      when(proj > 0.0, lit(1L << (nBits - 1 - i))).otherwise(lit(0L))
    }.reduce(_ + _)
}
