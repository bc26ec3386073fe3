package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) curve math for multi-dimensional data layout.
  *
  * A single sort key can cluster ONE dimension; a 100 TB table queried
  * by two (customer AND date, geo AND time) leaves the second predicate
  * scanning every file. Interleaving the bits of both grid coordinates
  * produces a 1-D key whose ranges are 2-D tiles: range-partitioning by
  * the z-value gives every output file a tight bounding box in BOTH
  * dimensions, so parquet min/max stats (or any range index) skip files
  * for either predicate. This is the layout operation behind Delta's
  * `OPTIMIZE ZORDER BY` and ClickHouse's `mortonEncode`, built here
  * from plain codegen'd integer arithmetic — no UDF, no library.
  *
  * Everything is engine-portable int64 math (shift/and/or over
  * non-negative values), so the identical computation runs in DuckDB
  * for the oracle gate; [[interleaveSql]] keeps the two spellings side
  * by side.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y`
    * (odd positions) into one z-value < 2^(2·bits). Inputs must be
    * non-negative; higher bits are ignored by construction. The fold
    * unrolls to a flat `|`/`&`/`<<` expression tree that whole-stage
    * codegen compiles to straight-line JVM bit ops. */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    val xl = x.cast(LongType)
    val yl = y.cast(LongType)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** DuckDB SQL fragment computing [[interleave]] of expressions `x`
    * and `y` — kept alongside the Scala so the two cannot drift. */
  def interleaveSql(x: String, y: String, bits: Int): String =
    s"""CAST(list_sum(list_transform(range($bits), i ->
       |      ((($x >> i) & 1) << (2*i)) + ((($y >> i) & 1) << (2*i+1)))) AS BIGINT)""".stripMargin

  /** Reference implementation for the spec: plain Scala bit math. */
  def interleaveRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }
}
