package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.VectorFunctions

/** Bit-compatibility of the native codegen vector expressions with the
  * HOF formulations (and hence with the DuckDB oracle fragments, which
  * the HOF versions were verified against in round 1). */
class VectorExpressionsSpec extends SparkSpecBase {

  private lazy val embeddings = {
    VectorExpressions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("emb"))
  }

  test("vec_dot matches the zip_with/aggregate fold bit-for-bit") {
    val mismatches = embeddings
      .withColumn("hof", VectorFunctions.dot(col("emb"), col("emb")))
      .withColumn("native", expr("vec_dot(emb, emb)"))
      .filter(col("hof") =!= col("native")) // exact f64 comparison
      .count()
    assert(mismatches == 0)
  }

  test("hyperplane_sig matches the HOF signature on every vector") {
    val dims = embeddings.select(size(col("emb"))).head().getInt(0)
    val mismatches = embeddings
      .withColumn("hof", VectorFunctions.hyperplaneSignature(col("emb"), dims, 16))
      .withColumn("native", expr("hyperplane_sig(emb, 16)"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(mismatches == 0)
  }

  test("null inputs yield null, not a crash") {
    val r = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d, " +
      "hyperplane_sig(CAST(NULL AS ARRAY<DOUBLE>), 16) AS s").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
