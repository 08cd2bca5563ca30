package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns — no UDF, fully
  * Catalyst-visible, accumulation in double in strict index order so
  * results are deterministic across partitionings. The dot product is
  * a codegen'd [[DotProduct]] expression (one tight JVM loop per row);
  * the earlier `zip_with` + `aggregate` lambda version was interpreted
  * per element and dominated every similarity hot path.
  */
object VectorFunctions {

  /** Cast an `array<float>` embedding to `array<double>` for stable
    * accumulation. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column = DotProduct.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from a precomputed-norm layout (the scan-once pattern:
    * `withColumn("nrm", norm(v))` then reuse). */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}
