package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.dedup.{MinHash, SimHash}
import graft.functions.{DotProduct, DotProductInt, Fingerprint64, InterleaveBits16, QuantizeInt8, ShingleFingerprints}

/** SQL registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT fingerprint64(text) …")` works alongside the
  * Column API.
  *
  * Two entry points:
  *  - [[GraftFunctions.register]] for an existing session;
  *  - `spark.sql.extensions=graft.GraftExtensions` for cluster-wide
  *    injection at session build (the SparkSessionExtensions path).
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fingerprint64" -> { exprs =>
      Fingerprint64(exprs.head, Fingerprint64.DefaultSeed)
    },
    "shingle_fingerprints" -> { exprs =>
      ShingleFingerprints(exprs.head, 3, Fingerprint64.DefaultSeed)
    },
    "simhash64" -> { exprs => SimHash.SimHash64(exprs.head) },
    "minhash_signature" -> { exprs =>
      MinHash.MinHashSignature(exprs.head, 64, 0x5eedL)
    },
    "dot_product" -> { exprs => DotProduct(exprs(0), exprs(1)) },
    "dot_product_int" -> { exprs => DotProductInt(exprs(0), exprs(1)) },
    "vec_abs_max" -> { exprs => QuantizeInt8.AbsMax(exprs.head) },
    "vec_quantize_int8" -> { exprs => QuantizeInt8.Quantize(exprs.head) },
    "band_hashes" -> { exprs => MinHash.BandHashesExpr(exprs.head, 16) },
    "sig_match_count" -> { exprs =>
      MinHash.SigMatchCount(exprs(0), exprs(1))
    },
    "interleave_bits16" -> { exprs => InterleaveBits16(exprs(0), exprs(1)) })

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}
