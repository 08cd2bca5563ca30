package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product quantization (SURVEY.md §2 #89) — Jégou et al., "Product
  * Quantization for Nearest Neighbor Search" (TPAMI 2011). The unit
  * sphere is split into `m` orthogonal subspaces of `dsub` dims; each
  * subspace gets its own `ksub`-centroid codebook, so a vector
  * compresses to `m` small codes (m=8, ksub=16 → 8 bytes of payload
  * versus 512 for 64 raw doubles — the corpus scan that dominates a
  * 100 TB ANN sweep shrinks ~64×). Scoring is asymmetric distance
  * computation (ADC): the query precomputes one `m×ksub` table of
  * subspace dot products, and each corpus vector's approximate cosine
  * is `m` table lookups — no float vector is ever read in the scan.
  *
  * All three kernels are codegen'd Catalyst expressions with the
  * (tiny: m·ksub·dsub doubles) codebook riding along as a reference
  * object — the same pattern as [[DotProduct]]/[[DotProductInt]].
  */
object ProductQuantizer {

  /** Trained codebooks: `cent(sub)(code)` is a `dsub`-dim centroid. */
  final case class Codebooks(m: Int, ksub: Int, dsub: Int,
                             cent: Array[Array[Array[Double]]]) {
    def dim: Int = m * dsub
  }

  /** Lloyd k-means per subspace over a BOUNDED, unit-normalized fit
    * sample (driver-side: the sample is capped like the IVF fit — at
    * sampleCap·dim doubles it is sketch-sized relative to any corpus,
    * and a pure-Scala seeded Lloyd is deterministic across runs and
    * partitionings, which ml.KMeans' distributed reduce order is not).
    * Centroid quality only gates the CANDIDATE ordering; the exact
    * rerank restores true cosine for survivors. */
  def fit(samples: Array[Array[Double]], m: Int, ksub: Int, seed: Long,
          iters: Int = 10): Codebooks = {
    require(samples.nonEmpty, "pq fit: empty sample")
    val dim = samples.head.length
    require(dim % m == 0, s"pq fit: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val rnd = new scala.util.Random(seed)
    val cent = Array.tabulate(m) { s =>
      val off = s * dsub
      val pts = samples.map(v => java.util.Arrays.copyOfRange(v, off, off + dsub))
      // seeded init from distinct sample points (k-means++ adds nothing
      // a 10-iteration polish on a coarse quantizer would keep)
      val init = rnd.shuffle(pts.indices.toVector).iterator
        .map(pts).distinctBy(_.toSeq).take(ksub).toArray
      var cs = init ++ Array.fill(ksub - init.length)(init.head.clone())
      var it = 0
      while (it < iters) {
        // assignment parallelized across driver cores (r15: the
        // sample·ksub·dsub argmin scan is ~95% of the fit — 4 books ×
        // 10 iters × 8192 samples × 625 cells × 64 dims at d13's sf1
        // operating point ran ~18 s single-threaded). DETERMINISM
        // UNCHANGED: each point's argmin is a pure function written
        // to its own slot; the float ACCUMULATION below stays
        // sequential in point order, so sums/centroids — and every
        // spec-pinned recall derived from them — are bit-identical
        // to the serial fit.
        val csf = cs
        val bests = new Array[Int](pts.length)
        java.util.stream.IntStream.range(0, pts.length).parallel().forEach { pi =>
          val p = pts(pi)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < csf.length) {
            var d = 0.0; var i = 0
            while (i < dsub) { val t = p(i) - csf(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          bests(pi) = best
        }
        val sums = Array.fill(cs.length)(new Array[Double](dsub))
        val cnts = new Array[Long](cs.length)
        var pi = 0
        while (pi < pts.length) {
          val p = pts(pi); val best = bests(pi)
          var i = 0
          while (i < dsub) { sums(best)(i) += p(i); i += 1 }
          cnts(best) += 1
          pi += 1
        }
        cs = cs.zipWithIndex.map { case (old, c) =>
          if (cnts(c) == 0) old // empty cell keeps its centroid (stable)
          else sums(c).map(_ / cnts(c))
        }
        it += 1
      }
      cs
    }
    Codebooks(m, ksub, dsub, cent)
  }

  private def checkVecNrm(pretty: String, vec: Expression, nrm: Expression): TypeCheckResult =
    (vec.dataType, nrm.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (v, s) => TypeCheckResult.TypeCheckFailure(
        s"$pretty requires (array<double>, double), got ${v.catalogString}, ${s.catalogString}")
    }

  /** Nearest-centroid code per subspace of `vec/nrm` → array<int>. */
  case class Encode(left: Expression, right: Expression, cb: Codebooks)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkVecNrm(prettyName, left, right)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"

    def compute(vec: ArrayData, nrm: Double): ArrayData = {
      require(vec.numElements() == cb.dim,
        s"pq_encode: vector dim ${vec.numElements()} != codebook dim ${cb.dim}")
      val codes = new Array[Int](cb.m)
      var s = 0
      while (s < cb.m) {
        val off = s * cb.dsub
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cb.ksub) {
          val ctr = cb.cent(s)(c)
          var d = 0.0; var i = 0
          while (i < cb.dsub) {
            val t = vec.getDouble(off + i) / nrm - ctr(i)
            d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(s) = best
        s += 1
      }
      new GenericArrayData(codes)
    }

    override def nullSafeEval(vec: Any, nrm: Any): Any =
      compute(vec.asInstanceOf[ArrayData], nrm.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("pqEncode", this, classOf[Encode].getName)
      defineCodeGen(ctx, ev, (v, n) => s"$self.compute($v, $n)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Encode =
      copy(left = l, right = r)
  }

  /** Query-side ADC table: `lut(s·ksub + c) = (q/‖q‖)_sub(s) · cent(s)(c)`
    * — computed ONCE per query row, reused across the whole corpus. */
  case class Lut(left: Expression, right: Expression, cb: Codebooks)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkVecNrm(prettyName, left, right)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "pq_lut"

    def compute(vec: ArrayData, nrm: Double): ArrayData = {
      require(vec.numElements() == cb.dim,
        s"pq_lut: vector dim ${vec.numElements()} != codebook dim ${cb.dim}")
      val lut = new Array[Double](cb.m * cb.ksub)
      var s = 0
      while (s < cb.m) {
        val off = s * cb.dsub
        var c = 0
        while (c < cb.ksub) {
          val ctr = cb.cent(s)(c)
          var d = 0.0; var i = 0
          while (i < cb.dsub) { d += vec.getDouble(off + i) / nrm * ctr(i); i += 1 }
          lut(s * cb.ksub + c) = d
          c += 1
        }
        s += 1
      }
      new GenericArrayData(lut)
    }

    override def nullSafeEval(vec: Any, nrm: Any): Any =
      compute(vec.asInstanceOf[ArrayData], nrm.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("pqLut", this, classOf[Lut].getName)
      defineCodeGen(ctx, ev, (v, n) => s"$self.compute($v, $n)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Lut =
      copy(left = l, right = r)
  }

  /** ADC score: `Σ_s lut(s·ksub + codes(s))` ≈ cosine(query, vector) —
    * `m` lookups per corpus row, the whole point of PQ. */
  case class Adc(left: Expression, right: Expression, ksub: Int)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double> lut, array<int> codes), " +
            s"got ${l.catalogString}, ${r.catalogString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc"

    def compute(lut: ArrayData, codes: ArrayData): Double = {
      val m = codes.numElements()
      require(lut.numElements() == m * ksub,
        s"pq_adc: lut size ${lut.numElements()} != m·ksub ${m * ksub}")
      var acc = 0.0
      var s = 0
      while (s < m) { acc += lut.getDouble(s * ksub + codes.getInt(s)); s += 1 }
      acc
    }

    override def nullSafeEval(lut: Any, codes: Any): Any =
      compute(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("pqAdc", this, classOf[Adc].getName)
      defineCodeGen(ctx, ev, (l, c) => s"$self.compute($l, $c)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Adc =
      copy(left = l, right = r)
  }

  def pqEncode(vec: Column, nrm: Column, cb: Codebooks): Column =
    Bridge.column(Encode(Bridge.expression(vec), Bridge.expression(nrm), cb))
  def pqLut(vec: Column, nrm: Column, cb: Codebooks): Column =
    Bridge.column(Lut(Bridge.expression(vec), Bridge.expression(nrm), cb))
  def pqAdc(lut: Column, codes: Column, ksub: Int): Column =
    Bridge.column(Adc(Bridge.expression(lut), Bridge.expression(codes), ksub))
}
