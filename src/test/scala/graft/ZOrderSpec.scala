package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quantized = Tables.orders(spark, TestSpark.Sf)
    .withColumn("price_q",
      least(lit(65535L), floor(col("o_totalprice") / 10).cast("long")))
    .withColumn("date_q",
      greatest(lit(0L), datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")))
    .withColumn("z", ZOrder.zvalue16(col("price_q"), col("date_q")))
    .select("o_orderkey", "price_q", "date_q", "z")

  test("z-value interleaves bits (local reference check)") {
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val rows = quantized.limit(200).as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (k, p, d, z) =>
      assert(z == ref(p, d), s"order $k: z $z != ref ${ref(p, d)}")
    }
    // order preservation inside one dimension at fixed other dimension
    assert(ref(10, 0) < ref(20, 0) && ref(0, 10) < ref(0, 20))
  }

  test("z-ordered layout concentrates a 2-D box into fewer files than key order") {
    val rows = quantized.as[(Long, Long, Long, Long)].collect()
    // middle 20%-band box in each dimension (from exact local quantiles
    // — deterministic for the fixed testdata)
    def band(vs: Array[Long]): (Long, Long) = {
      val s = vs.sorted
      (s((s.length * 0.40).toInt), s((s.length * 0.60).toInt))
    }
    val (pLo, pHi) = band(rows.map(_._2))
    val (dLo, dHi) = band(rows.map(_._3))
    val box = col("price_q").between(pLo, pHi) && col("date_q").between(dLo, dHi)
    val inBox = rows.count(r => r._2 >= pLo && r._2 <= pHi && r._3 >= dLo && r._3 <= dHi)
    assert(inBox > 10, s"box too selective ($inBox rows) — widen the band")

    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    quantized.repartitionByRange(16, col("z"))
      .write.mode("overwrite").parquet(s"$dir/zsorted")
    quantized.repartitionByRange(16, col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/keysorted")
    def filesHit(path: String): Long =
      spark.read.parquet(path).filter(box)
        .select(input_file_name()).distinct().count()
    val zFiles = filesHit(s"$dir/zsorted")
    val kFiles = filesHit(s"$dir/keysorted")
    // key order scatters the (uncorrelated) box over ~every file; the
    // z layout keeps it in a contiguous z-band spanning few files —
    // the property that makes min/max file skipping work
    assert(zFiles * 2 <= kFiles,
      s"z layout hit $zFiles files vs $kFiles under key order — no concentration")
  }

  test("layout audit: footer stats exact, clustered layout skips, random layout cannot") {
    import graft.sources.LayoutAudit
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val li = Tables.lineitem(spark, TestSpark.Sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    // clustered-on-key layout vs a hash layout of the SAME rows
    li.repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.parquet(s"$base/clustered")
    li.repartition(4, col("l_partkey")).write.parquet(s"$base/random")

    // footer stats must equal a data-scan recompute, file for file
    def baseName(p: String) = p.substring(p.lastIndexOf('/') + 1)
    val stats = LayoutAudit.fileStats(spark, s"$base/clustered", "l_orderkey")
      .select("file", "n_rows", "min_val", "max_val")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(r => baseName(r._1)).view
      .mapValues(rs => (rs.map(_._2).sum, rs.map(_._3).min, rs.map(_._4).max))
      .toMap
    val want = spark.read.parquet(s"$base/clustered")
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"), min("l_orderkey").as("lo"),
        max("l_orderkey").as("hi"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => baseName(r._1) -> ((r._2, r._3, r._4))).toMap
    assert(stats.keySet == want.keySet)
    want.foreach { case (f, v) =>
      assert(stats(f) == v, s"footer stats diverged for $f: ${stats(f)} vs $v")
    }

    // a ~10%-of-domain range: the clustered layout prunes most row
    // groups from metadata alone; the hash layout can prune none
    // (every file's [min, max] spans the domain)
    val (loD, hiD) = li.agg(min("l_orderkey"), max("l_orderkey"))
      .as[(Long, Long)].head()
    val range = Seq((loD, loD + (hiD - loD) / 10))
    def skipPpm(p: String) =
      LayoutAudit.skippingReport(spark, s"$base/$p", "l_orderkey", range)
        .select("skip_ppm").as[Long].head()
    val (cl, rd) = (skipPpm("clustered"), skipPpm("random"))
    info(s"skip_ppm clustered=$cl random=$rd")
    assert(cl >= 500000L, s"clustered layout should skip most rows, got $cl")
    assert(rd == 0L, s"hash layout skipped $rd — footer ranges should span the domain")
  }

  test("layout audit skips hidden staging/manifest files (Spark file-index visibility rule)") {
    import graft.sources.{LayoutAudit, Writers}
    val base = java.nio.file.Files.createTempDirectory("graft_layout_h").toString
    val li = Tables.lineitem(spark, TestSpark.Sf)
      .select("l_orderkey", "l_partkey", "l_quantity").limit(1000)
    li.repartition(3).write.parquet(s"$base/t")
    val clean = LayoutAudit.fileStats(spark, s"$base/t", "l_orderkey")
      .agg(sum("n_rows")).as[Long].head()
    // plant exactly what a real artifact dir accumulates: a foreign-
    // schema parquet under an '_'-dir (writeShards manifests), one
    // under a '.'-dir (publish/compact staging), and a '.'-prefixed
    // stray file — all invisible to Spark's scan, so the audit must
    // not read them (foreign schema would throw 'column not found';
    // duplicated data would double-count row groups the scan never sees)
    Seq((1L, "x")).toDF("a", "b").write.parquet(s"$base/t/_manifest")
    li.limit(10).write.parquet(s"$base/t/.t.previous")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val visible = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/t"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(visible, new org.apache.hadoop.fs.Path(
      visible.getParent, "." + visible.getName))
    val audited = LayoutAudit.fileStats(spark, s"$base/t", "l_orderkey")
      .agg(sum("n_rows")).as[Long].head()
    val scanned = spark.read.parquet(s"$base/t").count()
    assert(audited == scanned,
      s"audit saw $audited rows vs the scan's $scanned — visibility rules diverge")
    assert(audited < clean, "renaming a part file hidden should shrink the audit")
  }
}
