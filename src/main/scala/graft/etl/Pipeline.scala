package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship composed pipeline — the reference DAG's transform_data
  * (dags/etl_grammy_spotify.py:76-297) re-expressed Spark-first over
  * the documents corpus:
  *
  *   filter empties → normalize text → fingerprint → dedup keep-top →
  *   mode-imputation via broadcast lookup → split/union → quality
  *   score → final aggregate.
  *
  * Every step is a declarative DataFrame op: the whole pipeline plans
  * as scan → project (codegen) → two shuffles (dedup window, final
  * agg) → broadcast join. No driver-side loops; the same plan holds on
  * a 1000-executor cluster.
  */
object Pipeline {

  def run(docs: DataFrame): DataFrame = {
    // 1. filter out empty documents (reference l.91)
    val nonEmpty = docs.filter(length(col("text")) > 0)

    // 2. normalize + fingerprint (reference l.105-119; md5 of the
    //    canonical form is the join/dedup key so shuffles carry 16
    //    bytes, not document bodies)
    val normed = nonEmpty
      .withColumn("text_norm", TextNorm.normalizeText(col("text")))
      .withColumn("fp", md5(col("text_norm")))

    // 3. dedup keep-top-per-fingerprint (reference l.151-154)
    val deduped = Dedup.topPerKey(normed, Seq("fp"),
      Seq(col("n_chars").desc, col("doc_id").asc))

    // 4. impute missing lang from the per-source mode (reference's
    //    join-imputation l.124-168; 'zh' simulated as missing)
    val srcMode = Dedup.topPerKey(
        docs.groupBy("source", "lang").agg(count(lit(1)).as("c")),
        Seq("source"), Seq(col("c").desc, col("lang").asc))
      .select(col("source").as("mode_source"), col("lang").as("mode_lang"))
    val imputed = deduped
      .withColumn("lang_missing", nullif(col("lang"), lit("zh")))
      .join(broadcast(srcMode), col("source") === col("mode_source"), "left")
      .withColumn("lang_final",
        coalesce(col("lang_missing"), col("mode_lang"), lit("unknown")))

    // 5. quality score + split/union (reference l.209-253). The score
    //    is an integer 0-100 (capped token count) so aggregates stay
    //    exact — no float-rounding ambiguity at any scale.
    val scored = imputed.withColumn("quality_pct",
        least(lit(100L),
          graft.text.TextFunctions.wordTokenCount(col("text_norm"))))
      .withColumn("split",
        when(col("lang_final") === "en", "en").otherwise("other"))
    val en = scored.filter(col("split") === "en")
    val other = scored.filter(col("split") =!= "en")
    val unioned = Merge.unionSplits(Seq(en, other))

    // 6. final aggregate (eda.ipynb summary shape)
    unioned
      .groupBy("split", "source", "lang_final")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum("quality_pct").as("sum_quality"))
      .orderBy("source", "lang_final")
  }

  val oracleSql: String =
    """WITH norm AS (
      |  SELECT doc_id, lang, source, n_chars,
      |         regexp_replace(regexp_replace(trim(lower(text)), '[ \t\n\x0b\f\r]*(feat\.|featuring|ft\.|&|and)[ \t\n\x0b\f\r]*', ';', 'g'), '[ \t\n\x0b\f\r]+', ' ', 'g') AS text_norm
      |  FROM documents WHERE length(text) > 0),
      |fp AS (SELECT *, md5(text_norm) AS fp FROM norm),
      |dedup AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rn
      |    FROM fp) t WHERE rn = 1),
      |srcmode AS (
      |  SELECT source AS mode_source, lang AS mode_lang FROM (
      |    SELECT source, lang, COUNT(*) AS c,
      |           ROW_NUMBER() OVER (PARTITION BY source ORDER BY COUNT(*) DESC, lang) AS rn
      |    FROM documents GROUP BY source, lang) t WHERE rn = 1),
      |imputed AS (
      |  SELECT d.doc_id, d.source, d.n_chars, d.text_norm,
      |         COALESCE(NULLIF(d.lang, 'zh'), m.mode_lang, 'unknown') AS lang_final
      |  FROM dedup d LEFT JOIN srcmode m ON d.source = m.mode_source),
      |scored AS (
      |  SELECT *,
      |         LEAST(100, len(regexp_extract_all(text_norm, '[a-z0-9]+'))) AS quality_pct,
      |         CASE WHEN lang_final = 'en' THEN 'en' ELSE 'other' END AS split
      |  FROM imputed)
      |SELECT split, source, lang_final,
      |       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(SUM(quality_pct) AS BIGINT) AS sum_quality
      |FROM scored
      |GROUP BY split, source, lang_final
      |ORDER BY source, lang_final""".stripMargin
}
