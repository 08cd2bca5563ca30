package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers mirroring the reference's extract stage
  * (dags/etl_grammy_spotify.py:38-67: CSV file + SQL table).
  *
  * Always pass an explicit schema for CSV at scale: schema inference
  * is a full extra pass over the data. Parquet/JDBC carry their own
  * schemas.
  */
object Readers {

  /** CSV with explicit schema — no inference pass; malformed rows
    * yield nulls instead of failing the job (PERMISSIVE, the
    * `errors="coerce"` analog). To RETAIN the raw text of bad rows,
    * include a `StructField("_corrupt_record", StringType)` in the
    * schema — the option below routes the original line there. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, sep: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC — the other columnar format Spark ships natively; same
    * pushdown/pruning behavior as parquet (PushedFilters + ReadSchema
    * reach the scan). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw-file ingestion for multimodal corpora: each file becomes one
    * row (path, modificationTime, length, content BINARY) — the
    * entry point that feeds `multimodal.Binary`'s typed-metadata +
    * opaque-bytes model. `pathGlobFilter` prunes by extension at the
    * listing, BEFORE any byte is read; at 100 TB pair this with a
    * manifest-driven file list instead of a directory walk. */
  def binaryFiles(spark: SparkSession, path: String,
                  globFilter: Option[String] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    globFilter.fold(base)(g => base.option("pathGlobFilter", g)).load(path)
  }

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** XML with explicit schema — Spark 4's NATIVE XML source (the
    * donated spark-xml path): `rowTag` names the repeating record
    * element; attributes surface as `_attr` fields; like CSV, an
    * explicit schema skips the inference pass and PERMISSIVE mode
    * coerces malformed records to nulls instead of failing the job.
    * The B2B-feed format every warehouse still ingests somewhere. */
  def xml(spark: SparkSession, path: String, schema: StructType,
          rowTag: String): DataFrame =
    spark.read
      .schema(schema)
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .format("xml")
      .load(path)

  /** JDBC reader builder (the `pd.read_sql` analog). `numPartitions` +
    * bound columns give parallel partitioned reads — a single-threaded
    * JDBC scan is the #1 ingest bottleneck at scale. Fired end-to-end
    * against embedded Derby in SourcesSpec (the one JDBC engine on the
    * classpath); the same options drive MySQL/Postgres in production. */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[(String, Long, Long, Int)] = None,
           props: Map[String, String] = Map.empty): DataFrameReader = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withPart = partitionColumn match {
      case Some((colName, lower, upper, n)) => base
        .option("partitionColumn", colName)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", n.toString)
      case None => base
    }
    props.foldLeft(withPart) { case (r, (k, v)) => r.option(k, v) }
  }
}
