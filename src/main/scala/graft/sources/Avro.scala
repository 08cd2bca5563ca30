package graft.sources

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro container-file source/sink (#74's row-format sibling): the
  * one mainstream Spark-bundled format family the sources lacked a
  * surface for. Spark ships the CORE Avro library (avro-1.12) but not
  * the `spark-avro` DataSource module, so `spark.read.format("avro")`
  * is absent in a stock distribution — this implements the same
  * explicit-schema contract (#1/#274) directly on the public Avro
  * Java API.
  *
  * READ: the file LISTING and decode are distributed — `binaryFile`
  * rows (one per container file, extension-pruned at listing) feed a
  * per-partition decode, the library's one documented mapPartitions
  * codec-boundary pattern (multimodal/Binary.scala). Parallelism is
  * per FILE: a well-laid-out Avro lake is many container files, so
  * tasks scale with the file count; sub-file (block-range) splitting
  * would need a full FileFormat and is out of scope. Records map onto
  * the EXPLICIT StructType by field NAME — a field absent from a
  * record reads null (the Avro schema-evolution posture), and field
  * order need not match.
  *
  * Malformed handling mirrors the CSV/XML PERMISSIVE contract: a file
  * that is not a decodable Avro container (bad magic, truncated
  * block, schema parse failure) yields ONE all-null row carrying the
  * file path in `_corrupt_record` when the passed schema includes
  * that column, and fails loudly otherwise — per-FILE, because the
  * container's framing is gone once a block is corrupt.
  *
  * WRITE: one container file per partition (`part-NNNNN.avro`) +
  * `_SUCCESS`, overwrite semantics. The Avro schema derives from the
  * DataFrame schema; nullable fields become `union(null, T)`.
  *
  * Supported field types both ways: boolean, int, long, float,
  * double, string, binary, and array of those (the embeddings shape).
  * Nested structs/maps/decimals are out of scope — flatten first.
  */
object Avro {

  def read(spark: SparkSession, path: String, rawSchema: StructType): DataFrame = {
    // read-side fields are nullable regardless of the declared schema
    // (the CSV-reader posture): schema evolution and the PERMISSIVE
    // corrupt-file row both surface nulls
    val schema = StructType(rawSchema.fields.map(_.copy(nullable = true)))
    val corruptIdx = schema.fieldNames.indexOf("_corrupt_record")
    val files = Readers.binaryFiles(spark, path, Some("*.avro"))
      .select(col("path"), col("content"))
    val out = files.as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .mapPartitions { it: Iterator[(String, Array[Byte])] =>
        it.flatMap { case (p, bytes) =>
          try decodeContainer(bytes, schema)
          catch {
            case scala.util.control.NonFatal(e) =>
              if (corruptIdx >= 0) {
                val vals = new Array[Any](schema.length)
                vals(corruptIdx) = p
                Iterator.single(Row.fromSeq(vals.toSeq))
              } else throw new java.io.IOException(
                s"Avro.read: undecodable container $p " +
                  s"(add a _corrupt_record column for PERMISSIVE): $e", e)
          }
        }
      }(Encoders.row(schema))
    out.toDF()
  }

  /** Decode one container file's records onto `schema` by field name.
    * Streaming decode — one record materialized at a time. */
  private def decodeContainer(bytes: Array[Byte],
                              schema: StructType): Iterator[Row] = {
    val reader = new DataFileStream[GenericRecord](
      new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      while (reader.hasNext) {
        val rec = reader.next()
        rows += Row.fromSeq(schema.fields.toSeq.map { f =>
          val has = rec.getSchema.getField(f.name) != null
          if (!has) null else fromAvro(rec.get(f.name), f.dataType)
        })
      }
    } finally reader.close()
    rows.iterator
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (a: Array[Byte], BinaryType) => a
    case (i: java.lang.Integer, IntegerType) => i.intValue()
    case (l: java.lang.Long, LongType) => l.longValue()
    case (i: java.lang.Integer, LongType) => i.longValue()
    case (f: java.lang.Float, FloatType) => f.floatValue()
    case (d: java.lang.Double, DoubleType) => d.doubleValue()
    case (f: java.lang.Float, DoubleType) => f.doubleValue()
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (xs: java.util.Collection[_], ArrayType(et, _)) =>
      xs.asScala.toSeq.map(x => fromAvro(x, et))
    case (other, want) => throw new java.io.IOException(
      s"Avro.read: cannot map ${other.getClass.getName} onto ${want.catalogString}")
  }

  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val avroJson = toAvroSchema(schema).toString
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    fs.mkdirs(root)
    // one container per partition, written executor-side through the
    // Hadoop FS API (tasks re-derive the FS from a fresh Configuration
    // — the default-FS config rides the classpath, and Configuration
    // itself is not serializable)
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val sch = new Schema.Parser().parse(avroJson)
        val part = new org.apache.hadoop.fs.Path(path, f"part-$i%05d.avro")
        val pfs = part.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = pfs.create(part, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](sch))
        w.create(sch, out)
        var n = 0L
        try rows.foreach { r => w.append(toAvro(r, schema, sch)); n += 1 }
        finally w.close()
        Iterator.single(n)
      }
    }.count()
    fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
  }

  private def toAvro(r: Row, schema: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (r.isNullAt(i)) null else (f.dataType match {
        case BinaryType => ByteBuffer.wrap(r.getAs[Array[Byte]](i))
        case ArrayType(et, _) =>
          val xs = r.getSeq[Any](i).map {
            case b: Array[Byte] => ByteBuffer.wrap(b)
            case x => x
          }
          new java.util.ArrayList[Any](xs.asJava)
        case _ => r.get(i)
      })
      rec.put(f.name, v)
    }
    rec
  }

  private[sources] def toAvroSchema(schema: StructType): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, containsNull) =>
        Schema.createArray(
          if (containsNull) nullable(prim(et)) else prim(et))
      case other => throw new IllegalArgumentException(
        s"Avro.write: unsupported type ${other.catalogString} — " +
          "flatten structs/maps and cast decimals first")
    }
    def nullable(s: Schema): Schema =
      Schema.createUnion(java.util.List.of(
        Schema.create(Schema.Type.NULL), s))
    val fields = schema.fields.toSeq.map { f =>
      if (f.nullable)
        new Schema.Field(f.name, nullable(prim(f.dataType)), null,
          Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, prim(f.dataType), null)
    }
    Schema.createRecord("graft_row", null, "graft", false, fields.asJava)
  }
}
