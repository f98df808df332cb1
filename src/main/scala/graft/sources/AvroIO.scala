package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container emit/ingest built directly on avro-core (which
  * ships with Spark) — the spark-avro CONNECTOR is not on this
  * classpath, but the format itself needs nothing more than the
  * codec library plus the same distributed plumbing FcsSource uses:
  *
  *   - read: a `binaryFile` scan (any Hadoop filesystem, splittable
  *     across files) → per-file `DataFileStream` decode inside
  *     mapPartitions — each container file is one task's work, the
  *     natural parallelism for the many-file layouts warehouses emit;
  *   - write: one container file per partition via mapPartitions
  *     (deflate by default), so emit parallelism = upstream
  *     partitioning, no driver funnel.
  *
  * Supported schema subset (flat records — the tidy-table shape every
  * other graft source speaks): boolean/int/long/float/double/string/
  * binary, TimestampType as the `timestamp-micros` logical type, and
  * nullable fields as `["null", T]` unions. Nested structs are out of
  * scope by design (flatten upstream).
  *
  * Determinism: timestamps round-trip as exact micros; doubles as
  * their IEEE bits; AvroIOSpec pins a full write→read round trip
  * (nulls, timestamps, binary, both codecs) value-for-value.
  *
  * Scale note: the writer targets paths via java.nio (this
  * environment's executors share a local filesystem); a cluster
  * deployment swaps the two file open/close call sites for
  * `org.apache.hadoop.fs.FileSystem` — the record encode/decode path
  * is filesystem-agnostic.
  */
object AvroIO {

  /** Spark → Avro schema (flat record, nullable fields as unions). */
  def avroSchemaFor(st: StructType, name: String = "graft_record"): Schema = {
    def prim(dt: DataType): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
      case TimestampNTZType =>
        "{\"type\":\"long\",\"logicalType\":\"local-timestamp-micros\"}"
      case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
      case other => throw new IllegalArgumentException(
        s"AvroIO: unsupported type $other (flatten/cast upstream)")
    }
    val fields = st.fields.map { f =>
      val t = if (f.nullable) s"""["null",${prim(f.dataType)}]""" else prim(f.dataType)
      val dflt = if (f.nullable) ",\"default\":null" else ""
      s"""{"name":"${f.name}","type":$t$dflt}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"$name","fields":[$fields]}""")
  }

  /** Avro → Spark schema (the same flat subset, unions → nullable). */
  def sparkSchemaFor(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"not a record schema: $s")
    def dt(t: Schema): DataType = t.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT =>
        if (t.getLogicalType != null && t.getLogicalType.getName == "date") DateType
        else IntegerType
      case Schema.Type.LONG =>
        if (t.getLogicalType == null) LongType
        else t.getLogicalType.getName match {
          case "timestamp-micros" => TimestampType
          case "local-timestamp-micros" => TimestampNTZType
          case _ => LongType
        }
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(
        s"AvroIO: unsupported avro type $other")
    }
    StructType(s.getFields.asScala.map { f =>
      val (inner, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val nonNull = f.schema().getTypes.asScala.filter(_.getType != Schema.Type.NULL)
          require(nonNull.size == 1, s"AvroIO: only [null, T] unions: ${f.schema()}")
          (nonNull.head, true)
        case _ => (f.schema(), false)
      }
      StructField(f.name(), dt(inner), nullable)
    }.toArray)
  }

  private def toAvro(v: Any, dt: DataType): AnyRef = v match {
    case null => null
    case ts: java.sql.Timestamp =>
      java.lang.Long.valueOf(ts.getTime / 1000 * 1000000L + ts.getNanos / 1000)
    case ldt: java.time.LocalDateTime =>
      java.lang.Long.valueOf(
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000)
    case d: java.sql.Date =>
      java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case d: java.time.LocalDate =>
      java.lang.Integer.valueOf(d.toEpochDay.toInt)
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other.asInstanceOf[AnyRef]
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      val micros = l.longValue()
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000).toInt)
      ts
    case (l: java.lang.Long, TimestampNTZType) =>
      val micros = l.longValue()
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000).toInt,
        java.time.ZoneOffset.UTC)
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (u: Utf8, _) => u.toString
    case (bb: java.nio.ByteBuffer, _) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (other, _) => other
  }

  /** Distributed emit: one container file per partition. Snappy by
    * default (the common warehouse choice — ~5× the encode throughput
    * of deflate at modest size cost; snappy-java ships with Spark).
    */
  def write(df: DataFrame, path: String, codec: String = "snappy"): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaFor(st).toString
    val dir = java.nio.file.Paths.get(path)
    // fresh target (overwrite semantics, like the other graft sinks)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    java.nio.file.Files.createDirectories(dir)
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(if (codec == "null") CodecFactory.nullCodec()
                 else CodecFactory.fromString(codec))
      // Attempt isolation: a retried or speculative task must never
      // write the final part path concurrently with another attempt —
      // each attempt encodes to its own dot-prefixed temp file (hidden
      // from Spark listings, excluded by the *.avro glob) and
      // atomically renames on success. Content per partition is
      // deterministic, so a late duplicate rename is harmless.
      val tc = org.apache.spark.TaskContext.get()
      val attempt = if (tc != null) tc.taskAttemptId() else 0L
      val tmpF = new java.io.File(s"$path/.part-$pid.avro.attempt-$attempt")
      w.create(schema, tmpF)
      var n = 0L
      it.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < st.length) {
          rec.put(i, toAvro(row.get(i), st(i).dataType))
          i += 1
        }
        w.append(rec)
        n += 1
      }
      w.close()
      java.nio.file.Files.move(
        tmpF.toPath, new java.io.File(s"$path/part-$pid.avro").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Iterator(n)
    }.sum()
    ()
  }

  /** Header-only schema sniff: a container file embeds its schema in
    * the header (magic + metadata map + sync marker) — reading it
    * needs the first few KB, never the file. The bounded stream makes
    * that a hard guarantee: if the header (plus the decoder's
    * read-ahead buffer) ever exceeds `maxHeaderBytes`, this throws
    * instead of silently degrading to a full-file read
    * (AvroIOSpec pins a multi-MB file sniffing under the bound).
    */
  private[graft] def sniffSchema(f: java.io.File,
                                 maxHeaderBytes: Int = 1 << 16): Schema = {
    val raw = new java.io.FileInputStream(f)
    val bounded = new java.io.InputStream {
      private var seen = 0L
      private def count(k: Int): Unit = {
        if (k > 0) seen += k
        if (seen > maxHeaderBytes) throw new IllegalStateException(
          s"AvroIO: schema sniff read past $maxHeaderBytes bytes of ${f.getPath} " +
            "— header larger than the bound (raise maxHeaderBytes)")
      }
      override def read(): Int = { val b = raw.read(); count(if (b < 0) 0 else 1); b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        // never hand the decoder more than the remaining budget, so a
        // large buffered read can't overshoot before the check
        val want = math.min(len.toLong, maxHeaderBytes + 1L - seen).toInt
        val k = raw.read(b, off, math.max(want, 1)); count(math.max(k, 0)); k
      }
      override def close(): Unit = raw.close()
    }
    val ds = new DataFileStream(bounded, new GenericDatumReader[GenericRecord]())
    try ds.getSchema finally ds.close()
  }

  /** Distributed ingest: binaryFile scan → per-file container decode.
    * The schema comes from the first file's HEADER (container files
    * embed it) — listed via a content-pruned path scan and sniffed
    * with [[sniffSchema]]'s bounded read, never a full-file collect.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    // pathGlobFilter, not a glob path: DataSource probes a glob path
    // literally as a file first (FileStreamSink.hasMetadata) and logs
    // a spurious FileNotFoundException stack per read.
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
    // selecting only `path` prunes `content`: the listing never reads
    // file bytes (binaryFile materializes content on demand per column)
    val head = bin.select("path").limit(1).collect()
    require(head.nonEmpty, s"AvroIO: no .avro files under $path")
    val schema = sniffSchema(
      new java.io.File(new java.net.URI(head(0).getString(0))))
    val st = sparkSchemaFor(schema)
    val rows = bin.select("content").rdd.flatMap { r =>
      // streaming decode: records surface as the downstream consumer
      // pulls them — no per-file ArrayBuffer doubling the file's rows
      // in task memory. The byte-array-backed stream needs no close
      // beyond drain (closed when the iterator exhausts).
      val ds = new DataFileStream(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0)),
        new GenericDatumReader[GenericRecord]())
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = ds.hasNext
          if (!h) ds.close()
          h
        }
        def next(): Row = {
          val rec = ds.next()
          Row.fromSeq(st.fields.indices.map(i =>
            fromAvro(rec.get(i), st(i).dataType)))
        }
      }
    }
    spark.createDataFrame(rows, st)
  }
}
