package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** FCS 3.1 binary source (SURVEY.md §2.2 F8).
  *
  * An FCS file is HEADER (ASCII offsets) + TEXT (delimited keyword/
  * value pairs: $PAR, $TOT, $DATATYPE, $BYTEORD, $PnN…) + DATA
  * (events × parameters matrix). The reference pipeline's first step
  * is exactly this conversion to tabular form; here it's a Spark
  * source: `binaryFile` scan → per-file parse (distributed; each file
  * parses inside its partition, no shuffle) → one row per event, one
  * column per channel.
  *
  * Column schema is fixed from the first file's TEXT segment on the
  * driver; files whose channel set differs are rejected (matching
  * DataFrame semantics — a manifest of mixed panels needs per-panel
  * reads).
  */
object FcsSource {

  case class FcsEvent(file: String, event_idx: Long, channels: Array[Double])

  case class FcsMeta(par: Int, tot: Long, datatype: String, littleEndian: Boolean,
                     names: Seq[String], keywords: Map[String, String])

  private val HeaderSize = 58

  def parseMeta(bytes: Array[Byte]): FcsMeta = {
    val version = new String(bytes, 0, 6, StandardCharsets.US_ASCII)
    require(version.startsWith("FCS"), s"not an FCS file: $version")
    def off(i: Int): Int =
      new String(bytes, 10 + 8 * i, 8, StandardCharsets.US_ASCII).trim.toInt
    val (ts, te) = (off(0), off(1))
    val kw = parseText(bytes, ts, te)
    val par = kw("$PAR").trim.toInt
    FcsMeta(
      par = par,
      tot = kw("$TOT").trim.toLong,
      datatype = kw("$DATATYPE").trim,
      littleEndian = kw.getOrElse("$BYTEORD", "1,2,3,4").trim == "1,2,3,4",
      names = (1 to par).map(i => kw.getOrElse(s"$$P${i}N", s"P$i").trim),
      keywords = kw)
  }

  /** TEXT segment: first byte is the delimiter; keys/values alternate
    * between delimiters (FCS 3.1 §3.2; doubled delimiters inside
    * values are not supported by this minimal reader).
    */
  private def parseText(bytes: Array[Byte], start: Int, end: Int): Map[String, String] = {
    val delim = bytes(start).toChar
    val body = new String(bytes, start + 1, end - start, StandardCharsets.UTF_8)
    val parts = body.split(java.util.regex.Pattern.quote(delim.toString), -1)
    parts.grouped(2).collect {
      case Array(k, v) if k.nonEmpty => k.trim -> v
    }.toMap
  }

  def parseEvents(bytes: Array[Byte]): Iterator[Array[Double]] = {
    val meta = parseMeta(bytes)
    def off(i: Int): Int =
      new String(bytes, 10 + 8 * i, 8, StandardCharsets.US_ASCII).trim.toInt
    val ds = {
      val h = off(2)
      if (h > 0) h else meta.keywords("$BEGINDATA").trim.toInt
    }
    require(meta.datatype == "F", s"only $$DATATYPE/F supported, got ${meta.datatype}")
    val buf = ByteBuffer.wrap(bytes, ds, (meta.tot * meta.par * 4).toInt)
      .order(if (meta.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    (0L until meta.tot).iterator.map { _ =>
      val row = new Array[Double](meta.par)
      var j = 0
      while (j < meta.par) { row(j) = buf.getFloat().toDouble; j += 1 }
      row
    }
  }

  /** $SPILLOVER: "n,name1,…,namen,v11,v12,…" (row-major). */
  def spilloverMatrix(kw: Map[String, String]): Option[(Seq[String], Array[Array[Double]])] =
    kw.get("$SPILLOVER").map { s =>
      val parts = s.split(",").map(_.trim)
      val n = parts(0).toInt
      val names = parts.slice(1, 1 + n).toSeq
      val vals = parts.slice(1 + n, 1 + n + n * n).map(_.toDouble)
      (names, Array.tabulate(n, n)((i, j) => vals(i * n + j)))
    }

  /** Read a directory/glob of FCS files into (file, event_idx,
    * channel columns). Schema comes from the first file.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val first = bin.select("content").head().getAs[Array[Byte]](0)
    val names = parseMeta(first).names
    val events: Dataset[FcsEvent] = bin.as[(String, Array[Byte])].flatMap {
      case (file, content) =>
        val meta = parseMeta(content)
        require(meta.names == names,
          s"channel mismatch in $file: ${meta.names} vs $names")
        parseEvents(content).zipWithIndex.map { case (row, i) =>
          FcsEvent(file, i.toLong, row)
        }
    }
    events.select(
      col("file") +: col("event_idx") +:
        names.zipWithIndex.map { case (n, i) =>
          element_at(col("channels"), i + 1).as(n)
        }: _*)
  }

  /** Streaming variant: tail a directory for incoming FCS files
    * (the reactor's trigger model — process each new upload as it
    * lands) via the binaryFile file-stream source. Channel names must
    * be supplied up front (streaming requires a fixed schema before
    * any file exists); files with a different panel fail the batch.
    */
  def readStream(spark: SparkSession, path: String, names: Seq[String]): DataFrame = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val bin = spark.readStream.format("binaryFile").schema(schema).load(path)
      .select(col("path"), col("content"))
    val events: Dataset[FcsEvent] = bin.as[(String, Array[Byte])].flatMap {
      case (file, content) =>
        val meta = parseMeta(content)
        require(meta.names == names,
          s"channel mismatch in $file: ${meta.names} vs $names")
        parseEvents(content).zipWithIndex.map { case (row, i) =>
          FcsEvent(file, i.toLong, row)
        }
    }
    events.select(
      col("file") +: col("event_idx") +:
        names.zipWithIndex.map { case (n, i) =>
          element_at(col("channels"), i + 1).as(n)
        }: _*)
  }

  /** Minimal FCS 3.1 writer (round-trip fixture + the reference
    * pipeline's tabular→FCS inverse). float32, little-endian, mode L.
    */
  def write(path: String, names: Seq[String], rows: Seq[Array[Double]],
            extraKeywords: Map[String, String] = Map.empty): Unit = {
    val par = names.length
    val delim = "/"
    val kw = scala.collection.mutable.LinkedHashMap[String, String](
      "$MODE" -> "L", "$DATATYPE" -> "F", "$BYTEORD" -> "1,2,3,4",
      "$PAR" -> par.toString, "$TOT" -> rows.length.toString)
    names.zipWithIndex.foreach { case (n, i) =>
      kw(s"$$P${i + 1}N") = n
      kw(s"$$P${i + 1}B") = "32"
      kw(s"$$P${i + 1}R") = "262144"
    }
    extraKeywords.foreach { case (k, v) => kw(k) = v }
    val text = delim + kw.map { case (k, v) => s"$k$delim$v$delim" }.mkString
    val textBytes = text.getBytes(StandardCharsets.UTF_8)
    val textStart = HeaderSize
    val textEnd = textStart + textBytes.length - 1
    val dataStart = textEnd + 1
    val dataEnd = dataStart + rows.length * par * 4 - 1
    def pad8(v: Int): String = f"$v%8d"
    val header = "FCS3.1    " + pad8(textStart) + pad8(textEnd) +
      pad8(dataStart) + pad8(dataEnd) + pad8(0) + pad8(0)
    require(header.length == HeaderSize)
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      out.write(header.getBytes(StandardCharsets.US_ASCII))
      out.write(textBytes)
      val buf = ByteBuffer.allocate(rows.length * par * 4).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach(r => r.foreach(v => buf.putFloat(v.toFloat)))
      out.write(buf.array())
    } finally out.close()
  }
}
