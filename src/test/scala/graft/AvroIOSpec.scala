package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AvroIO

/** Round-trip pins for the hand-wired Avro container source/sink
  * (avro-core, no spark-avro connector): all supported types incl.
  * nulls/timestamps/binary, both codecs, schema inversion, and a real
  * events-table slice.
  */
class AvroIOSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("schema mapping inverts over the flat subset") {
    val st = org.apache.spark.sql.types.StructType.fromDDL(
      "b BOOLEAN, i INT, l BIGINT, f FLOAT, d DOUBLE, s STRING, " +
        "bin BINARY, ts TIMESTAMP, tn TIMESTAMP_NTZ, dt DATE")
    val back = AvroIO.sparkSchemaFor(AvroIO.avroSchemaFor(st))
    assert(back == st)
    // non-nullable fields survive too
    val nn = org.apache.spark.sql.types.StructType(st.fields.map(_.copy(nullable = false)))
    assert(AvroIO.sparkSchemaFor(AvroIO.avroSchemaFor(nn)) == nn)
  }

  test("write -> read round trip: values, nulls, timestamps, binary, both codecs") {
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some("2024-03-01 10:11:12.123456")),
      (2L, None, Some(-0.25), Some("1969-12-31 23:59:59.000001")), // pre-epoch micros
      (3L, Some("beta"), None, None)
    ).toDF("id", "s", "d", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .withColumn("bin", when(col("id") =!= 3L, encode(col("s"), "UTF-8")))
      .withColumn("flag", col("id") % 2 === 0)
      .withColumn("tsn", col("ts").cast("timestamp_ntz"))
      .withColumn("dt", col("ts").cast("date"))
    for (codec <- Seq("snappy", "deflate", "null")) {
      val dir = java.nio.file.Files.createTempDirectory("avroio").toString
      AvroIO.write(df, dir, codec)
      val back = AvroIO.read(spark, dir)
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      val a = df.orderBy("id").collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq; case x => x })
      val b = back.orderBy("id").collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq; case x => x })
      assert(a.toSeq == b.toSeq, s"codec=$codec")
    }
  }

  test("events-table slice round trips through multiple container files") {
    val ev = Graft.table(spark, SharedSpark.sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(500).repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("avroev").toString
    AvroIO.write(ev, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 4)
    val back = AvroIO.read(spark, dir)
    assert(back.count() == 500)
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select(md5(concat_ws("|",
        col("event_id"), unix_micros(col("ts")), col("user_id"),
        col("event_type"), col("value"))))
        .as[String].collect().sorted.toSeq
    assert(key(back) == key(ev))
  }

  test("schema sniff reads only the header, even on a multi-MB file") {
    // one uncompressed container file of ~3 MB (null codec so snappy
    // can't shrink the synthetic text under the bar)
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      repeat(md5(col("id").cast("string")), 50).as("text")).repartition(1)
    val dir = java.nio.file.Files.createTempDirectory("avrosniff").toString
    AvroIO.write(docs, dir, codec = "null")
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    assert(f.length() > (1 << 20), s"want a multi-MB file, got ${f.length()}")
    // default 64 KB bound sniffs fine — proof the read is header-only
    val s = AvroIO.sniffSchema(f)
    assert(s.getFields.size() == 2)
    // and the bound is real: a bound smaller than the header throws
    // instead of silently reading on
    val e = intercept[IllegalStateException](AvroIO.sniffSchema(f, maxHeaderBytes = 8))
    assert(e.getMessage.contains("schema sniff"))
    // leftover attempt temp files are invisible to read(): plant one
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".part-0.avro.attempt-99"), Array[Byte](1, 2, 3))
    assert(AvroIO.read(spark, dir).count() == 2000)
  }
}
