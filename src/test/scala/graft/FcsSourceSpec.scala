package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.FcsSource
import graft.operators.FlowCyto
import org.apache.spark.sql.functions._

import java.nio.file.Files

class FcsSourceSpec extends AnyFunSuite {
  import SharedSpark.spark

  private def tmpDir = Files.createTempDirectory("fcs").toFile

  test("FCS write → read round-trip preserves values and schema") {
    val dir = tmpDir
    val names = Seq("FSC-A", "SSC-A", "FL1-A")
    val rows1 = Seq(Array(1.5, 2.5, 3.5), Array(4.0, 5.0, 6.0))
    val rows2 = Seq(Array(7.25, 8.25, 9.25))
    FcsSource.write(s"$dir/a.fcs", names, rows1)
    FcsSource.write(s"$dir/b.fcs", names, rows2)

    val df = FcsSource.read(spark, s"$dir/*.fcs")
    assert(df.columns.toSeq == Seq("file", "event_idx") ++ names)
    assert(df.count() == 3)
    val a0 = df.filter(col("file").endsWith("a.fcs") && col("event_idx") === 0)
      .select("FSC-A", "SSC-A", "FL1-A").head()
    assert(a0.getDouble(0) == 1.5 && a0.getDouble(1) == 2.5 && a0.getDouble(2) == 3.5)
    val b0 = df.filter(col("file").endsWith("b.fcs")).select("FL1-A").head()
    assert(b0.getDouble(0) == 9.25)
  }

  test("metadata: $PAR/$TOT/$DATATYPE/$BYTEORD and channel names parse") {
    val dir = tmpDir
    FcsSource.write(s"$dir/m.fcs", Seq("X", "Y"), Seq(Array(1.0, 2.0)))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/m.fcs"))
    val meta = FcsSource.parseMeta(bytes)
    assert(meta.par == 2 && meta.tot == 1 && meta.datatype == "F" && meta.littleEndian)
    assert(meta.names == Seq("X", "Y"))
  }

  test("$SPILLOVER round-trips and feeds compensation") {
    val dir = tmpDir
    val spill = Array(Array(1.0, 0.1), Array(0.05, 1.0))
    val spillKw = "2,X,Y," + spill.flatten.mkString(",")
    FcsSource.write(s"$dir/s.fcs", Seq("X", "Y"),
      Seq(Array(100.5, 20.0)), Map("$SPILLOVER" -> spillKw))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/s.fcs"))
    val kw = FcsSource.parseMeta(bytes).keywords
    val Some((names, m)) = FcsSource.spilloverMatrix(kw)
    assert(names == Seq("X", "Y"))
    assert(m(0)(1) == 0.1 && m(1)(0) == 0.05)

    // true signal t satisfies observed = t × S; compensate recovers t.
    val df = FcsSource.read(spark, s"$dir/s.fcs")
    val comp = FlowCyto.compensate(df, Seq(col("X"), col("Y")), m, Seq("cX", "cY"), round_ = 6)
    val r = comp.select("cX", "cY").head()
    // observed (100.5, 20) = (100, 10) × [[1,.1],[.05,1]] → recover (100, 10)
    assert(math.abs(r.getDouble(0) - 100.0) < 1e-4)
    assert(math.abs(r.getDouble(1) - 10.0) < 1e-4)
  }

  test("property: random panels round-trip through write → read (seeded)") {
    val rnd = new scala.util.Random(7)
    val dir = tmpDir
    for (trial <- 1 to 8) {
      val par = 1 + rnd.nextInt(8)
      val names = (1 to par).map(i => s"CH$i-${rnd.nextInt(100)}")
      val nEvents = 1 + rnd.nextInt(50)
      // float-exact values: write truncates doubles to float32
      val rows = Seq.fill(nEvents)(
        Array.fill(par)(rnd.nextFloat().toDouble * math.pow(10, rnd.nextInt(5))))
      val exact = rows.map(_.map(v => v.toFloat.toDouble))
      val f = s"$dir/p$trial.fcs"
      FcsSource.write(f, names, rows)
      val meta = FcsSource.parseMeta(
        Files.readAllBytes(java.nio.file.Paths.get(f)))
      assert(meta.par == par && meta.tot == nEvents && meta.names == names)
      val got = FcsSource.read(spark, f)
        .orderBy("event_idx").collect()
        .map(r => names.indices.map(i => r.getDouble(2 + i)).toArray)
      assert(got.length == nEvents, s"trial $trial")
      exact.zip(got).foreach { case (e, g) =>
        assert(e.sameElements(g), s"trial $trial: ${e.toSeq} vs ${g.toSeq}")
      }
    }
  }

  test("property: compensation inverts random diagonally-dominant spillover") {
    val rnd = new scala.util.Random(11)
    val dir = tmpDir
    for (trial <- 1 to 5) {
      val par = 2 + rnd.nextInt(3)
      val names = (1 to par).map(i => s"C$i")
      // diag-dominant → invertible, physically-shaped spillover
      val s = Array.tabulate(par, par)((i, j) =>
        if (i == j) 1.0 else rnd.nextDouble() * 0.1)
      val truth = Array.fill(par)(10.0 + rnd.nextDouble() * 1000.0)
      val observed = Array.tabulate(par)(j =>
        (0 until par).map(i => truth(i) * s(i)(j)).sum)
      val spillKw = s"$par,${names.mkString(",")},${s.flatten.mkString(",")}"
      val f = s"$dir/c$trial.fcs"
      FcsSource.write(f, names, Seq(observed), Map("$SPILLOVER" -> spillKw))
      val kw = FcsSource.parseMeta(
        Files.readAllBytes(java.nio.file.Paths.get(f))).keywords
      val Some((spillNames, m)) = FcsSource.spilloverMatrix(kw)
      assert(spillNames == names)
      val comp = FlowCyto.compensate(FcsSource.read(spark, f),
        names.map(col), m, names.map(n => s"c$n"), round_ = 4)
      val r = comp.select(names.map(n => col(s"c$n")): _*).head()
      names.indices.foreach { i =>
        // float32 storage of observed limits recovery precision
        assert(math.abs(r.getDouble(i) - truth(i)) < 0.5,
          s"trial $trial ch $i: ${r.getDouble(i)} vs ${truth(i)}")
      }
    }
  }

  test("streaming FCS source picks up files as they land") {
    val dir = tmpDir
    val names = Seq("FSC-A", "SSC-A")
    FcsSource.write(s"$dir/first.fcs", names, Seq(Array(1.0, 2.0), Array(3.0, 4.0)))
    val q = FcsSource.readStream(spark, s"$dir/*.fcs", names)
      .writeStream.format("memory").queryName("fcs_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("fcs_stream").count() == 2)
      // a new upload lands; the stream processes just the new file
      FcsSource.write(s"$dir/second.fcs", names, Seq(Array(5.0, 6.0)))
      q.processAllAvailable()
      val rows = spark.table("fcs_stream")
      assert(rows.count() == 3)
      val second = rows.filter(org.apache.spark.sql.functions.col("file").endsWith("second.fcs"))
      assert(second.count() == 1)
      assert(second.select("FSC-A").head().getDouble(0) == 5.0)
    } finally q.stop()
  }

  test("mixed channel panels are rejected") {
    val dir = tmpDir
    FcsSource.write(s"$dir/a.fcs", Seq("X", "Y"), Seq(Array(1.0, 2.0)))
    FcsSource.write(s"$dir/b.fcs", Seq("X", "Z"), Seq(Array(1.0, 2.0)))
    val ex = intercept[Exception] {
      FcsSource.read(spark, s"$dir/*.fcs").count()
    }
    assert(ex.getMessage != null)
  }
}
