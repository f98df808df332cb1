package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SharedSpark.{sfDir, spark}
  import spark.implicits._

  test("blob decode stub is deterministic and preserves ids") {
    val docs = Graft.table(spark, sfDir, "documents")
    val feats = Multimodal.decodeFeatures(Multimodal.blobsFromDocuments(docs))
    val n = docs.count()
    assert(feats.count() == n)
    val twice = Multimodal.decodeFeatures(Multimodal.blobsFromDocuments(docs))
    assert(feats.toDF().except(twice.toDF()).count() == 0)
    val r = feats.filter(_.doc_id == 0).head()
    assert(r.width >= 64 && r.width < 128 && r.height >= 64 && r.height < 128)
    assert(r.n_frames >= 1 && r.n_frames <= 8)
  }

  test("real PNG payloads decode through imageio in the batched path") {
    // render a 20x12 PNG in memory: left half dark gray 32, right
    // half light gray 224 → mean luminance exactly (32+224)/2 = 128
    val img = new java.awt.image.BufferedImage(
      20, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 20) {
      val v = if (x < 10) 32 else 224
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val rows = Seq(Multimodal.BlobRow(1L, png),
        Multimodal.BlobRow(2L, "not an image at all".getBytes("UTF-8")))
      .toDS()
    val got = Multimodal.decodeFeatures(rows).collect()
      .map(f => f.doc_id -> f).toMap
    assert(got(1L).width == 20 && got(1L).height == 12)
    assert(got(1L).n_frames == 1)
    assert(got(1L).mean_byte == 128.0)
    // non-image payload falls back to the deterministic stub
    val (w, h, f, _) = Multimodal.fakeDecode("not an image at all".getBytes("UTF-8"))
    assert(got(2L).width == w && got(2L).height == h && got(2L).n_frames == f)
  }

  test("frame-sample manifest lists every stride-th full frame with offsets") {
    import org.apache.spark.sql.functions._
    // 70 bytes → 4 full 16-byte frames (6 tail bytes dropped);
    // stride 2 samples frames 0 and 2
    val blobs = Seq((1L, ("ab" * 35).getBytes("UTF-8")),
        (2L, "short".getBytes("UTF-8")))   // 5 bytes → 0 frames → absent
      .toDF("doc_id", "blob")
    val got = Multimodal.frameSampleManifest(blobs, "doc_id",
        frameBytes = 16, stride = 2)
      .orderBy("doc_id", "sample_id")
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 1L))
    assert(got.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 0L), (1L, 2L, 32L)))
    assert(got.forall(_.getLong(5) == 4L))
    // digest is md5 of the 16-byte frame slice's uppercase HEX string
    // (byte-exact and DuckDB-replayable for arbitrary payload bytes)
    val hex = ("ab" * 8).getBytes("UTF-8").map("%02X".format(_)).mkString
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(hex.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got.head.getString(4) == expectMd5)
  }

  test("batching shape: grouped batches cover all rows exactly once") {
    val blobs = (1L to 100L).map(i => Multimodal.BlobRow(i, Array.fill(8)(i.toByte))).toDS()
    val out = Multimodal.decodeFeatures(blobs.repartition(3), batchSize = 7)
    assert(out.count() == 100)
    assert(out.select("doc_id").distinct().count() == 100)
  }

  test("nearest-neighbor resize through the real codec equals the formula at sampled coords") {
    val ids = Seq(0L, 1L, 42L, -7L, Long.MaxValue).map(java.lang.Long.valueOf).toDS()
    for ((outSide, side) <- Seq((4, 8), (2, 8), (8, 8))) {
      val got = Multimodal.imageResizeStats(ids, side = side, outSide = outSide)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      // independent replay: luma formula at (x*side/outSide, y*side/outSide)
      for (id <- Seq(0L, 1L, 42L, -7L, Long.MaxValue)) {
        val sid = Math.floorMod(id, 2147483648L)
        var sum = 0L
        for (y <- 0 until outSide; x <- 0 until outSide) {
          val sx = x * side / outSide; val sy = y * side / outSide
          val r = Math.floorMod(sid * 31 + sx * 7 + sy * 13, 256)
          val g = Math.floorMod(sid * 17 + sx * 3 + sy * 5, 256)
          val b = Math.floorMod(sid * 11 + sx * 19 + sy * 23, 256)
          sum += (r * 299 + g * 587 + b * 114) / 1000
        }
        val exp = math.floor(sum.toDouble / (outSide * outSide) * 10000 + 0.5) / 10000
        assert(got(id) == exp, s"id=$id out=$outSide")
      }
    }
    // outSide == side must equal the unresized roundtrip luma.
    val full = Multimodal.imageResizeStats(ids, side = 8, outSide = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val rt = Multimodal.imageRoundtripStats(ids, side = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(full == rt)
  }

  test("WAV audio roundtrip through the real codec equals the PCM formula") {
    val idSeq = Seq(0L, 1L, 42L, -7L, Long.MaxValue)
    val ids = idSeq.map(java.lang.Long.valueOf).toDS()
    val n = 256
    val got = Multimodal.audioRoundtripStats(ids, n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (id <- idSeq) {
      val sid = Math.floorMod(id, 2147483648L)
      val samples = (0 until n).map(i =>
        Math.floorMod(sid * 7 + i.toLong * 13, 65536L) - 32768L)
      val exp = (n.toLong, samples.map(math.abs).sum, samples.map(math.abs).max)
      assert(got(id) == exp, s"id=$id got=${got(id)} exp=$exp")
    }
    // determinism: identical second run
    assert(Multimodal.audioRoundtripStats(ids, n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap == got)
  }

  test("audio window features match a scalar replay of the PCM formula") {
    val idSeq = Seq(0L, 42L, -7L)
    val ids = idSeq.map(java.lang.Long.valueOf).toDS()
    val n = 256; val win = 64; val stride = 32
    val rows = Multimodal.audioWindowFeatures(ids, n, win, stride).collect()
    // 7 windows per doc: starts 0, 32, …, 192
    assert(rows.length == idSeq.size * 7)
    for (id <- idSeq) {
      val sid = Math.floorMod(id, 2147483648L)
      val s = (0 until n).map(i =>
        Math.floorMod(sid * 7 + i.toLong * 13, 65536L) - 32768L)
      for (r <- rows.filter(_.getLong(0) == id)) {
        val start = r.getLong(2).toInt
        assert(start == r.getLong(1).toInt * stride)
        val w = s.slice(start, start + win)
        assert(r.getLong(3) == w.map(x => x * x).sum, s"sum_sq id=$id start=$start")
        assert(r.getLong(4) == w.sliding(2).count(p => p.head * p.last < 0),
          s"zero_crossings id=$id start=$start")
        assert(r.getLong(5) == w.map(math.abs).max, s"peak id=$id start=$start")
        val rms = math.floor(math.sqrt(r.getLong(3).toDouble / win) * 10000 + 0.5) / 10000
        assert(r.getDouble(6) == rms)
      }
    }
  }

  test("perceptual near-dup: same-group variants collide, banding is pigeonhole-exact") {
    import graft.operators.Multimodal
    import SharedSpark.spark
    import spark.implicits._
    // 8 groups x 4 variants
    val ids = (0L until 32L).map(java.lang.Long.valueOf).toDS()
    val pairs = Multimodal.imageNearDupPairs(ids, side = 8, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every intra-group pair must be found (one-pixel edits stay
    // within Hamming 3 of their original on this formula corpus)
    val intra = for (g <- 0L until 8L; a <- 0 until 4; b <- a + 1 until 4)
      yield (g * 4 + a, g * 4 + b)
    val found = pairs.map(p => (p._1, p._2)).toSet
    intra.foreach { p => assert(found.contains(p), s"missing intra-group pair $p") }
    // exactness of candidates: brute-force hashes agree with the
    // banded join's verdict for EVERY pair at the threshold
    def hash(id: Long): Array[Long] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.formulaPngVariant(id, 8)))
      val lum = Array.tabulate(64)(j =>
        (((img.getRGB(j % 8, j / 8) >> 16) & 0xff) * 299 +
          ((img.getRGB(j % 8, j / 8) >> 8) & 0xff) * 587 +
          (img.getRGB(j % 8, j / 8) & 0xff) * 114) / 1000L)
      val s0 = lum.sum
      val b = new Array[Long](4)
      for (j <- 0 until 64) if (lum(j) * 64 > s0) b(j / 16) |= 1L << (j % 16)
      b
    }
    val hs = (0L until 32L).map(i => i -> hash(i)).toMap
    def ham(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val brute = (for (a <- 0L until 32L; b <- a + 1 until 32L;
                      h = ham(hs(a), hs(b)) if h <= 3) yield (a, b, h.toLong)).toSet
    assert(pairs.toSet == brute, "banded candidates must equal brute force at the threshold")
  }
}
