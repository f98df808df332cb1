package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** L112 — DCT pHash: the fixed-point cosine table, the integer
  * invariance claims (the reason pHash is the robust tier), and the
  * banding exactness of the full operator.
  */
class PHashSpec extends AnyFunSuite {

  private def ham(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("cosine table matches rounded trig; every u≠0 row sums to zero exactly") {
    for (u <- 0 until 8; x <- 0 until 8) {
      val exact = math.round(10000.0 * math.cos((2 * x + 1) * u * math.Pi / 16))
      assert(Multimodal.dctK(u)(x) === exact, s"dctK($u)($x)")
    }
    // the zero row sums are what makes brightness-shift invariance an
    // INTEGER IDENTITY, not an approximation — the rounded table
    // keeps the ± symmetry of the true cosines
    for (u <- 1 until 8) assert(Multimodal.dctK(u).sum === 0L, s"row $u")
  }

  test("pHash is bit-identical under brightness shift and contrast scale") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val lum = Array.fill(64)(rnd.nextInt(180).toLong + 10)
      val ph = Multimodal.pHashBands(lum).toSeq
      for (c <- Seq(1L, 17L, 50L)) {
        assert(Multimodal.pHashBands(lum.map(_ + c)).toSeq === ph,
          s"brightness +$c, trial $trial")
      }
      assert(Multimodal.pHashBands(lum.map(_ * 3L)).toSeq === ph,
        s"contrast x3, trial $trial")
    }
  }

  test("rounded contrast edit: aHash misses at any threshold, pHash catches exactly") {
    // alternating columns straddling the mean (100/101): integer
    // contrast halving collapses them to a constant 50 grid — every
    // above-mean aHash bit flips (Hamming 64... of the 32 set bits),
    // while the DCT signs are unchanged (the only nonzero
    // coefficient either side is DC)
    val a = Array.tabulate(64)(j => 100L + (j % 2))
    val b = a.map(_ / 2)
    assert(ham(Multimodal.aHashBands(a), Multimodal.aHashBands(b)) === 32)
    assert(ham(Multimodal.pHashBands(a), Multimodal.pHashBands(b)) === 0)
  }

  test("DFT table matches rounded trig; a sampled pure tone dominates its own bin") {
    for (m <- 0 until 16) {
      val exact = math.round(1000.0 * math.cos(m * math.Pi / 8))
      assert(Multimodal.dftC(m) === exact, s"dftC($m)")
    }
    // sin(mπ/8) really is the table at (m+12) mod 16
    for (m <- 0 until 16) {
      val exact = math.round(1000.0 * math.sin(m * math.Pi / 8))
      assert(Multimodal.dftC((m + 12) % 16) === exact, s"sin via shift, m=$m")
    }
    // a pure cosine at bin k0 (sampled from the same table) must be
    // classified into bin k0 by the integer spectrum
    for (k0 <- Seq(1, 2, 3, 5, 7)) {
      val s = Array.tabulate(16)(j => 30 * Multimodal.dftC((k0 * j) % 16))
      var best = 0; var bestP = -1L
      for (k <- 1 to 8) {
        var re = 0L; var im = 0L
        for (j <- 0 until 16) {
          re += s(j) * Multimodal.dftC((k * j) % 16)
          im += s(j) * Multimodal.dftC((k * j + 12) % 16)
        }
        val p = re * re + im * im
        if (p > bestP) { bestP = p; best = k }
      }
      assert(best === k0, s"pure tone at bin $k0 classified as $best")
    }
  }

  test("operator: banded pairs equal brute force at the threshold over the formula corpus") {
    import SharedSpark.spark
    import spark.implicits._
    val ids = (0L until 32L).map(java.lang.Long.valueOf).toDS()
    val pairs = Multimodal.imagePHashNearDupPairs(ids, side = 8, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def hash(id: Long): Array[Long] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.formulaPngVariant(id, 8)))
      Multimodal.pHashBands(Multimodal.lumaGrid(img, 8))
    }
    val hs = (0L until 32L).map(i => i -> hash(i)).toMap
    val brute = (for (x <- 0L until 32L; y <- x + 1 until 32L;
                      h = ham(hs(x), hs(y)) if h <= 3) yield (x, y, h.toLong)).toSet
    assert(pairs === brute, "banded candidates must equal brute force at the threshold")
    assert(pairs.nonEmpty, "the formula corpus must contain pHash near-dups")
    spark.catalog.clearCache()
  }
}
