package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftx.{MinHashSignature, PointInPolygon, RollingHash, SimHash64}

import scala.util.Random

/** Pure-JVM randomized property tests for the native expression
  * kernels (no Spark session — these check the math; the
  * codegen-parity specs in ExpressionsSpec check the plumbing).
  * Seeded → deterministic.
  */
class PropertySpec extends AnyFunSuite {

  test("sorted intersect kernel: |A∩B| via merge equals Set intersection") {
    val rnd = new Random(1)
    for (_ <- 1 to 200) {
      val a = List.fill(rnd.nextInt(60))(rnd.nextLong() % 50)
      val b = List.fill(rnd.nextInt(60))(rnd.nextLong() % 50)
      val sa = a.distinct.sorted.toArray
      val sb = b.distinct.sorted.toArray
      val expect = (a.toSet intersect b.toSet).size
      var i = 0; var j = 0; var n = 0
      while (i < sa.length && j < sb.length) {
        if (sa(i) == sb(j)) { n += 1; i += 1; j += 1 }
        else if (sa(i) < sb(j)) i += 1
        else j += 1
      }
      assert(n == expect, s"a=$a b=$b")
    }
  }

  test("zorder2: interleave is invertible and order-embeds boxes") {
    import org.apache.spark.sql.graftx.Zorder2
    val rnd = new Random(7)
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      for (i <- 0 until 32) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    for (_ <- 1 to 500) {
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = rnd.nextLong() & 0xFFFFFFFFL
      assert(deinterleave(Zorder2.interleave(x, y)) == ((x, y)))
    }
    // locality: within an aligned 2^k × 2^k tile, all z values are
    // contiguous (the property row-group pruning relies on)
    val k = 4
    val bx = (rnd.nextInt(1 << 10) >> k) << k
    val by = (rnd.nextInt(1 << 10) >> k) << k
    val zs = for (dx <- 0 until (1 << k); dy <- 0 until (1 << k))
      yield Zorder2.interleave(bx + dx, by + dy)
    assert(zs.max - zs.min == (1 << (2 * k)) - 1)
  }

  test("jacobi eigendecomposition reconstructs random symmetric matrices") {
    import graft.operators.Pca
    val rnd = new Random(11)
    for (_ <- 1 to 20) {
      val d = 2 + rnd.nextInt(7)
      val m = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- 0 to i) {
        val v = rnd.nextGaussian()
        m(i)(j) = v; m(j)(i) = v
      }
      val (values, vectors) = Pca.jacobiEigen(m)
      // V diag(λ) Vᵀ == M to numerical precision
      for (i <- 0 until d; j <- 0 until d) {
        val rec = (0 until d).map(t => vectors(i)(t) * values(t) * vectors(j)(t)).sum
        // convergence stops at Σoff² < 1e-12 → entries accurate to ~1e-6
        assert(math.abs(rec - m(i)(j)) < 1e-6, s"d=$d ($i,$j): $rec vs ${m(i)(j)}")
      }
    }
  }

  test("minhash signature estimates Jaccard (statistical bound)") {
    val rnd = new Random(2)
    val k = 128
    for (_ <- 1 to 50) {
      val common = 5 + rnd.nextInt(36)
      val extra = rnd.nextInt(31)
      val shared = (1 to common).map(i => s"c$i")
      val a = shared ++ (1 to extra).map(i => s"a$i")
      val b = shared ++ (1 to extra).map(i => s"b$i")
      val sa = MinHashSignature.signature(a.iterator.map(_.getBytes("UTF-8")), k)
      val sb = MinHashSignature.signature(b.iterator.map(_.getBytes("UTF-8")), k)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
      val truth = common.toDouble / (common + 2 * extra)
      // binomial sd ≈ sqrt(p(1-p)/k) ≤ 0.045 at k=128; allow ~5 sd
      assert(math.abs(est - truth) < 0.25, s"est=$est truth=$truth common=$common extra=$extra")
    }
  }

  test("simhash: identical sets collide, disjoint sets diverge") {
    val rnd = new Random(3)
    for (_ <- 1 to 50) {
      val n = 10 + rnd.nextInt(51)
      val toks = (1 to n).map(i => s"t${rnd.nextInt(100000)}_$i")
      val h1 = SimHash64.simhash(toks.iterator.map(_.getBytes("UTF-8")))
      val h2 = SimHash64.simhash(toks.iterator.map(_.getBytes("UTF-8")))
      assert(h1 == h2)
      val disjoint = (1 to n).map(i => s"u${rnd.nextInt(100000)}_$i")
      val h3 = SimHash64.simhash(disjoint.iterator.map(_.getBytes("UTF-8")))
      assert(java.lang.Long.bitCount(h1 ^ h3) > 8)
    }
  }

  test("rolling hash: deterministic and order-sensitive") {
    val rnd = new Random(4)
    for (_ <- 1 to 200) {
      val a = rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString
      val b = rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString
      assert(RollingHash.hash(a.getBytes("UTF-8")) == RollingHash.hash(a.getBytes("UTF-8")))
      if (a != b) {
        assert(RollingHash.hash((a + b).getBytes("UTF-8")) !=
          RollingHash.hash((b + a).getBytes("UTF-8")) || (a + b) == (b + a))
      }
    }
  }

  test("point-in-polygon matches axis-box semantics on random boxes") {
    val rnd = new Random(5)
    for (_ <- 1 to 500) {
      def c() = rnd.nextDouble() * 200 - 100
      val (x1, x2, y1, y2) = (c(), c(), c(), c())
      val (px, py) = (c(), c())
      val (loX, hiX) = (math.min(x1, x2), math.max(x1, x2))
      val (loY, hiY) = (math.min(y1, y2), math.max(y1, y2))
      if (hiX - loX > 1e-6 && hiY - loY > 1e-6 &&
        px != loX && px != hiX && py != loY && py != hiY) {
        val xs = Array(loX, hiX, hiX, loX)
        val ys = Array(loY, loY, hiY, hiY)
        val in = PointInPolygon.contains(xs, ys, px, py)
        val expect = px > loX && px < hiX && py > loY && py < hiY
        assert(in == expect, s"box=($loX,$loY)-($hiX,$hiY) p=($px,$py)")
      }
    }
  }
}
