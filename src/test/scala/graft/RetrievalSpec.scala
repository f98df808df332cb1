package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextRank, TextStats}

/** Corpus retrieval/salience operators: BM25 scoring against an
  * independent in-memory replication of the Okapi formula, and
  * TextRank against an independent integer power-iteration reference
  * (same technique as BpeSpec: the reference shares no code with the
  * operator).
  */
class RetrievalSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffle join spark spark agg"),
    (2L, "join filter scan window join"),
    (3L, "sort merge join shuffle spark"),
    (4L, "vector batch stream row column")
  ).toDF("doc_id", "text")

  test("bm25 matches an independent in-memory Okapi computation") {
    val terms = Seq("spark", "join")
    val got = TextStats.bm25(corpus, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    val docs = Seq(
      1L -> "spark shuffle join spark spark agg",
      2L -> "join filter scan window join",
      3L -> "sort merge join shuffle spark",
      4L -> "vector batch stream row column").map {
      case (id, t) => id -> t.split(" ").toSeq
    }
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    def score(id: Long): BigDecimal = {
      val toks = docs.find(_._1 == id).get._2
      val dl = toks.size.toDouble
      terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) BigDecimal(0)
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          val tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
          BigDecimal(idf * tfn).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
    }
    def round4(s: BigDecimal): Double =
      ((s * 1000000).toLong + 50L) / 100L / 10000.0
    assert(got.keySet == Set(1L, 2L, 3L))
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == round4(score(id)), s"doc $id")
    }
    // the doc hitting both terms with the highest tf ranks first
    assert(got(1L) > got(2L) && got(1L) > got(3L))
  }

  test("jlProject equals a hand-computed sign projection") {
    import graft.operators.Ann
    val d = 6; val k = 2
    val vec = Array(1.0f, -2.0f, 0.5f, 4.0f, 0.0f, -1.5f)
    val df = Seq((1L, vec.toSeq)).toDF("vec_id", "embedding")
    val got = Ann.jlProject(df, "vec_id", "embedding", d, k)
      .collect().head
    val planes = Ann.jlPlanes(d, k)
    // planes are ±1/√k, deterministic in (d, k)
    val inv = 1.0 / math.sqrt(k.toDouble)
    assert(planes.flatten.forall(v => v == inv || v == -inv))
    assert(Ann.jlPlanes(d, k).map(_.toSeq).toSeq == planes.map(_.toSeq).toSeq)
    (0 until k).foreach { j =>
      var dot = 0.0
      (0 until d).foreach(i => dot += vec(i) * planes(j)(i))
      assert(got.getDouble(1 + j) == dot, s"plane $j")
    }
  }

  test("textRank matches an independent integer power-iteration reference") {
    val got = TextRank.textRank(corpus, "text", iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // independent reference: bigrams → undirected weighted edges →
    // 5 damped rounds in scaled integer arithmetic
    val texts = Seq(
      "spark shuffle join spark spark agg",
      "join filter scan window join",
      "sort merge join shuffle spark",
      "vector batch stream row column").map(_.split(" ").toSeq)
    val bi = texts.flatMap(t => t.zip(t.tail)).filter(p => p._1 != p._2)
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val und = bi.toSeq.flatMap { case ((a, b), c) => Seq((a, b) -> c, (b, a) -> c) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val deg = und.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val scale = 1000000000L
    var rank = deg.keys.map(_ -> scale).toMap
    for (_ <- 1 to 5) {
      val contrib = und.toSeq.map { case ((s, d), w) => d -> (rank(s) * w / deg(s)) }
        .groupBy(_._1).map { case (d, v) => d -> v.map(_._2).sum }
      rank = contrib.map { case (w, s) => w -> (150000000L + 85L * s / 100L) }
    }
    assert(got == rank)
    assert(got.nonEmpty)

    // forced distributed rounds (localFinishEdges=0) must equal the
    // single-task local finish bit-for-bit (the CC/BPE contract).
    val dist = TextRank.textRank(corpus, "text", iters = 5,
        localFinishEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist == got)
  }
}
