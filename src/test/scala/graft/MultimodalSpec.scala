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

  test("batching shape: grouped batches cover all rows exactly once") {
    val blobs = (1L to 100L).map(i => Multimodal.BlobRow(i, Array.fill(8)(i.toByte))).toDS()
    val out = Multimodal.decodeFeatures(blobs.repartition(3), batchSize = 7)
    assert(out.count() == 100)
    assert(out.select("doc_id").distinct().count() == 100)
  }
}
