package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.{MediaMeta, MediaRecord}

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries opaque bytes; stub decode is deterministic") {
    val docs = Seq((1L, "hello"), (2L, "worlds!")).toDF("doc_id", "text")
    val out = MultimodalOps.decodeDocuments(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_bytes") === 5)
    assert(out(1L).getAs[Int]("width") === 5)
    assert(out(1L).getAs[Int]("height") === 35)
    assert(out(2L).getAs[Int]("n_bytes") === 7)
    assert(out(2L).getAs[String]("format") === "png") // 7 % 3 == 1
  }

  test("decoder is called in batches, once per group") {
    var batches = Vector.empty[Int]
    val counting = new MultimodalOps.MediaDecoder {
      override def decodeBatch(b: Seq[MediaRecord]): Seq[MediaMeta] =
        MultimodalOps.StubDecoder.decodeBatch(b)
    }
    val media = Seq.tabulate(10)(i => MediaRecord(i.toLong, Array.fill(i + 1)(0x41.toByte)))
      .toDS().repartition(1)
    val out = MultimodalOps.decode(media, counting, batchSize = 4).collect()
    assert(out.length === 10)
    assert(out.map(_.n_bytes).sorted.toSeq === (1 to 10))
  }
}
