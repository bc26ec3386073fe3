package graft.operators

import graft.SparkSpecBase
import graft.multimodal.{MediaBlob, MediaCodec}

class MultimodalQueriesSpec extends SparkSpecBase {

  private def blob(id: Long, bytes: Array[Byte], frames: Int = 4) =
    MediaBlob(id, "video", 32, 32, frames, bytes)

  test("decode computes byte stats over the raw payload") {
    val f = MediaCodec.decode(blob(1, Array[Byte](10, 20, 30)))
    assert(f.n_bytes == 3 && f.sum_bytes == 60 && f.min_byte == 10 && f.max_byte == 30)
    assert(f.mean_byte == 20.0)
    val empty = MediaCodec.decode(blob(2, Array.empty[Byte]))
    assert(empty.n_bytes == 0 && empty.mean_byte == 0.0)
  }

  test("decode treats bytes as unsigned") {
    val f = MediaCodec.decode(blob(1, Array[Byte](-1)))  // 0xFF = 255
    assert(f.sum_bytes == 255 && f.max_byte == 255)
  }

  test("frame sampling slices whole frames and drops the tail remainder") {
    // 10 bytes, 4 frames -> frame_len 2, frames at 0,2,4,6; stride 2 -> frames 0,2
    val s = MediaCodec.sampleFrames(blob(1, Array.range(0, 10).map(_.toByte), frames = 4), 2)
    assert(s.frame_len == 2 && s.n_sampled == 2 && s.sampled_bytes == 4)
  }

  test("resize halves dims and truncates payload to the pixel budget") {
    val r = MediaCodec.resize(MediaBlob(1, "image", 8, 4, 1, Array.fill(100)(1.toByte)))
    assert(r.width == 4 && r.height == 2 && r.data.length == 8)
    val small = MediaCodec.resize(MediaBlob(1, "image", 8, 4, 1, Array.fill(3)(1.toByte)))
    assert(small.data.length == 3)
  }

  test("batched pipeline equals per-row decode regardless of batch boundaries") {
    import spark.implicits._
    val viaPipeline = MultimodalQueries.mmFeatures(spark, sfDir)
      .select("doc_id", "sum_bytes").as[(Long, Long)].collect().toMap
    val perRow = MultimodalQueries.mediaTable(spark, sfDir)
      .collect().map(b => b.doc_id -> MediaCodec.decode(b).sum_bytes).toMap
    assert(viaPipeline == perRow)
    assert(viaPipeline.size == 500)
  }

  test("media table round-trips binary payloads through the BinaryType column") {
    val blobs = MultimodalQueries.mediaTable(spark, sfDir).take(5)
    blobs.foreach { b =>
      assert(new String(b.data, java.nio.charset.StandardCharsets.UTF_8).nonEmpty)
      assert(Set("image", "audio", "video").contains(b.media_type))
    }
  }

  test("mm_dup_groups equals a brute-force head-block fingerprint grouping") {
    import spark.implicits._
    val P = graft.functions.HashFunctions.P
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs
      .map { case (id, t) =>
        val head = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(64)
        (id, head.foldLeft(0L)((h, x) => (h * 131 + (x & 0xff)) % P))
      }
      .groupBy(_._2).collect { case (h, g) if g.length >= 2 =>
        (h, g.length.toLong, g.map(_._1).min)
      }.toSet
    val got = MultimodalQueries.mmDupGroups(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected, s"dup groups drifted (got ${got.size}, exp ${expected.size})")
    assert(got.nonEmpty, "planted near-dups share heads; the screen must fire")
  }

  test("mm_shard_layout: shards partition the corpus under the byte budget") {
    import spark.implicits._
    val rows = MultimodalQueries.mmShardLayout(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val nMedia = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_._4).sum == nMedia, "shard item counts must partition the corpus")
    rows.groupBy(r => (r._1, r._2)).foreach { case ((mt, blk), shards) =>
      val byShard = shards.sortBy(_._3)
      // dense shard numbering from 0 within each (type, block) group
      assert(byShard.map(_._3).toSeq == byShard.indices.map(_.toLong),
        s"non-dense shards in ($mt, $blk)")
      // exclusive-prefix packing: every shard STARTS under the budget,
      // so its size can exceed 4096 by at most one straggling item --
      // total bytes through shard k-1 must stay below k * budget
      byShard.map(_._5).scanLeft(0L)(_ + _).zipWithIndex.drop(1).dropRight(1)
        .foreach { case (cum, k) =>
          assert(cum >= k * 4096L, s"shard $k in ($mt, $blk) opened early")
        }
      // doc ranges of consecutive shards must not overlap (order kept)
      byShard.sliding(2).foreach {
        case Array(a, b) => assert(a._7 < b._6, s"overlapping shards in ($mt, $blk)")
        case _ =>
      }
    }
  }
}
