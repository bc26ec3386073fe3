package graft.operators

import graft.SparkSpecBase
import graft.multimodal.{MediaBlob, MediaCodec, MediaFiles}

class MultimodalQueriesSpec extends SparkSpecBase {

  private def blob(id: Long, bytes: Array[Byte], frames: Int = 4) =
    MediaBlob(id, "video", 32, 32, frames, bytes)

  test("keyframe selection coheres with scene-cut: shots partition frames, cuts agree") {
    import org.apache.spark.sql.functions._
    val shots = MultimodalQueries.mmKeyframeSelect(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(max(col("shot")).as("max_shot"), sum(col("n_frames")).as("covered"))
    val cuts = MultimodalQueries.mmVideoSceneCut(spark, sfDir)
      .select(col("doc_id"), col("n_frames"), col("n_cuts"))
    val joined = shots.join(cuts, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("max_shot") == r.getAs[Long]("n_cuts"),
        s"doc ${r.getAs[Long]("doc_id")}: shots and cuts disagree")
      assert(r.getAs[Long]("covered") == r.getAs[Long]("n_frames"),
        s"doc ${r.getAs[Long]("doc_id")}: shots do not partition the frames")
    }
    // the keyframe lives inside its shot's span
    MultimodalQueries.mmKeyframeSelect(spark, sfDir).collect().foreach { r =>
      val (lo, hi, k) = (r.getAs[Long]("first_frame"),
        r.getAs[Long]("last_frame"), r.getAs[Long]("keyframe"))
      assert(k >= lo && k <= hi, s"keyframe $k outside shot [$lo,$hi]")
    }
  }

  test("stub decode computes byte stats over the raw payload") {
    val f = MediaCodec.decode(blob(1, Array[Byte](10, 20, 30)))
    assert(f.n_units == 3 && f.sum_vals == 60 && f.min_val == 10 && f.max_val == 30)
    assert(f.mean_val == 20.0 && f.decoded_w == 0 && f.decoded_h == 0)
    val empty = MediaCodec.decode(blob(2, Array.empty[Byte]))
    assert(empty.n_units == 0 && empty.mean_val == 0.0)
  }

  test("stub decode treats bytes as unsigned") {
    val f = MediaCodec.decode(blob(1, Array[Byte](-1)))  // 0xFF = 255
    assert(f.sum_vals == 255 && f.max_val == 255)
  }

  test("BMP round-trip: header dims and every channel value survive encode+decode") {
    // w=3 → 3w=9 bytes/row → stride 12: 3 padding bytes exercise the
    // row-padding walk; h=2 exercises the bottom-up row order
    val px = Map((0, 0) -> (1, 2, 3), (1, 0) -> (4, 5, 6), (2, 0) -> (7, 8, 9),
      (0, 1) -> (10, 11, 12), (1, 1) -> (13, 14, 15), (2, 1) -> (255, 0, 128))
    val bytes = MediaFiles.encodeBmp(3, 2, (x, y) => px((x, y)))
    val got = MediaFiles.decodeBmp(bytes).get
    assert(got.width == 3 && got.height == 2)
    // visual top-down, (b, g, r) per pixel
    val want = (0 until 2).flatMap(y => (0 until 3).flatMap { x =>
      val (b, g, r) = px((x, y)); Seq(b, g, r)
    })
    assert(got.channels.toSeq == want, "padding or row order mishandled")
  }

  test("WAV round-trip + chunk walking: an extra LIST chunk before data decodes fine") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val bytes = MediaFiles.encodeWav(8000, samples)
    val got = MediaFiles.decodeWav(bytes).get
    assert(got.sampleRate == 8000 && got.bitsPerSample == 16)
    assert(got.samples.toSeq == samples.toSeq)
    // splice an odd-sized LIST chunk between 'fmt ' and 'data': a real
    // RIFF walker must skip it (word-aligned) and still find the data
    val head = bytes.take(36) // RIFF..WAVE..fmt chunk
    val tail = bytes.drop(36) // data chunk
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0) // size 5 + pad
    val spliced = head ++ listChunk ++ tail
    // fix the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    val got2 = MediaFiles.decodeWav(spliced).get
    assert(got2.samples.toSeq == samples.toSeq, "chunk walk failed on LIST")
  }

  test("malformed media falls back to the stub, never throws") {
    val junkImage = MediaBlob(7, "image", 4, 4, 1, Array[Byte]('B', 'M', 1, 2, 3))
    val f = MediaCodec.decodeMedia(junkImage)
    assert(f.decoded_w == 0 && f.n_units == 5, "truncated BMP must stub-decode")
    val junkAudio = MediaBlob(8, "audio", 0, 0, 1, "RIFFxxxxWAVE".getBytes("US-ASCII"))
    val f2 = MediaCodec.decodeMedia(junkAudio)
    assert(f2.decoded_w == 0, "chunkless WAV must stub-decode")
    assert(MediaFiles.decodeBmp("plain text".getBytes).isEmpty)
    assert(MediaFiles.decodeWav("plain text that is long enough to pass the length gate"
      .getBytes).isEmpty)
  }

  test("mm_features decodes REAL container bytes: parsed dims match the encode parameters") {
    import spark.implicits._
    val feats = MultimodalQueries.mmFeatures(spark, sfDir)
      .select("doc_id", "media_type", "decoded_w", "decoded_h")
      .as[(Long, String, Int, Int)].collect()
    assert(feats.nonEmpty)
    feats.foreach {
      case (id, "image", w, h) =>
        assert(w == 16 + (id % 8) * 2 && h == 8 + (id % 5) * 3,
          s"doc $id: BMP header dims not recovered ($w x $h)")
      case (_, "audio", rate, bits) =>
        assert(rate == 16000 && bits == 16, "WAV fmt fields not recovered")
      case (id, "video", w, h) =>
        assert(w == 32 + (id % 8) * 16 && h == 32 + (id % 5) * 16,
          s"doc $id: AVI avih dims not recovered ($w x $h)")
      case other => fail(s"unexpected row $other")
    }
  }

  test("mm_binary_files: binaryFile source recovers per-file dims, length, and pixel sums") {
    import spark.implicits._
    val got = MultimodalQueries.mmBinaryFiles(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val nImages = graft.Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0).count()
    assert(got.length == nImages, "one row per written .bmp file")
    got.foreach { case (id, w, h, len, sb, sg, sr) =>
      assert(w == 16 + (id % 8) * 2 && h == 8 + (id % 5) * 3, s"doc $id dims")
      // BMP spec: 54-byte headers + rows padded to 4 bytes
      assert(len == 54 + ((3 * w + 3) / 4) * 4 * h, s"doc $id file length")
      // spot-check one channel sum against the closed-form pixel values
      val expB = (for (y <- 0L until h; x <- 0L until w)
        yield (id + 2 * x + 3 * y) % 256).sum
      assert(sb == expB, s"doc $id blue-channel sum")
      assert(sg >= 0 && sr >= 0)
    }
  }

  test("mm_image_hist: bucket counts sum to the pixel count per channel") {
    import spark.implicits._
    val rows = MultimodalQueries.mmImageHist(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, g) =>
      assert(g.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L), s"doc $id buckets")
      val px = (16 + (id % 8) * 2) * (8 + (id % 5) * 3)
      assert(g.map(_._3).sum == px && g.map(_._4).sum == px && g.map(_._5).sum == px,
        s"doc $id: histogram mass != $px pixels")
    }
  }

  test("mm_phash: aHash groups equal a from-scratch closed-form recompute") {
    import spark.implicits._
    // independent recompute: straight from the pixel FORMULAS, never
    // touching MediaFiles — so a decode row-order or channel-order bug
    // cannot cancel itself out
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").as[Long].collect().filter(_ % 3 == 0)
    def ahash(id: Long): (Long, Long) = {
      val w = 16 + (id % 8).toInt * 2; val h = 8 + (id % 5).toInt * 3
      val sums = new Array[Long](64); val cnts = new Array[Long](64)
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) {
        def m(v: Long) = ((v % 256) + 256) % 256
        val gray = (m(id + 2 * x + 3 * y) + m(id * 2 + x + 5 * y + 1) +
          m(id * 3 + 4 * x + y + 2)).toInt / 3
        val blk = (y * 8 / h) * 8 + (x * 8 / w)
        sums(blk) += gray; cnts(blk) += 1; total += gray
      }
      val n = w.toLong * h
      var h0 = 0L; var h1 = 0L
      for (b <- 0 until 64 if sums(b) * n > total * cnts(b))
        if (b < 32) h0 |= 1L << b else h1 |= 1L << (b - 32)
      (h0, h1)
    }
    val expected = ids.map(ahash).groupBy(identity).collect {
      case (hsh, grp) if grp.length >= 2 =>
        val members = ids.filter(i => ahash(i) == hsh)
        (hsh._1, hsh._2, members.length.toLong, members.min)
    }.toSet
    val got = MultimodalQueries.mmPhash(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected, s"aHash groups drifted: got $got want $expected")
    assert(got.nonEmpty, "the gradient fixtures must collide (aHash invariance)")
  }

  test("frame sampling falls back to equal slicing for container-less payloads") {
    // 10 bytes, 4 frames -> frame_len 2, frames at 0,2,4,6; stride 2 -> frames 0,2
    val s = MediaCodec.sampleFrames(blob(1, Array.range(0, 10).map(_.toByte), frames = 4), 2)
    assert(s.frame_len == 2 && s.n_sampled == 2 && s.sampled_bytes == 4)
  }

  test("AVI round-trip: header fields and every frame byte survive encode+decode") {
    // odd frame sizes exercise the RIFF word-alignment padding walk
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7), Array[Byte](8))
    val bytes = MediaFiles.encodeAvi(320, 240, 40000, frames)
    val got = MediaFiles.decodeAvi(bytes).get
    assert(got.width == 320 && got.height == 240)
    assert(got.microSecPerFrame == 40000 && got.totalFrames == 3)
    assert(got.frames.map(_.toSeq).toSeq == frames.map(_.toSeq),
      "movi chunk walk mishandled sizes or padding")
    // malformed containers never parse: truncated header, wrong form,
    // garbage after a valid prefix
    assert(MediaFiles.decodeAvi(bytes.take(11)).isEmpty)
    assert(MediaFiles.decodeAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val corrupt = bytes.clone
    corrupt(4) = 0x7f.toByte // RIFF size points past the buffer
    corrupt(5) = 0x7f.toByte; corrupt(6) = 0x7f.toByte
    assert(MediaFiles.decodeAvi(corrupt).isEmpty)
    // an INNER chunk size near Int.MaxValue must fail the bound check,
    // not overflow past it (returns None, never throws — a corrupt row
    // must not kill the decode batch)
    val innerOverflow = bytes.clone
    val hdrlSizeOff = 16 // RIFF(12) + "LIST"(4) -> the hdrl list's size field
    innerOverflow(hdrlSizeOff) = 0xf0.toByte
    innerOverflow(hdrlSizeOff + 1) = 0xff.toByte
    innerOverflow(hdrlSizeOff + 2) = 0xff.toByte
    innerOverflow(hdrlSizeOff + 3) = 0x7f.toByte // 0x7ffffff0
    assert(MediaFiles.decodeAvi(innerOverflow).isEmpty, "Int overflow must not escape")
  }

  test("decodeAvi skips interleaved audio chunks: only video chunks become frames") {
    // hand-splice a '01wb' audio chunk between two video chunks inside
    // movi (the standard interleaved A/V layout)
    val frames = Seq(Array[Byte](1, 2), Array[Byte](3, 4))
    val bytes = MediaFiles.encodeAvi(64, 48, 40000, frames)
    // movi content currently: 00dc(2B) 00dc(2B); rebuild with an audio
    // chunk in the middle by editing the container bytes directly
    val audio = "01wb".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 9, 9, 9, 9)
    // locate the second '00dc' tag and splice before it
    def find(bs: Array[Byte], tag: String, from: Int): Int =
      bs.indices.drop(from).find(i => i + 4 <= bs.length &&
        new String(bs, i, 4, "US-ASCII") == tag).getOrElse(-1)
    val first = find(bytes, "00dc", 0)
    val second = find(bytes, "00dc", first + 4)
    val spliced = bytes.take(second) ++ audio ++ bytes.drop(second)
    // fix the RIFF and movi LIST sizes (both grew by 12)
    def bump(bs: Array[Byte], off: Int, by: Int): Unit = {
      val v = java.nio.ByteBuffer.wrap(bs, off, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      java.nio.ByteBuffer.wrap(bs, off, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v + by)
    }
    bump(spliced, 4, audio.length) // RIFF size
    val moviList = find(spliced, "movi", 0) - 8 // its LIST size field
    bump(spliced, moviList + 4, audio.length)
    val got = MediaFiles.decodeAvi(spliced).get
    assert(got.frames.map(_.toSeq).toSeq == frames.map(_.toSeq),
      "audio '01wb' chunks must not be counted as video frames")
  }

  test("frame sampling walks REAL AVI movi chunks (container truth beats metadata)") {
    val frames = Seq.tabulate(5)(f => Array.fill(10)(f.toByte))
    val avi = MediaFiles.encodeAvi(64, 48, 40000, frames)
    // metadata LIES (n_frames = 2): the container walk must win
    val s = MediaCodec.sampleFrames(MediaBlob(9, "video", 64, 48, 2, avi), 2)
    assert(s.n_frames == 5, "frame count must come from the parsed container")
    assert(s.frame_len == 10 && s.n_sampled == 3 && s.sampled_bytes == 30)
  }

  test("resize halves dims and truncates payload to the pixel budget (stub fallback)") {
    val r = MediaCodec.resize(MediaBlob(1, "image", 8, 4, 1, Array.fill(100)(1.toByte)))
    assert(r.width == 4 && r.height == 2 && r.data.length == 8)
    val small = MediaCodec.resize(MediaBlob(1, "image", 8, 4, 1, Array.fill(3)(1.toByte)))
    assert(small.data.length == 3)
    // container-less payloads route resizeImage to the same stub
    val viaReal = MediaCodec.resizeImage(MediaBlob(1, "image", 8, 4, 1, Array.fill(100)(1.toByte)))
    assert(viaReal.width == 4 && viaReal.data.length == 8)
  }

  test("resizeImage box-averages 2x2 blocks for real BMPs (hand-computed pixels)") {
    // 4x2 source -> 2x1 resized; channel values chosen so each 2x2
    // average is exact or exercises the floor
    val px = Map(
      (0, 0) -> (10, 1, 0), (1, 0) -> (20, 2, 0), (2, 0) -> (7, 3, 255), (3, 0) -> (9, 4, 255),
      (0, 1) -> (30, 5, 0), (1, 1) -> (40, 6, 0), (2, 1) -> (8, 7, 253), (3, 1) -> (11, 8, 252))
    val bmp = MediaFiles.encodeBmp(4, 2, (x, y) => px((x, y)))
    val r = MediaCodec.resizeImage(MediaBlob(5, "image", 4, 2, 1, bmp))
    assert(r.width == 2 && r.height == 1)
    val back = MediaFiles.decodeBmp(r.data).get
    // pixel (0,0): b = (10+20+30+40)/4 = 25, g = (1+2+5+6)/4 = 3 (floor 3.5)
    // pixel (1,0): b = (7+9+8+11)/4 = 8 (floor 8.75), g = (3+4+7+8)/4 = 5
    //              (floor 5.5), r = (255+255+253+252)/4 = 253 (floor 253.75)
    assert(back.channels.toSeq == Seq(25, 3, 0, 8, 5, 253),
      s"box averages drifted: ${back.channels.toSeq}")
  }

  test("downsampleAudio pair means truncate toward zero (hand-computed samples)") {
    // Negative odd pair sums are where truncate (-3/2 = -1, DuckDB //)
    // and floor (-3/2 = -2, Python //) disagree — the oracle contract
    // is truncate, so pin it on exactly such pairs. 7 samples: the odd
    // tail (99) must be dropped.
    val in = Array(-1, -2, 5, 4, -7, 2, 99) // pairs: -3/2, 9/2, -5/2
    val wav = MediaFiles.encodeWav(16000, in)
    val r = MediaCodec.downsampleAudio(MediaBlob(9, "audio", 0, 0, 1, wav))
    val back = MediaFiles.decodeWav(r.data).get
    assert(back.sampleRate == 8000)
    assert(back.samples.toSeq == Seq(-1, 4, -2),
      s"pair means drifted: ${back.samples.toSeq}")
    // payload: 44-byte RIFF/fmt/data header + 2 bytes per sample
    assert(r.data.length == 44 + 2 * 3)
  }

  test("batched pipeline equals per-row decode regardless of batch boundaries") {
    import spark.implicits._
    val viaPipeline = MultimodalQueries.mmFeatures(spark, sfDir)
      .select("doc_id", "sum_vals").as[(Long, Long)].collect().toMap
    val perRow = MultimodalQueries.mediaTableEncoded(spark, sfDir)
      .collect().map(b => b.doc_id -> MediaCodec.decodeMedia(b).sum_vals).toMap
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

  test("mm_wav_energy stats equal a brute-force recompute over decoded samples") {
    import spark.implicits._
    val got = MultimodalQueries.mmWavEnergy(spark, sfDir)
      .as[(Long, Int, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val byDoc = got.map(r => r._1 -> r).toMap
    MultimodalQueries.mediaTableEncoded(spark, sfDir)
      .filter(_.media_type == "audio").take(20).foreach { b =>
        val samples = MediaFiles.decodeWav(b.data).get.samples
        val chunks = samples.grouped(160).toArray
          .map(_.map(v => v.toLong * v).sum)
        val (_, rate, n, nc, total, maxE, maxIdx) = byDoc(b.doc_id)
        assert(rate == 16000 && n == samples.length && nc == chunks.length)
        assert(total == chunks.sum, s"doc ${b.doc_id}: total energy drifted")
        assert(maxE == chunks.max)
        assert(maxIdx == chunks.indexOf(chunks.max).toLong, "first-max tie rule")
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

  test("mm_audio_pitch: the detector recovers every planted period through the codec") {
    import spark.implicits._
    val rows = MultimodalQueries.mmAudioPitch(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._1 % 3 == 1), "audio docs only")
    rows.foreach { case (id, n, r0, bestL, bestR) =>
      val p = 4 + (id % 13)
      val amp = 512 + (id % 97)
      assert(n == 400 + (id % 5) * 40, s"doc $id sample count")
      assert(r0 == n * amp * amp, s"doc $id zero-lag energy")
      // the argmax IS the planted full period — detection, not metadata
      assert(bestL == 2 * p, s"doc $id: found lag $bestL, planted ${2 * p}")
      // perfect alignment at the true period: every product is +amp^2
      assert(bestR == (n - 2 * p) * amp * amp, s"doc $id best_r")
    }
    // the grid genuinely discriminates: different docs find different periods
    assert(rows.map(_._4).distinct.length == 13, "expected all 13 planted periods")
  }

  test("MJPEG: real JPEG payloads in a real MJPG AVI, codec noise inside the decision margins") {
    import graft.multimodal.MediaFiles
    // the MJPG container declares its codec: strh handler AND strf
    // biCompression both carry the fourcc (VfW's dispatch fields)
    val jp = MediaFiles.encodeJpegSolid(48, 32, 128)
    val avi = MediaFiles.encodeAvi(48, 32, 40000, Seq(jp, jp), handler = "MJPG")
    val s = new String(avi, "ISO-8859-1")
    assert(s.contains("vidsMJPG"), "strh handler fourcc")
    assert(s.sliding(4).count(_ == "MJPG") >= 2, "strf biCompression fourcc too")
    // every '00dc' payload is a complete JPEG (SOI marker) the walker
    // hands back byte-identical
    val dec = MediaFiles.decodeAvi(avi).get
    assert(dec.frames.length == 2)
    dec.frames.foreach { f =>
      assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8, "JPEG SOI")
      assert(java.util.Arrays.equals(f, jp), "payload survives the container")
    }
    // codec noise bound: a solid plant decodes to a mean within 2 levels
    // at EVERY planted level the fixture uses — the margin arithmetic
    // (cut threshold 32, scene gap >= 80, keyframe step 8) rests on this
    for (level <- Seq(32, 40, 48, 128, 136, 144, 224, 232, 240)) {
      val pix = MediaFiles.decodeJpeg(MediaFiles.encodeJpegSolid(48, 32, level)).get
      assert(pix.width == 48 && pix.height == 32)
      val mean = pix.channels.map(_.toLong).sum.toDouble / pix.channels.length
      assert(math.abs(mean - level) <= 2.0,
        s"solid $level decoded to mean $mean — JPEG noise exceeds the fixture margin")
    }
    // non-image bytes refuse instead of guessing
    assert(MediaFiles.decodeJpeg("not a jpeg".getBytes).isEmpty)
  }

  test("mm_mjpeg_keyframes recovers the planted schedule from decoded pixels") {
    import spark.implicits._
    val rows = MultimodalQueries.mmMjpegKeyframes(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._1 % 3 == 2), "video docs only")
    rows.groupBy(_._1).foreach { case (id, shots) =>
      val ns = 1 + ((id / 3) % 3).toInt
      val fps = 1 + ((id / 5) % 3).toInt
      assert(shots.length == ns, s"doc $id: ${shots.length} shots, planted $ns")
      shots.sortBy(_._2).zipWithIndex.foreach { case ((_, shot, first, last, n, key), s) =>
        assert(shot == s && first == s.toLong * fps && last == s.toLong * fps + fps - 1
          && n == fps, s"doc $id shot $s span")
        val expectKey = s.toLong * fps +
          (0 until fps).maxBy(j => ((id + j) % 3, -j))
        assert(key == expectKey, s"doc $id shot $s keyframe: $key vs $expectKey")
      }
    }
    // the detector genuinely segments: shot counts vary across docs
    assert(rows.groupBy(_._1).values.map(_.length).toSet == Set(1, 2, 3))
  }
}
