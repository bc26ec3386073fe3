package graft.multimodal

/** Opaque media payload with typed metadata — the engine's model for
  * image/audio/video columns: binary data rides an ordinary BinaryType
  * column; metadata (dims, frame count) are plain typed columns so
  * Catalyst can prune/filter on them without touching payload bytes.
  */
case class MediaBlob(
    doc_id: Long,
    media_type: String, // image | audio | video
    width: Int,
    height: Int,
    n_frames: Int,
    data: Array[Byte])

/** Batch-level decoded features. For media the codec can really parse
  * (BMP images, WAV audio — see [[MediaFiles]]) the stats are over
  * DECODED content units (pixel channel values / PCM samples) and
  * `decoded_w`/`decoded_h` carry header fields (image dims; for audio,
  * sample rate and bits per sample). For everything else the stub path
  * reports raw-byte stats with decoded_w = decoded_h = 0. */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    decoded_w: Int,
    decoded_h: Int,
    n_units: Long,
    sum_vals: Long,
    min_val: Int,
    max_val: Int,
    mean_val: Double)

/** Frame-sampling result for video payloads. */
case class FrameSample(
    doc_id: Long,
    n_frames: Int,
    frame_len: Long,
    n_sampled: Int,
    sampled_bytes: Long)

/** Media codec: REAL header-parsing decode for BMP, WAV, and AVI
  * payloads ([[MediaFiles]] — pure JVM, zero deps); the byte-stat STUB
  * remains only as the disclosed fallback for payloads with no
  * parsable container (and for the frame CONTENTS inside an AVI, which
  * stay an opaque "raw codec" — the sandbox has no video codec
  * library; a real decoder would plug into the per-frame bytes the
  * container walk already isolates). Everything around it — the typed
  * binary schema, executor-side batching, frame slicing, resize
  * metadata handling — is the Spark plumbing such a codec plugs into.
  *
  * Batch shape: [[decodeBatch]] takes a whole batch so a real
  * implementation can amortize codec/model initialization per batch
  * (the JVM analog of a pandas-batch UDF).
  */
object MediaCodec {

  private def stats(doc: Long, mt: String, w: Int, h: Int,
      vals: Array[Int]): MediaFeatures = {
    var sum = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var i = 0
    while (i < vals.length) {
      val v = vals(i)
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val n = vals.length.toLong
    MediaFeatures(doc, mt, w, h, n, sum,
      if (n == 0) 0 else mn, if (n == 0) 0 else mx,
      if (n == 0) 0.0 else sum.toDouble / n.toDouble)
  }

  /** STUB decode for payloads with no parsable container: unsigned
    * byte statistics standing in for what a codec+model would emit. */
  def decode(blob: MediaBlob): MediaFeatures = {
    val bs = blob.data
    val vals = new Array[Int](bs.length)
    var i = 0
    while (i < bs.length) { vals(i) = bs(i) & 0xff; i += 1 }
    stats(blob.doc_id, blob.media_type, 0, 0, vals)
  }

  /** REAL decode where the container is parsable: BMP payloads yield
    * header dims + channel-value stats, WAV payloads yield
    * (sample_rate, bits) + PCM sample stats (signed), AVI payloads
    * yield header dims + unsigned byte stats over the movi frame
    * payloads (the container walk is real; the frame bytes stay an
    * opaque "raw codec" — actual video frame decoding would plug in
    * here). Anything that fails structural validation falls back to
    * the byte-stat stub — a corrupt file still produces a row (with
    * decoded_w = 0 marking the fallback) instead of killing the
    * batch. */
  def decodeMedia(blob: MediaBlob): MediaFeatures = {
    val parsed = blob.media_type match {
      case "image" => MediaFiles.decodeBmp(blob.data).map(b =>
        stats(blob.doc_id, blob.media_type, b.width, b.height, b.channels))
      case "audio" => MediaFiles.decodeWav(blob.data).map(w =>
        stats(blob.doc_id, blob.media_type, w.sampleRate, w.bitsPerSample, w.samples))
      case "video" => MediaFiles.decodeAvi(blob.data).map { a =>
        val vals = new Array[Int](a.frames.iterator.map(_.length).sum)
        var i = 0
        a.frames.foreach(_.foreach { b => vals(i) = b & 0xff; i += 1 })
        stats(blob.doc_id, blob.media_type, a.width, a.height, vals)
      }
      case _ => None
    }
    parsed.getOrElse(decode(blob))
  }

  /** Batch decode: one call per executor-side batch. */
  def decodeBatch(batch: Seq[MediaBlob]): Seq[MediaFeatures] = batch.map(decodeMedia)

  /** Stub resize: halves dimensions, truncates payload to the new pixel
    * budget — the fallback for payloads with no parsable container. */
  def resize(blob: MediaBlob): MediaBlob = {
    val w = math.max(blob.width / 2, 1)
    val h = math.max(blob.height / 2, 1)
    blob.copy(width = w, height = h,
      data = blob.data.take(math.min(blob.data.length, w * h)))
  }

  /** REAL 2x box downsample for parsable BMP payloads: decode, average
    * each 2x2 pixel block per channel (integer mean, floor — the
    * deterministic arithmetic an oracle can replay), re-encode as an
    * actual BMP. Odd trailing rows/columns are dropped (floor dims).
    * Container-less or too-small payloads fall back to the metadata
    * stub above. */
  def resizeImage(blob: MediaBlob): MediaBlob =
    MediaFiles.decodeBmp(blob.data) match {
      case Some(bmp) if bmp.width >= 2 && bmp.height >= 2 =>
        val w2 = bmp.width / 2
        val h2 = bmp.height / 2
        def ch(c: Int, x: Int, y: Int): Int = bmp.channels(3 * (y * bmp.width + x) + c)
        def avg(c: Int, x: Int, y: Int): Int =
          (ch(c, 2 * x, 2 * y) + ch(c, 2 * x + 1, 2 * y) +
            ch(c, 2 * x, 2 * y + 1) + ch(c, 2 * x + 1, 2 * y + 1)) / 4
        blob.copy(width = w2, height = h2,
          data = MediaFiles.encodeBmp(w2, h2,
            (x, y) => (avg(0, x, y), avg(1, x, y), avg(2, x, y))))
      case _ => resize(blob)
    }

  /** REAL 2:1 audio downsample for parsable WAV payloads — the audio
    * analog of [[resizeImage]]'s 2x2 box filter: decode, average each
    * adjacent sample pair, re-encode an actual PCM16 WAV at HALF the
    * sample rate. Pair means use truncate-toward-zero integer division
    * (Scala `/`), which is exactly DuckDB's `//` on negative operands
    * (-3/2 == -1 in both) — floor division would disagree on every
    * odd negative pair sum, so the choice is load-bearing for the
    * oracle. An odd trailing sample is dropped (floor length).
    * Container-less or too-short payloads pass through unchanged. */
  def downsampleAudio(blob: MediaBlob): MediaBlob =
    MediaFiles.decodeWav(blob.data) match {
      case Some(w) if w.samples.length >= 2 =>
        val out = Array.tabulate(w.samples.length / 2)(j =>
          (w.samples(2 * j) + w.samples(2 * j + 1)) / 2)
        blob.copy(data = MediaFiles.encodeWav(w.sampleRate / 2, out))
      case _ => blob
    }

  /** Keep every `stride`-th frame, starting at 0. For a parsable AVI
    * container the frames are the REAL '00dc' movi chunks — boundaries
    * come from the chunk walk, the frame count from the container, not
    * from metadata (frame_len reports the first chunk's size; this
    * engine's encoder emits equal-size chunks per file). Payloads with
    * no parsable container fall back to metadata-driven equal slicing
    * (tail remainder dropped) — the disclosed degraded path. */
  def sampleFrames(blob: MediaBlob, stride: Int): FrameSample =
    MediaFiles.decodeAvi(blob.data) match {
      case Some(a) if a.frames.nonEmpty =>
        val sampledIdx = 0 until a.frames.length by stride
        FrameSample(blob.doc_id, a.frames.length, a.frames(0).length.toLong,
          sampledIdx.length, sampledIdx.map(i => a.frames(i).length.toLong).sum)
      case _ =>
        val n = math.max(blob.n_frames, 1)
        val frameLen = blob.data.length.toLong / n
        val sampledIdx = 0 until n by stride
        val sampledBytes = sampledIdx.map { i =>
          val start = (i * frameLen).toInt
          blob.data.slice(start, start + frameLen.toInt).length.toLong
        }.sum
        FrameSample(blob.doc_id, n, frameLen, sampledIdx.length, sampledBytes)
    }
}
