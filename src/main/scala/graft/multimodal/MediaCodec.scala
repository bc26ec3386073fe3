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

/** Batch-level decoded features (what a real codec would emit). */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    sum_bytes: Long,
    min_byte: Int,
    max_byte: Int,
    mean_byte: Double)

/** Frame-sampling result for video payloads. */
case class FrameSample(
    doc_id: Long,
    n_frames: Int,
    frame_len: Long,
    n_sampled: Int,
    sampled_bytes: Long)

/** STUB media codec.
  *
  * A production deployment would link an actual image/audio codec here
  * (not available in this environment); the decode below is a
  * deterministic fake over the raw bytes. Everything AROUND it — the
  * typed binary schema, executor-side batching, frame slicing, resize
  * metadata handling — is the real Spark plumbing a decoder would plug
  * into: swap `decode` and the pipeline is production-shaped.
  *
  * Batch shape: [[decodeBatch]] takes a whole batch so a real
  * implementation can amortize codec/model initialization per batch
  * (the JVM analog of a pandas-batch UDF).
  */
object MediaCodec {

  /** Deterministic fake "decode": byte statistics standing in for the
    * feature vector a codec+model would produce. */
  def decode(blob: MediaBlob): MediaFeatures = {
    val bs = blob.data
    var sum = 0L
    var mn = 256
    var mx = -1
    var i = 0
    while (i < bs.length) {
      val v = bs(i) & 0xff
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val n = bs.length.toLong
    MediaFeatures(blob.doc_id, blob.media_type, n, sum,
      if (n == 0) 0 else mn, if (n == 0) 0 else mx,
      if (n == 0) 0.0 else sum.toDouble / n.toDouble)
  }

  /** Batch decode: one call per executor-side batch. */
  def decodeBatch(batch: Seq[MediaBlob]): Seq[MediaFeatures] = batch.map(decode)

  /** Stub resize: halves dimensions, truncates payload to the new pixel
    * budget (a real implementation would re-encode). */
  def resize(blob: MediaBlob): MediaBlob = {
    val w = math.max(blob.width / 2, 1)
    val h = math.max(blob.height / 2, 1)
    blob.copy(width = w, height = h,
      data = blob.data.take(math.min(blob.data.length, w * h)))
  }

  /** Split payload into n_frames equal frames (tail remainder dropped)
    * and keep every `stride`-th frame, starting at 0. */
  def sampleFrames(blob: MediaBlob, stride: Int): FrameSample = {
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
