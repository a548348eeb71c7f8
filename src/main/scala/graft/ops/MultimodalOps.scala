package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media
  * payloads travel as opaque `binary` columns beside typed metadata,
  * and per-item decode/feature-extraction runs as a partition-local
  * Dataset transform (the Scala analogue of a `mapInPandas` batch UDF:
  * one JVM call per partition, vectorizable inside, no per-row
  * driver involvement).
  *
  * ==== STUB BOUNDARY ====
  * Real codec libraries (image/audio/video) are not available in this
  * environment, so [[decodeStub]] is a clearly-marked DETERMINISTIC
  * FAKE: it derives pseudo-dimensions and channel statistics from the
  * bytes themselves. The Spark-side contract — schema, binary
  * batching, partition-local execution, deterministic output — is the
  * real, tested surface; swapping the fake for an ONNX/javacv decoder
  * changes only the function body.
  */
object MultimodalOps {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      mean_byte: Double,
      entropy_proxy: Double)

  /** STUB decode: deterministic pseudo-metadata + byte statistics.
    * Replace the body with a real codec at deploy time.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    val n = bytes.length
    val mean =
      if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n
    val hist = new Array[Int](16)
    bytes.foreach(b => hist((b & 0xff) >> 4) += 1)
    val entropy =
      if (n == 0) 0.0
      else -hist.filter(_ > 0).map { c =>
        val p = c.toDouble / n
        p * math.log(p)
      }.sum
    MediaFeatures(
      r.media_id, r.kind, n,
      width = if (n == 0) 0 else 16 + (bytes(0) & 0x7f),
      height = if (n == 0) 0 else 16 + (bytes(n - 1) & 0x7f),
      // raw doubles: queries round at the output edge like every other
      // float column, so the oracle's ROUND semantics match
      mean_byte = mean,
      entropy_proxy = entropy)
  }

  /** Partition-local feature extraction over a binary media column.
    * Input df columns: (media_id long, kind string, payload binary).
    */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }

  /** Deterministic frame sampling: split the payload into `frames`
    * equal chunks and keep every `stride`-th chunk (video-frame-
    * sampling shape without a codec).
    */
  def sampleFrames(df: DataFrame, frames: Int, stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .flatMap { r =>
        val n = r.payload.length
        if (n == 0 || frames <= 0) Iterator.empty
        else {
          val size = math.max(1, n / frames)
          (0 until frames by stride).iterator
            .map { i =>
              val from = math.min(i * size, n)
              val until = math.min((i + 1) * size, n)
              (r.media_id, i, r.payload.slice(from, until))
            }
            .filter(_._3.nonEmpty)
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** STUB resize: deterministic re-sampling of the payload to a target
    * "pixel" budget (byte stride sampling stands in for real
    * interpolation; metadata carries the declared target dims). The
    * partition-local execution shape is identical to a real resampler.
    */
  def resizeStub(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val budget = targetW * targetH
    df.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val n = r.payload.length
        val out =
          if (n == 0 || n <= budget) r.payload
          else {
            val step = n.toDouble / budget
            Array.tabulate(budget)(i => r.payload((i * step).toInt))
          }
        (r.media_id, r.kind, targetW, targetH, out)
      })
      .toDF("media_id", "kind", "width", "height", "payload")
  }

  /** Build a synthetic media table from the documents table (UTF-8
    * payloads) — test/bench scaffolding for the binary plumbing.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
}
