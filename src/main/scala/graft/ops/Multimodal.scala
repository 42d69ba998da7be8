package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY columns with typed
  * metadata, batched decode / feature-extract / frame-sample operators.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): `FakeCodec.decode` derives deterministic pseudo-metadata and
  * features from the bytes themselves. Everything around it — schema,
  * batching (mapPartitions so a real decoder amortizes per-task init, the
  * Scala analogue of a Python `mapInPandas` batch UDF), partition safety,
  * null handling — is real and tested, so swapping in a real codec is a
  * one-function change.
  */
object Multimodal {

  final case class MediaMeta(kind: String, n_bytes: Long, fmt: String)
  final case class DecodedMedia(
      id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, features: Array[Float])

  /** STUB — deterministic fake decode standing in for a real image/audio
    * codec. Derives (width, height, frames, 8-dim features) from the MD5 of
    * the byte content (md5 is computable by the DuckDB oracle too, so the
    * whole decode output is independently checkable). Marked per builder
    * instructions; replace with a real decoder off-sandbox.
    */
  object FakeCodec {
    def decode(id: Long, kind: String, bytes: Array[Byte]): DecodedMedia = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      def u(i: Int): Int = d(i) & 0xff
      val w = 16 + u(0) % 64
      val ht = 16 + u(1) % 64
      val frames = if (kind == "video") 1 + u(2) % 30 else 1
      val feats = Array.tabulate(8)(i => u(3 + i).toFloat / 255.0f)
      DecodedMedia(id, kind, w, ht, frames, feats)
    }
  }

  /** Wrap a text table into a media table: (id, kind, media BINARY, meta).
    * In production media bytes come from object storage; here they're the
    * UTF-8 payload of the text column (real bytes, fake semantics).
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("media"))
      .withColumn("meta", struct(
        col("kind"), length(col("media")).cast("long").as("n_bytes"),
        lit("fake/v1").as("fmt")))

  /** Batched decode: one codec "session" per partition (mapPartitions), the
    * shape a real decoder needs. Returns typed rows.
    */
  def decodeBatch(media: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[DecodedMedia]
    media.select(col("id"), col("kind"), col("media"))
      .mapPartitions { it =>
        // real codecs would init native state here, once per task
        it.map { r =>
          FakeCodec.decode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
        }
      }.toDF()
  }

  /** Frame sampling for "video" media: split the byte payload into fixed
    * `frameBytes` chunks and keep every `stride`-th chunk — the real
    * partitioning/array shape of frame extraction with a stub splitter.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.where(col("kind") === "video")
      .select(col("id"),
        filter(
          transform(
            sequence(lit(0),
              ((length(col("media")) - 1) / lit(frameBytes)).cast("int")),
            i => struct(i.as("frame_no"),
              col("media").substr(i * frameBytes + 1, lit(frameBytes)).as("frame"))),
          s => pmod(s.getField("frame_no"), lit(stride)) === 0).as("frames"))
      .select(col("id"), explode(col("frames")).as("f"))
      .select(col("id"), col("f.frame_no").as("frame_no"),
        length(col("f.frame")).cast("int").as("frame_bytes"))
}
