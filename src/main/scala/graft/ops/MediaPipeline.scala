package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Tables

/** Typed `mapPartitions` seam for real media decoders.
  *
  * Expressions (see [[MultiModal]]) cover everything hashable; an
  * actual image/audio/video decode needs native code — a JNI codec, an
  * ONNX runtime session — which in Spark lives behind `mapPartitions`
  * so per-partition setup (codec init, model load) amortizes across a
  * batch of rows instead of paying per row. This file makes that
  * plumbing real and tested; only the decoder body is a stub.
  *
  * Batch shape: rows stream through `grouped(batchSize)` so a real
  * decoder can hand fixed-size batches to vectorized inference; memory
  * stays O(batchSize · payload), never O(partition).
  */
final case class MediaRecord(doc_id: Long, payload: Array[Byte])
final case class MediaFeatures(doc_id: Long, features: Array[Long])

trait MediaDecoder extends Serializable {
  /** Called once per executor-partition before the first batch —
    * where codec/model initialization belongs. */
  def open(): Unit = ()
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Long]]
}

/** STUB decoder — deterministic md5-derived integers in place of real
  * pixel/sample features (no media codecs ship in this environment).
  * Computes exactly [[MultiModal.featureExpr]], which is what lets a
  * test pin the mapPartitions path ≡ the expression path. A real
  * implementation replaces ONLY this class. */
object StubDecoder extends MediaDecoder {
  override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Long]] =
    payloads.map { p =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(p).map("%02x".format(_)).mkString
      (0 until MultiModal.FeatureDim).toArray.map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${hex}_$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(h, 16) % 1000
      }
    }
}

object MediaPipeline {

  def mediaDataset(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .selectExpr("doc_id", "encode(text, 'UTF-8') AS payload")
      .as[MediaRecord]
  }

  /** Distributed feature extraction through the decoder seam. */
  def extractFeatures(ds: Dataset[MediaRecord], decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      decoder.open()
      it.grouped(batchSize).flatMap { batch =>
        batch.map(_.doc_id).zip(decoder.decodeBatch(batch.map(_.payload)))
          .map { case (id, f) => MediaFeatures(id, f) }
      }
    }
  }
}
