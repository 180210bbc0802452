package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Text → embedding hand-off (reference M8: ai/ollama/embed.go:19-88,
  * ai/httpclient — batched HTTP embed calls with client rotation and
  * least-connections balancing).
  *
  * Spark-native shape: `mapPartitions` drains each partition in
  * `batchSize` groups, one provider call per group — per-batch overhead
  * (connection setup, auth, serialization) amortizes exactly like the
  * reference's batch embed requests, and the provider object lives once
  * per partition (the client-per-worker pattern). A production deployment
  * implements [[EmbedProvider]] with an HTTP client; tests and benchmarks
  * use [[NoopProvider]], the deterministic twin of the reference's noop AI
  * (noop/ai.go:47-64).
  */
trait EmbedProvider extends Serializable {
  /** Embed a batch of texts; returns one packed quantized vector each
    * (the reference's wire format: [f32 min][f32 max][dim codes]). */
  def embedBatch(texts: Seq[String]): Seq[Array[Byte]]
  def dim: Int
}

/** Deterministic fake provider (text-seeded splitmix, header min=-1/max=1). */
final case class NoopProvider(dim: Int = 512) extends EmbedProvider {
  def embedBatch(texts: Seq[String]): Seq[Array[Byte]] =
    texts.map(t => VectorKernels.noopEmbed(t, dim))
}

object Embedder {

  /** Adds `qvec binary` (packed quantized embedding) to `df` by batching
    * `textCol` through the provider, `batchSize` texts per call
    * (reference BATCH_SIZE_DATABASE=1000-shaped micro-batches). */
  def embedColumn(df: DataFrame, textCol: String, provider: EmbedProvider,
      batchSize: Int = 1000, outCol: String = "qvec"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      // one provider instance per partition = the per-worker client
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = provider.embedBatch(batch.map(_.getString(idx)))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(enc)
  }
}
