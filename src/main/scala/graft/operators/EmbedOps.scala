package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.lifecycle.EpisodicMemory.Embedder

/** F11 embedding generation seam, completed as a distributed operator: embed
  * a text column via `mapPartitions` with per-partition embedder
  * construction and explicit batching — the execution shape a real encoder
  * needs (load the model ONCE per partition/executor, embed texts in
  * batches; the reference calls MiniLM/OpenAI with text lists,
  * bambooai/qa_retrieval.py:250-261, google_search.py:239-246).
  *
  * The model itself stays behind the [[Embedder]] seam (HashEmbedder is the
  * deterministic stand-in — external encoders are non-deterministic and
  * outside the verified scope per SURVEY §7.5); everything Spark-side —
  * factory-per-partition, batch grouping, schema threading — is real and
  * tested. At 100 TB this is a narrow map at scan speed with model cost
  * amortized per partition, vs a per-row UDF that cannot batch.
  */
object EmbedOps {

  /** Append `outCol: array<double>` computed from `textCol`. `mkEmbedder`
    * runs once per partition (ship a factory, not a model). */
  def embedColumn(df: DataFrame, textCol: String, outCol: String,
      mkEmbedder: () => Embedder, batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(DoubleType))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      val embedder = mkEmbedder()
      rows.grouped(batchSize).flatMap { batch =>
        val embs = embedder.embedBatch(batch.map { r =>
          Option(r.getString(idx)).getOrElse("")
        })
        batch.iterator.zip(embs.iterator).map { case (r, e) =>
          Row.fromSeq(r.toSeq :+ e)
        }
      }
    }(Encoders.row(schema))
  }
}
