package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Beyond-reference data-pipeline queries (dedup, similarity search, text
  * analysis, multimodal) over `documents` / `embeddings`. Populated as the
  * operators land.
  */
object PipelineQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}
