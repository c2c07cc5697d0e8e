package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pack C — LLM-training-data operators (SURVEY.md §2.C). */
object LlmData {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}
