package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pack B — Kassette pipeline operators (SURVEY.md §2.B). Filled in
  * incrementally; see operators/ for the underlying transforms. */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}
