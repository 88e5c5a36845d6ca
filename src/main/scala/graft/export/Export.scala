package graft.export

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Query-result export surfaces.
  *
  * The reference multiplexes results into MCAP or, with
  * `Accept: application/json`, transcodes to newline-delimited JSON
  * rows of `{"topic","sequence","log_time","publish_time","data":{..}}`
  * with nanosecond-integer timestamps (reference:
  * server/mcap/mcap_to_json.go:42-142, server/routes/query.go:101-135).
  * MCAP is a container format for robotics capture; on the Spark side
  * the durable representation is the parquet table itself, and NDJSON
  * is the interchange surface.
  *
  * `ndjson` is a streaming projection — one pass, no driver
  * materialization; write it with `df.write.text(...)` for a
  * distributed export of any size.
  */
object Export {

  /** dp3 NDJSON shape over a canonical message frame. `dataCols` are
    * the decoded payload columns to nest under "data". */
  def ndjson(df: DataFrame, dataCols: Seq[String]): Dataset[String] = {
    val payload = struct(dataCols.map(col): _*)
    import df.sparkSession.implicits._
    df.select(to_json(struct(
      col("topic"),
      col("seq").as("sequence"),
      col("time").as("log_time"),
      col("time").as("publish_time"),
      payload.as("data"))).as("json")).as[String]
  }

  /** Multi-topic export merge: the /export endpoint merges topic
    * streams k-way ordered by (log_time, tie) (reference:
    * server/treemgr/treemgr.go:1066-1116 — tie-break is channel id
    * there; topic name is our deterministic analogue). */
  def exportMerged(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "export of zero topics")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
      .orderBy(col("time").asc, col("topic").asc, col("seq").asc)
  }
}
