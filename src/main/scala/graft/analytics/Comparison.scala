package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J6: API-vs-PREDICTION comparison table (ref `Wind_Genration.py:437-454`):
  * for each key, take the latest row per data source, unpivot the parameter
  * columns, and emit per-parameter (api, real-time, difference) rows with
  * prettified labels (D23).
  *
  * Scale shape: one window per (key, source) to pick latest rows (P14), then
  * an explode of a fixed small parameter list over those few rows — the wide
  * raw frame is reduced to |keys|×|sources| rows before any unpivot.
  */
object Comparison {

  def sourceDiff(df: DataFrame, key: String, sourceCol: String,
      apiSource: String, rtSource: String, params: Seq[String],
      order: Seq[Column]): DataFrame = {
    val latest = Ranking.lastPerKey(df,
      Seq(col(key), col(sourceCol)), order)
    val long = latest.select(col(key), col(sourceCol),
        explode(array(params.map(p =>
          struct(lit(p).as("p"), col(p).cast("double").as("v"))): _*)).as("kv"))
      .select(col(key), col(sourceCol),
        col("kv.p").as("param"), col("kv.v").as("value"))
    val api = long.filter(col(sourceCol) === apiSource)
      .select(col(key), col("param"), col("value").as("api_value"))
    val rt = long.filter(col(sourceCol) === rtSource)
      .select(col(key), col("param"), col("value").as("rt_value"))
    api.join(rt, Seq(key, "param"))
      .select(col(key),
        initcap(regexp_replace(col("param"), "_", " ")).as("parameter"),
        col("api_value"), col("rt_value"),
        (col("rt_value") - col("api_value")).as("difference"))
  }

  /** Corpus snapshot diff — the data-versioning primitive behind "what
    * changed between yesterday's crawl and today's": every doc id in
    * either snapshot labeled `added` / `removed` / `changed` / `unchanged`
    * by its content fingerprint ([[graft.text.TextAnalysis.fingerprint]]
    * — md5 of normalized text, so whitespace/case churn is not a change).
    *
    * Scale shape: each side reduces to (id, 32-byte fingerprint) in its
    * scan projection; one full-outer equi-join on the id carries those
    * narrow rows only — document text never crosses the shuffle. Emitting
    * `unchanged` rows keeps the output a total function of the id union
    * (filter them out when only the delta matters).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      id: Column, text: Column): DataFrame = {
    // presence flags, not fingerprint nullness, drive the membership
    // verdict: a present doc with null text must read changed/unchanged
    // (null-safe compare), never added/removed
    def fp(df: DataFrame, out: String, mark: String): DataFrame =
      df.select(id.as("doc_id"),
        graft.text.TextAnalysis.fingerprint(text).as(out),
        lit(true).as(mark))
    fp(before, "__fb", "__pb")
      .join(fp(after, "__fa", "__pa"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__pb").isNull, lit("added"))
          .when(col("__pa").isNull, lit("removed"))
          .when(col("__fa") <=> col("__fb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
