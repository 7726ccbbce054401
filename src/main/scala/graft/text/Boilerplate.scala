package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level corpus dedup: a LINE that recurs across many
  * documents is boilerplate (cookie banners, nav menus, "all rights
  * reserved"), and the cleaning pass drops the line while keeping the
  * document — finer-grained than whole-doc dedup, which misses documents
  * that are mostly unique with a shared header/footer.
  *
  * Scale shape: explode to (doc, idx, line), count DISTINCT docs per
  * trimmed line (one shuffle on the line key with map-side partials), keep
  * lines under the threshold, reassemble per doc. The blocked-line set is
  * NOT force-broadcast: on a web-scale corpus the lines appearing in more
  * than `maxDocs` documents are the boilerplate of the entire web — easily
  * tens of GB — so AQE decides (broadcast when runtime stats fit, shuffled
  * anti-join otherwise), the same treatment as
  * [[graft.dedup.Dedup.greedySurvivors]]. Reassembly sorts each doc's
  * surviving (idx, line)
  * pairs inside `array_sort` (deterministic under any shuffle order) —
  * never relies on `collect_list` arrival order.
  */
object Boilerplate {

  /** `(doc_id, clean_text, n_kept_lines, n_dropped_lines)`: documents with
    * every line that occurs (trim-normalized) in more than `maxDocs`
    * distinct documents removed. Documents whose every line is boilerplate
    * drop out of the result entirely (nothing left to keep).
    */
  def dropBoilerplateLines(df: DataFrame, id: Column, text: Column,
      maxDocs: Long): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val lines = df.select(id.as("doc_id"),
        size(split(text, "\n")).as("__total"),
        posexplode(split(text, "\n")).as(Seq("idx", "line")))
      .withColumn("__norm", trim(col("line")))
    val blocked = lines.groupBy(col("__norm"))
      .agg(countDistinct(col("doc_id")).as("__docs"))
      .filter(col("__docs") > maxDocs)
      .select(col("__norm").as("__bad"))
    lines.join(blocked, col("__norm") === col("__bad"), "left_anti")
      .groupBy(col("doc_id"), col("__total"))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("idx"), col("line")))),
          s => s.getField("line"))).as("clean_text"),
        count(lit(1)).as("n_kept_lines"))
      .select(col("doc_id"), col("clean_text"),
        col("n_kept_lines"),
        (col("__total") - col("n_kept_lines")).as("n_dropped_lines"))
  }
}
