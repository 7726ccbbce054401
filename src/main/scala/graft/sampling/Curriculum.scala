package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Competence-based curriculum schedule (Platanios et al., NAACL 2019):
  * epoch e of E trains on the documents whose difficulty percentile is at
  * most the model's competence c(e) = √(e/E) — easy data first, the full
  * corpus by the last epoch. The operator answers the planning question
  * ("how much data, at what mean difficulty, does each epoch see?")
  * without materializing any per-epoch corpus copy.
  *
  * Scale shape: difficulty percentiles come from the jump-spine
  * discipline (x171's): ONE aggregate to |distinct difficulty| rows, a
  * cumulative window over that bounded spine — never a corpus-row global
  * window — then a 5-row epoch frame broadcast against the spine and a
  * final |epochs|-row aggregate. Corpus rows are touched exactly once.
  */
object Curriculum {

  def schedule(df: DataFrame, difficulty: Column, epochs: Int = 5)
      : DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val spine = df.groupBy(difficulty.cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = spine.agg(sum(col("c")).as("n"))
    // pr(v) = share of docs at-or-below v; exact k/N double division, so
    // both engines draw the identical boundary
    val ranked = spine
      .withColumn("__cum", sum(col("c")).over(w))
      .crossJoin(broadcast(n))
      .withColumn("pr", col("__cum").cast("double") / col("n").cast("double"))
    val session = df.sparkSession
    import session.implicits._
    val eframe = (1 to epochs).map(e =>
        (e, math.sqrt(e.toDouble / epochs.toDouble)))
      .toDF("epoch", "competence")
    ranked.join(broadcast(eframe), col("pr") <= col("competence"))
      .groupBy(col("epoch"), col("competence"))
      .agg(sum(col("c")).as("n_docs"),
        round(sum(col("v") * col("c").cast("double")) /
          sum(col("c")).cast("double"), 6).as("mean_difficulty"))
      .select(col("epoch"), round(col("competence"), 6).as("competence"),
        col("n_docs"), col("mean_difficulty"))
  }
}
