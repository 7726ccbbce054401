package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift metrics for pipeline monitoring. A filter/gate in a
  * training-data pipeline never removes rows uniformly — it reshapes the
  * distribution of everything correlated with its criterion — and the
  * population stability index is the standard one-number-per-bucket view
  * of that shift (banking/model-monitoring lineage; conventional reading:
  * < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).
  */
object Drift {

  /** PSI of a metric's distribution between a frame's FULL population and
    * its `kept` sub-population (a gate's before/after view): fixed-width
    * value buckets (`bucket = min(⌊value/bucketWidth⌋, maxBucketIdx)` —
    * fixed edges, so results are deterministic and mergeable across
    * partitions, unlike data-dependent quantile edges), add-one (Laplace)
    * smoothed shares on both sides so empty buckets stay finite, and the
    * per-bucket signed PSI term `(p_before − p_after)·ln(p_before/p_after)`
    * (each term ≥ 0; their sum is the PSI). Emits one row per observed
    * bucket: `(bucket, c_before, c_after, psi_term)`.
    *
    * Scale shape: ONE pass over the frame (the gate flag rides the same
    * scan — no second evaluation of the gated subset), a bucket-keyed
    * aggregate of conditional counts (≤ maxBucketIdx+1 rows), and the
    * totals return as a single broadcast cross-join. Nothing after the
    * first aggregate is corpus-sized.
    */
  def psiGateShift(df: DataFrame, value: Column, kept: Column,
      bucketWidth: Long, maxBucketIdx: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxBucketIdx >= 1, s"maxBucketIdx must be >= 1, got $maxBucketIdx")
    val b = df.select(
      least(floor(value.cast("double") / bucketWidth.toDouble).cast("long"),
        lit(maxBucketIdx.toLong)).as("bucket"),
      kept.as("__k"))
    val cb = b.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_before"),
        count(when(col("__k"), 1)).as("c_after"))
    val tot = cb.agg(sum(col("c_before")).as("__tb"),
      sum(col("c_after")).as("__ta"), count(lit(1)).as("__nb"))
    val pa = (col("c_before").cast("double") + lit(1.0)) /
      (col("__tb").cast("double") + col("__nb").cast("double"))
    val pb = (col("c_after").cast("double") + lit(1.0)) /
      (col("__ta").cast("double") + col("__nb").cast("double"))
    cb.crossJoin(broadcast(tot))
      .select(col("bucket"), col("c_before"), col("c_after"),
        round((pa - pb) * log(pa / pb), 6).as("psi_term"))
  }

  /** Split-homogeneity chi-square: Pearson's χ² of a bucketed metric's
    * distribution between the two halves of a deterministic hash split —
    * the exchangeability check a train/test split must pass BEFORE any
    * eval number downstream of it means anything (a split whose length
    * distribution differs between halves leaks difficulty, and the eval
    * set silently stops representing the training distribution). Emits
    * one row: χ², degrees of freedom (buckets − 1), and N.
    *
    * Scale shape: one scan into a (bucket × side) aggregate; margins
    * re-aggregate that frame; expected counts via two broadcast joins.
    * Zero-observed cells still contribute (the bucket×side grid is built
    * from the margins, not from observed rows). Exact integer counts to
    * one final double sum, rounded 6.
    */
  def splitChiSquare(df: DataFrame, id: Column, value: Column,
      bucketWidth: Long, maxBucketIdx: Int, salt: String,
      cutBuckets: Int): DataFrame = {
    require(bucketWidth > 0 && maxBucketIdx >= 1, "bad bucketing")
    val side = (graft.sampling.Sampling.hashBucket(id, salt) < cutBuckets)
      .cast("int")
    val bucket = least(floor(value.cast("double") / bucketWidth.toDouble)
      .cast("long"), lit(maxBucketIdx.toLong))
    val obs = df.select(bucket.as("bucket"), side.as("side"))
      .groupBy(col("bucket"), col("side")).agg(count(lit(1)).as("__o"))
      .localCheckpoint(true) // margins + cells all re-aggregate this frame
    val rowT = obs.groupBy(col("bucket")).agg(sum(col("__o")).as("__rt"))
    val colT = obs.groupBy(col("side")).agg(sum(col("__o")).as("__ct"))
    val n = obs.agg(sum(col("__o")).as("__N"))
    val e = col("__rt").cast("double") * col("__ct").cast("double") /
      col("__N").cast("double")
    val o = coalesce(col("__o"), lit(0L)).cast("double")
    rowT.crossJoin(broadcast(colT)).crossJoin(broadcast(n))
      .join(obs, Seq("bucket", "side"), "left")
      .select((((o - e) * (o - e)) / e).as("__term"), col("bucket"), col("__N"))
      .agg(round(sum(col("__term")), 6).as("chi2"),
        (countDistinct(col("bucket")) - 1).as("df"),
        max(col("__N")).as("n"))
  }

  /** Per-group selection-bias screen: pooled two-proportion z-test of
    * each group's flag rate against the REST of the population — the
    * fairness/monitoring question "is the gate (or dedup, or sampler)
    * treating this source/language differently than everyone else",
    * answered with the standard significance scale (|z| > 2 ≈ p < .05)
    * instead of an eyeballed rate table. Groups equal to the whole
    * population (or a degenerate pooled rate of exactly 0 or 1) emit a
    * null z — the test is undefined there, not zero.
    *
    * Scale shape: one grouped aggregate to |groups| rows, totals back as
    * a 1-row broadcast, closed-form arithmetic — exact integer counts
    * until the final ratios.
    */
  def proportionBias(df: DataFrame, group: Column, flag: Column): DataFrame = {
    val per = df.select(group.as("group"), flag.as("__f"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"), count(when(col("__f"), 1)).as("n_flagged"))
    val tot = per.agg(sum(col("n")).as("__N"), sum(col("n_flagged")).as("__K"))
    val n = col("n").cast("double")
    val k = col("n_flagged").cast("double")
    val bigN = col("__N").cast("double")
    val bigK = col("__K").cast("double")
    val p1 = k / n
    val p0 = (bigK - k) / (bigN - n)
    val pp = bigK / bigN
    val den = pp * (lit(1.0) - pp) * (lit(1.0) / n + lit(1.0) / (bigN - n))
    per.crossJoin(broadcast(tot))
      .select(col("group"), col("n"), col("n_flagged"),
        round(p1, 6).as("rate"),
        // outer guard: a group equal to the whole population has no rest
        // to test against — and under ANSI mode the p0/den divisions by
        // (N−n)=0 would THROW, so they must sit inside the branch CaseWhen
        // only evaluates when the guard holds
        round(when(col("__N") > col("n"),
          when(den > 0.0, (p1 - p0) / sqrt(den))), 6).as("z"))
  }

  /** Single change-point locator per key (binary-segmentation step 1):
    * the split position that maximizes the between-segment variance
    * reduction `(i·(n−i)/n)·(mean₁ − mean₂)²` — where the a25 CUSUM
    * FLAGS that a mean shifted, this says WHERE, which is what turns a
    * drift alarm into an actionable "sensor recalibrated at 14:07 /
    * corpus mixture changed at snapshot 12" statement. Emits one row per
    * key: the 1-based split index (first segment = rows 1..i), its
    * timestamp, the score, and n; keys with fewer than 2 rows emit
    * nothing (no interior split exists). Ties (equal score) resolve to
    * the EARLIEST split.
    *
    * Determinism: values are quantized to `valueScale` fixed-point units
    * BEFORE the prefix sums (the a25 construction), so every prefix sum
    * is an exact integer and the score is the same double on any
    * partitioning/engine that mirrors the expression tree.
    *
    * Scale shape: one per-key window (running sum + count — the
    * sessionize cost envelope), one closed-form score per row, one
    * per-key argmax via min(struct) — no second scan, no loop: binary
    * segmentation's recursion would re-run this on each half.
    */
  def changePoint(df: DataFrame, key: Column, time: Column,
      order: Seq[Column], value: Column, valueScale: Int): DataFrame = {
    val scale = math.pow(10, valueScale)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc +: (1 to order.size).map(i => col(s"__o$i").asc): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val base = df.select(
      (key.as("__k") +: time.as("__t") +:
        round(value.cast("double") * scale).as("__vq") +:
        order.zipWithIndex.map { case (o, i) => o.as(s"__o${i + 1}") }): _*)
    val stats = base
      .withColumn("__s", sum(col("__vq")).over(w))
      .withColumn("__i", count(lit(1)).over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))))
      .withColumn("__tot", sum(col("__vq")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))))
    val i = col("__i").cast("double")
    val n = col("__n").cast("double")
    val m1 = col("__s") / i
    val m2 = (col("__tot") - col("__s")) / (n - i)
    val score = (i * (n - i) / n) * (m1 - m2) * (m1 - m2)
    val scored = stats
      .filter(col("__n") >= 2 && col("__i") < col("__n")) // interior splits only
      .select(col("__k").as("key"), col("__i").as("split_idx"),
        col("__t").as("split_ts"), col("__n").as("n"),
        (score / (scale * scale)).as("__sc"))
    scored.groupBy(col("key"))
      .agg(min(struct((-col("__sc")).as("ns"), col("split_idx").as("si"),
        col("split_ts").as("st"), col("n").as("nn"))).as("__best"))
      .select(col("key"), col("__best.si").as("split_idx"),
        col("__best.st").as("split_ts"), col("__best.nn").as("n"),
        round(-col("__best.ns"), 6).as("score"))
  }
}
