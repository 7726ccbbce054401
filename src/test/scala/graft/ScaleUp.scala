package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for measured scale validation: writes a
  * `factor`× replica of a driver-generated sf directory (same schema, same
  * physical column types) so the full bench can run at 10× and the
  * "every plan shape is ~linear" argument becomes a measurement instead of
  * prose. Tooling, so it lives in the TEST sourceset (the Explain rule):
  *
  * {{{
  * sbt 'Test/runMain graft.ScaleUp /root/testdata/sf0.1 target/sf1 10'
  * }}}
  *
  * Construction (all transforms deterministic — no RNG, so the dataset is
  * bit-reproducible across runs):
  *
  *  - dimension tables (`region`, `nation`) copy unchanged — a real 10×
  *    deployment has the same 25 nations;
  *  - fact tables replicate `factor`× with KEY-STRIDE REMAPPING: replica
  *    `r` shifts every primary AND foreign key by `r · (max_key + 1)`, so
  *    join fan-outs, per-key row counts, group sizes and skew SHAPE are
  *    preserved exactly while distinct-key counts scale — the scaling a
  *    real corpus exhibits (more customers, not 10× rows per customer);
  *  - `documents.text` in replicas r > 0 is rewritten by a PER-REPLICA
  *    character rotation (`translate` over [a-z] shifted 7r mod 26 and
  *    [0-9] shifted r mod 10): a length-preserving bijection on tokens,
  *    so WITHIN-replica exact/near-dup structure is isomorphic to the
  *    original (dup density per doc constant — the honest scaling) while
  *    cross-replica token sets are disjoint and shingle Jaccard ≈ 0. A
  *    round-9 review measured that the earlier 2-token-suffix scheme left
  *    cross-replica Jaccard ≈ 0.93 — every doc's replicas formed a
  *    near-dup family and the dedup-tier scale measurements ran on a
  *    dup-saturated corpus; the rotation removes that artifact. `n_chars`
  *    is recomputed (and unchanged, the map is 1:1) so the
  *    `n_chars = length(text)` invariant stays checkable;
  *  - `embeddings.embedding` in replicas r > 0 gains per-dimension
  *    deterministic jitter (±1%, `sin`-derived from (vec_id, dim, r)) so
  *    ANN/clustering geometry stays non-degenerate (no 10-way exact
  *    cosine ties) while the cluster structure is preserved;
  *  - `events.ts` keeps the original time range: 10× the rows in the same
  *    window is 10× per-window density, which is what stresses the
  *    windowed aggregates; `user_id` strides, so per-user cadence is
  *    unchanged and the key-cardinality face scales.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: ScaleUp <srcSfDir> <dstDir> [factor=10]")
      sys.exit(2)
    }
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    require(new java.io.File(src).isDirectory, s"not a directory: $src")
    require(factor >= 1, s"factor must be >= 1, got $factor")
    // the per-replica text rotation (7r mod 26 over letters, r mod 10 over
    // digits) is only collision-free while both residues stay distinct:
    // the letter shift repeats every 26 replicas and the digit shift every
    // 10, so factor > 10 would hand two replicas the same digit mapping
    // and silently reintroduce cross-replica near-dup families on
    // digit-heavy tokens — refuse rather than measure on a tainted corpus
    require(factor <= 10,
      s"factor must be <= 10 (text-rotation aliasing above that), got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // replica index 0..factor-1 via a per-row explode — map-only, no
    // shuffle, and replica 0 is the original rows bit-for-bit
    val rep = explode(sequence(lit(0L), lit(factor - 1L))).as("__r")
    def replicate(df: DataFrame, keyStrides: Map[String, Long]): DataFrame = {
      val base = df.select(col("*"), rep)
      val shifted = keyStrides.foldLeft(base) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + col("__r") * s)
      }
      shifted.drop("__r")
    }

    // shared strides: a foreign key must shift by the SAME stride as the
    // primary key it references, or joins would break in replicas r > 0
    val ck = stride(read("customer"), "c_custkey")
    val ok = stride(read("orders"), "o_orderkey")
    val pk = stride(read("part"), "p_partkey")
    val sk = stride(read("supplier"), "s_suppkey")

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(read("customer"), Map("c_custkey" -> ck)), "customer")
    write(replicate(read("supplier"), Map("s_suppkey" -> sk)), "supplier")
    write(replicate(read("part"), Map("p_partkey" -> pk)), "part")
    write(replicate(read("orders"),
      Map("o_orderkey" -> ok, "o_custkey" -> ck)), "orders")
    write(replicate(read("lineitem"),
      Map("l_orderkey" -> ok, "l_partkey" -> pk, "l_suppkey" -> sk)),
      "lineitem")

    val ev = read("events")
    write(replicate(ev, Map(
      "event_id" -> stride(ev, "event_id"),
      "user_id" -> stride(ev, "user_id"))), "events")

    val docs = read("documents")
    val dstride = stride(docs, "doc_id")
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val digits = "0123456789"
    def rotated(r: Int): String =
      letters.drop(r * 7 % 26) + letters.take(r * 7 % 26) +
        digits.drop(r % 10) + digits.take(r % 10)
    val docText = (1 until factor).foldLeft(col("text")) { (acc, r) =>
      when(col("__r") === r,
        translate(col("text"), letters + digits, rotated(r))).otherwise(acc)
    }
    write(docs.select(col("*"), rep)
      .select((col("doc_id") + col("__r") * dstride).as("doc_id"),
        docText.as("text"), col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    val emb = read("embeddings")
    val vstride = stride(emb, "vec_id")
    // ±1% deterministic jitter on replicas > 0; replica 0 bit-identical
    val jittered = transform(col("embedding"), (x, i) =>
      when(col("__r") === 0, x).otherwise(
        (x + sin((col("vec_id") % 997 + 1) * (i + 1) * col("__r")) * x * 0.01)
          .cast("float")))
    write(emb.select(col("*"), rep)
      .select((col("vec_id") + col("__r") * vstride).as("vec_id"),
        jittered.as("embedding"), col("label")),
      "embeddings")

    // row-count report so a truncated run can't masquerade as complete
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      println(s"[scaleup] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    spark.stop()
  }
}
