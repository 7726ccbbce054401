package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints one-line JSON results.
  *
  * Timing protocol: after an untimed session warmup, every query runs THREE
  * times and the per-query minimum is reported. A single-pass measurement is
  * hostage to whatever else the machine is doing at that moment — round 3's
  * driver bench ran under heavy external CPU contention and reported 20-50×
  * inflated times for code that measures 65 s total on an idle box, and the
  * round-4 min-of-2 demonstrably failed to reject *sustained* contention
  * (four queries reported 10-35× their idle-box times). Min-of-3 plus
  * PER-PASS system load-average stamps in the output line let a reader
  * adjudicate a loaded box from the JSON alone without re-running: a
  * snapshot is clean iff every entry of "loads" is well under the cpu
  * count ("load" = the worst pass).
  *
  * Output protocol: the driver captures only the LAST 2000 chars of stdout.
  * A full per-query JSON line for ~80 queries is ~2 kB and lands truncated
  * (BENCH_r01-r03 all show `parsed: null`). So: the full line is written to
  * `BENCH_LOCAL.json` and printed FIRST (for humans / logs), then a compact
  * line — headline total plus the slowest queries, capped well under the
  * tail window — is printed LAST so the driver always finds one complete
  * parseable JSON line in its tail.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // SPARK_GRAFT_AQE=false for the skew-audit A/B: the salted twins
      // (a02_salted_sum, j07_asof_salted, j10_salted_join) vs their plain
      // faces under AQE skew handling vs plain shuffle with AQE off.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session init otherwise lands on the
    // alphabetically-first query's measurement
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    // noop sink: forces full evaluation of every output column (a count()
    // would let Catalyst prune the per-row expression work away).
    // A failed query returns Left(error), NOT a timing — r7 shipped four
    // analysis-time failures as healthy 0.07 s "timings" because the old
    // version caught Throwable and recorded elapsed time anyway. Failures
    // must be loud: they go into an "errors" array in the JSON line and are
    // excluded from "total".
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
      }
    }
    // optional arg: comma-separated name prefixes for targeted iteration
    // (e.g. `runMain graft.Bench j09,x06`); full-run output files are only
    // written on unfiltered runs so a targeted pass never clobbers them
    val prefixes = args.headOption.map(_.split(",").toSeq).getOrElse(Nil)
    val filtered = !prefixes.isEmpty
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // 1-minute load average sampled AFTER EACH PASS, not just at the end:
    // a run is only trustworthy when every pass ran on a quiet box, and
    // the per-pass stamps let the JSON prove that (or name the dirty pass)
    // without a re-run. "load" reports the WORST pass; >> #cpus means the
    // box was contended and even the min-of-3 numbers are suspect.
    // SPARK_GRAFT_PASSES: pass count (default 3). The sf1 scale run pays
    // ~10× per pass, where min-of-2 is the right cost/noise tradeoff.
    val passCount = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val passStamps = Seq.fill(passCount) {
      val r = ordered.map { case (n, f) => n -> runOnce(n, f) }
      (r, osBean.getSystemLoadAverage)
    }
    val passes = passStamps.map(_._1)
    val passLoads = passStamps.map(_._2)
    val byName = passes.flatten.groupBy(_._1)
    // a query succeeds iff at least one pass succeeded (min over successes);
    // a query with zero successful passes is an error entry, never a timing
    val results = byName.collect { case (n, ts) if ts.exists(_._2.isRight) =>
      n -> ts.collect { case (_, Right(v)) => v }.min
    }
    val errors = byName.collect { case (n, ts) if !ts.exists(_._2.isRight) =>
      n -> ts.collectFirst { case (_, Left(m)) => m }.getOrElse("unknown")
    }.toSeq.sortBy(_._1)
    val load = passLoads.max
    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    def jsonLine(entries: Seq[(String, Double)], total: Double): String = {
      val qs = entries.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
        .mkString("{", ",", "}")
      val loads = passLoads.map(ms).mkString("[", ",", "]")
      val errs = errors.map { case (k, m) => s"\"" + k + "\":" + jstr(m) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","load":${ms(load)},"loads":$loads,"errors":$errs,"queries":$qs,"sf":"$sfDir"}"""
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val all = results.toSeq.sortBy(_._1)
    val full = jsonLine(all, total)
    // SPARK_GRAFT_BENCH_OUT names the snapshot file so a scale run (sf1)
    // can't clobber the committed sf0.1 BENCH_LOCAL.json
    if (!filtered)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")),
        (full + "\n").getBytes("UTF-8"))
    println(full)
    // compact line last: slowest queries, greedily capped at 1500 chars of
    // query payload so line + sbt's trailing "[success] ..." both fit the
    // driver's 2000-char tail window
    val bySlow = results.toSeq.sortBy(-_._2)
    // errors ride in both lines; shrink the query budget so the compact
    // line still fits the tail window even on a broken round
    var budget = 1500 - errors.map { case (k, m) => k.length + m.length + 8 }.sum
    val top = bySlow.takeWhile { case (k, v) =>
      val cost = k.length + ms(v).length + 4
      val fits = budget - cost >= 0
      if (fits) budget -= cost
      fits
    }
    println(jsonLine(top.sortBy(_._1), total))
    spark.stop()
  }
}
