package graft

import graft.analytics.Entities
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Entity resolution (golden records) + the mojibake detector. */
class EntitiesSpec extends SparkSpec {
  import spark.implicits._

  test("goldenRecords merges transitively and applies survivorship rules") {
    // rid 2 and 3 are each one deletion from base rid 1, but distance 2
    // from EACH OTHER — only the closure through the base merges them
    val reg = Seq(
      (1L, "abcdefgh", 10.0),
      (2L, "bcdefgh", 1.0),   // deletes pos 1
      (3L, "abcdegh", 2.0),   // deletes pos 6
      (9L, "zzzzzzzz", 5.0)   // singleton — must survive unmerged
    ).toDF("rid", "rkey", "rval")
    // pin the premise the fixture claims: the variants do NOT pair up
    val d = reg.as("a").crossJoin(reg.as("b"))
      .filter(col("a.rid") === 2 && col("b.rid") === 3)
      .select(levenshtein(col("a.rkey"), col("b.rkey"))).head().getInt(0)
    assert(d === 2)
    val got = Entities.goldenRecords(reg, col("rid"), col("rkey"), col("rval"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3), r.getDouble(4))).toMap
    assert(got === Map(
      1L -> ((3L, "abcdefgh", "abcdefgh", 13.0)), // longest = the 8-char base
      9L -> ((1L, "zzzzzzzz", "zzzzzzzz", 5.0))))
  }

  test("goldenRecords longest_key orders by length before lexicography") {
    // "zz" > "aaa" lexicographically, but the padded composite puts the
    // 3-char key first — the "most complete value wins" rule
    val reg = Seq((1L, "zz", 0.0), (2L, "zza", 0.0)).toDF("rid", "rkey", "rval")
    val row = Entities.goldenRecords(reg, col("rid"), col("rkey"), col("rval"))
      .head()
    assert(row.getString(2) === "zz")  // canonical: lowest rid
    assert(row.getString(3) === "zza") // longest: length wins
  }

  test("goldenRecordsDelta equals batch resolution, including a bridge merge") {
    // old batch holds two SEPARATE entities ("abcd" vs "abef", distance
    // 2); the new batch's "abed" is distance 1 from BOTH — the increment
    // must fuse entities that were distinct in the previous publication
    val old = Seq((2L, "abcd", 1.0), (4L, "abef", 2.0), (6L, "zzzz", 3.0))
      .toDF("rid", "rkey", "rval")
    val fresh = Seq((9L, "abed", 4.0)).toDF("rid", "rkey", "rval")
    val oldPairs = Entities.matchEdges(old, col("rid"), col("rkey"))
    assert(oldPairs.count() === 0) // premise: nothing merged before
    val (delta, golden) = Entities.goldenRecordsDelta(old, fresh, oldPairs,
      col("rid"), col("rkey"), col("rval"))
    // delta edges touch the new record only — and exactly bridge both
    assert(delta.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((2L, 9L), (4L, 9L)))
    val got = golden.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), r.getDouble(4))).toMap
    assert(got === Map(
      2L -> ((3L, "abcd", 7.0)), // fused entity: 2, 4, 9
      6L -> ((1L, "zzzz", 3.0))))
    // batch-equivalence: same result as resolving the union from scratch
    val batch = Entities.goldenRecords(old.union(fresh),
      col("rid"), col("rkey"), col("rval"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getDouble(4))).toMap
    assert(batch === got)
  }

  test("goldenRecordsDelta cap decisions use block sizes over old ∪ new") {
    // four records share the key "aa": each batch's block is 2 exploded
    // rows per variant (≤ maxBucket=3), but the UNION block is 4 (> 3).
    // A per-partition cap decision would emit 5 delta edges (1 new×new +
    // 4 new×old) that a from-scratch run over the union would never
    // generate — the round-10 ADVICE finding. The delta path must decide
    // the cap on old ∪ new block sizes and emit ZERO delta edges.
    val old = Seq((1L, "aa", 1.0), (2L, "aa", 2.0)).toDF("rid", "rkey", "rval")
    val fresh = Seq((8L, "aa", 3.0), (9L, "aa", 4.0)).toDF("rid", "rkey", "rval")
    val oldPairs = Entities.matchEdges(old, col("rid"), col("rkey"), 3)
    assert(oldPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L))) // premise: under the cap within the old batch alone
    // premise: from scratch over the union the block is over-cap → no edges
    assert(Entities.matchEdges(old.union(fresh), col("rid"), col("rkey"), 3)
      .count() === 0)
    val (delta, golden) = Entities.goldenRecordsDelta(old, fresh, oldPairs,
      col("rid"), col("rkey"), col("rval"), 3)
    assert(delta.count() === 0)
    // the documented scoped exception: the previously-VERIFIED old×old
    // match (1,2) is never retro-dropped, even though a scratch run over
    // the over-cap union would not re-derive it; the new records stay
    // singletons
    val got = golden.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 8L -> 1L, 9L -> 1L))
  }

  test("mojibakeHits counts each marker family, clean text scores zero") {
    val df = Seq(
      (1L, "cafÃ© donâ€™t Â x �"),
      (2L, "perfectly clean ascii prose"),
      (3L, "legitimate unicode: café naïve — em dash")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.mojibakeHits(col("text")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // row 1: Ã(1) + â€(1) + Â(1) + U+FFFD(1) = 4
    assert(got === Map(1L -> 4, 2L -> 0, 3L -> 0))
  }

  test("x200 entityAssignments agrees with goldenRecords on the partition") {
    import spark.implicits._
    // two entities bridged by middle variants + one singleton
    val recs = Seq(
      (1L, "smith", 1.0), (2L, "smit", 1.0), (3L, "smitt", 1.0),
      (10L, "jones", 2.0), (11L, "jons", 2.0),
      (99L, "unique", 3.0)).toDF("rid", "rkey", "rval")
    val asg = Entities.entityAssignments(recs, col("rid"), col("rkey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
    // the partition's per-entity sizes equal goldenRecords' n_records
    val golden = Entities.goldenRecords(recs, col("rid"), col("rkey"),
      col("rval")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = asg.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(sizes === golden)
  }

  test("x211 sortedNeighborhood: hand candidates on a known key order, " +
      "partition-count independent") {
    import spark.implicits._
    // sort order aa < ab < ac < zz; w=2 -> 3 adjacent pairs, of which
    // (aa,ab) and (ac,zz) share a truth; true pairs = C(2,2)+C(2,2) = 2
    val recs = Seq((1L, "aa", 1L), (2L, "ab", 1L), (3L, "ac", 2L),
      (4L, "zz", 2L)).toDF("rid", "k", "t")
    def run(parts: Int) = Entities.sortedNeighborhood(recs, col("rid"),
      col("k"), col("t"), window = 2, partitions = parts).head()
    val r = run(1)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("candidate_pairs") === 3L)
    assert(r.getAs[Long]("covered_pairs") === 2L)
    assert(r.getAs[Long]("true_pairs") === 2L)
    assert(r.getAs[Double]("pairs_completeness") === 1.0)
    assert(r.getAs[Double]("pairs_quality") === 0.666667)
    // the distributed rank must be partition-cut independent
    assert(run(3) === r)
  }

  test("x211 sortedNeighborhood window widens monotonically toward " +
      "full completeness") {
    import spark.implicits._
    // truth twins are 2 apart in sort order: w=2 misses them, w=3 pairs
    // them
    val recs = Seq((1L, "ka", 1L), (2L, "kb", 2L), (3L, "kc", 1L),
      (4L, "kd", 2L)).toDF("rid", "k", "t")
    val w2 = Entities.sortedNeighborhood(recs, col("rid"), col("k"),
      col("t"), window = 2).head()
    val w3 = Entities.sortedNeighborhood(recs, col("rid"), col("k"),
      col("t"), window = 3).head()
    assert(w2.getAs[Long]("covered_pairs") === 0L)
    assert(w3.getAs[Long]("covered_pairs") === 2L)
    assert(w3.getAs[Double]("pairs_completeness") === 1.0)
  }
}
