package graft

import graft.physics.Power
import graft.similarity.Similarity

/** DuckDB oracle SQL for EVERY entry in [[SparkEntry.queries]] — the
  * rows-only escape list (`HarnessConsistencySpec.rowsOnly`) is empty.
  * Even the HLL sketch query is oracle-checked: a sketch value has no
  * DuckDB twin, but a07_approx_distinct emits the PROPERTY
  * "estimate within 5% of exact" as a boolean, which the oracle asserts.
  *
  * Each statement mirrors the Spark expression tree's association order so
  * per-row double arithmetic is bit-identical across engines; aggregates are
  * rounded on both sides. Int-width casts: Spark `size`/`hour`/`row_number`
  * are 32-bit where DuckDB's are 64-bit.
  */
object OracleSql {

  private val Toks = "string_split_regex(trim(lower(text)), '\\s+')"

  /** Word-bigram shingle list, distinct, mirroring
    * [[graft.text.TextAnalysis.shingles]] + array_distinct.
    */
  /** Shared CTE chain of the MinHash→band→candidate→Jaccard near-dup
    * pipeline (mirrors [[graft.dedup.Dedup.nearDuplicates]]); ends with
    * `scored(doc_a, doc_b, jaccard)`. Used by x06 (pairs) and x18
    * (connected components over the pairs).
    */
  /** MinHash near-dup chain, width-parameterized: hash index i uses group
    * g = i/4 and md5 slice i%4 (group 0 hashes the gram as-is, group g ≥ 1
    * hashes "g:" || gram — the seeded kernel's construction), banded as
    * numHashes/rowsPerBand bands of rowsPerBand. (4, 2) reproduces the
    * narrow chain x06/x18/x27 have always used, character-for-character in
    * semantics.
    */
  /** DuckDB twin of [[graft.plans.Kernels.cdcChunks]] + the chunk-table
    * explode: renders a `cfp` CTE of `(doc_id, chunk_idx, chunk_len,
    * chunk_hash)` with the SAME integer arithmetic (M, B, the B^j mod M
    * coefficient list, window, mask) interpolated from
    * [[graft.text.Chunking]] — the single source of truth for the chunking
    * scheme. O(n·window) per document via a per-position window hash (the
    * kernel's rolling form computes identical values).
    */
  private def cdcChainSql(window: Int, maskBits: Int): String = {
    val M = graft.text.Chunking.HashM
    val B = graft.text.Chunking.HashB
    val mod = 1L << maskBits
    val pows = graft.text.Chunking.pows(window)
      .map(p => s"CAST($p AS BIGINT)").mkString("[", ", ", "]")
    s"""cdc_d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |cdc_cuts AS (SELECT doc_id, text,
       | list_sort(list_concat(list_concat([CAST(0 AS BIGINT)],
       |  list_filter(range($window, n), p ->
       |   list_reduce(list_transform(range(0, $window), j ->
       |     (ord(substring(text, CAST(p - $window + 1 + j AS INT), 1))
       |      * ($pows[CAST(j + 1 AS INT)])) % $M),
       |    (a, b) -> (a + b) % $M) % $mod = 0)),
       |  [CAST(n AS BIGINT)])) AS bs
       | FROM cdc_d WHERE n > 0),
       |cdc_ch AS (SELECT doc_id, text,
       |  CAST(i - 1 AS INT) AS chunk_idx,
       |  CAST(bs[CAST(i AS INT)] + 1 AS INT) AS s,
       |  CAST(bs[CAST(i + 1 AS INT)] AS INT) AS e
       | FROM cdc_cuts, unnest(range(1, len(bs))) AS t(i)),
       |cfp AS (SELECT doc_id, chunk_idx,
       |  CAST(e - s + 1 AS INT) AS chunk_len,
       |  list_reduce(list_transform(range(s, e + 1), q ->
       |    CAST(ord(substring(text, CAST(q AS INT), 1)) AS BIGINT)),
       |   (a, c) -> (a * $B + c) % $M) AS chunk_hash
       | FROM cdc_ch)""".stripMargin
  }

  private def nearDupChainSql(numHashes: Int, rowsPerBand: Int,
      src: String = "documents"): String = {
    val sigExprs = (0 until numHashes).map { i =>
      val g = i / 4
      val s = i % 4
      val arg = if (g == 0) "x" else s"'$g:' || x"
      s"list_min(list_transform(grams, x -> substring(md5($arg), ${s * 8 + 1}, 8))) AS sig$i"
    }.mkString(",\n ")
    val bandSelects = (0 until numHashes / rowsPerBand).map { b =>
      val c = (0 until rowsPerBand).map(r => s"sig${b * rowsPerBand + r}")
        .mkString(" || ")
      s"SELECT doc_id, $c AS band, ${b + 1} AS band_id FROM sig"
    }.mkString("\n UNION ALL ")
    s"""ndt AS (SELECT doc_id, $Toks AS toks FROM $src),
       |g AS (SELECT doc_id, $DistinctGrams AS grams FROM ndt),
       |sig AS (SELECT doc_id,
       | $sigExprs
       | FROM g),
       |bands AS ($bandSelects),
       |capped AS (SELECT doc_id, band, band_id FROM (
       | SELECT doc_id, band, band_id, count(*) OVER (PARTITION BY band, band_id) AS bc
       | FROM bands) WHERE bc <= 1000),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       | FROM capped a JOIN capped b
       |  ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id),
       |scored AS (SELECT doc_a, doc_b,
       | round(CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) /
       |  greatest(CAST(len(ga.grams) + len(gb.grams) AS DOUBLE)
       |   - CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE), 1.0), 6) AS jaccard
       | FROM cand JOIN g ga ON cand.doc_a = ga.doc_id JOIN g gb ON cand.doc_b = gb.doc_id)""".stripMargin
  }

  private lazy val NearDupChain = nearDupChainSql(4, 2)

  /** Shared a31/a45 funnel chain: earliest QUALIFYING timestamp per stage
    * (each stage's min ts at-or-after the previous stage's qualifying
    * min — Funnel.reachedFrames' statement), ending with `s1`/`s2`/`s3`
    * `(user_id, t)`. One definition behind both the reach counts (a31)
    * and the transition timings (a45).
    */
  private val FunnelChain =
    """s1 AS (SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY e.user_id)""".stripMargin

  /** Shared duplicate-cluster chain: [[NearDupChain]]'s verified pairs at
    * the 0.3 threshold → undirected edges → min-reachable-label connected
    * components, ending with `clus(doc_id, cluster_id)` (cluster members
    * only; singletons are absent, mirroring
    * [[graft.dedup.Dedup.duplicateClusters]]). One definition behind x18
    * (clusters), x111 (cluster-consistent split) and x112 (inflation
    * histogram) so the clustering cannot drift between them. Callers must
    * open with `WITH RECURSIVE`.
    */
  private lazy val ClusterChain =
    s"""$NearDupChain,
       |cpairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM cpairs
       | UNION SELECT doc_b, doc_a FROM cpairs),
       |reach AS (SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
       | UNION SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
       |clus AS (SELECT CAST(u AS BIGINT) AS doc_id,
       |  CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY u)""".stripMargin

  /** x120/x123 shared statement: the dirty-registry fixture (mirrors
    * SparkEntry.entityRegistry), brute-force levenshtein edges, reach
    * recursion, survivorship. x123 resolves the same registry
    * incrementally, so BOTH queries check against this one SQL.
    */
  /** Shared x120/x123/x200 registry-resolution chain: the deterministic
    * dirty-registry fixture, exact distance-1 match pairs on `key(rkey)`
    * (identity for the golden-record faces; x200 truncates to model a
    * lossy upstream), recursive transitive closure, ending at
    * `lab(rid, rkey, rval, entity_id)`. One macro behind the
    * golden-record faces and the B-cubed evaluation so the partition
    * being scored is the partition being produced.
    */
  /** Just the dirty-registry fixture (t + reg CTEs, mirrors
    * SparkEntry.entityRegistry) — shared by [[entityChainSql]] and the
    * x206 blocking audit, which needs the registry but none of the
    * resolution machinery.
    */
  private val RegistrySql: String =
      s"""t AS (SELECT doc_id,
        |  'u' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS tok
        | FROM documents WHERE doc_id < 2000),
        |reg AS (
        | SELECT doc_id*3 AS rid, tok AS rkey,
        |  CAST(doc_id % 97 AS DOUBLE) AS rval FROM t
        | UNION ALL
        | SELECT doc_id*3+1,
        |  substring(tok, 1, CAST(doc_id % 9 AS INTEGER)) ||
        |   substring(tok, CAST(doc_id % 9 AS INTEGER) + 2),
        |  CAST(doc_id % 97 AS DOUBLE) FROM t WHERE doc_id % 3 = 0
        | UNION ALL
        | SELECT doc_id*3+2,
        |  substring(tok, 1, CAST((doc_id*7+3) % 9 AS INTEGER)) ||
        |   substring(tok, CAST((doc_id*7+3) % 9 AS INTEGER) + 2),
        |  CAST(doc_id % 97 AS DOUBLE) FROM t WHERE doc_id % 5 = 0)""".stripMargin

  private def entityChainSql(key: String => String = identity): String =
      s"""$RegistrySql,
        |pairs AS (SELECT a.rid AS u, b.rid AS v FROM reg a JOIN reg b
        | ON a.rid < b.rid
        |  AND levenshtein(${key("a.rkey")}, ${key("b.rkey")}) <= 1),
        |edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
        |reach AS (SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        | UNION SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
        |clus AS (SELECT u AS rid, min(r) AS cluster_id FROM reach GROUP BY u),
        |lab AS (SELECT reg.rid, reg.rkey, reg.rval,
        |  coalesce(c.cluster_id, reg.rid) AS entity_id
        | FROM reg LEFT JOIN clus c ON reg.rid = c.rid)""".stripMargin

  private lazy val EntityChain: String = entityChainSql()

  private lazy val EntityResolutionSql: String =
      s"""WITH RECURSIVE $EntityChain
        |SELECT CAST(entity_id AS BIGINT) AS entity_id,
        | CAST(count(*) AS BIGINT) AS n_records,
        | arg_min(rkey, rid) AS canonical_key,
        | arg_max(rkey, lpad(CAST(length(rkey) AS VARCHAR), 4, '0') || rkey)
        |  AS longest_key,
        | round(sum(rval), 2) AS total_value
        |FROM lab GROUP BY entity_id""".stripMargin

  /** The weighted-split CASE of [[graft.sampling.Sampling.splitLabel]]
    * over an arbitrary id expression — the ONE SQL renderer behind x19,
    * x57 and x111 (same thresholds, same `split` salt), so the split rule
    * exists once on the SQL side.
    */
  private def splitCaseSql(idExpr: String): String = {
    val ts = graft.sampling.Sampling.thresholds(SparkEntry.TrainSplit)
    val cases = ts.init.map { case (n, t) =>
      s"WHEN ${bucketSql(idExpr, "split")} < $t THEN '$n'" }.mkString(" ")
    s"CASE $cases ELSE '${ts.last._1}' END"
  }

  /** Shared domain co-citation graph chain (the x32-style deterministic
    * outlink enrichment → distinct (doc, domain) → directed co-citation
    * edges), ending with `ed(src, dst)`. Used by x62 (PageRank), x78
    * (communities) and x95 (personalized PageRank) so the graph
    * construction cannot drift between them.
    */
  /** Renders [[SparkEntry.UrlEnrichRule]]s as the SQL `text || CASE…`
    * enrichment CTE — the single SQL-side renderer behind both the x32
    * and the x62/x78/x95 oracles; neither the %2/%3/%6 rules nor the
    * domain regex exists twice anywhere.
    */
  private def urlEnrichSql(rules: Seq[SparkEntry.UrlEnrichRule]): String = {
    val cases = rules.map { r =>
      val host =
        if (r.hostMod > 0)
          s"'${r.scheme}${r.hostPrefix}' || CAST(doc_id % ${r.hostMod} AS VARCHAR) || '${r.hostSuffix}'"
        else s"'${r.scheme}${r.hostPrefix}${r.hostSuffix}'"
      val url =
        if (r.pathCarriesId) s"$host || '${r.path}' || CAST(doc_id AS VARCHAR)"
        else s"$host || '${r.path}'"
      s"CASE WHEN doc_id % ${r.docMod} = 0 THEN '${r.lead}' || $url ELSE '' END"
    }.mkString(" ||\n  ")
    s"""p AS (SELECT doc_id, text ||
       |  $cases AS text
       | FROM documents)""".stripMargin
  }

  private lazy val DomainGraphChainSql = {
    s"""${urlEnrichSql(SparkEntry.UrlEnrichRules)},
       |dom AS (SELECT DISTINCT doc_id, domain FROM (SELECT doc_id,
       |  unnest(regexp_extract_all(text, '${graft.text.Urls.domainPattern}', 1)) AS domain FROM p)),
       |ed AS (SELECT a.domain AS src, b.domain AS dst FROM dom a
       | JOIN dom b ON a.doc_id = b.doc_id AND a.domain <> b.domain)""".stripMargin
  }

  /** Shared PageRank round CTEs mirroring
    * [[graft.analytics.Graph.pageRank]]'s fixed-point integer arithmetic
    * (damping 85/100, scale 10⁹, dangling mass redistributed uniformly),
    * chained after a preceding `ed(src, dst)` CTE and ending at
    * `rk<iters>(node, rank_fp)`. One macro behind the domain PageRank
    * (x62) and TextRank keywords (x198) so the round arithmetic cannot
    * drift between them.
    */
  private def pageRankSql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""rk$k AS (SELECT n0.node,
         | base.b + ((CAST(85 AS BIGINT) * (COALESCE(c.inn, CAST(0 AS BIGINT))
         |   + (d$k.dm // nn.cnt))) // 100) AS rank_fp
         | FROM nodes n0
         | CROSS JOIN base CROSS JOIN nn
         | CROSS JOIN (SELECT CAST(COALESCE(sum(rank_fp), 0) AS BIGINT) AS dm
         |   FROM rk${k - 1} WHERE node NOT IN (SELECT node FROM deg)) d$k
         | LEFT JOIN (SELECT e.dst AS node,
         |    CAST(sum(r.rank_fp // g.dg) AS BIGINT) AS inn
         |   FROM ed e JOIN rk${k - 1} r ON e.src = r.node
         |   JOIN deg g ON e.src = g.node
         |   GROUP BY e.dst) c ON n0.node = c.node)"""
    }.mkString(",\n")
    s"""nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nodes),
       |base AS (SELECT CAST(1000000000 AS BIGINT) // cnt AS init,
       | (CAST(15 AS BIGINT) * (CAST(1000000000 AS BIGINT) // cnt)) // 100 AS b
       | FROM nn),
       |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS dg
       | FROM ed GROUP BY src),
       |rk0 AS (SELECT node, init AS rank_fp FROM nodes CROSS JOIN base),
       |$rounds""".stripMargin
  }

  /** Shared x78/x139 label-propagation chain over [[DomainGraphChainSql]]:
    * `CommunityRounds` unrolled max-neighbor-label rounds (count DESC,
    * label ASC tiebreak — [[graft.analytics.Graph.labelPropagation]]'s
    * min-struct rule), ending with `und(src, dst)` and `lab(node, label)`.
    * One definition behind the community listing (x78) and its modularity
    * score (x139) so the partition cannot drift between them.
    */
  private lazy val CommunityChain = {
    val rounds = (1 to SparkEntry.CommunityRounds).map { k =>
      s"""lp$k AS (SELECT node, label FROM (
         | SELECT node, label,
         |  row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
         | FROM (SELECT u.dst AS node, l.label, count(*) AS c
         |  FROM und u JOIN lp${k - 1} l ON u.src = l.node
         |  GROUP BY u.dst, l.label)) WHERE rn = 1)"""
    }.mkString(",\n")
    s"""$DomainGraphChainSql,
       |und AS (SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed),
       |lp0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
       |$rounds,
       |lab AS (SELECT node, label FROM lp${SparkEntry.CommunityRounds})""".stripMargin
  }

  /** Shared x97/x142 lang-id chain: the x03 marker-count scorer reduced
    * to its decision, ending with `d(doc_id, predicted)`. One definition
    * behind the confusion matrix (x97) and its kappa score (x142) so the
    * classifier mirror cannot drift between them.
    */
  private def langDetectChainSql(src: String, p: String): String =
    s"""${p}t AS (SELECT doc_id, $Toks AS toks FROM $src),
       |${p}sc AS (SELECT doc_id,
       | CAST(len(list_filter(toks, w -> list_contains(['der','die','und','nicht','das'], w))) AS INTEGER) AS score_de,
       | CAST(len(list_filter(toks, w -> list_contains(['the','a','and','is','of'], w))) AS INTEGER) AS score_en,
       | CAST(len(list_filter(toks, w -> list_contains(['el','la','que','los','una'], w))) AS INTEGER) AS score_es,
       | CAST(len(list_filter(toks, w -> list_contains(['le','la','et','les','une'], w))) AS INTEGER) AS score_fr,
       | CAST(len(list_filter(toks, w -> list_contains(['的','是','了','在','我'], w))) AS INTEGER) AS score_zh
       | FROM ${p}t),
       |${p}d AS (SELECT doc_id,
       | CASE WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
       |  WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
       |  WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
       |  WHEN score_fr >= score_zh THEN 'fr' ELSE 'zh' END AS predicted
       | FROM ${p}sc)""".stripMargin

  private lazy val LangDetectChain = langDetectChainSql("documents", "")

  /** Shared x137/x154 two-sample-KS grid (mirrors
    * [[graft.analytics.Comparison.ksDrift]]), ending with
    * `cum(grp, n, v, cum_all, cum_g)` plus `gr(nn)`. One definition behind
    * the raw statistic (x137) and its FDR decision layer (x154) so the
    * grid cannot drift between them.
    */
  private lazy val KsChainSql =
    """c AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
      |  CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
      |sp AS (SELECT v, sum(sum(c)) OVER (ORDER BY v
      |  ROWS UNBOUNDED PRECEDING) AS cum_all FROM c GROUP BY v),
      |tot AS (SELECT grp, sum(c) AS n FROM c GROUP BY 1),
      |gr AS (SELECT sum(c) AS nn FROM c),
      |grid AS (SELECT t.grp, t.n, s.v, s.cum_all, COALESCE(c.c, 0) AS c
      | FROM tot t CROSS JOIN sp s
      | LEFT JOIN c ON c.grp = t.grp AND c.v = s.v),
      |cum AS (SELECT grp, n, v, cum_all, sum(c) OVER (PARTITION BY grp
      |  ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_g FROM grid)""".stripMargin

  /** x155's unrolled MMR greedy: brute-force cosine pool of 8 per query
    * (ids 1–3), then `selectK` argmax steps, each scoring the remaining
    * pool by round-6 (0.5·rel − 0.5·max-sim-to-picked) with doc-id ties —
    * the [[graft.similarity.Similarity.mmrRerank]] determinism contract,
    * restated step by step. The greedy recurrence is generated, not
    * hand-copied, so step i can't drift from step j.
    */
  private lazy val MmrChainSql =
    s"""WITH $MmrChainBody
       |SELECT query_id, doc_id, pick, mmr_score FROM all4""".stripMargin

  private lazy val MmrChainBody = {
    val steps = (2 to 4).map { i =>
      s"""sel$i AS (SELECT query_id, doc_id, $i AS pick, score AS mmr_score
         | FROM (SELECT p.query_id, p.doc_id,
         |   round(0.5 * p.rel - 0.5 * coalesce(mx.mxs, 0.0), 6) AS score,
         |   row_number() OVER (PARTITION BY p.query_id
         |    ORDER BY round(0.5 * p.rel - 0.5 * coalesce(mx.mxs, 0.0), 6)
         |     DESC, p.doc_id) AS rn
         |  FROM pool p
         |  LEFT JOIN (SELECT s.query_id, s.da, max(s.s) AS mxs
         |    FROM sims s JOIN all${i - 1} t
         |     ON s.query_id = t.query_id AND s.db = t.doc_id
         |    GROUP BY 1, 2) mx
         |   ON mx.query_id = p.query_id AND mx.da = p.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM all${i - 1} t2
         |   WHERE t2.query_id = p.query_id AND t2.doc_id = p.doc_id)
         | ) WHERE rn = 1),
         |all$i AS (SELECT * FROM all${i - 1}
         | UNION ALL SELECT * FROM sel$i)""".stripMargin
    }.mkString(",\n")
    s"""v2 AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
       | FROM embeddings),
       |qv AS (SELECT vec_id AS qid, ve AS qvec FROM v2
       | WHERE vec_id IN (1, 2, 3)),
       |asim AS (SELECT qv.qid, v2.vec_id AS nid,
       |  ${cosineSql("qv.qvec", "v2.ve")} AS cosine
       | FROM v2 CROSS JOIN qv WHERE v2.vec_id <> qv.qid),
       |pool AS (SELECT qid AS query_id, nid AS doc_id, cosine AS rel FROM (
       |  SELECT qid, nid, cosine, row_number() OVER (
       |   PARTITION BY qid ORDER BY cosine DESC, nid) AS rn FROM asim)
       | WHERE rn <= 8),
       |pv AS (SELECT p.query_id, p.doc_id, p.rel, v2.ve
       | FROM pool p JOIN v2 ON v2.vec_id = p.doc_id),
       |sims AS (SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
       |  ${cosineSql("a.ve", "b.ve")} AS s
       | FROM pv a JOIN pv b
       |  ON a.query_id = b.query_id AND a.doc_id <> b.doc_id),
       |sel1 AS (SELECT query_id, doc_id, 1 AS pick, rel AS mmr_score FROM (
       |  SELECT query_id, doc_id, rel, row_number() OVER (
       |   PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn FROM pool)
       | WHERE rn = 1),
       |all1 AS (SELECT * FROM sel1),
       |$steps""".stripMargin
  }

  /** Distinct word n-gram list mirroring the `ShingleSet(n)` kernel. */
  private def distinctGramsSql(n: Int): String = {
    val parts = (0 until n).map(k => if (k == 0) "toks[i]" else s"toks[i + $k]").mkString(", ")
    s"""list_distinct(CASE WHEN len(toks) < $n THEN CAST([] AS VARCHAR[])
       | ELSE list_transform(generate_series(1, len(toks) - ${n - 1}),
       |   i -> concat_ws(' ', $parts)) END)""".stripMargin
  }

  private val DistinctGrams = distinctGramsSql(2)

  private def planeList(p: Seq[Double]): String =
    p.map(_.toString).mkString("[", ", ", "]")

  /** Sum of sign-bit terms mirroring [[Similarity.hyperplaneBucket]]. */
  private def bucketExpr(planes: Seq[Seq[Double]], vecCol: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($vecCol, ${planeList(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def cosineSql(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"

  /** Gopher-style quality-rule metric chain (mirrors
    * [[graft.text.QualityRules.report]]), ending with
    * `r(doc_id, n_words, mean_len, n_stop, alpha_ratio, bullet_ratio,
    * ellipsis_ratio)`. Shared by x28 (per-doc report) and x85 (PSI across
    * the gate) so the rule arithmetic cannot drift between them.
    */
  private lazy val QualityRuleChainSql =
    s"""t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
       |m AS (SELECT doc_id,
       |  CAST(len(toks) AS INTEGER) AS n_words,
       |  CAST(list_sum(list_transform(toks, tk -> length(tk))) AS DOUBLE)
       |    / CAST(greatest(len(toks), 1) AS DOUBLE) AS mean_len,
       |  CAST(len(list_intersect(list_distinct(toks),
       |    ['the', 'a', 'an', 'of', 'and', 'to', 'in', 'is'])) AS INTEGER) AS n_stop,
       |  CAST(len(list_filter(toks, tk -> regexp_matches(tk, '[a-z]'))) AS DOUBLE)
       |    / CAST(greatest(len(toks), 1) AS DOUBLE) AS alpha_ratio,
       |  string_split(text, chr(10)) AS lines
       | FROM t),
       |r AS (SELECT doc_id, n_words, mean_len, n_stop, alpha_ratio,
       |  CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE)
       |    / CAST(greatest(len(lines), 1) AS DOUBLE) AS bullet_ratio,
       |  CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$'))) AS DOUBLE)
       |    / CAST(greatest(len(lines), 1) AS DOUBLE) AS ellipsis_ratio
       | FROM m)""".stripMargin

  /** The x28 pass-all predicate over the `r` CTE's columns — one constant
    * consumed by both x28 and x85.
    */
  private val PassesAllSql =
    """(n_words >= 25 AND n_words <= 80) AND (mean_len >= 3.0 AND mean_len <= 10.0)
      |  AND n_stop >= 2 AND alpha_ratio >= 0.8
      |  AND (bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3)""".stripMargin

  /** 16 SimHash bit terms mirroring [[graft.dedup.Dedup.simhash16]]. */
  private val SimhashExpr = (0 until 16).map { i =>
    s"""(CASE WHEN list_sum(list_transform(dt, w ->
       | CASE WHEN substring(md5(w), ${i + 1}, 1) IN ('8','9','a','b','c','d','e','f')
       | THEN 1 ELSE -1 END)) > 0 THEN ${1L << (15 - i)} ELSE 0 END)""".stripMargin
  }.mkString("(", " + ", ")")

  private val Planes8 = Similarity.deterministicPlanes(8, 64)
  private val Planes6 = Similarity.deterministicPlanes(6, 64, seed = 7L)

  /** CTE chain replicating [[graft.multimodal.Multimodal.DeterministicFakeDecoder]]:
    * FNV-1a (64-bit, wrapping) over the UTF-8 bytes of `text`, carried in
    * HUGEINT with explicit mod-2^64 wrap; `fm448` below is Java's
    * `Math.floorMod(h, 448)` on the SIGNED 64-bit view of the hash, the
    * remaining extracts shift first (h >>> k, k ≥ 8), so they are
    * non-negative and a plain mod suffices.
    */
  private val DecodedFeatures =
    """t AS (SELECT doc_id, encode(text) AS bl, hex(encode(text)) AS hx FROM documents),
      |b AS (SELECT doc_id, octet_length(bl) AS byte_len,
      |  list_transform(range(1, octet_length(bl) + 1),
      |    i -> CAST(16 * (instr('0123456789ABCDEF', substring(hx, 2*i - 1, 1)) - 1)
      |         + (instr('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1) AS HUGEINT)) AS bytes
      |  FROM t),
      |h AS (SELECT doc_id, byte_len,
      |  list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), bytes),
      |    (acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616) AS hv
      |  FROM b),
      |dec AS (SELECT doc_id, byte_len,
      |  CAST(64 + ((((CASE WHEN hv >= 9223372036854775808 THEN hv - 18446744073709551616
      |    ELSE hv END) % 448) + 448) % 448) AS INTEGER) AS width,
      |  CAST(64 + ((hv // 65536) % 448) AS INTEGER) AS height,
      |  CAST(3 AS INTEGER) AS channels,
      |  CAST(1 + ((hv // 4294967296) % 30) AS INTEGER) AS n_frames,
      |  CAST((hv // 256) % 1000 AS DOUBLE) / 1000.0 AS brightness
      |  FROM h)""".stripMargin

  /** DuckDB twin of [[graft.sampling.Sampling.hashKey]]: integer value of
    * the first 8 hex chars of md5(salt || id).
    */
  private def hashKeySql(idExpr: String, salt: String): String =
    s"""list_reduce(list_transform(range(1, 9),
       | i -> CAST(instr('0123456789abcdef',
       |   substring(md5('$salt' || CAST($idExpr AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
       | (a, b) -> a * 16 + b)""".stripMargin

  /** DuckDB twin of [[graft.sampling.Sampling.hashBucket]]:
    * [[hashKeySql]] mod Buckets.
    */
  private def bucketSql(idExpr: String, salt: String): String =
    s"${hashKeySql(idExpr, salt)} % ${graft.sampling.Sampling.Buckets}"

  /** DuckDB twin of [[graft.sampling.Sharding.shardManifest]]'s per-row
    * 32-bit content hash: integer value of the first 8 hex chars of
    * md5(id || ':' || payload). Shared by x173 (manifest) and x175
    * (manifest diff) so the two oracles cannot drift.
    */
  private def rowHashSql(idExpr: String, payloadExpr: String): String =
    s"""list_reduce(list_transform(range(1, 9),
       | i -> CAST(instr('0123456789abcdef', substring(
       |   md5(CAST($idExpr AS VARCHAR) || ':' || $payloadExpr), i, 1)) - 1
       |   AS BIGINT)), (a, b) -> a * 16 + b)""".stripMargin

  /** x191/x195 shared Fellegi–Sunter pieces, mirroring
    * `SparkEntry.fsFields`/`fsOffsetPairs`: the scored metadata fields,
    * the null-safe per-field agreement projection, and the m/u fit from
    * the chain's verified matches + the offset-171 non-match sample.
    * [[FsWeightChain]] chains after [[NearDupChain]] (it reads `scored`)
    * and ends at `w(field, n_match, n_nonmatch, mp, up)` with `attrs`
    * still in scope — one macro behind the model face and the scoring
    * face so the two cannot drift.
    */
  private val FsFields = Seq("lang", "source", "len_band", "tok1")

  private def fsAgreeExprs(l: String, r: String): String =
    FsFields.map(f =>
      s"$l.$f IS NOT DISTINCT FROM $r.$f AS ag_$f").mkString(",\n  ")

  private def fsUnpivotSql(src: String, keyCols: String): String =
    FsFields.map(f =>
      s"SELECT $keyCols, '$f' AS field, ag_$f AS agree FROM $src")
      .mkString("\n UNION ALL ")

  private lazy val FsWeightChain =
    s"""mp AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
       |nmp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       | FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 171),
       |attrs AS (SELECT doc_id, lang, source,
       |  CAST(floor(n_chars / 100) AS BIGINT) AS len_band,
       |  list_extract($Toks, 1) AS tok1 FROM documents),
       |lab AS (SELECT doc_a, doc_b, true AS m FROM mp
       | UNION ALL SELECT doc_a, doc_b, false FROM nmp),
       |j AS (SELECT l.m, ${fsAgreeExprs("a", "b")}
       | FROM lab l JOIN attrs a ON l.doc_a = a.doc_id
       |  JOIN attrs b ON l.doc_b = b.doc_id),
       |st AS (${fsUnpivotSql("j", "m")}),
       |w AS (SELECT field,
       |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |  CAST(sum(CASE WHEN NOT m THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_nonmatch,
       |  (CAST(sum(CASE WHEN m AND agree THEN 1 ELSE 0 END) AS DOUBLE)
       |    + 0.5) /
       |   (CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
       |   AS mp,
       |  (CAST(sum(CASE WHEN NOT m AND agree THEN 1 ELSE 0 END)
       |    AS DOUBLE) + 0.5) /
       |   (CAST(sum(CASE WHEN NOT m THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
       |   AS up
       | FROM st GROUP BY 1)""".stripMargin

  /** DuckDB twin of [[graft.text.TextAnalysis.qualityScore]] over CTE
    * columns `text`/`toks` — shared by x02 (the score itself) and x40
    * (budget selection ranked by it).
    */
  private val QualitySql =
    """round(
      | least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4 +
      | (1.0 - least((CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS DOUBLE)
      |   / CAST(greatest(length(text), 1) AS DOUBLE)) * 5.0, 1.0)) * 0.3 +
      | (1.0 - abs((CAST(len(list_filter(toks, w -> list_contains(['the','a','an','of','and','to','in','is'], w))) AS DOUBLE)
      |   / CAST(greatest(len(toks), 1) AS DOUBLE) - 0.4))) * 0.3, 6)""".stripMargin

  /** Shared by x24 (broadcast probe grams) and x41 (bloom pre-filter) —
    * the two decontamination variants are output-identical by design.
    */
  private lazy val DecontaminateSql =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |g AS (SELECT doc_id, ${distinctGramsSql(8)} AS grams FROM t),
       |b AS (SELECT doc_id, grams, ${bucketSql("doc_id", "probe")} AS bk FROM g),
       |pg AS (SELECT gram, CAST(count(*) AS BIGINT) AS pdocs FROM (
       | SELECT doc_id, unnest(grams) AS gram FROM b WHERE bk < 2000) GROUP BY gram),
       |cg AS (SELECT doc_id, unnest(grams) AS gram FROM b WHERE bk >= 2000)
       |SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS shared_grams,
       | CAST(sum(pdocs) AS BIGINT) AS gram_probe_hits
       |FROM cg JOIN pg ON cg.gram = pg.gram GROUP BY cg.doc_id""".stripMargin

  /** PQ subspace distances + codes CTE pair (expects `v`/`cent` defined),
    * shared by x43 and x44 — mirrors [[graft.plans.Kernels.pqEncode]]'s
    * left-to-right fold (list_reduce with a 0.0 seed = the kernel's acc
    * loop, bit-identical) and its strict-< low-id tie rule.
    */
  private lazy val PqChainSql =
    """d2 AS (SELECT v.vec_id, c.cid, CAST(r.range AS INTEGER) AS s,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 9),
      |    j -> (v.ve[CAST(r.range * 8 + j AS INTEGER)] - c.cv[CAST(r.range * 8 + j AS INTEGER)])
      |       * (v.ve[CAST(r.range * 8 + j AS INTEGER)] - c.cv[CAST(r.range * 8 + j AS INTEGER)]))),
      |    (a, b) -> a + b) AS dist
      | FROM v CROSS JOIN cent c CROSS JOIN range(0, 8) r),
      |codes AS (SELECT vec_id, s, cid AS code FROM (
      |  SELECT vec_id, s, cid, row_number() OVER (
      |    PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn FROM d2) WHERE rn = 1)""".stripMargin

  /** BM25 batch chain shared by x45 (the ranking itself) and x53 (rank
    * fusion): the x36 scoring tree over a query TABLE — distinct (query,
    * term) pairs join the token stream, df stays corpus-wide per term,
    * per-(query, doc) scores re-rank in `r`.
    */
  private lazy val Bm25BatchChain =
    s"""q AS (SELECT CAST(query_id AS BIGINT) AS query_id, query_text
       | FROM (VALUES (1, 'vector hash'), (2, 'stream merge sort'))
       |  AS q(query_id, query_text)),
       |qt AS (SELECT DISTINCT query_id,
       |  unnest(string_split_regex(trim(lower(query_text)), '\\s+')) AS term FROM q),
       |t AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS doc_len,
       |  unnest(toks) AS term FROM (SELECT doc_id, $Toks AS toks FROM documents)),
       |tc AS (SELECT qt.query_id, t.doc_id, t.doc_len, t.term,
       |  CAST(count(*) AS BIGINT) AS cnt
       | FROM t JOIN qt USING (term) GROUP BY 1, 2, 3, 4),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  avg(CAST(len($Toks) AS INTEGER)) AS avgdl FROM documents),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM (
       |  SELECT DISTINCT doc_id, term FROM tc) GROUP BY term),
       |sc AS (SELECT tc.query_id, tc.doc_id,
       |  ln(1.0 + (CAST(st.n_docs AS DOUBLE) - CAST(dfq.dfreq AS DOUBLE) + 0.5) /
       |    (CAST(dfq.dfreq AS DOUBLE) + 0.5)) *
       |  ((CAST(tc.cnt AS DOUBLE) * 2.2) / (CAST(tc.cnt AS DOUBLE) + 1.2 *
       |    (0.25 + 0.75 * (CAST(tc.doc_len AS DOUBLE) / st.avgdl)))) AS term_score
       | FROM tc JOIN dfq USING (term) CROSS JOIN st),
       |g AS (SELECT query_id, doc_id, round(sum(term_score), 6) AS score
       | FROM sc GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, score, CAST(row_number() OVER (
       |  PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rnk
       | FROM g)""".stripMargin

  /** IVF+PQ search, shared by x44 (per-query face) and x47 (batch
    * query-table face): x09's coarse assignment/probe chain composed with
    * x43's code/ADC chain — candidates are vectors whose coarse list is
    * among the query's nprobe=2 probed lists, scored by ADC over their PQ
    * codes. One SQL for both keys: the batch plan must be
    * result-identical to the per-query plan on the same probes.
    */
  /** CTEs shared by every IVF-PQ face: doubled vectors, seed centroids,
    * coarse assignment ranks, plus [[PqChainSql]]'s subspace distances and
    * codes. Search chains ([[ivfPqSearchCtes]]) build on these.
    */
  private lazy val IvfPqSharedCtes =
    s"""v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve FROM embeddings),
       |cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id % 50 = 0),
       |rnks AS (SELECT v.vec_id, c.cid,
       |  row_number() OVER (PARTITION BY v.vec_id
       |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
       | FROM v CROSS JOIN cent c),
       |asg AS (SELECT vec_id, cid FROM rnks WHERE rn = 1),
       |$PqChainSql""".stripMargin

  /** The probe→candidate→ADC→rank chain at a given `nprobe`, CTE names
    * prefixed by `p` so two search passes can share one WITH clause (the
    * x71 recall face runs nprobe 1 and 2 side by side).
    */
  private def ivfPqSearchCtes(p: String, nprobe: Int): String =
    s"""${p}probes AS (SELECT vec_id AS qid, cid FROM rnks
       | WHERE rn <= $nprobe AND vec_id IN (0, 1)),
       |${p}cand AS (SELECT pp.qid AS query_id, a.vec_id AS neighbor_id
       | FROM ${p}probes pp JOIN asg a ON a.cid = pp.cid
       | WHERE a.vec_id <> pp.qid),
       |${p}adc AS (SELECT ca.query_id, ca.neighbor_id,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(qd.dist ORDER BY qd.s)), (a, b) -> a + b) AS adist
       | FROM ${p}cand ca
       | JOIN codes c2 ON c2.vec_id = ca.neighbor_id
       | JOIN d2 qd ON qd.vec_id = ca.query_id AND qd.cid = c2.code AND qd.s = c2.s
       | GROUP BY 1, 2),
       |${p}r AS (SELECT query_id, neighbor_id, round(adist, 6) AS adc_dist,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY round(adist, 6) ASC, neighbor_id ASC) AS INTEGER) AS rnk FROM ${p}adc)""".stripMargin

  private lazy val IvfPqSql =
    s"""WITH $IvfPqSharedCtes,
       |${ivfPqSearchCtes("", 2)}
       |SELECT query_id, neighbor_id, adc_dist, rnk FROM r WHERE rnk <= 5""".stripMargin

  /** x71: end-to-end recall of the compressed (IVF-PQ) tier against exact
    * brute-force cosine top-5, per nprobe — the quantization-loss gauge
    * x09_recall provides for the uncompressed IVF tier. Both sides are
    * deterministic, so the recall rows are exact (no tolerance needed).
    */
  private lazy val IvfPqRecallSql =
    s"""WITH $IvfPqSharedCtes,
       |${ivfPqSearchCtes("p1", 1)},
       |${ivfPqSearchCtes("p2", 2)},
       |brute AS (SELECT qid, nid FROM (
       |  SELECT q.qid, v.vec_id AS nid,
       |   row_number() OVER (PARTITION BY q.qid
       |    ORDER BY ${cosineSql("q.qv", "v.ve")} DESC, v.vec_id) AS rnk
       |  FROM v CROSS JOIN (SELECT vec_id AS qid, ve AS qv FROM v
       |   WHERE vec_id IN (0, 1)) q
       |  WHERE v.vec_id <> q.qid) WHERE rnk <= 5),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM brute),
       |h1 AS (SELECT CAST(count(*) AS DOUBLE) AS hits FROM p1r
       | JOIN brute ON p1r.query_id = brute.qid AND p1r.neighbor_id = brute.nid
       | WHERE p1r.rnk <= 5),
       |h2 AS (SELECT CAST(count(*) AS DOUBLE) AS hits FROM p2r
       | JOIN brute ON p2r.query_id = brute.qid AND p2r.neighbor_id = brute.nid
       | WHERE p2r.rnk <= 5)
       |SELECT CAST(1 AS INTEGER) AS nprobe, round(h1.hits / tot.total, 6) AS recall FROM h1, tot
       |UNION ALL
       |SELECT CAST(2 AS INTEGER) AS nprobe, round(h2.hits / tot.total, 6) AS recall FROM h2, tot""".stripMargin

  /** Shared-span chain for x69 (span extraction) and x73 (span removal):
    * the planted-boilerplate enrichment, the naive positional-4-gram
    * self-join, and the gaps-and-islands collapse to maximal spans ≥ 12
    * tokens (`sp`). The naive rule needs no winnow prefilter — the Spark
    * side's two-stage plan must drop no span to hash-match it.
    */
  private lazy val SharedSpanChainSql =
    s"""d AS (SELECT doc_id,
       |  CASE WHEN doc_id % 40 = 0 THEN text || ' ${SparkEntry.SharedSpan1}'
       |       WHEN doc_id % 40 = 7 THEN text || ' ${SparkEntry.SharedSpan2}'
       |       ELSE text END AS text FROM documents),
       |t AS (SELECT doc_id, $Toks AS toks FROM d),
       |tf AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 4),
       |p AS (SELECT doc_id, toks,
       |  CAST(unnest(range(0, len(toks) - 3)) AS INTEGER) AS pos FROM tf),
       |g AS (SELECT doc_id, pos,
       |  array_to_string(toks[pos+1:pos+4], ' ') AS gram FROM p),
       |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  a.pos AS apos, b.pos AS bpos
       | FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |r AS (SELECT doc_a, doc_b, apos - bpos AS diag, apos,
       |  apos - row_number() OVER (PARTITION BY doc_a, doc_b, apos - bpos
       |    ORDER BY apos) AS island FROM m),
       |s AS (SELECT doc_a, doc_b, diag, island, min(apos) AS a_start,
       |  count(*) + 3 AS span_len FROM r GROUP BY 1, 2, 3, 4),
       |sp AS (SELECT doc_a, doc_b, CAST(a_start AS BIGINT) AS a_start,
       |  CAST(a_start - diag AS BIGINT) AS b_start,
       |  CAST(span_len AS BIGINT) AS span_len
       | FROM s WHERE span_len >= 12)""".stripMargin

  /** Intra-doc repeat chain for x75 (spans) and x76 (fraction): the
    * double-stamp enrichment, the naive per-doc positional-4-gram
    * self-join (apos < bpos), and the diagonal islands collapse.
    */
  private lazy val SelfSpanChainSql =
    s"""d AS (SELECT doc_id,
       |  CASE WHEN doc_id % 25 = 0 THEN text || ' ${SparkEntry.SharedSpan1}' ||
       |    ' ${SparkEntry.SelfRepeatFiller} ${SparkEntry.SharedSpan1}'
       |       ELSE text END AS text FROM documents),
       |t AS (SELECT doc_id, $Toks AS toks FROM d),
       |tf AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 4),
       |p AS (SELECT doc_id, toks,
       |  CAST(unnest(range(0, len(toks) - 3)) AS INTEGER) AS pos FROM tf),
       |g AS (SELECT doc_id, pos,
       |  array_to_string(toks[pos+1:pos+4], ' ') AS gram FROM p),
       |m AS (SELECT a.doc_id AS doc_id, a.pos AS apos, b.pos AS bpos
       | FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.gram = b.gram
       |  AND a.pos < b.pos),
       |r AS (SELECT doc_id, bpos - apos AS diag, apos,
       |  apos - row_number() OVER (PARTITION BY doc_id, bpos - apos
       |    ORDER BY apos) AS island FROM m),
       |s AS (SELECT doc_id, diag, island, min(apos) AS a_start,
       |  count(*) + 3 AS span_len FROM r GROUP BY 1, 2, 3),
       |sp AS (SELECT doc_id, CAST(a_start AS BIGINT) AS a_start,
       |  CAST(a_start + diag AS BIGINT) AS b_start,
       |  CAST(span_len AS BIGINT) AS span_len
       | FROM s WHERE span_len >= 12)""".stripMargin

  /** Winnowing fingerprint chain shared by x48 (per-doc fingerprints) and
    * x49 (copy-detection pairs) — mirrors `Kernels.winnow` exactly:
    * positional 4-gram hashes (unsigned value of the first 8 md5 hex
    * chars, the [[hashKeySql]] fold), window-4 minima, distinct per doc.
    * Docs with < 4 tokens emit nothing; docs with fewer than 4 grams
    * winnow one window over all their grams (`generate_series` is
    * end-inclusive, so s runs 0..max(m−4, 0) = max(m−3, 1) windows).
    */
  private lazy val WinnowSql =
    s"""t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |d AS (SELECT doc_id, toks, CAST(len(toks) - 3 AS INTEGER) AS m
       | FROM t WHERE len(toks) >= 4),
       |gi AS (SELECT doc_id, m, toks,
       |  CAST(unnest(generate_series(0, m - 1)) AS INTEGER) AS i FROM d),
       |h AS (SELECT doc_id, m, i, list_reduce(list_transform(range(1, 9),
       |   j -> CAST(instr('0123456789abcdef', substring(md5(
       |     array_to_string(toks[i + 1:i + 4], ' ')), CAST(j AS INTEGER), 1)) - 1 AS BIGINT)),
       |   (a, b) -> a * 16 + b) AS hv FROM gi),
       |ws AS (SELECT doc_id,
       |  CAST(unnest(generate_series(0, greatest(m - 4, 0))) AS INTEGER) AS s FROM d),
       |wm AS (SELECT ws.doc_id, ws.s, min(h.hv) AS fingerprint
       | FROM ws JOIN h ON h.doc_id = ws.doc_id AND h.i >= ws.s AND h.i < least(ws.s + 4, h.m)
       | GROUP BY 1, 2),
       |fp AS (SELECT DISTINCT doc_id, fingerprint FROM wm)""".stripMargin

  /** DuckDB twin of [[graft.warehouse.Layout.zValue]]: the same
    * bit-interleave terms, generated by the same loop.
    */
  private def zValueSql(x: String, y: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    val xm = s"(CAST($x AS BIGINT) & $mask)"
    val ym = s"(CAST($y AS BIGINT) & $mask)"
    (0 until bits).map { i =>
      s"((($xm >> $i) & 1) << ${2 * i}) + ((($ym >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  val all: Map[String, String] = Map(
    "p01_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey < 100",
    "p02_coerce" ->
      "SELECT event_id, CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS coerced FROM events",
    "p03_range_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity BETWEEN 10.0 AND 40.0 AND l_discount BETWEEN 0.02 AND 0.08""".stripMargin,
    "p04_fill_defaults" ->
      """SELECT event_type, count(*) AS cnt,
        | round(sum(coalesce(CASE WHEN event_type = 'error' THEN NULL ELSE value END, -1.0)), 2) AS sum_v
        |FROM events GROUP BY event_type""".stripMargin,
    "p05_dedup_first" ->
      """SELECT user_id, event_id, value FROM (
        | SELECT user_id, event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    "p06_flag_filter" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events WHERE value > 100 GROUP BY event_type""".stripMargin,
    "p07_station_filter" ->
      """SELECT user_id, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events WHERE event_type = 'purchase' GROUP BY user_id""".stripMargin,
    "p08_time_filter" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' GROUP BY event_type""".stripMargin,
    "p15_dead_letter" ->
      """SELECT reject_reason, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM (SELECT value,
        |  CASE WHEN NOT (value BETWEEN 0.0 AND 450.0) THEN 'value_range'
        |       WHEN NOT (event_type <> 'error') THEN 'not_error'
        |  END AS reject_reason FROM events)
        |WHERE reject_reason IS NOT NULL GROUP BY reject_reason""".stripMargin,
    "p10_normalize_rename" ->
      """SELECT event_type AS station, round(sum(value), 2) AS total_power,
        | round(avg(round((value * 0.1) * 1000.0)) / 1000.0, 6) AS avg_volt, count(*) AS cnt
        |FROM events GROUP BY event_type""".stripMargin,
    "p12_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",
    "p13_last_n_per_key" ->
      """SELECT user_id, event_id, CAST(rn AS INTEGER) AS rn FROM (
        | SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn <= 3""".stripMargin,
    "p14_latest_per_key" ->
      """SELECT event_type, event_id, value FROM (
        | SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,

    "d01_local_time" ->
      """SELECT CAST(hour(ts + INTERVAL 2 HOUR) AS INTEGER) AS local_hour, count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,
    "d02_sanitize_ts" ->
      "SELECT event_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s FROM events",
    "d03_time_features" ->
      """SELECT CAST(hour(ts) AS INTEGER) AS hour, strftime(ts, '%A') AS day_of_week,
        | CASE WHEN hour(ts) >= 6 AND hour(ts) < 18 THEN 'Day' ELSE 'Night' END AS time_of_day,
        | count(*) AS cnt
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "d06_validity_flag" ->
      """SELECT (CASE WHEN value > 300 THEN NULL ELSE value END) IS NOT NULL
        |  AND props IS NOT NULL AS is_valid, count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,
    "d07_wind_power_density" ->
      """SELECT l_returnflag, round(sum((0.5 * (1.0 + l_tax)) *
        | (((l_quantity / 10.0) * (l_quantity / 10.0)) * (l_quantity / 10.0))), 2) AS sum_wpd
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "d08_capacity_utilization" ->
      """SELECT event_type, round(avg(round(round((value /
        | CASE event_type WHEN 'click' THEN 500.0 WHEN 'view' THEN 400.0
        |  WHEN 'purchase' THEN 380.0 WHEN 'signup' THEN 360.0 WHEN 'error' THEN 350.0 END)
        | * 100.0, 6) * 1000000.0)) / 1000000.0, 6) AS avg_util
        |FROM events GROUP BY event_type""".stripMargin,
    "d09_hub_air_density" ->
      s"""SELECT event_id,
         | round((value / 50.0) * ${Power.ShearFactor}, 6) AS hub_mps,
         | round(((1000.0 + (value / 10.0)) * 100.0) /
         |   (287.05 * ((value / 20.0) + 273.15)), 6) AS density
         |FROM events""".stripMargin,
    "d11_turbine_power_curve" ->
      s"""WITH t AS (SELECT event_id, value / 12.0 AS v FROM events)
         |SELECT event_id, round(CASE
         |  WHEN v < 3.0 OR v > 25.0 THEN 0.0
         |  WHEN v > 12.0 THEN 2500.0
         |  ELSE least((((((0.5 * 1.225) * CAST(${Power.RotorSweptAreaM2} AS DOUBLE)) * ((v * v) * v)) * 0.4) / 1000.0), 2500.0)
         | END, 4) AS power_kw
         |FROM t""".stripMargin,
    "d11_curve_native" ->
      s"""WITH t AS (SELECT event_id, value / 12.0 AS v FROM events)
         |SELECT event_id, round(CASE
         |  WHEN v < 3.0 OR v > 25.0 THEN 0.0
         |  WHEN v > 12.0 THEN 2500.0
         |  ELSE least((((((0.5 * 1.225) * CAST(${Power.RotorSweptAreaM2} AS DOUBLE)) * ((v * v) * v)) * 0.4) / 1000.0), 2500.0)
         | END, 4) AS power_kw
         |FROM t""".stripMargin,
    "d12_farm_energy" ->
      s"""SELECT l_returnflag, round(sum(((l_extendedprice / 1000.0) * l_linenumber)
         | * ${10.0 / 60.0}), 2) AS sum_energy
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "d13_solar_power" ->
      """WITH t AS (SELECT event_id,
        |  greatest(1000.0 * (1.0 - ((value / 5.0) / 100.0)), 50.0) AS irr,
        |  greatest(0.18 * (1.0 - (0.0045 * ((value / 10.0) - 25.0))), 0.05) AS eff
        | FROM events)
        |SELECT event_id, round(irr, 6) AS irradiance, round(eff, 9) AS efficiency,
        | round(((((irr * 1.7) * eff) * 0.85) * 1000.0) / 1000.0, 4) AS power_kw
        |FROM t""".stripMargin,
    "d16_daytime_gate" ->
      """SELECT event_type, round(sum(CASE WHEN hour(ts) >= 6 AND hour(ts) < 18
        | THEN value ELSE 0.0 END), 2) AS sum_gated
        |FROM events GROUP BY event_type""".stripMargin,
    "d17_power_from_vi" ->
      """SELECT l_returnflag, round(sum((l_extendedprice * l_quantity) / 1000.0), 2) AS sum_power
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "d18_power_coefficient" ->
      """SELECT event_type, round(avg(value / (power(value / 30.0, 3) + 0.001)), 4) AS avg_pc
        |FROM events GROUP BY event_type""".stripMargin,
    "d19_wind_class" ->
      """SELECT wind_class, count(*) AS cnt FROM (
        | SELECT CASE WHEN value / 5.0 <= 0 OR value / 5.0 > 100 THEN NULL
        |  WHEN value / 5.0 <= 3 THEN 'Calm' WHEN value / 5.0 <= 7 THEN 'Light'
        |  WHEN value / 5.0 <= 12 THEN 'Moderate' WHEN value / 5.0 <= 20 THEN 'Strong'
        |  ELSE 'Gale' END AS wind_class FROM events)
        |GROUP BY wind_class""".stripMargin,
    "d20_round" ->
      """SELECT event_id, round(value / 7.0, 3) AS r3, round(value / 9.0, 4) AS r4,
        | round(value * 1.37, 6) AS r6
        |FROM events""".stripMargin,
    "d21_simulator" ->
      """WITH base AS (SELECT range AS id, range // 3 AS tick, range % 3 AS st
        |  FROM range(0, 6000)),
        |d AS (SELECT tick, st,
        |  1704067200 + tick * 5 AS epoch,
        |  ((tick * 10 + st) % 628) / 100.0 AS phase FROM base),
        |e AS (SELECT tick, st, epoch,
        |  CAST(floor((epoch % 86400) / 3600) AS BIGINT) AS hr,
        |  sin(phase) AS s, phase FROM d),
        |f AS (SELECT tick, st, epoch, hr,
        |  1.0 + (((s * 43758.5453) - floor(s * 43758.5453)) - 0.5) * 0.1 AS fluct,
        |  (s + 1.0) * 50.0 AS clouds,
        |  20.0 + sin(phase / 2.0) * 8.0 AS temp_c FROM e),
        |g AS (SELECT tick, st, epoch, hr, temp_c, temp_c + 5.5 AS panel_t,
        |  CASE WHEN hr >= 6 AND hr < 18
        |   THEN greatest(1000.0 * (1.0 - (clouds / 100.0)), 50.0) * fluct
        |   ELSE 0.0 END AS irr FROM f),
        |h AS (SELECT tick, st, epoch, hr, temp_c, panel_t, irr,
        |  greatest(0.18 * (1.0 - (0.0045 * (panel_t - 25.0))), 0.05) AS eff,
        |  CASE st WHEN 0 THEN 1000000.0 WHEN 1 THEN 600000.0 ELSE 150000.0 END AS panels
        |  FROM g),
        |i AS (SELECT tick, st, epoch, hr, temp_c, panel_t, irr, eff,
        |  CASE WHEN hr >= 6 AND hr < 18
        |   THEN ((((irr * 1.7) * eff) * 0.85) * panels) / 1000.0 ELSE 0.0 END AS pw
        |  FROM h)
        |SELECT epoch AS epoch_s, CAST(hr AS INTEGER) AS hour,
        | CASE st WHEN 0 THEN 'BSPP' WHEN 1 THEN 'KOSPP' ELSE 'ZFSPP' END AS station_id,
        | CASE WHEN tick % 120 = 0 THEN 'API' ELSE 'PREDICTION' END AS data_source,
        | round(temp_c, 6) AS temperature_C, round(panel_t, 6) AS panel_temperature_C,
        | round(irr, 4) AS solar_irradiance_Wm2, round(eff, 6) AS effective_efficiency,
        | round(pw, 4) AS power_kW, round(pw * 0.16666666666666666, 4) AS energy_kWh_10min
        |FROM i""".stripMargin,
    "d22_ewma_batch" ->
      """WITH t AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events)
        |SELECT event_type, round(sum((CASE WHEN rn = 1 THEN power(0.65, n - 1)
        | ELSE 0.35 * power(0.65, n - rn) END) * value), 6) AS ewma
        |FROM t GROUP BY event_type""".stripMargin,
    "d23_prettify" ->
      """SELECT DISTINCT event_type,
        | upper(substring(event_type, 1, 1)) || substring(event_type, 2) AS label
        |FROM events""".stripMargin,

    "a01_global_stats" ->
      """SELECT round(sum(l_extendedprice), 2) AS sum_price, round(avg(l_quantity), 6) AS avg_qty,
        | max(l_quantity) AS max_qty, count(*) AS cnt
        |FROM lineitem""".stripMargin,
    "a02_group_stats" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price, round(avg(l_discount), 6) AS avg_disc,
        | max(l_quantity) AS max_qty, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "a02_salted_sum" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a03_hourly_agg" ->
      """SELECT CAST(hour(ts) AS INTEGER) AS hour, round(sum(value), 2) AS sum_value,
        | count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,
    "a16_low_power_alerts" ->
      """SELECT event_type, event_id, value, value < 100.0 AS alert,
        | CAST(100.0 AS DOUBLE) AS threshold_kW FROM (
        | SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    "a05_capacity_factor" ->
      """WITH g AS (SELECT event_type, avg(round(value * 100.0)) / 100.0 AS a, max(value) AS m
        | FROM events GROUP BY event_type)
        |SELECT event_type, round((a / (SELECT max(m) FROM g)) * 100.0, 6) AS capacity_factor_pct
        |FROM g""".stripMargin,
    "a06_category_counts" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
    "a07_distinct_count" ->
      "SELECT event_type, count(DISTINCT user_id) AS n_distinct FROM events GROUP BY event_type",
    // Tolerance oracle: DuckDB cannot reproduce the HLL estimate, but it
    // CAN assert the property the estimate must satisfy. The Spark side
    // computes |approx - exact| <= 0.05 * exact per group; the oracle
    // asserts it holds for every group, so a sketch drifting past 5%
    // breaks the hash match instead of being unverifiable.
    "a07_approx_distinct" ->
      "SELECT event_type, TRUE AS within_5pct FROM events GROUP BY event_type",
    // same tolerance-oracle pattern: the merged-sketch estimate must sit
    // within 5% of exact for EVERY key, or the hash match breaks
    "a21_hll_merge" ->
      "SELECT event_type, TRUE AS within_5pct FROM events GROUP BY event_type",
    // the one-shot rule the three-way partial merge must reproduce
    "a29_rollup_merge" ->
      """SELECT event_type AS event_type, count(*) AS rows, count(value) AS cnt,
        | round(sum(value), 6) AS sum, min(value) AS min, max(value) AS max,
        | CASE WHEN count(value) > 0
        |   THEN round(sum(value) / count(value), 6) END AS avg
        |FROM events GROUP BY 1""".stripMargin,
    // the naive ntile rule stated directly: global row_number in
    // (value ASC, tie, id) order, bin = floor((rnk-1)*bins/n)
    "a27_equidepth_hist" ->
      s"""WITH q AS (SELECT event_id, value AS v,
         |  ${hashKeySql("event_id", "eqdepth")} AS tie FROM events),
         |r AS (SELECT v, CAST(row_number() OVER (
         |  ORDER BY (0 - v) DESC, tie ASC, event_id ASC) AS BIGINT) AS rnk,
         |  count(*) OVER () AS n FROM q),
         |b AS (SELECT v,
         |  least(CAST(floor((rnk - 1) * 16.0 / n) AS BIGINT),
         |    CAST(15 AS BIGINT)) AS bin FROM r)
         |SELECT bin, count(*) AS cnt, min(v) AS lo, max(v) AS hi
         |FROM b GROUP BY bin""".stripMargin,
    "a26_sensor_gaps" ->
      """WITH o AS (SELECT user_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events)
        |SELECT user_id, epoch_us(prev) AS gap_start_us,
        | epoch_us(ts) AS gap_end_us,
        | (epoch_us(ts) - epoch_us(prev)) // 1000000 AS gap_secs
        |FROM o WHERE prev IS NOT NULL
        | AND epoch_us(ts) - epoch_us(prev) > CAST(21600000000 AS BIGINT)""".stripMargin,
    // CUSUM closed form: running sum of drift increments minus the
    // clamped running min — centi-unit quantization keeps every
    // statistic integer-valued, so the hash compare is exact
    "a25_cusum_drift" ->
      """WITH q0 AS (SELECT user_id, ts, event_id,
        |  round(value * 100) AS vq FROM events),
        |s AS (SELECT user_id, ts, event_id, vq,
        |  sum(vq - 6000.0) OVER w AS sh,
        |  sum(4000.0 - vq) OVER w AS sl
        | FROM q0
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT user_id, ts, event_id, vq,
        |  sh - least(min(sh) OVER w, 0) AS hi,
        |  sl - least(min(sl) OVER w, 0) AS lo
        | FROM s
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
        | event_id, CAST(vq AS BIGINT) AS value_centi,
        | CAST(hi AS BIGINT) AS cusum_hi, CAST(lo AS BIGINT) AS cusum_lo,
        | (hi > 20000.0 OR lo > 20000.0) AS drift
        |FROM m""".stripMargin,
    "a24_quantile_merge" ->
      """SELECT event_type, q, TRUE AS within_tol
        |FROM (SELECT DISTINCT event_type FROM events)
        |CROSS JOIN (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
        |            (CAST(0.75 AS DOUBLE))) AS qs(q)""".stripMargin,
    "a08_describe" ->
      """SELECT event_type, count(value) AS cnt,
        | round(avg(round(value * 100.0)) / 100.0, 6) AS mean,
        | round(stddev_samp(value), 6) AS std, round(min(value), 6) AS min,
        | round(quantile_cont(value, 0.25), 6) AS p25, round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.75), 6) AS p75, round(max(value), 6) AS max
        |FROM events GROUP BY event_type""".stripMargin,
    "a09_histogram" ->
      """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket, event_type, count(*) AS cnt,
        | CAST(floor(value / 25.0) AS BIGINT) * CAST(25.0 AS DOUBLE) AS bucket_lo
        |FROM events GROUP BY 1, 2""".stripMargin,
    // one window pass computes all three lag columns (mirror of the
    // Spark single-window array-of-lags), stacked then corr'd per
    // (type, lag); round-6 absorbs co-moment merge jitter (a10 rationale)
    "a30_autocorr" ->
      """WITH o AS (SELECT event_type, value AS v,
        |  lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
        |  lag(value, 3) OVER w AS l3
        | FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
        |u AS (SELECT event_type, 1 AS lg, v, l1 AS lv FROM o WHERE l1 IS NOT NULL
        | UNION ALL SELECT event_type, 2, v, l2 FROM o WHERE l2 IS NOT NULL
        | UNION ALL SELECT event_type, 3, v, l3 FROM o WHERE l3 IS NOT NULL)
        |SELECT event_type, CAST(lg AS INTEGER) AS lag, round(corr(v, lv), 6) AS acf,
        | CAST(count(*) AS BIGINT) AS n_pairs
        |FROM u GROUP BY event_type, lg""".stripMargin,
    // staged min-timestamp chain: stage i's min ts is taken only over
    // events at-or-after the entity's stage i-1 min — the Funnel.funnel
    // semantics stated directly
    "a31_funnel" ->
      s"""WITH $FunnelChain,
        |c AS (SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n FROM s1
        | UNION ALL SELECT 2, 'click', count(*) FROM s2
        | UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
        | CAST(n AS BIGINT) AS n_entities,
        | round(CASE WHEN lag(n) OVER (ORDER BY stage_idx) IS NULL THEN 1.0
        |  ELSE CAST(n AS DOUBLE) / CAST(lag(n) OVER (ORDER BY stage_idx) AS DOUBLE)
        |  END, 6) AS conversion,
        | round(CAST(n AS DOUBLE) /
        |  CAST(first_value(n) OVER (ORDER BY stage_idx) AS DOUBLE), 6) AS overall
        |FROM c""".stripMargin,
    // a31's qualifying-timestamp chain with per-transition delays; stats
    // at millisecond rounding (engine percentile lerps differ in the
    // last ulp of µs-scale values — see Funnel.funnelTiming)
    "a45_funnel_timing" ->
      s"""WITH $FunnelChain,
        |d AS (
        | SELECT 1 AS idx, 'view->click' AS transition,
        |  epoch_us(s2.t) - epoch_us(s1.t) AS d_us
        | FROM s2 JOIN s1 USING (user_id)
        | UNION ALL
        | SELECT 2, 'click->purchase', epoch_us(s3.t) - epoch_us(s2.t)
        | FROM s3 JOIN s2 USING (user_id))
        |SELECT CAST(idx AS INTEGER) AS stage_idx, transition,
        | count(*) AS n_entities,
        | round(quantile_cont(d_us, 0.5) / CAST(1000000 AS DOUBLE), 3)
        |  AS median_secs,
        | round(quantile_cont(d_us, 0.9) / CAST(1000000 AS DOUBLE), 3)
        |  AS p90_secs
        |FROM d GROUP BY 1, 2""".stripMargin,
    // default ORDER BY frame = RANGE unbounded→current (ties summed
    // together on both engines); BIGINT weights so the cumsum is exact
    "a46_weighted_median" ->
      """WITH c AS (SELECT l_returnflag, l_extendedprice AS v,
        |  sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag
        |   ORDER BY l_extendedprice) AS cum,
        |  sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag)
        |   AS tot
        | FROM lineitem)
        |SELECT l_returnflag, min(v) AS weighted_median,
        | CAST(max(tot) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tot GROUP BY l_returnflag""".stripMargin,
    "a10_corr" ->
      """SELECT event_type, round(corr(value, hour(ts)), 6) AS corr
        |FROM events GROUP BY event_type""".stripMargin,
    "a11_corr_matrix" ->
      """WITH g AS (SELECT CAST(ts AS DATE) AS b, event_type AS k,
        |  avg(round(value * 100.0)) / 100.0 AS v
        | FROM events GROUP BY 1, 2)
        |SELECT a.k AS key_a, b2.k AS key_b, round(corr(a.v, b2.v), 6) AS corr
        |FROM g a JOIN g b2 ON a.b = b2.b GROUP BY 1, 2""".stripMargin,
    "a12_linear_trend" ->
      """SELECT event_type, round(regr_slope(value, hour(ts)), 6) AS slope,
        | round(regr_intercept(value, hour(ts)), 6) AS intercept
        |FROM events GROUP BY event_type""".stripMargin,
    "a13_pivot_wide" ->
      """SELECT CAST(ts AS DATE) AS date,
        | round(avg(round(value * 100.0)) FILTER (WHERE event_type = 'click') / 100.0, 6) AS click,
        | round(avg(round(value * 100.0)) FILTER (WHERE event_type = 'error') / 100.0, 6) AS error,
        | round(avg(round(value * 100.0)) FILTER (WHERE event_type = 'purchase') / 100.0, 6) AS purchase,
        | round(avg(round(value * 100.0)) FILTER (WHERE event_type = 'signup') / 100.0, 6) AS signup,
        | round(avg(round(value * 100.0)) FILTER (WHERE event_type = 'view') / 100.0, 6) AS view
        |FROM events GROUP BY 1""".stripMargin,
    // the debounce rule stated as the window it is: IS DISTINCT FROM the
    // previous row's watched value, first row always kept
    "p16_debounce" ->
      """WITH o AS (SELECT event_id, user_id, event_type,
        |  lag(event_type) OVER w AS pv, row_number() OVER w AS rn
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, event_type FROM o
        |WHERE rn = 1 OR event_type IS DISTINCT FROM pv""".stripMargin,
    // hop membership as in a34, exact windowed distinct
    "a35_window_distinct" ->
      """WITH e AS (SELECT user_id,
        |  time_bucket(INTERVAL '30 minutes', ts) AS b FROM events),
        |u AS (SELECT user_id, b AS w FROM e
        | UNION ALL SELECT user_id, b - INTERVAL '30 minutes' FROM e)
        |SELECT CAST(epoch(w) AS BIGINT) AS ws,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
        |FROM u GROUP BY 1""".stripMargin,
    // hopping membership stated directly: each event belongs to its
    // 30-min bucket's window and the one starting 30 min earlier
    "a34_hopping_window" ->
      """WITH e AS (SELECT event_type, value,
        |  time_bucket(INTERVAL '30 minutes', ts) AS b FROM events),
        |u AS (SELECT event_type, value, b AS w FROM e
        | UNION ALL SELECT event_type, value, b - INTERVAL '30 minutes' FROM e)
        |SELECT CAST(epoch(w) AS BIGINT) AS ws, event_type,
        | round(sum(value), 2) AS sum_value, count(*) AS cnt
        |FROM u GROUP BY 1, 2""".stripMargin,
    "a14_tumbling_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws,
        | round(sum(value), 2) AS sum_value, count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,
    "a18_sessions" ->
      """WITH o AS (SELECT user_id, ts, event_id, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events),
        |s AS (SELECT user_id, ts, value,
        |  sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL '1800 seconds'
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        | FROM o)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        | CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS session_start,
        | CAST(epoch(date_trunc('second', max(ts))) AS BIGINT) AS session_end,
        | count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "a15_power_curve_table" ->
      s"""WITH t AS (SELECT CAST(range AS BIGINT) AS id,
         |  CAST(range AS DOUBLE) * CAST(0.4 AS DOUBLE) AS v FROM range(0, 100))
         |SELECT id, round(CASE
         |  WHEN v < 3.0 OR v > 25.0 THEN 0.0
         |  WHEN v > 12.0 THEN 2500.0
         |  ELSE least((((((0.5 * 1.225) * CAST(${Power.RotorSweptAreaM2} AS DOUBLE)) * ((v * v) * v)) * 0.4) / 1000.0), 2500.0)
         | END, 4) AS power_kw
         |FROM t""".stripMargin,

    "j01_union" ->
      """WITH u AS (SELECT * FROM lineitem WHERE l_returnflag = 'A'
        | UNION ALL SELECT * FROM lineitem WHERE l_returnflag = 'R')
        |SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM u GROUP BY l_returnflag""".stripMargin,
    "j02_extend_columns" ->
      """SELECT value > 100 AS high, count(*) AS cnt, round(sum(value * 2.0), 2) AS sum_v2
        |FROM events GROUP BY 1""".stripMargin,
    "j03_broadcast_lookup" ->
      """SELECT e.event_type,
        | round(sum(round(e.value * d.weight * 1000.0)) / 1000.0, 2) AS weighted_sum,
        | count(*) AS cnt
        |FROM events e JOIN (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 5.0),
        | ('signup', 2.0), ('error', 0.0)) AS d(event_type, weight)
        | ON e.event_type = d.event_type
        |GROUP BY e.event_type""".stripMargin,
    "j04_aligned_join" ->
      """WITH p AS (SELECT CAST(ts AS DATE) AS date,
        |  round(avg(round(value * 100.0)) FILTER (WHERE event_type = 'click') / 100.0, 6) AS click,
        |  round(avg(round(value * 100.0)) FILTER (WHERE event_type = 'purchase') / 100.0, 6) AS purchase
        | FROM events GROUP BY 1)
        |SELECT * FROM p WHERE click IS NOT NULL AND purchase IS NOT NULL""".stripMargin,
    "j05_star_schema" ->
      """SELECT c_mktsegment, CAST(year(o_orderdate) AS INTEGER) AS year,
        | round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders,
        | count(DISTINCT o_custkey) AS n_cust
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "j06_source_diff" ->
      """WITH f AS (SELECT user_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events WHERE event_type IN ('click', 'view')),
        |l AS (SELECT user_id, event_type, value FROM f WHERE rn = 1)
        |SELECT a.user_id, 'Value' AS parameter, a.value AS api_value, r.value AS rt_value,
        | r.value - a.value AS difference
        |FROM l a JOIN l r ON a.user_id = r.user_id
        | AND a.event_type = 'click' AND r.event_type = 'view'""".stripMargin,
    "j07_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, max(value) AS purchase_value FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |j AS (SELECT c.event_id, c.user_id, c.ts, c.value,
        |  p.ts AS pts, p.purchase_value,
        |  row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts DESC) AS rn
        | FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts)
        |SELECT event_id, user_id,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t, value,
        | CAST(epoch(date_trunc('second', pts)) AS BIGINT) AS purchase_t,
        | purchase_value
        |FROM j WHERE rn = 1""".stripMargin,
    // Same oracle as j07_asof_join on purpose: the salted variant must be
    // row-identical to the unsalted as-of join.
    "j07_asof_salted" ->
      """WITH c AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, max(value) AS purchase_value FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |j AS (SELECT c.event_id, c.user_id, c.ts, c.value,
        |  p.ts AS pts, p.purchase_value,
        |  row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts DESC) AS rn
        | FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts)
        |SELECT event_id, user_id,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t, value,
        | CAST(epoch(date_trunc('second', pts)) AS BIGINT) AS purchase_t,
        | purchase_value
        |FROM j WHERE rn = 1""".stripMargin,
    "j07_asof_forward" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, max(value) AS purchase_value FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |j AS (SELECT c.event_id, c.user_id, c.ts, p.ts AS pts, p.purchase_value,
        |  row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts ASC) AS rn
        | FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts)
        |SELECT event_id, user_id,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
        | CAST(epoch(date_trunc('second', pts)) AS BIGINT) AS purchase_t,
        | purchase_value
        |FROM j WHERE rn = 1""".stripMargin,
    "j08_range_join" ->
      """WITH e AS (SELECT user_id, event_id AS error_id, ts AS error_ts,
        |  ts + INTERVAL '30 minutes' AS until_ts FROM events
        |  WHERE event_type = 'error'),
        |c AS (SELECT user_id, event_id AS click_id, ts FROM events
        |  WHERE event_type = 'click')
        |SELECT c.user_id, c.click_id, e.error_id
        |FROM c JOIN e ON c.user_id = e.user_id
        | AND c.ts >= e.error_ts AND c.ts <= e.until_ts""".stripMargin,

    "j11_scd2" ->
      """WITH g AS (
        |  SELECT user_id, ts, min(event_type) AS event_type
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2
        |), h AS (
        |  SELECT user_id, ts, event_type,
        |    (row_number() OVER w = 1 OR
        |     event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), c AS (
        |  SELECT user_id, event_type, ts AS valid_from FROM h WHERE chg
        |)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER w2 AS valid_to,
        |  lead(valid_from) OVER w2 IS NULL AS is_current
        |FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)""".stripMargin,
    "j10_salted_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "j09_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_orderkey IN
        | (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,

    "o01_rank_by_aggregate" ->
      """WITH g AS (SELECT event_type, round(sum(value), 2) AS total_value
        | FROM events GROUP BY event_type)
        |SELECT event_type, total_value,
        | CAST(rank() OVER (ORDER BY total_value DESC) AS INTEGER) AS rnk
        |FROM g""".stripMargin,
    "o02_time_order" ->
      "SELECT event_id FROM events ORDER BY ts, event_id LIMIT 20",
    "o03_rank_window" ->
      """WITH g AS (SELECT event_type, user_id, round(sum(value), 2) AS total
        | FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id, total, CAST(rn AS INTEGER) AS rn FROM (
        | SELECT event_type, user_id, total,
        |  row_number() OVER (PARTITION BY event_type ORDER BY total DESC, user_id DESC) AS rn
        | FROM g) WHERE rn <= 3""".stripMargin,

    "s01_kafka_roundtrip" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "s08_orc_roundtrip" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    // x18's component labels, winner = argmax(n_chars, tie min id) per
    // cluster; survivors = corpus minus the losers
    "x94_dedup_keep_best" ->
      s"""WITH RECURSIVE $NearDupChain,
         |pairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         | UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
         | UNION SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
         |lab AS (SELECT u, min(r) AS cid FROM reach GROUP BY u),
         |sc AS (SELECT u, cid, n_chars FROM lab
         | JOIN documents ON lab.u = documents.doc_id),
         |losers AS (SELECT u FROM (SELECT u,
         |  row_number() OVER (PARTITION BY cid ORDER BY n_chars DESC, u ASC) AS rn
         | FROM sc) WHERE rn > 1)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT u FROM losers)""".stripMargin,
    "s05_csv_roundtrip" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "s06_partitioned_parquet" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value,
        | count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type""".stripMargin,

    "x01_token_counts" ->
      s"""SELECT doc_id, CAST(len($Toks) AS INTEGER) AS n_tokens,
         | CAST(list_sum(list_transform($Toks,
         |  w -> CAST(greatest(ceil(length(w) / 4.0), 1) AS BIGINT))) AS BIGINT) AS n_subwords
         |FROM documents""".stripMargin,
    "x02_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents)
         |SELECT doc_id, $QualitySql AS quality
         |FROM t""".stripMargin,
    "x03_lang_id" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |sc AS (SELECT doc_id,
         | CAST(len(list_filter(toks, w -> list_contains(['der','die','und','nicht','das'], w))) AS INTEGER) AS score_de,
         | CAST(len(list_filter(toks, w -> list_contains(['the','a','and','is','of'], w))) AS INTEGER) AS score_en,
         | CAST(len(list_filter(toks, w -> list_contains(['el','la','que','los','una'], w))) AS INTEGER) AS score_es,
         | CAST(len(list_filter(toks, w -> list_contains(['le','la','et','les','une'], w))) AS INTEGER) AS score_fr,
         | CAST(len(list_filter(toks, w -> list_contains(['的','是','了','在','我'], w))) AS INTEGER) AS score_zh
         | FROM t)
         |SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
         | CASE WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
         |  WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
         |  WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
         |  WHEN score_fr >= score_zh THEN 'fr' ELSE 'zh' END AS detected_lang
         |FROM sc""".stripMargin,
    "x04_exact_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
        | FROM documents)
        |SELECT doc_id, fingerprint,
        | min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
        | doc_id <> min(doc_id) OVER (PARTITION BY fingerprint) AS is_duplicate
        |FROM fp""".stripMargin,
    "x05_minhash_signature" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |g AS (SELECT doc_id, $DistinctGrams AS grams FROM t)
         |SELECT doc_id,
         | list_min(list_transform(grams, x -> substring(md5(x), 1, 8))) AS sig0,
         | list_min(list_transform(grams, x -> substring(md5(x), 9, 8))) AS sig1,
         | list_min(list_transform(grams, x -> substring(md5(x), 17, 8))) AS sig2,
         | list_min(list_transform(grams, x -> substring(md5(x), 25, 8))) AS sig3
         |FROM g""".stripMargin,
    "x06_near_duplicates" ->
      s"""WITH $NearDupChain
         |SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.3""".stripMargin,
    // the wide chain differs only in signature width and band count; the
    // verify stage is the same exact Jaccard, so a hash match here proves
    // the seeded kernel and the generalized banding end to end
    "x51_neardup_wide" ->
      s"""WITH ${nearDupChainSql(8, 2)}
         |SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.3""".stripMargin,
    // the x27 survivors rule (reachability-min over the near-dup graph)
    // grouped by source; shares mirror the Spark division tree at round 6
    // per-row norms via the same sequential list_dot_product kernel the
    // cosine mirrors use; mean norm in micro-units (fixed-point, exact);
    // the %97 zeroing mirrors the Spark fixture
    "x91_embedding_qa" ->
      """WITH v AS (SELECT CAST(label AS BIGINT) AS label,
        |  CASE WHEN vec_id % 97 = 0
        |   THEN list_transform(embedding, x -> CAST(0.0 AS DOUBLE))
        |   ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS ve,
        |  CAST(len(embedding) AS INTEGER) AS d
        | FROM embeddings),
        |n AS (SELECT label, sqrt(list_dot_product(ve, ve)) AS nrm, d FROM v)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        | CAST(count(CASE WHEN nrm = 0.0 THEN 1 END) AS BIGINT) AS n_zero,
        | CAST(count(CASE WHEN nrm IS NULL THEN 1 END) AS BIGINT) AS n_bad,
        | CAST(count(DISTINCT d) AS BIGINT) AS n_dims_distinct,
        | round((sum(round(nrm * 1000000.0)) / 1000000.0) / count(*), 6) AS mean_norm,
        | round(min(nrm), 6) AS min_norm, round(max(nrm), 6) AS max_norm
        |FROM n GROUP BY label""".stripMargin,
    // (source, term) counts once; corpus counts/totals re-aggregate that
    // frame; the per-term ratio tree mirrors the Spark association order
    "x92_source_divergence" ->
      s"""WITH st AS (SELECT source, unnest($Toks) AS term FROM documents),
         |c AS (SELECT source, term, count(*) AS cnt FROM st GROUP BY source, term),
         |ct AS (SELECT term, sum(cnt) AS cc FROM c GROUP BY term),
         |stot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS stn FROM c GROUP BY source),
         |ctot AS (SELECT sum(cnt) AS ctn FROM c)
         |SELECT c.source, stot.stn AS n_tokens,
         | round(sum((CAST(cnt AS DOUBLE) / CAST(stn AS DOUBLE)) *
         |  ln((CAST(cnt AS DOUBLE) / CAST(stn AS DOUBLE)) /
         |   (CAST(cc AS DOUBLE) / CAST(ctn AS DOUBLE)))), 6) AS kl
         |FROM c JOIN ct USING (term) JOIN stot USING (source) CROSS JOIN ctot
         |GROUP BY c.source, stot.stn""".stripMargin,
    // the three shared chains composed: quality gate (QualityRuleChain +
    // PassesAll) → near-dup CC survivors over the GATED corpus
    // (nearDupChainSql with src = the gated CTE) → datacard aggregation
    "x110_pipeline_e2e" ->
      s"""WITH RECURSIVE $QualityRuleChainSql,
         |gated AS (SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
         | FROM documents d JOIN r ON d.doc_id = r.doc_id
         | WHERE $PassesAllSql),
         |${nearDupChainSql(4, 2, "gated")},
         |pairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         | UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
         | UNION SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
         |dropped AS (SELECT u FROM (SELECT u, min(r) AS mr FROM reach GROUP BY u)
         | WHERE u <> mr),
         |released AS (SELECT * FROM gated
         | WHERE doc_id NOT IN (SELECT u FROM dropped))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         | CAST(sum(n_chars) AS BIGINT) AS total_chars,
         | CAST(sum(ntok) AS BIGINT) AS total_tokens,
         | round(CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |  AS avg_tokens,
         | round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |  AS exact_dup_rate
         |FROM (SELECT lang, source, n_chars, CAST(len($Toks) AS BIGINT) AS ntok,
         |  md5(text) AS h FROM released)
         |GROUP BY lang""".stripMargin,
    // heaviest keys + max/mean skew ratio over the aggregated key frame
    // p16's change-point rule + lead-closed validity ranges
    "j12_scd2_dim" ->
      """WITH o AS (SELECT event_id, user_id, event_type, ts,
        |  lag(event_type) OVER w AS pv, row_number() OVER w AS rn
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT user_id, event_type, ts, event_id FROM o
        | WHERE rn = 1 OR event_type IS DISTINCT FROM pv)
        |SELECT user_id, event_type,
        | CAST(epoch_us(ts) AS BIGINT) AS ef_us,
        | CAST(epoch_us(lead(ts) OVER w2) AS BIGINT) AS et_us,
        | (lead(ts) OVER w2 IS NULL) AS is_current,
        | CAST(row_number() OVER w2 AS BIGINT) AS version
        |FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    // the overlap join's oracle IS the naive theta join — small data can
    // afford what the bucketed rewrite exists to avoid
    "j11_overlap_join" ->
      """WITH sp AS (SELECT CAST(ts AS DATE) AS day, user_id,
        |  min(ts) AS ls, max(ts) AS le FROM events GROUP BY 1, 2),
        |d AS (SELECT DISTINCT day FROM sp),
        |w AS (SELECT day, 1 AS window_id,
        |  CAST(day AS TIMESTAMP) + INTERVAL 2 HOUR AS ws,
        |  CAST(day AS TIMESTAMP) + INTERVAL 6 HOUR AS we FROM d
        | UNION ALL
        | SELECT day, 2, CAST(day AS TIMESTAMP) + INTERVAL 14 HOUR,
        |  CAST(day AS TIMESTAMP) + INTERVAL 18 HOUR FROM d)
        |SELECT sp.day, user_id, CAST(window_id AS BIGINT) AS window_id,
        | CAST(epoch_us(greatest(ls, ws)) AS BIGINT) AS overlap_start_us,
        | CAST(epoch_us(least(le, we)) AS BIGINT) AS overlap_end_us,
        | CAST(epoch_us(least(le, we)) - epoch_us(greatest(ls, ws)) AS BIGINT)
        |  AS overlap_us
        |FROM sp JOIN w ON sp.day = w.day AND ls <= we AND ws <= le""".stripMargin,
    "p20_disorder_audit" ->
      """WITH o AS (SELECT epoch_us(ts) AS us,
        |  max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        | FROM events),
        |l AS (SELECT greatest(coalesce(pmax - us, 0), 0) AS late_us FROM o)
        |SELECT count(*) AS n_events,
        | CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_late,
        | round(CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |  / CAST(count(*) AS DOUBLE), 6) AS disorder_pct,
        | max(late_us) AS max_late_us,
        | round(quantile_cont(late_us, 0.95) / CAST(1000000 AS DOUBLE), 3)
        |  AS p95_late_secs
        |FROM l""".stripMargin,
    "p19_key_skew" ->
      """WITH c AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
        | FROM events GROUP BY user_id),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS nk,
        |  CAST(sum(cnt) AS BIGINT) AS tot, CAST(max(cnt) AS BIGINT) AS mx
        | FROM c)
        |SELECT CAST(rnk AS INTEGER) AS rnk, key, cnt,
        | round(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
        | round(CAST(mx AS DOUBLE) / (CAST(tot AS DOUBLE) / CAST(nk AS DOUBLE)), 6)
        |  AS skew_ratio
        |FROM (SELECT key, cnt, row_number() OVER (
        |  ORDER BY cnt DESC, key ASC) AS rnk FROM c) CROSS JOIN st
        |WHERE rnk <= 10""".stripMargin,
    // per-user lagged state pairs → |states|² aggregate + row-conditional
    // probabilities
    // ISO-Monday week truncs in both engines; offsets exact day-diff // 7
    "a44_cohort_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
        | FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS period
        | FROM events),
        |c AS (SELECT f.cohort,
        |  datediff('day', CAST(f.cohort AS DATE), CAST(a.period AS DATE)) // 7
        |   AS week_offset,
        |  count(*) AS active_users
        | FROM a JOIN f USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY 1)
        |SELECT CAST(epoch(c.cohort) AS BIGINT) AS cohort_ws, week_offset,
        | active_users, s.cohort_size,
        | round(CAST(100 AS DOUBLE) * active_users / s.cohort_size, 4)
        |  AS retention_pct
        |FROM c JOIN s USING (cohort)""".stripMargin,
    "a43_transition_matrix" ->
      """WITH o AS (SELECT event_type AS s,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |   AS prev
        | FROM events),
        |p AS (SELECT prev AS from_state, s AS to_state,
        |  CAST(count(*) AS BIGINT) AS cnt
        | FROM o WHERE prev IS NOT NULL GROUP BY prev, s),
        |ft AS (SELECT from_state, CAST(sum(cnt) AS BIGINT) AS ftot
        | FROM p GROUP BY from_state)
        |SELECT p.from_state, to_state, cnt,
        | round(CAST(cnt AS DOUBLE) / CAST(ftot AS DOUBLE), 6) AS prob
        |FROM p JOIN ft ON p.from_state = ft.from_state""".stripMargin,
    // exact interpolated percentile bounds (a08 quantile_cont parity),
    // per-row clip mirrored
    "p18_winsorize" ->
      """WITH b AS (SELECT event_type AS g,
        |  quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
        | FROM events GROUP BY event_type)
        |SELECT event_id, event_type,
        | round(least(greatest(value, lo), hi), 6) AS clipped,
        | (value < lo OR value > hi) AS was_clipped
        |FROM events JOIN b ON event_type = g""".stripMargin,
    // consecutive decreases per key; drop magnitudes are per-row exact
    "a42_counter_monotonic" ->
      """WITH o AS (SELECT user_id, value,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |   - value AS drop
        | FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        | CAST(count(CASE WHEN drop > 0.0 THEN 1 END) AS BIGINT) AS n_decreases,
        | round(max(CASE WHEN drop > 0.0 THEN drop END), 6) AS max_drop,
        | (count(CASE WHEN drop > 0.0 THEN 1 END) = 0) AS monotone
        |FROM o GROUP BY user_id""".stripMargin,
    // n·σ quantized to micro-units before the denominator sum (x61
    // construction); σ rounds 6 first on both sides
    "x109_neyman_alloc" ->
      """WITH per AS (SELECT event_type AS stratum,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(stddev_samp(value), 6) AS sd FROM events GROUP BY event_type),
        |pw AS (SELECT stratum, n, sd,
        |  coalesce(round(CAST(n AS DOUBLE) * sd * 1000000.0), 0.0) AS pw
        | FROM per),
        |den AS (SELECT sum(pw) AS den FROM pw)
        |SELECT stratum, n, sd, round(pw / den, 6) AS weight,
        | round(CAST(1000 AS DOUBLE) * (pw / den), 6) AS alloc
        |FROM pw CROSS JOIN den""".stripMargin,
    // centi-quantized value × integer-ms hold interval; both sums exact
    "a41_time_weighted" ->
      """WITH o AS (SELECT event_type, value, epoch_us(ts) AS us,
        |  lead(epoch_us(ts)) OVER (PARTITION BY event_type
        |    ORDER BY ts, event_id) AS nus
        | FROM events),
        |d AS (SELECT event_type, value, (nus - us) // 1000 AS dt_ms
        | FROM o WHERE nus IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
        | CAST(sum(dt_ms) AS BIGINT) AS total_ms,
        | round(sum(round(value * 100) * dt_ms) / sum(dt_ms) / 100.0, 6)
        |  AS tw_mean
        |FROM d GROUP BY event_type""".stripMargin,
    // sub-k (lang, source, len-bucket) classes stated directly
    "x107_k_anonymity" ->
      """SELECT lang, source,
        | CAST(floor(n_chars / 128) AS BIGINT) AS len_bucket,
        | CAST(count(*) AS BIGINT) AS class_size
        |FROM documents GROUP BY lang, source, floor(n_chars / 128)
        |HAVING count(*) < 5""".stripMargin,
    // x17's assignment chain joined to ground-truth labels; per-cluster
    // majority via the ranked window (count desc, label asc)
    "x105_cluster_purity" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id % 50 = 0),
         |asg AS (SELECT vec_id, cid FROM (
         | SELECT v.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c) WHERE rn = 1),
         |lab AS (SELECT a.cid, CAST(e.label AS BIGINT) AS lab
         | FROM asg a JOIN embeddings e ON a.vec_id = e.vec_id),
         |cl AS (SELECT cid, lab, CAST(count(*) AS BIGINT) AS c
         | FROM lab GROUP BY cid, lab),
         |best AS (SELECT cid, lab, c,
         |  row_number() OVER (PARTITION BY cid ORDER BY c DESC, lab ASC) AS rn,
         |  CAST(sum(c) OVER (PARTITION BY cid) AS BIGINT) AS n FROM cl)
         |SELECT cid AS centroid_id, n AS n_vecs, lab AS majority_label,
         | c AS n_majority, round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS purity
         |FROM best WHERE rn = 1""".stripMargin,
    // full bucket×side grid from the margins (zero-observed cells count);
    // the per-cell term mirrors the Spark tree
    "x106_split_chisq" ->
      s"""WITH b AS (SELECT least(CAST(floor(CAST(n_chars AS DOUBLE) / 64.0)
         |   AS BIGINT), 8) AS bucket,
         |  CAST(${bucketSql("doc_id", "chisq")} < 5000 AS INTEGER) AS side
         | FROM documents),
         |obs AS (SELECT bucket, side, CAST(count(*) AS BIGINT) AS o
         | FROM b GROUP BY bucket, side),
         |rt AS (SELECT bucket, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY bucket),
         |ct AS (SELECT side, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY side),
         |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
         |cells AS (SELECT rt.bucket, ct.side,
         |  CAST(coalesce(obs.o, 0) AS DOUBLE) AS o,
         |  CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(nn.n AS DOUBLE) AS e,
         |  nn.n AS n
         | FROM rt CROSS JOIN ct CROSS JOIN nn
         | LEFT JOIN obs ON rt.bucket = obs.bucket AND ct.side = obs.side)
         |SELECT round(sum(((o - e) * (o - e)) / e), 6) AS chi2,
         | CAST(count(DISTINCT bucket) - 1 AS BIGINT) AS df,
         | CAST(max(n) AS BIGINT) AS n
         |FROM cells""".stripMargin,
    // exhaustive truth over the SAME sampled gram frame the chain builds
    // (g), production chain as `scored`; per-band recall. The dial CTE
    // mirrors Dedup.bucketsForTargetRows bit-for-bit: ceiling division as
    // BIGINT floor division ((t·B + n − 1) // n), clamped to [1, B]
    "x104_neardup_recall" ->
      s"""WITH dial AS (SELECT greatest(CAST(1 AS BIGINT),
         |  least(CAST(${graft.sampling.Sampling.Buckets} AS BIGINT),
         |   (CAST(${SparkEntry.RecallTargetRows} AS BIGINT)
         |     * ${graft.sampling.Sampling.Buckets}
         |     + greatest(count(*), 1) - 1) // greatest(count(*), 1)))
         |  AS nb FROM documents),
         |samp AS (SELECT doc_id, text FROM documents
         | WHERE ${bucketSql("doc_id", "ndrecall")} < (SELECT nb FROM dial)),
         |${nearDupChainSql(4, 2, "samp")},
         |found AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
         |truth AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
         |   greatest(CAST(len(a.grams) + len(b.grams) AS DOUBLE)
         |    - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE), 1.0), 6)
         |   AS jaccard
         | FROM g a JOIN g b ON a.doc_id < b.doc_id),
         |tt AS (SELECT doc_a, doc_b, jaccard FROM truth WHERE jaccard >= 0.3)
         |SELECT CAST(least(CAST(floor(jaccard / 0.2) AS INTEGER), 4)
         |  AS INTEGER) AS band,
         | CAST(count(*) AS BIGINT) AS n_truth,
         | CAST(count(f.doc_a) AS BIGINT) AS n_found,
         | round(CAST(count(f.doc_a) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |  AS recall
         |FROM tt LEFT JOIN found f USING (doc_a, doc_b)
         |GROUP BY least(CAST(floor(jaccard / 0.2) AS INTEGER), 4)""".stripMargin,
    // a34's hop membership + per-window ranking (count desc, type asc)
    "a40_trending" ->
      """WITH e AS (SELECT event_type,
        |  time_bucket(INTERVAL '30 minutes', ts) AS b FROM events),
        |u AS (SELECT event_type, b AS w FROM e
        | UNION ALL SELECT event_type, b - INTERVAL '30 minutes' FROM e),
        |c AS (SELECT w, event_type, CAST(count(*) AS BIGINT) AS cnt
        | FROM u GROUP BY w, event_type)
        |SELECT CAST(epoch(w) AS BIGINT) AS ws, event_type, cnt,
        | CAST(rnk AS INTEGER) AS rnk
        |FROM (SELECT w, event_type, cnt, row_number() OVER (
        |  PARTITION BY w ORDER BY cnt DESC, event_type ASC) AS rnk FROM c)
        |WHERE rnk <= 3""".stripMargin,
    // the shared QualityRuleChain pass flag joined to source; the z
    // arithmetic mirrors the Spark tree (pooled two-proportion test)
    "x103_gate_bias" -> {
      val z = """((CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE))
        |   - ((CAST(kk AS DOUBLE) - CAST(n_pass AS DOUBLE))
        |      / (CAST(nn AS DOUBLE) - CAST(n_docs AS DOUBLE))))
        |  / sqrt((CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))
        |   * (1.0 - (CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)))
        |   * (1.0 / CAST(n_docs AS DOUBLE)
        |      + 1.0 / (CAST(nn AS DOUBLE) - CAST(n_docs AS DOUBLE))))"""
        .stripMargin
      val den = """(CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))
        |   * (1.0 - (CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)))
        |   * (1.0 / CAST(n_docs AS DOUBLE)
        |      + 1.0 / (CAST(nn AS DOUBLE) - CAST(n_docs AS DOUBLE)))"""
        .stripMargin
      s"""WITH $QualityRuleChainSql,
         |p AS (SELECT doc_id, $PassesAllSql AS passes FROM r),
         |j AS (SELECT d.source, p.passes FROM documents d JOIN p USING (doc_id)),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(CASE WHEN passes THEN 1 END) AS BIGINT) AS n_pass
         | FROM j GROUP BY source),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
         |  CAST(sum(n_pass) AS BIGINT) AS kk FROM per)
         |SELECT source, n_docs, n_pass,
         | round(CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS pass_rate,
         | round(CASE WHEN nn > n_docs THEN
         |   CASE WHEN $den > 0.0 THEN $z END END, 6) AS z
         |FROM per CROSS JOIN tot""".stripMargin
    },
    // the closed-form water level stated with the same windows: exclusive
    // prefix sums over (cap, key) order, one valid segment, 1-row level
    "x102_water_fill" -> {
      val b = SparkEntry.TokenBudget
      s"""WITH c AS (SELECT source AS key, CAST(sum(len($Toks)) AS BIGINT) AS cap
         | FROM documents GROUP BY source),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(cap) AS BIGINT) AS tot FROM c),
         |r AS (SELECT key, cap,
         |  CAST(coalesce(sum(cap) OVER (ORDER BY cap, key
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p,
         |  CAST(row_number() OVER (ORDER BY cap, key) AS BIGINT) AS i,
         |  CAST(coalesce(lag(cap) OVER (ORDER BY cap, key), 0) AS BIGINT) AS prev
         | FROM c),
         |lv AS (SELECT max((CAST($b AS DOUBLE) - CAST(p AS DOUBLE))
         |   / CAST(n - i + 1 AS DOUBLE)) AS l
         | FROM r CROSS JOIN t
         | WHERE tot > $b
         |  AND (CAST($b AS DOUBLE) - CAST(p AS DOUBLE)) / CAST(n - i + 1 AS DOUBLE)
         |   >= CAST(prev AS DOUBLE)
         |  AND (CAST($b AS DOUBLE) - CAST(p AS DOUBLE)) / CAST(n - i + 1 AS DOUBLE)
         |   < CAST(cap AS DOUBLE))
         |SELECT key AS source, cap AS cap_tokens,
         | round(CASE WHEN l IS NULL THEN CAST(cap AS DOUBLE)
         |  ELSE least(CAST(cap AS DOUBLE), l) END, 6) AS allocation,
         | (l IS NULL OR CAST(cap AS DOUBLE) <= l) AS saturated
         |FROM c CROSS JOIN lv""".stripMargin
    },
    // strict local maxima: both neighbors exist and are smaller
    "a39_peaks" ->
      """WITH o AS (SELECT event_id, event_type, value,
        |  lag(value) OVER w AS pv, lead(value) OVER w AS nv
        | FROM events
        | WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
        |SELECT event_id, event_type, value
        |FROM o WHERE pv IS NOT NULL AND nv IS NOT NULL
        | AND value > pv AND value > nv AND value >= 200.0""".stripMargin,
    // train counts from the hash-bucket split, Laplace (cnt+1)/(total+V),
    // eval tokens left-joined; the per-token -ln tree mirrors Spark
    "x101_heldout_surprise" ->
      s"""WITH tk AS (SELECT doc_id, ${bucketSql("doc_id", "heldout")} AS b,
         |  unnest($Toks) AS term FROM documents),
         |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tk
         | WHERE b < 8000 GROUP BY term),
         |sc AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
         |  CAST(count(*) AS BIGINT) AS v FROM tc)
         |SELECT doc_id,
         | round(avg(-ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE) /
         |   CAST(total + v AS DOUBLE))), 6) AS surprise,
         | CAST(count(*) AS BIGINT) AS n_tokens,
         | CAST(count(CASE WHEN cnt IS NULL THEN 1 END) AS BIGINT) AS n_oov
         |FROM tk LEFT JOIN tc USING (term) CROSS JOIN sc
         |WHERE b >= 8000 GROUP BY doc_id""".stripMargin,
    // per-doc md5-slice minima (the nearDupChain sig construction, 8
    // hashes) → per-source element-wise min → pairwise match fraction
    "x100_source_overlap_est" -> {
      val sigExprs = (0 until 8).map { i =>
        val g = i / 4
        val sl = i % 4
        val arg = if (g == 0) "x" else s"'$g:' || x"
        s"list_min(list_transform(grams, x -> substring(md5($arg), ${sl * 8 + 1}, 8))) AS s$i"
      }.mkString(",\n ")
      val mins = (0 until 8).map(i => s"min(s$i) AS s$i").mkString(", ")
      val matches = (0 until 8)
        .map(i => s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH t AS (SELECT source, $Toks AS toks FROM documents),
         |g AS (SELECT source, $DistinctGrams AS grams FROM t),
         |sd AS (SELECT source,
         | $sigExprs
         | FROM g),
         |ss AS (SELECT source, $mins FROM sd GROUP BY source)
         |SELECT a.source AS source_a, b.source AS source_b,
         | CAST($matches AS INTEGER) AS n_matching,
         | round(CAST($matches AS DOUBLE) / 8.0, 6) AS est_jaccard
         |FROM ss a JOIN ss b ON a.source < b.source""".stripMargin
    },
    // the a18 gaps-and-islands chain (same strict-> boundary — verified
    // against session_window's merge behavior in TemporalSpec) with
    // session_window's reported end = last event + gap
    "a38_session_window" ->
      """WITH o AS (SELECT user_id, ts, event_id, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events),
        |s AS (SELECT user_id, ts, value,
        |  sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL '1800 seconds'
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM o)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        | epoch_us(max(ts) + INTERVAL '1800 seconds') AS session_end_us,
        | count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // x52's slice-unnest bigrams, space-joined, per-source ranked window
    "x99_source_signatures" ->
      s"""WITH t AS (SELECT source, $Toks AS toks FROM documents),
         |b AS (SELECT source, unnest(toks[1:len(toks) - 1]) || ' ' ||
         |   unnest(toks[2:len(toks)]) AS bigram
         | FROM t WHERE len(toks) >= 2),
         |c AS (SELECT source, bigram, CAST(count(*) AS BIGINT) AS cnt
         | FROM b GROUP BY source, bigram)
         |SELECT source, bigram, cnt, CAST(rnk AS INTEGER) AS rnk
         |FROM (SELECT source, bigram, cnt, row_number() OVER (
         |  PARTITION BY source ORDER BY cnt DESC, bigram ASC) AS rnk FROM c)
         |WHERE rnk <= 5""".stripMargin,
    // per-relation child/orphan counts; NOT IN is safe here because the
    // parent key columns carry no nulls in this schema
    "j14_ref_integrity" ->
      """SELECT 'lineitem->orders' AS relation,
        | (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
        | (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans
        |UNION ALL SELECT 'orders->customer',
        | (SELECT CAST(count(*) AS BIGINT) FROM orders),
        | (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |UNION ALL SELECT 'customer->nation',
        | (SELECT CAST(count(*) AS BIGINT) FROM customer),
        | (SELECT CAST(count(*) AS BIGINT) FROM customer
        |   WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
        |UNION ALL SELECT 'nation->region',
        | (SELECT CAST(count(*) AS BIGINT) FROM nation),
        | (SELECT CAST(count(*) AS BIGINT) FROM nation
        |   WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region))
        |UNION ALL SELECT 'lineitem->orders_even',
        | (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        | (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
        |     WHERE o_orderkey % 2 = 0))""".stripMargin,
    // centi-quantized prefix sums (a25 construction) → closed-form split
    // score per row, mirrored association → argmax by (score desc, idx)
    "a37_changepoint" ->
      """WITH q AS (SELECT event_type AS k, ts, event_id,
        |  round(value * 100) AS vq FROM events),
        |s AS (SELECT k, ts, vq,
        |  sum(vq) OVER w AS s, count(*) OVER w AS i,
        |  sum(vq) OVER p AS tot, count(*) OVER p AS n
        | FROM q
        | WINDOW w AS (PARTITION BY k ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  p AS (PARTITION BY k)),
        |sc AS (SELECT k, i AS split_idx, ts AS split_ts, n,
        |  ((CAST(i AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))
        |    / CAST(n AS DOUBLE)) *
        |   (s / CAST(i AS DOUBLE) - (tot - s) / (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))) *
        |   (s / CAST(i AS DOUBLE) - (tot - s) / (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))))
        |   / (100.0 * 100.0) AS score
        | FROM s WHERE n >= 2 AND i < n)
        |SELECT k AS event_type, CAST(split_idx AS BIGINT) AS split_idx,
        | CAST(epoch_us(split_ts) AS BIGINT) AS split_t_us,
        | CAST(n AS BIGINT) AS n, round(score, 6) AS score
        |FROM (SELECT *, row_number() OVER (PARTITION BY k
        |   ORDER BY score DESC, split_idx ASC) AS rn FROM sc)
        |WHERE rn = 1""".stripMargin,
    // distinct (source, gram) sets with the same df cap on both sides;
    // sizes measured on the capped frame so the Jaccard is consistent
    "x98_source_overlap" ->
      s"""WITH t AS (SELECT source, $Toks AS toks FROM documents),
         |g AS (SELECT DISTINCT source, unnest(${distinctGramsSql(8)}) AS gram FROM t),
         |gc AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
         |k AS (SELECT g.source, g.gram FROM g JOIN gc USING (gram)
         | WHERE c <= 1000),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM k
         | GROUP BY source),
         |i AS (SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(count(*) AS BIGINT) AS ni
         | FROM k a JOIN k b ON a.gram = b.gram AND a.source < b.source
         | GROUP BY a.source, b.source)
         |SELECT source_a, source_b, ni AS n_shared_grams,
         | round(CAST(ni AS DOUBLE) / CAST(na.n + nb.n - ni AS DOUBLE), 6)
         |  AS jaccard
         |FROM i JOIN sz na ON i.source_a = na.source
         | JOIN sz nb ON i.source_b = nb.source""".stripMargin,
    // distinct (user, type) baskets; lift = exact integer counts until
    // one final double ratio mirroring the Spark association order
    // mirrors itemAffinity's enforced basket cap (default 256, salted-hash
    // + item tiebreak) so the two engines cannot diverge on a corpus with
    // a >256-item basket; a no-op at this fixture's ~8 event types
    "a36_type_affinity" ->
      s"""WITH ei0 AS (SELECT DISTINCT user_id AS e, event_type AS item
        | FROM events),
        |eir AS (SELECT e, item, row_number() OVER (PARTITION BY e
        |  ORDER BY ${hashKeySql("item",
             graft.analytics.Distribution.AffinitySalt)} ASC, item ASC) AS rn
        | FROM ei0),
        |ei AS (SELECT e, item FROM eir
        | WHERE rn <= ${graft.analytics.Distribution.DefaultMaxBasket}),
        |tot AS (SELECT CAST(count(DISTINCT e) AS BIGINT) AS nn FROM ei),
        |per AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM ei
        | GROUP BY item),
        |co AS (SELECT a.item AS item_a, b.item AS item_b,
        |  CAST(count(*) AS BIGINT) AS n_both
        | FROM ei a JOIN ei b ON a.e = b.e AND a.item < b.item
        | GROUP BY a.item, b.item)
        |SELECT item_a, item_b, n_both,
        | round((CAST(n_both AS DOUBLE) * CAST(nn AS DOUBLE)) /
        |  (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS lift
        |FROM co JOIN per ca ON co.item_a = ca.item
        | JOIN per cb ON co.item_b = cb.item CROSS JOIN tot""".stripMargin,
    // x03's marker-argmax chain joined to the ground-truth label, then
    // the |langs|² cell aggregate with per-actual recall
    "x97_lang_confusion" ->
      s"""WITH $LangDetectChain,
         |j AS (SELECT lang AS actual, predicted
         | FROM documents JOIN d USING (doc_id)),
         |pa AS (SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
         | FROM j GROUP BY actual, predicted),
         |tot AS (SELECT actual, sum(n) AS tn FROM pa GROUP BY actual)
         |SELECT actual, predicted, n,
         | round(CAST(n AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS recall
         |FROM pa JOIN tot USING (actual)""".stripMargin,
    // the cap rule stated as the naive window: smallest (hash, id) per
    // source — the heap implementation must agree row-for-row
    "x96_group_cap" ->
      s"""SELECT doc_id, source FROM (
         | SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |   ORDER BY ${hashKeySql("doc_id", "cap")} ASC, doc_id ASC) AS rn
         | FROM documents) WHERE rn <= 15""".stripMargin,
    // parallel slice-unnest bigrams (x52 pattern) keyed by source; the
    // bigram distinct key is the same RS-joined string as the Spark side
    "x93_ngram_diversity" ->
      s"""WITH t AS (SELECT source, $Toks AS toks FROM documents),
         |u AS (SELECT source, unnest(toks) AS term FROM t),
         |us AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT term) AS BIGINT) AS n_distinct_tokens
         | FROM u GROUP BY source),
         |b AS (SELECT source, unnest(toks[1:len(toks) - 1]) || chr(30) ||
         |   unnest(toks[2:len(toks)]) AS bg
         | FROM t WHERE len(toks) >= 2),
         |bs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct_bigrams
         | FROM b GROUP BY source)
         |SELECT us.source, n_tokens, n_distinct_tokens,
         | round(CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         |  AS uni_diversity,
         | coalesce(n_bigrams, 0) AS n_bigrams,
         | coalesce(n_distinct_bigrams, 0) AS n_distinct_bigrams,
         | CASE WHEN n_bigrams > 0
         |  THEN round(CAST(n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6)
         |  END AS bi_diversity
         |FROM us LEFT JOIN bs ON us.source = bs.source""".stripMargin,
    // the x01 token/subword kernels restated per row, then one per-lang
    // aggregate; ratios of exact integer sums, round-6 on both sides
    "x90_token_fertility" ->
      s"""WITH d AS (SELECT lang, n_chars AS nc,
         |  CAST(len($Toks) AS BIGINT) AS w,
         |  CAST(list_sum(list_transform($Toks,
         |   t -> CAST(greatest(ceil(length(t) / 4.0), 1) AS BIGINT))) AS BIGINT) AS sw
         | FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(w) AS BIGINT) AS n_words,
         | CAST(sum(sw) AS BIGINT) AS n_subwords,
         | round(CAST(sum(sw) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6) AS fertility,
         | round(CAST(sum(nc) AS DOUBLE) / CAST(sum(sw) AS DOUBLE), 6)
         |  AS chars_per_subword
         |FROM d GROUP BY lang""".stripMargin,
    // per-column stats stated as one UNION ALL branch per column; dtype
    // literals mirror Spark's simpleString for the normalized events
    // schema (ts arrives as TIMESTAMP via Tables.events)
    "p15_profile" -> {
      val cols = Seq("event_id" -> "bigint", "ts" -> "timestamp",
        "user_id" -> "bigint", "event_type" -> "string",
        "value" -> "double", "props" -> "string")
      cols.map { case (c, t) =>
        s"""SELECT '$c' AS "column", '$t' AS dtype,
           | CAST(count(*) AS BIGINT) AS n_rows,
           | CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           | CAST(min($c) AS VARCHAR) AS min_value,
           | CAST(max($c) AS VARCHAR) AS max_value FROM events"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
    },
    // the a26 gap rule rolled up per key in exact integer micros; the
    // ratio is the only double and rounds identically on both sides
    "a33_availability" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS us,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id) AS dt
        | FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        | CAST(max(us) - min(us) AS BIGINT) AS span_us,
        | CAST(count(CASE WHEN dt > 21600000000 THEN 1 END) AS BIGINT) AS n_gaps,
        | CAST(coalesce(sum(CASE WHEN dt > 21600000000 THEN dt END), 0) AS BIGINT)
        |  AS downtime_us,
        | CASE WHEN max(us) - min(us) > 0 THEN
        |  round(1.0 - CAST(coalesce(sum(CASE WHEN dt > 21600000000 THEN dt END), 0)
        |    AS DOUBLE) / CAST(max(us) - min(us) AS DOUBLE), 6) END AS availability
        |FROM o GROUP BY user_id""".stripMargin,
    // the Q5 join stated flat; per-row revenue quantized to 1e-4 before
    // the sum (integer-valued → merge-order-exact on both sides)
    "j13_region_revenue" ->
      """SELECT n_name,
        | sum(round(l_extendedprice * (1 - l_discount) * 10000)) / 10000 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        | AND o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    // backward and forward candidates picked independently (the j07
    // rule each way), then the nearer wins; exact-µs distances, ties to
    // the past — the CASE mirrors the Spark pick expression
    "j12_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, max(value) AS pv FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |b AS (SELECT event_id, pts, pv FROM (
        | SELECT c.event_id, p.ts AS pts, p.pv,
        |  row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts DESC) AS rn
        | FROM c JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts) WHERE rn = 1),
        |f AS (SELECT event_id, pts, pv FROM (
        | SELECT c.event_id, p.ts AS pts, p.pv,
        |  row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts ASC) AS rn
        | FROM c JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts) WHERE rn = 1)
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS t_us, c.value,
        | CASE WHEN b.pts IS NOT NULL AND (f.pts IS NULL OR
        |   epoch_us(c.ts) - epoch_us(b.pts) <= epoch_us(f.pts) - epoch_us(c.ts))
        |  THEN epoch_us(b.pts) ELSE epoch_us(f.pts) END AS near_t_us,
        | CASE WHEN b.pts IS NOT NULL AND (f.pts IS NULL OR
        |   epoch_us(c.ts) - epoch_us(b.pts) <= epoch_us(f.pts) - epoch_us(c.ts))
        |  THEN b.pv ELSE f.pv END AS purchase_value
        |FROM c LEFT JOIN b ON c.event_id = b.event_id
        | LEFT JOIN f ON c.event_id = f.event_id""".stripMargin,
    // per-row rate arithmetic on exact integer micros — bit-identical
    // across engines, so even the boolean flag compares exactly
    "a32_rate_spikes" ->
      """WITH o AS (SELECT event_id, event_type, value,
        |  epoch_us(ts) AS us, lag(value) OVER w AS lv,
        |  lag(epoch_us(ts)) OVER w AS lus
        | FROM events
        | WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id))
        |SELECT event_id, event_type, us - lus AS dt_us,
        | round(CASE WHEN us - lus > 0
        |  THEN (value - lv) / (CAST(us - lus AS DOUBLE) / 1000000.0) END, 6) AS rate,
        | coalesce(abs(CASE WHEN us - lus > 0
        |  THEN (value - lv) / (CAST(us - lus AS DOUBLE) / 1000000.0) END) > 0.5,
        |  FALSE) AS is_spike
        |FROM o WHERE lus IS NOT NULL""".stripMargin,
    // x18's recursive component labels → 1/size micro-unit weights →
    // per-source mass sums; weights and mass·weight products are BIGINT
    // and the sums are exact (DuckDB BIGINT-sum → HUGEINT; Spark side
    // decimal(38,0)), both sides casting the SAME exact integer to double
    // for the final /1e6 — so the compare is exact at any corpus size
    "x86_soft_dedup_weights" ->
      s"""WITH RECURSIVE $NearDupChain,
         |pairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         | UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
         | UNION SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
         |lab AS (SELECT u, min(r) AS cid FROM reach GROUP BY u),
         |sz AS (SELECT cid, count(*) AS csz FROM lab GROUP BY cid),
         |w AS (SELECT u AS doc_id, CAST(round(1000000.0 / csz) AS BIGINT) AS wfp
         | FROM lab JOIN sz USING (cid))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         | round(CAST(sum(coalesce(wfp, 1000000)) AS DOUBLE) / 1000000.0, 6)
         |  AS effective_docs,
         | CAST(sum(n_chars) AS BIGINT) AS char_mass,
         | round(CAST(sum(CAST(n_chars AS BIGINT) * coalesce(wfp, 1000000))
         |   AS DOUBLE) / 1000000.0, 6) AS effective_chars
         |FROM documents LEFT JOIN w USING (doc_id) GROUP BY source""".stripMargin,
    // per-(doc, term) counts → -Σ p·ln p; the per-row expression mirrors
    // the Spark tree ((-p) * ln(p)); round-6 absorbs sum merge order
    "x87_token_entropy" ->
      s"""WITH t AS (SELECT doc_id, unnest($Toks) AS term FROM documents),
         |c AS (SELECT doc_id, term, count(*) AS cnt FROM t GROUP BY doc_id, term),
         |l AS (SELECT doc_id, CAST(len($Toks) AS INTEGER) AS n_tokens FROM documents),
         |h AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
         |  sum((-(CAST(cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE))) *
         |   ln(CAST(cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE))) AS ent
         | FROM c JOIN l USING (doc_id) GROUP BY c.doc_id)
         |SELECT h.doc_id, l.n_tokens, n_distinct, round(ent, 6) AS entropy,
         | round(CASE WHEN n_distinct > 1
         |  THEN ent / ln(CAST(n_distinct AS DOUBLE)) ELSE 0.0 END, 6) AS norm_entropy,
         | round(CAST(n_distinct AS DOUBLE) / CAST(l.n_tokens AS DOUBLE), 6) AS ttr
         |FROM h JOIN l ON h.doc_id = l.doc_id""".stripMargin,
    // fixed-point per-dim means (x17 mirror), then dot/norm sums in
    // micro²-units — integer-valued doubles end to end, exact compare
    "x88_centroid_similarity" ->
      """WITH v AS (SELECT CAST(label AS BIGINT) AS g,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve FROM embeddings),
        |ex AS (SELECT g, CAST(r.range AS INTEGER) AS dim,
        |  ve[CAST(r.range AS INTEGER) + 1] AS x
        | FROM v CROSS JOIN range(0, 64) r),
        |cent AS (SELECT g, dim,
        |  round((sum(round(x * 1000000000.0)) / 1000000000.0) / count(*), 6) AS c
        | FROM ex GROUP BY g, dim),
        |norms AS (SELECT g, sum(round(c * c * 1000000000000.0)) AS n2fp
        | FROM cent GROUP BY g),
        |pair AS (SELECT a.g AS label_a, b.g AS label_b,
        |  sum(round(a.c * b.c * 1000000000000.0)) AS dotfp
        | FROM cent a JOIN cent b ON a.dim = b.dim AND a.g < b.g
        | GROUP BY a.g, b.g)
        |SELECT label_a, label_b,
        | round(dotfp / sqrt(na.n2fp * nb.n2fp), 6) AS cosine
        |FROM pair JOIN norms na ON pair.label_a = na.g
        | JOIN norms nb ON pair.label_b = nb.g""".stripMargin,
    // one scan, one per-lang aggregate; the distinct rides md5 digests
    // exactly like the Spark side (never full bodies)
    "x89_corpus_datacard" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         | CAST(sum(n_chars) AS BIGINT) AS total_chars,
         | CAST(sum(ntok) AS BIGINT) AS total_tokens,
         | round(CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_tokens,
         | round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |  AS exact_dup_rate
         |FROM (SELECT lang, source, n_chars, CAST(len($Toks) AS BIGINT) AS ntok,
         |  md5(text) AS h FROM documents)
         |GROUP BY lang""".stripMargin,
    "x83_dedup_mixture_shift" ->
      s"""WITH RECURSIVE $NearDupChain,
         |pairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         | UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
         | UNION SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
         |dropped AS (SELECT u FROM (SELECT u, min(r) AS mr FROM reach GROUP BY u)
         | WHERE u <> mr),
         |flags AS (SELECT doc_id, source,
         |  CASE WHEN doc_id NOT IN (SELECT u FROM dropped) THEN 1 END AS kept
         | FROM documents),
         |persrc AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_before,
         |  CAST(count(kept) AS BIGINT) AS docs_after FROM flags GROUP BY source),
         |tot AS (SELECT CAST(sum(docs_before) AS BIGINT) AS tb,
         |  CAST(sum(docs_after) AS BIGINT) AS ta FROM persrc)
         |SELECT source, docs_before, docs_after,
         | round(CAST(docs_before AS DOUBLE) / CAST(tb AS DOUBLE), 6) AS share_before,
         | round(CAST(docs_after AS DOUBLE) / CAST(ta AS DOUBLE), 6) AS share_after
         |FROM persrc CROSS JOIN tot""".stripMargin,
    // embedding decontamination vs the planted-clone probe set (x37's
    // +100000 id pattern); cosineSql is the shared round-6 kernel mirror
    "x82_semantic_decontaminate" ->
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |p AS (SELECT vec_id + 100000 AS pid, ve AS pv FROM v
         | WHERE vec_id % 50 = 0),
         |sc AS (SELECT v.vec_id, ${cosineSql("v.ve", "p.pv")} AS cos
         | FROM v CROSS JOIN p WHERE v.vec_id <> p.pid)
         |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits,
         | max(cos) AS max_cosine
         |FROM sc WHERE cos >= 0.9 GROUP BY vec_id""".stripMargin,
    // per-gram doc counts joined back to the distinct doc-gram pairs; the
    // ratio arithmetic mirrors the Spark tree (1.0 − s/n, round 6)
    "x81_gram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |g AS (SELECT doc_id, unnest(${distinctGramsSql(8)}) AS gram FROM t),
         |dfc AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
         |per AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(count(CASE WHEN df > 1 THEN 1 END) AS BIGINT) AS n_shared
         | FROM g JOIN dfc USING (gram) GROUP BY g.doc_id)
         |SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
         | coalesce(n_shared, 0) AS n_shared,
         | CASE WHEN coalesce(n_grams, 0) > 0
         |  THEN round(1.0 - CAST(n_shared AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
         |  ELSE 1.0 END AS novelty
         |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,
    // the x06 pair chain joined to each side's source, pair key normalized
    // (least, greatest) so mirrored pairs land in one row; round-6 on the
    // mean absorbs avg merge jitter (the x38 argument)
    "x80_cross_source_dups" ->
      s"""WITH $NearDupChain,
         |pairs AS (SELECT doc_a, doc_b, jaccard FROM scored
         |  WHERE jaccard >= 0.3),
         |sp AS (SELECT least(sa.source, sb.source) AS source_a,
         |   greatest(sa.source, sb.source) AS source_b, p.jaccard
         | FROM pairs p JOIN documents sa ON p.doc_a = sa.doc_id
         |  JOIN documents sb ON p.doc_b = sb.doc_id)
         |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS dup_pairs,
         | round(avg(jaccard), 6) AS avg_jaccard
         |FROM sp GROUP BY source_a, source_b""".stripMargin,
    "x21_repetition" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |g AS (SELECT doc_id, len(toks) AS nt, len($DistinctGrams) AS ng FROM t)
         |SELECT doc_id, round(CASE WHEN CAST(nt - 1 AS DOUBLE) <= 0.0 THEN 0.0
         | ELSE 1.0 - CAST(ng AS DOUBLE) / CAST(nt - 1 AS DOUBLE) END, 6) AS repetition
         |FROM g""".stripMargin,
    "x22_sequence_pack" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($Toks) AS BIGINT) AS tok,
         |  ${bucketSql("doc_id", "pack")} % 8 AS bucket FROM documents),
         |c AS (SELECT doc_id, bucket,
         |  CAST(coalesce(sum(tok) OVER (PARTITION BY bucket ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
         | FROM t)
         |SELECT doc_id, bucket,
         | CAST(floor(CAST(cum AS DOUBLE) / 2048) AS BIGINT) AS pack_id,
         | CAST(cum % 2048 AS BIGINT) AS pack_offset
         |FROM c""".stripMargin,
    "x23_corpus_mixture" ->
      s"""SELECT doc_id, 'curated' AS source FROM documents
         | WHERE doc_id % 3 = 0 AND ${bucketSql("doc_id", "mix/curated")} < 10000
         |UNION ALL
         |SELECT doc_id, 'web' AS source FROM documents
         | WHERE doc_id % 3 = 1 AND ${bucketSql("doc_id", "mix/web")} < 5000
         |UNION ALL
         |SELECT doc_id, 'boiler' AS source FROM documents
         | WHERE doc_id % 3 = 2 AND ${bucketSql("doc_id", "mix/boiler")} < 1000""".stripMargin,
    "x19_train_split" ->
      s"""SELECT doc_id, ${splitCaseSql("doc_id")} AS split
         |FROM documents""".stripMargin,
    // DuckDB mirror of Urls.canonicalUrl over the shared MessyUrlVariants
    // fixture: same rule chain in the same order; the dialects differ only
    // in replacement syntax (\1 vs $1) and the explicit 'g' flag (DuckDB
    // replaces first-match by default, Spark replaces all)
    "x113_url_canonical" -> {
      val nv = SparkEntry.MessyUrlVariants.size
      val cases = SparkEntry.MessyUrlVariants.zipWithIndex.map {
        case ((pre, suf), i) =>
          s"WHEN doc_id % $nv = $i THEN '$pre' || CAST(doc_id // $nv AS VARCHAR) || '$suf'"
      }.mkString(" ")
      raw"""WITH u AS (SELECT doc_id, CASE $cases END AS url FROM documents),
         |c0 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS u FROM u),
         |c1 AS (SELECT doc_id,
         |  lower(regexp_extract(u, '^(?i)(https?://[^/?#]*)', 1)) AS head, u
         | FROM c0),
         |c2 AS (SELECT doc_id, head || substr(u, length(head) + 1) AS u FROM c1),
         |c3 AS (SELECT doc_id,
         |  regexp_replace(u, '^(https?)://www\.', '\1://') AS u FROM c2),
         |c4 AS (SELECT doc_id, regexp_replace(
         |   regexp_replace(u, ':(?:80|443)$$', ''),
         |   ':(?:80|443)([/?#])', '\1', 'g') AS u FROM c3),
         |c5 AS (SELECT doc_id, regexp_replace(regexp_replace(
         |   regexp_replace(u, '&utm_[^&#]*', '', 'g'),
         |   '\?utm_[^&#]*&', '?'), '\?utm_[^&#]*$$', '') AS u FROM c4),
         |c6 AS (SELECT doc_id, regexp_replace(u, '/+$$', '') AS u FROM c5)
         |SELECT u AS canonical_url, min(doc_id) AS canonical_doc,
         | count(*) AS n_variants
         |FROM c6 GROUP BY 1""".stripMargin
    },
    // x19's split rule keyed by the near-dup CLUSTER id (singletons fall
    // back to the doc id, so their label matches x19 exactly)
    "x111_cluster_split" ->
      s"""WITH RECURSIVE $ClusterChain
         |SELECT d.doc_id,
         | ${splitCaseSql("coalesce(c.cluster_id, d.doc_id)")} AS split
         |FROM documents d LEFT JOIN clus c ON d.doc_id = c.doc_id""".stripMargin,
    // ln(2) is interpolated from the JVM constant so both engines divide
    // by bit-identical doubles; squared/rank-weighted sums in DOUBLE to
    // mirror the Spark side's overflow-safe arithmetic op for op
    // aHash over the FNV stub-decode stream (DecodedFeatures' hv):
    // intensity k = ((hv·(2k+1)) mod 2^64) // 2^56, bit = p_k·64 > Σp —
    // all-integer, so the 64-char bitstring matches bit for bit
    "x119_media_phash" ->
      s"""WITH $DecodedFeatures,
         |px AS (SELECT doc_id, list_transform(range(0, 64), k ->
         |   ((hv * (2*k + 1)) % 18446744073709551616) // 72057594037927936)
         |  AS ps FROM h),
         |bs AS (SELECT doc_id, list_reduce(list_transform(range(1, 65), i ->
         |   CASE WHEN ps[CAST(i AS INT)] * 64 > list_sum(ps)
         |    THEN '1' ELSE '0' END), (a, b) -> a || b) AS phash
         | FROM px),
         |g AS (SELECT phash, CAST(count(*) AS BIGINT) AS n_same_phash
         | FROM bs GROUP BY phash)
         |SELECT doc_id, phash, n_same_phash FROM bs JOIN g USING (phash)""".stripMargin,
    // the cdc chain (cfp) with the SAME minLen filter and >= 2-doc reach
    // cut as Chunking.sharedChunks
    "x117_cdc_shared" ->
      s"""WITH ${cdcChainSql(graft.text.Chunking.DefaultWindow,
            graft.text.Chunking.DefaultMaskBits)}
         |SELECT chunk_hash, chunk_len,
         | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         | CAST(count(*) AS BIGINT) AS n_occurrences
         |FROM cfp WHERE chunk_len >= ${graft.text.Chunking.DefaultMinLen}
         |GROUP BY chunk_hash, chunk_len
         |HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    // per-doc shared chunk mass over the same chain; docs with no
    // qualifying chunks report zero counts and a null fraction (0/0)
    "x118_cdc_redundancy" ->
      s"""WITH ${cdcChainSql(graft.text.Chunking.DefaultWindow,
            graft.text.Chunking.DefaultMaskBits)},
         |q AS (SELECT * FROM cfp
         | WHERE chunk_len >= ${graft.text.Chunking.DefaultMinLen}),
         |reach AS (SELECT chunk_hash, chunk_len,
         |  count(DISTINCT doc_id) AS r
         | FROM q GROUP BY chunk_hash, chunk_len),
         |per AS (SELECT q.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(count(CASE WHEN r >= 2 THEN 1 END) AS BIGINT) AS shared_chunks,
         |  sum(CAST(chunk_len AS BIGINT)) AS mass,
         |  sum(CASE WHEN r >= 2 THEN CAST(chunk_len AS BIGINT) ELSE 0 END) AS smass
         | FROM q JOIN reach USING (chunk_hash, chunk_len) GROUP BY q.doc_id)
         |SELECT d.doc_id,
         | CAST(coalesce(n_chunks, 0) AS BIGINT) AS n_chunks,
         | CAST(coalesce(shared_chunks, 0) AS BIGINT) AS shared_chunks,
         | round(CAST(smass AS DOUBLE) / CAST(mass AS DOUBLE), 6)
         |  AS shared_mass_fraction
         |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin,
    // registry = base + two deterministic single-deletion variants; edges
    // = exact levenshtein <= 1 over all ordered pairs (the oracle may
    // brute-force what Spark blocks); closure via the reach recursion;
    // survivorship: arg_min on rid, arg_max on the zero-padded
    // (length, key) composite — both tie-free (rid unique; equal
    // composite => equal key)
    // mirror of Similarity.matryoshkaRecall: x08's scored-rank pattern,
    // with prefix widths applied via list_slice on BOTH vector sides
    "x122_matryoshka_recall" ->
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < 5),
         |dims AS (SELECT unnest([${SparkEntry.MatryoshkaDims.mkString(", ")}])
         |  AS dim),
         |tf AS (SELECT qid, nid FROM (
         | SELECT q.qid, v.vec_id AS nid,
         |  row_number() OVER (PARTITION BY q.qid
         |   ORDER BY ${cosineSql("q.qv", "v.ve")} DESC, v.vec_id) AS rnk
         | FROM v CROSS JOIN q WHERE v.vec_id <> q.qid) WHERE rnk <= 3),
         |tp AS (SELECT dim, qid, nid FROM (
         | SELECT d.dim, q.qid, v.vec_id AS nid,
         |  row_number() OVER (PARTITION BY d.dim, q.qid
         |   ORDER BY ${cosineSql("list_slice(q.qv, 1, d.dim)",
                "list_slice(v.ve, 1, d.dim)")} DESC, v.vec_id) AS rnk
         | FROM v CROSS JOIN q CROSS JOIN dims d WHERE v.vec_id <> q.qid)
         | WHERE rnk <= 3)
         |SELECT CAST(tp.dim AS INTEGER) AS dim, tp.qid AS query_id,
         | round(CAST(count(tf.nid) AS DOUBLE) / 3, 6) AS recall
         |FROM tp LEFT JOIN tf ON tp.qid = tf.qid AND tp.nid = tf.nid
         |GROUP BY 1, 2""".stripMargin,
    // mirror of Validation.tClosenessViolations: same absent-term fold
    // ((Σ_present |pc−pg|) + 1 − Σ_present pg) / 2
    "x134_t_closeness" ->
      """WITH cs AS (SELECT source, n_chars // 256 AS len_bucket, lang,
        |  CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2, 3),
        |ct AS (SELECT source, len_bucket, sum(c) AS ct FROM cs GROUP BY 1, 2),
        |g AS (SELECT lang, sum(c) AS sc FROM cs GROUP BY 1),
        |n AS (SELECT sum(c) AS n FROM cs),
        |tv AS (SELECT cs.source, CAST(cs.len_bucket AS BIGINT) AS len_bucket,
        |  CAST(max(ct.ct) AS BIGINT) AS class_size,
        |  round((sum(abs(CAST(cs.c AS DOUBLE) / ct.ct
        |     - CAST(g.sc AS DOUBLE) / n.n))
        |   + 1.0 - sum(CAST(g.sc AS DOUBLE) / n.n)) / 2.0, 6) AS tv_distance
        | FROM cs JOIN ct ON cs.source = ct.source
        |   AND cs.len_bucket = ct.len_bucket
        | JOIN g ON cs.lang = g.lang CROSS JOIN n
        | GROUP BY 1, 2)
        |SELECT * FROM tv WHERE tv_distance > 0.35""".stripMargin,
    // mirror of Sampling.epochMix: the SAME driver-computed integer
    // dials rendered as CASE constants (no float mirror)
    "x135_epoch_mix" -> {
      def caseOver(pick: ((Int, Long)) => Long, default: Long): String =
        "CASE source " + SparkEntry.EpochFactors.toSeq.sortBy(_._1).map {
          case (k, f) =>
            s"WHEN '$k' THEN ${pick(graft.sampling.Sampling.epochDials(f))}"
        }.mkString(" ") + s" ELSE $default END"
      s"""WITH w AS (SELECT doc_id, source,
         |  ${caseOver(_._1.toLong, 1L)} AS wh,
         |  ${caseOver(_._2, 0L)} AS fb FROM documents),
         |whole AS (SELECT doc_id, source, unnest(range(0, wh)) AS epoch
         | FROM w WHERE wh >= 1),
         |frac AS (SELECT doc_id, source, wh AS epoch FROM w
         | WHERE ${bucketSql("doc_id", "epoch")} < fb)
         |SELECT doc_id, source, CAST(epoch AS INTEGER) AS epoch FROM whole
         |UNION ALL
         |SELECT doc_id, source, CAST(epoch AS INTEGER) AS epoch FROM frac"""
        .stripMargin
    },
    // mirror of Dedup.containmentPairs: rare-shingle blocking (df in
    // [2,5]) then exact containment both ways; filters on the ROUNDED
    // values like the Spark side
    "x136_containment" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |g AS (SELECT doc_id, $DistinctGrams AS grams FROM t),
         |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         |dfc AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY 1),
         |rare AS (SELECT e.doc_id, e.gram FROM e JOIN dfc ON e.gram = dfc.gram
         | WHERE dfc.df BETWEEN 2 AND 5),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         | FROM rare a JOIN rare b ON a.gram = b.gram AND a.doc_id < b.doc_id),
         |sc AS (SELECT doc_a, doc_b,
         |  CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) AS i,
         |  CAST(len(ga.grams) AS DOUBLE) AS na,
         |  CAST(len(gb.grams) AS DOUBLE) AS nb
         | FROM cand JOIN g ga ON cand.doc_a = ga.doc_id
         |  JOIN g gb ON cand.doc_b = gb.doc_id)
         |SELECT doc_a, doc_b,
         | round(i / greatest(na, 1.0), 6) AS contain_a,
         | round(i / greatest(nb, 1.0), 6) AS contain_b,
         | round(i / greatest(na + nb - i, 1.0), 6) AS jaccard
         |FROM sc WHERE greatest(round(i / greatest(na, 1.0), 6),
         |  round(i / greatest(nb, 1.0), 6)) >= 0.15""".stripMargin,
    // mirror of Comparison.ksDrift: both ECDFs evaluated at every jump
    // point of the pooled sample; integer counts until the final division
    "x137_ks_drift" ->
      s"""WITH $KsChainSql
         |SELECT grp AS "group", CAST(max(n) AS BIGINT) AS n,
         | round(max(abs(CAST(cum_g AS DOUBLE) / n
         |  - CAST(cum_all - cum_g AS DOUBLE) / (nn - n))), 6) AS ks
         |FROM cum CROSS JOIN gr GROUP BY grp, nn""".stripMargin,
    // mirror of Comparison.ksFdr: the x137 grid + truncated Kolmogorov
    // series p (clamped, round-6 BEFORE the BH comparison) + step-up
    "x154_ks_fdr" ->
      s"""WITH $KsChainSql,
         |ks AS (SELECT grp, CAST(max(n) AS BIGINT) AS n,
         |  round(max(abs(CAST(cum_g AS DOUBLE) / n
         |   - CAST(cum_all - cum_g AS DOUBLE) / (nn - n))), 6) AS ks,
         |  CAST(max(nn) AS BIGINT) AS nn
         | FROM cum CROSS JOIN gr GROUP BY grp, nn),
         |wp AS (SELECT grp, n, ks,
         |  CASE WHEN ks IS NOT NULL THEN round(least(1.0, greatest(0.0,
         |   2.0 * (exp(-2.0 * l2) - exp(-8.0 * l2) + exp(-18.0 * l2)))), 6)
         |  END AS p
         | FROM (SELECT grp, n, ks, CAST(n AS DOUBLE) * CAST(nn - n AS DOUBLE)
         |    / CAST(nn AS DOUBLE) * ks * ks AS l2 FROM ks)),
         |mm AS (SELECT count(p) AS m FROM wp),
         |rk AS (SELECT grp, n, ks, p, m,
         |  row_number() OVER (ORDER BY p ASC NULLS LAST, grp ASC) AS i
         | FROM wp CROSS JOIN mm),
         |fl AS (SELECT *, CASE WHEN p IS NOT NULL
         |   AND p <= 0.05 * CAST(i AS DOUBLE) / CAST(m AS DOUBLE)
         |  THEN i ELSE 0 END AS ok FROM rk),
         |mx AS (SELECT *, max(ok) OVER () AS imax FROM fl)
         |SELECT grp AS "group", n, ks, p,
         | CASE WHEN p IS NOT NULL THEN i <= imax END AS rejected
         |FROM mx""".stripMargin,
    // mirror of Correlation.spearmanByGroup: mid-ranks (min rank + half
    // the tie count) over (n_chars, round-6 quality), then plain corr
    "x138_spearman" ->
      s"""WITH t AS (SELECT doc_id, text, lang, CAST(n_chars AS BIGINT) AS x,
         |  $Toks AS toks FROM documents),
         |q AS (SELECT lang, x, $QualitySql AS y FROM t),
         |r AS (SELECT lang,
         |  CAST(rank() OVER (PARTITION BY lang ORDER BY x) AS DOUBLE)
         |   + (CAST(count(*) OVER (PARTITION BY lang, x) AS DOUBLE) - 1.0) / 2.0 AS rx,
         |  CAST(rank() OVER (PARTITION BY lang ORDER BY y) AS DOUBLE)
         |   + (CAST(count(*) OVER (PARTITION BY lang, y) AS DOUBLE) - 1.0) / 2.0 AS ry
         | FROM q)
         |SELECT lang AS "group", CAST(count(*) AS BIGINT) AS n,
         | round(corr(rx, ry), 6) AS spearman FROM r GROUP BY lang""".stripMargin,
    // mirror of Sharding.assignShards: the oracle states the scan as ONE
    // global cumsum (tiny here); the Spark side must equal it from the
    // range-partitioned two-pass — partition-boundary independence is
    // exactly what the hash-match proves
    "x132_shard_assign" ->
      s"""WITH k AS (SELECT doc_id, n_chars,
         |  ${hashKeySql("doc_id", "shard")} AS hk FROM documents),
         |c AS (SELECT doc_id, n_chars, sum(n_chars) OVER (
         |  ORDER BY hk, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM k)
         |SELECT doc_id, n_chars,
         | CAST((cum - n_chars) // 20000 AS BIGINT) AS shard
         |FROM c""".stripMargin,
    // mirror of Sharding.matchedSample: per-bucket want counts from the
    // treatment histogram, hash-ranked control fill
    "x133_matched_sample" ->
      s"""WITH t AS (SELECT n_chars // 64 AS b, count(*) AS want
         | FROM documents WHERE lang = 'en' GROUP BY 1),
         |c AS (SELECT doc_id, n_chars, n_chars // 64 AS b,
         |  row_number() OVER (PARTITION BY n_chars // 64
         |   ORDER BY ${hashKeySql("doc_id", "match")}, doc_id) AS rnk
         | FROM documents WHERE lang <> 'en')
         |SELECT c.doc_id, c.n_chars, CAST(c.b AS BIGINT) AS len_bucket
         |FROM c JOIN t ON c.b = t.b AND c.rnk <= t.want""".stripMargin,
    // mirror of Evaluation.ndcg over the x45 chain: rel = #distinct
    // shared terms; dcg/idcg rounded at 6 BEFORE the final division so
    // both engines divide identical quantities
    "x129_ndcg" ->
      s"""WITH $Bm25BatchChain,
         |ranked AS (SELECT query_id, doc_id, rnk FROM r WHERE rnk <= 10),
         |dt AS (SELECT DISTINCT doc_id, term FROM t),
         |rel AS (SELECT qt.query_id, dt.doc_id,
         |  CAST(count(*) AS BIGINT) AS rel
         | FROM dt JOIN qt USING (term) GROUP BY 1, 2),
         |dcg AS (SELECT ranked.query_id,
         |  round(sum((power(2.0, coalesce(rel.rel, 0)) - 1.0) /
         |   log2(CAST(ranked.rnk AS DOUBLE) + 1.0)), 6) AS dcg
         | FROM ranked LEFT JOIN rel ON ranked.query_id = rel.query_id
         |  AND ranked.doc_id = rel.doc_id
         | GROUP BY 1),
         |ideal AS (SELECT query_id, round(sum((power(2.0, rel) - 1.0) /
         |   log2(CAST(pos AS DOUBLE) + 1.0)), 6) AS idcg FROM (
         |  SELECT query_id, rel, row_number() OVER (PARTITION BY query_id
         |   ORDER BY rel DESC, doc_id) AS pos FROM rel) WHERE pos <= 10
         | GROUP BY 1)
         |SELECT dcg.query_id, dcg.dcg, ideal.idcg,
         | CASE WHEN ideal.idcg > 0 THEN round(dcg.dcg / ideal.idcg, 6) END
         |  AS ndcg
         |FROM dcg LEFT JOIN ideal ON dcg.query_id = ideal.query_id""".stripMargin,
    // closed-form mirror of MediaHeaders.synthWav/parseWav — any misread
    // LE field, skipped chunk, or pad byte breaks the hash
    "x130_wav_headers" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 7 = 0 THEN 'unknown' ELSE 'wav' END AS format,
        | CASE WHEN doc_id % 7 = 0 THEN NULL
        |      ELSE CAST(1 + doc_id % 2 AS INTEGER) END AS channels,
        | CASE WHEN doc_id % 7 = 0 THEN NULL
        |      WHEN doc_id % 4 = 0 THEN 8000 WHEN doc_id % 4 = 1 THEN 16000
        |      WHEN doc_id % 4 = 2 THEN 22050 ELSE 44100 END AS sample_rate,
        | CASE WHEN doc_id % 7 = 0 THEN NULL
        |      ELSE CAST(8 * (1 + doc_id % 3) AS INTEGER) END AS bits_per_sample,
        | CASE WHEN doc_id % 7 = 0 THEN NULL
        |      ELSE CAST((100 + (doc_id * 31) % 900) * 1000000 //
        |       (CASE WHEN doc_id % 4 = 0 THEN 8000
        |             WHEN doc_id % 4 = 1 THEN 16000
        |             WHEN doc_id % 4 = 2 THEN 22050 ELSE 44100 END) AS BIGINT)
        |  END AS duration_us
        |FROM documents""".stripMargin,
    // mirror of Validation.lDiversityViolations over (source, 256-char
    // length bucket) with lang as the sensitive attribute
    "x131_l_diversity" ->
      """SELECT source, CAST(n_chars // 256 AS BIGINT) AS len_bucket,
        | CAST(count(*) AS BIGINT) AS class_size,
        | CAST(count(DISTINCT lang) AS BIGINT) AS n_sensitive
        |FROM documents GROUP BY 1, 2
        |HAVING count(DISTINCT lang) < 3""".stripMargin,
    // mirror of Similarity.bitextMargin: two x08-shaped kNN passes, then
    // the ratio margin in 1e-6 integer units (LONG sums, one division)
    "x124_bitext_margin" ->
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |s AS (SELECT * FROM v WHERE vec_id % 2 = 0),
         |g AS (SELECT * FROM v WHERE vec_id % 2 = 1),
         |p AS (SELECT * FROM s WHERE vec_id < 40),
         |fwd AS (SELECT qid, nid, c, row_number() OVER (PARTITION BY qid
         |   ORDER BY c DESC, nid) AS rnk FROM (
         | SELECT p.vec_id AS qid, g.vec_id AS nid,
         |  ${cosineSql("p.ve", "g.ve")} AS c FROM p CROSS JOIN g)),
         |fx AS (SELECT qid, sum(CAST(round(c * 1e6) AS BIGINT)) AS sx,
         |  CAST(count(*) AS BIGINT) AS kx FROM fwd WHERE rnk <= 4 GROUP BY qid),
         |best AS (SELECT qid, nid, c FROM fwd WHERE rnk = 1),
         |bwd AS (SELECT yid, nid2, c, row_number() OVER (PARTITION BY yid
         |   ORDER BY c DESC, nid2) AS rnk FROM (
         | SELECT cq.nid AS yid, s.vec_id AS nid2,
         |  ${cosineSql("gv.ve", "s.ve")} AS c
         | FROM (SELECT DISTINCT nid FROM best) cq
         | JOIN g gv ON gv.vec_id = cq.nid CROSS JOIN s)),
         |fy AS (SELECT yid, sum(CAST(round(c * 1e6) AS BIGINT)) AS sy,
         |  CAST(count(*) AS BIGINT) AS ky FROM bwd WHERE rnk <= 4 GROUP BY yid)
         |SELECT best.qid AS src_id, best.nid AS tgt_id, best.c AS cosine,
         | round(CAST(round(best.c * 1e6) AS BIGINT) * 2.0 * kx * ky /
         |  CAST(sx * ky + sy * kx AS DOUBLE), 6) AS margin
         |FROM best JOIN fx ON best.qid = fx.qid
         |JOIN fy ON best.nid = fy.yid""".stripMargin,
    // mirror of Evaluation.auc: per-score blocks, midranks in half-rank
    // units (2·cum + n + 1), all-BIGINT rank sum, one final division
    "x125_classifier_auc" ->
      s"""WITH t AS (SELECT doc_id, text, lang, $Toks AS toks FROM documents),
         |q AS (SELECT $QualitySql AS s,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM t),
         |b AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(y) AS BIGINT) AS p FROM q GROUP BY s),
         |r AS (SELECT p, n, coalesce(sum(n) OVER (ORDER BY s
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         | FROM b)
         |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
         | CAST(sum(n - p) AS BIGINT) AS n_neg,
         | CAST(0 AS BIGINT) AS n_null,
         | round(CAST(sum(p * (2 * cum + n + 1)) - sum(p) * (sum(p) + 1)
         |   AS DOUBLE) / (2.0 * sum(p) * sum(n - p)), 6) AS auc
         |FROM r""".stripMargin,
    // mirror of Evaluation.wilsonGate at z=1.96, tau=0.25, pass =
    // quality >= 0.75: z^2 is the SAME Scala double product, the gate
    // compares the unrounded lower bound
    "x202_wilson_gate" ->
      s"""WITH t AS (SELECT doc_id, text, source, $Toks AS toks
         | FROM documents),
         |q AS (SELECT source, CASE WHEN $QualitySql >= 0.75
         |  THEN 1 ELSE 0 END AS pass FROM t),
         |g AS (SELECT source AS "group", CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(pass) AS BIGINT) AS k FROM q GROUP BY 1),
         |m AS (SELECT "group", n, k,
         |  CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
         |  CAST(n AS DOUBLE) AS nd FROM g),
         |w AS (SELECT "group", n, k, ph,
         |  (ph + ${1.96 * 1.96} / (2.0 * nd))
         |   / (1.0 + ${1.96 * 1.96} / nd) AS center,
         |  1.96 * sqrt(ph * (1.0 - ph) / nd
         |    + ${1.96 * 1.96} / (4.0 * nd * nd))
         |   / (1.0 + ${1.96 * 1.96} / nd) AS half
         | FROM m)
         |SELECT "group", n, k, round(ph, 6) AS p_hat,
         | round(center - half, 6) AS wilson_lo,
         | round(center + half, 6) AS wilson_hi,
         | center - half >= 0.25 AS passed
         |FROM w""".stripMargin,
    // mirror of Importance.freshnessEss at half-life 90d over the
    // deterministic doc_id%365 age: the decay rate is the SAME Scala
    // double ln(0.5)/90
    "x203_freshness_ess" ->
      s"""WITH b AS (SELECT source AS "group",
         |  exp(${math.log(0.5) / 90.0} * CAST(doc_id % 365 AS DOUBLE))
         |   AS w
         | FROM documents),
         |g AS (SELECT "group", CAST(count(*) AS BIGINT) AS n,
         |  sum(w) AS sw, sum(w * w) AS sw2 FROM b GROUP BY 1)
         |SELECT "group", n, round(sw, 6) AS sum_w,
         | round(sw * sw / sw2, 6) AS ess,
         | round(sw * sw / sw2 / CAST(n AS DOUBLE), 6) AS ess_ratio
         |FROM g""".stripMargin,
    // mirror of TextAnalysis.codeSwitchReport over the German-tail
    // fixture: 20-token chunk slices, per-chunk marker argmax with the
    // x03 earlier-language tie-break, per-doc distinct-language panel
    "x204_code_switch" -> {
      val langs = graft.text.TextAnalysis.langMarkers
      val scores = langs.map { case (l, ms) =>
        val lst = ms.map(m => s"'$m'").mkString("[", ",", "]")
        s"CAST(len(list_filter(ck, w -> list_contains($lst, w)))" +
          s" AS INTEGER) AS s_$l"
      }.mkString(",\n  ")
      val names = langs.map(_._1)
      val caseChain = names.init.zipWithIndex.map { case (l, i) =>
        val rest = names.drop(i + 1).map(r => s"s_$l >= s_$r")
          .mkString(" AND ")
        s"WHEN $rest THEN '$l'"
      }.mkString("\n   ") + s"\n   ELSE '${names.last}'"
      s"""WITH d AS (SELECT doc_id, CASE WHEN doc_id % 40 = 0
         |  THEN text || repeat(' der die und nicht das', 5)
         |  ELSE text END AS text FROM documents),
         |t AS (SELECT doc_id, $Toks AS toks FROM d),
         |b AS (SELECT doc_id, toks,
         |  CAST((len(toks) + 19) // 20 AS INTEGER) AS nc
         | FROM t WHERE CAST((len(toks) + 19) // 20 AS INTEGER) >= 1),
         |c0 AS (SELECT doc_id, nc, toks,
         |  unnest(range(0, CAST(nc AS BIGINT))) AS i FROM b),
         |ch AS (SELECT doc_id, nc,
         |  toks[CAST(i * 20 + 1 AS INTEGER):CAST(i * 20 + 20 AS INTEGER)]
         |   AS ck FROM c0),
         |sc AS (SELECT doc_id, nc,
         |  $scores
         | FROM ch),
         |dec AS (SELECT doc_id, CASE $caseChain END AS lg FROM sc
         | WHERE greatest(${names.map(l => s"s_$l").mkString(", ")}) >= 1),
         |pc AS (SELECT doc_id, lg, CAST(count(*) AS BIGINT) AS c
         | FROM dec GROUP BY 1, 2),
         |rk AS (SELECT doc_id, lg, c,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lg)
         |   AS rn,
         |  CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS nl,
         |  CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS ns
         | FROM pc)
         |SELECT b.doc_id, b.nc AS n_chunks,
         | coalesce(r.nl, 0) AS n_langs, coalesce(r.ns, 0) AS n_scored,
         | r.lg AS dominant_lang, coalesce(r.nl >= 2, false) AS mixed
         |FROM b LEFT JOIN (SELECT * FROM rk WHERE rn = 1) r
         | ON b.doc_id = r.doc_id""".stripMargin
    },
    // mirror of Evaluation.operatingPoints over the x125 score/label
    // pair: |distinct scores| spine, cumulative (tp, fp) from the top,
    // metrics from integer counts, argmax flags on the ROUNDED values
    "x201_operating_point" ->
      s"""WITH t AS (SELECT doc_id, text, lang, $Toks AS toks FROM documents),
         |q AS (SELECT $QualitySql AS s,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM t),
         |b AS (SELECT s, CAST(sum(y) AS BIGINT) AS p,
         |  CAST(count(*) - sum(y) AS BIGINT) AS ng FROM q GROUP BY s),
         |tot AS (SELECT CAST(sum(p) AS BIGINT) AS tp_all,
         |  CAST(sum(ng) AS BIGINT) AS tn_all FROM b),
         |c AS (SELECT s, tp_all, tn_all,
         |  CAST(sum(p) OVER w AS BIGINT) AS tp,
         |  CAST(sum(ng) OVER w AS BIGINT) AS fp
         | FROM b CROSS JOIN tot
         | WINDOW w AS (ORDER BY s DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |m AS (SELECT s AS threshold, tp, fp,
         |  tp_all - tp AS fn, tn_all - fp AS tn,
         |  round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS prec,
         |  round(CAST(tp AS DOUBLE) / CAST(tp_all AS DOUBLE), 6) AS rec,
         |  round(2.0 * CAST(tp AS DOUBLE) / (2.0 * CAST(tp AS DOUBLE)
         |   + CAST(fp AS DOUBLE) + CAST(tp_all - tp AS DOUBLE)), 6) AS f1,
         |  round(CAST(tp AS DOUBLE) / CAST(tp_all AS DOUBLE)
         |   - CAST(fp AS DOUBLE) / CAST(tn_all AS DOUBLE), 6) AS youden
         | FROM c),
         |bm AS (SELECT max(f1) AS bf, max(youden) AS bj FROM m)
         |SELECT threshold, tp, fp, fn, tn, prec, rec, f1, youden,
         | f1 = bf AS best_f1, youden = bj AS best_youden
         |FROM m CROSS JOIN bm""".stripMargin,
    // mirror of TfIdf.zipfSlope: same tokenizer, same (freq desc, term)
    // rank tie-break, ln-ln regr_slope over each source's top-50
    "x126_zipf_slope" ->
      s"""WITH t AS (SELECT source, unnest($Toks) AS term FROM documents),
         |f AS (SELECT source, term, CAST(count(*) AS BIGINT) AS fr
         | FROM t GROUP BY 1, 2),
         |r AS (SELECT source, fr, row_number() OVER (PARTITION BY source
         |  ORDER BY fr DESC, term ASC) AS rnk FROM f)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
         | round(regr_slope(ln(CAST(fr AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6)
         |  AS zipf_slope,
         | round(regr_intercept(ln(CAST(fr AS DOUBLE)),
         |  ln(CAST(rnk AS DOUBLE))), 6) AS intercept
         |FROM r WHERE rnk <= 50 GROUP BY source""".stripMargin,
    // mirror of Evaluation.calibration: 1e-6 quantized score, integer
    // bin arithmetic (floor of an exactly-representable quotient), exact
    // micro-unit confidence sums
    "x127_calibration" ->
      s"""WITH t AS (SELECT doc_id, text, lang, $Toks AS toks FROM documents),
         |q AS (SELECT CAST(round($QualitySql * 1e6) AS BIGINT) AS pu,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM t),
         |b AS (SELECT CAST(least(floor(pu * 10 / 1000000), 9) AS INTEGER)
         |   AS bin,
         |  CAST(count(*) AS BIGINT) AS n, sum(pu) AS su,
         |  CAST(sum(y) AS BIGINT) AS pos FROM q GROUP BY 1),
         |tot AS (SELECT sum(n) AS tt FROM b)
         |SELECT bin, n,
         | round(CAST(su AS DOUBLE) / (n * 1e6), 6) AS mean_conf,
         | round(CAST(pos AS DOUBLE) / n, 6) AS pos_rate,
         | round(abs(CAST(su AS DOUBLE) / (n * 1e6) - CAST(pos AS DOUBLE) / n),
         |  6) AS gap,
         | round(abs(CAST(su AS DOUBLE) / (n * 1e6) - CAST(pos AS DOUBLE) / n)
         |  * CAST(n AS DOUBLE) / tt, 6) AS ece_term
         |FROM b CROSS JOIN tot""".stripMargin,
    "x120_entity_resolution" -> EntityResolutionSql,
    // x123 computes the SAME final registry incrementally (old edges
    // persisted, delta candidates only) — batch-equivalence IS the
    // contract, so the oracle is x120's statement verbatim
    "x123_entity_delta" -> EntityResolutionSql,

    // same injected suffixes (shared constants), same length-difference
    // substring counting — integer-exact on both engines
    "x121_mojibake" -> {
      val a = SparkEntry.MojibakeSuffixA
      val b = SparkEntry.MojibakeSuffixB
      val terms = graft.text.TextAnalysis.mojibakeMarkers.map { m =>
        s"(length(tx) - length(replace(tx, '$m', ''))) // ${m.length}"
      }.mkString("\n        |   + ")
      s"""WITH t AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN text || '$a'
        |       WHEN doc_id % 11 = 0 THEN text || '$b'
        |       ELSE text END AS tx
        | FROM documents)
        |SELECT doc_id,
        | CAST($terms AS INTEGER) AS mojibake_hits,
        | CAST($terms AS INTEGER) > 0 AS is_mojibake
        |FROM t""".stripMargin
    },
    "x116_source_concentration" ->
      s"""WITH c AS (SELECT source AS k, count(*) AS cnt FROM documents
         | GROUP BY 1),
         |r AS (SELECT cnt, CAST(row_number() OVER (ORDER BY cnt ASC, k ASC)
         |  AS BIGINT) AS i FROM c),
         |a AS (SELECT count(*) AS n, CAST(sum(cnt) AS BIGINT) AS tot,
         |  sum(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)) AS s2,
         |  sum(CAST(i AS DOUBLE) * CAST(cnt AS DOUBLE)) AS w, max(cnt) AS top,
         |  sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS clnc
         | FROM r)
         |SELECT n AS n_categories,
         | round(s2 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi,
         | round(CAST(2 AS DOUBLE) * w
         |   / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
         |  - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini,
         | round((ln(CAST(tot AS DOUBLE)) - clnc / CAST(tot AS DOUBLE))
         |  / CAST(${math.log(2.0)} AS DOUBLE), 6) AS entropy_bits,
         | round(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS top_share
         |FROM a""".stripMargin,
    "x115_threshold_sweep" ->
      s"""WITH $NearDupChain,
         |b AS (SELECT CAST(floor(jaccard / CAST(0.05 AS DOUBLE)) AS BIGINT)
         |   AS bk, count(*) AS n_pairs
         | FROM scored GROUP BY 1)
         |SELECT round(bk * CAST(0.05 AS DOUBLE), 2) AS threshold, n_pairs,
         | CAST(sum(n_pairs) OVER (ORDER BY bk DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |  AS n_at_or_above
         |FROM b""".stripMargin,
    "x112_dup_inflation" ->
      s"""WITH RECURSIVE $ClusterChain,
         |sz AS (SELECT coalesce(c.cluster_id, d.doc_id) AS cid,
         |  count(*) AS cluster_size
         | FROM documents d LEFT JOIN clus c ON d.doc_id = c.doc_id GROUP BY 1)
         |SELECT cluster_size, count(*) AS n_clusters,
         | CAST(sum(cluster_size) AS BIGINT) AS n_docs,
         | CAST(sum(cluster_size - 1) AS BIGINT) AS n_excess
         |FROM sz GROUP BY 1""".stripMargin,
    // x06's verified-pair chain labeled by the x19 split rule on each
    // side — pure functions of the ids, so the oracle composes the two
    // existing chains verbatim
    "x57_split_leakage" ->
      s"""WITH $NearDupChain,
         |pr AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
         |lab AS (SELECT doc_a, doc_b,
         |  ${splitCaseSql("doc_a")} AS split_a,
         |  ${splitCaseSql("doc_b")} AS split_b FROM pr)
         |SELECT doc_a, doc_b, split_a, split_b FROM lab
         |WHERE split_a <> split_b""".stripMargin,
    // the x40 rank decomposition with one "token" per doc: rnk is the
    // inclusive running count in (score DESC, tie ASC, id ASC) order,
    // pct_rank = (rnk-1)/(n-1)
    "x56_percentile_rank" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
         |q AS (SELECT doc_id, $QualitySql AS score,
         |  ${hashKeySql("doc_id", "budget")} AS tie FROM t),
         |r AS (SELECT doc_id, score, CAST(row_number() OVER (
         |  ORDER BY score DESC, tie ASC, doc_id ASC) AS BIGINT) AS rnk,
         |  count(*) OVER () AS n FROM q)
         |SELECT doc_id, score, rnk,
         | round(CAST(rnk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE), 6) AS pct_rank
         |FROM r""".stripMargin,
    "x20_stratified_sample" -> {
      val conds = SparkEntry.StratFractions.toSeq.sortBy(_._1)
        .map { case (k, f) =>
          s"(event_type = '$k' AND bk < ${math.round(f * graft.sampling.Sampling.Buckets)})"
        }.mkString(" OR ")
      s"""WITH b AS (SELECT event_id, event_type,
         |  ${bucketSql("event_id", "sample")} AS bk FROM events)
         |SELECT event_id, event_type FROM b WHERE $conds""".stripMargin
    },
    "x18_dup_clusters" ->
      s"""WITH RECURSIVE $ClusterChain
         |SELECT doc_id, cluster_id, (doc_id = cluster_id) AS is_canonical
         |FROM clus""".stripMargin,
    "x07_simhash" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($Toks) AS dt FROM documents),
         |s AS (SELECT doc_id, CAST($SimhashExpr AS BIGINT) AS simhash FROM t)
         |SELECT doc_id, simhash, CAST(bit_count(simhash) AS INTEGER) AS popcount FROM s""".stripMargin,
    "x08_knn_bruteforce" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < 5),
         |sc AS (SELECT q.qid, v.vec_id AS nid, ${cosineSql("q.qv", "v.ve")} AS cosine
         | FROM v CROSS JOIN q WHERE v.vec_id <> q.qid)
         |SELECT qid AS query_id, nid AS neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
         |FROM (SELECT qid, nid, cosine,
         | row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk FROM sc)
         |WHERE rnk <= 3""".stripMargin,
    "x09_knn_ivf" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id % 50 = 0),
         |asg AS (SELECT vec_id, cid FROM (
         | SELECT v.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c) WHERE rn = 1),
         |q AS (SELECT a.vec_id AS qid, a.cid, v.ve AS qv FROM asg a
         | JOIN v ON a.vec_id = v.vec_id WHERE a.vec_id IN (1, 2, 3)),
         |n AS (SELECT a.vec_id AS nid, a.cid, v.ve AS nv FROM asg a
         | JOIN v ON a.vec_id = v.vec_id),
         |sc AS (SELECT q.qid, n.nid, ${cosineSql("q.qv", "n.nv")} AS cosine
         | FROM q JOIN n ON q.cid = n.cid AND n.nid <> q.qid)
         |SELECT qid AS query_id, nid AS neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
         |FROM (SELECT qid, nid, cosine,
         | row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk FROM sc)
         |WHERE rnk <= 3""".stripMargin,
    "x09_knn_ivf_nprobe2" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id % 50 = 0),
         |asg AS (SELECT vec_id, cid FROM (
         | SELECT v.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c) WHERE rn = 1),
         |probes AS (SELECT vec_id AS qid, cid FROM (
         | SELECT v.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c WHERE v.vec_id IN (1, 2, 3)) WHERE rn <= 2),
         |q AS (SELECT p.qid, p.cid, v.ve AS qv FROM probes p JOIN v ON p.qid = v.vec_id),
         |n AS (SELECT a.vec_id AS nid, a.cid, v.ve AS nv FROM asg a
         | JOIN v ON a.vec_id = v.vec_id),
         |sc AS (SELECT q.qid, n.nid, ${cosineSql("q.qv", "n.nv")} AS cosine
         | FROM q JOIN n ON q.cid = n.cid AND n.nid <> q.qid)
         |SELECT qid AS query_id, nid AS neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
         |FROM (SELECT qid, nid, cosine,
         | row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk FROM sc)
         |WHERE rnk <= 3""".stripMargin,
    "x09_recall" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id % 50 = 0),
         |asg AS (SELECT vec_id, cid FROM (
         | SELECT v.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c) WHERE rn = 1),
         |bq AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id IN (1, 2, 3)),
         |bsc AS (SELECT bq.qid, v.vec_id AS nid, ${cosineSql("bq.qv", "v.ve")} AS cosine
         | FROM v CROSS JOIN bq WHERE v.vec_id <> bq.qid),
         |brute AS (SELECT qid, nid FROM (SELECT qid, nid,
         | row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk FROM bsc)
         | WHERE rnk <= 3),
         |n AS (SELECT a.vec_id AS nid, a.cid, v.ve AS nv FROM asg a
         | JOIN v ON a.vec_id = v.vec_id),
         |probes AS (SELECT vec_id AS qid, cid, rn FROM (
         | SELECT v.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c WHERE v.vec_id IN (1, 2, 3)) WHERE rn <= 2),
         |sc AS (SELECT p.qid, n.nid, p.rn AS probe_rn, ${cosineSql("q.ve", "n.nv")} AS cosine
         | FROM probes p JOIN v q ON p.qid = q.vec_id
         | JOIN n ON p.cid = n.cid AND n.nid <> p.qid),
         |ivf1 AS (SELECT qid, nid FROM (SELECT qid, nid,
         |  row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
         |  FROM sc WHERE probe_rn = 1) WHERE rnk <= 3),
         |ivf2 AS (SELECT qid, nid FROM (SELECT qid, nid,
         |  row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
         |  FROM sc) WHERE rnk <= 3)
         |SELECT CAST(1 AS INTEGER) AS nprobe,
         | round(CAST((SELECT count(*) FROM ivf1 i JOIN brute b ON i.qid = b.qid AND i.nid = b.nid) AS DOUBLE)
         |  / CAST((SELECT count(*) FROM brute) AS DOUBLE), 6) AS recall
         |UNION ALL
         |SELECT CAST(2 AS INTEGER) AS nprobe,
         | round(CAST((SELECT count(*) FROM ivf2 i JOIN brute b ON i.qid = b.qid AND i.nid = b.nid) AS DOUBLE)
         |  / CAST((SELECT count(*) FROM brute) AS DOUBLE), 6) AS recall""".stripMargin,
    "x16_simhash_pairs" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($Toks) AS dt FROM documents),
         |s AS (SELECT doc_id, CAST($SimhashExpr AS BIGINT) AS simhash FROM t),
         |bands AS (SELECT doc_id, simhash, simhash // 256 AS band, 1 AS band_id FROM s
         | UNION ALL SELECT doc_id, simhash, simhash % 256 AS band, 2 AS band_id FROM s),
         |capped AS (SELECT doc_id, simhash, band, band_id FROM (
         | SELECT doc_id, simhash, band, band_id,
         |  count(*) OVER (PARTITION BY band, band_id) AS bc FROM bands) WHERE bc <= 1000),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         | FROM capped a JOIN capped b
         |  ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 2""".stripMargin,
    "x17_kmeans_step" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id % 50 = 0),
         |asg AS (SELECT vec_id, cid FROM (
         | SELECT v.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c) WHERE rn = 1),
         |ex AS (SELECT a.cid, CAST(r.range AS INTEGER) AS dim,
         |  v.ve[CAST(r.range AS INTEGER) + 1] AS x
         | FROM asg a JOIN v ON a.vec_id = v.vec_id CROSS JOIN range(0, 64) r)
         |SELECT cid AS centroid_id, dim,
         | round((sum(round(x * 1000000000.0)) / 1000000000.0) / count(*), 6) AS mean,
         | count(*) AS cluster_size
         |FROM ex GROUP BY cid, dim""".stripMargin,
    "x35_cluster_sample" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id % 50 = 0),
         |asg AS (SELECT vec_id, cid FROM (
         | SELECT v.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c) WHERE rn = 1),
         |h AS (SELECT vec_id, cid, ${hashKeySql("vec_id", "clsample")} AS hk FROM asg),
         |r AS (SELECT vec_id, cid AS centroid_id, CAST(row_number() OVER (
         |  PARTITION BY cid ORDER BY hk, vec_id) AS INTEGER) AS rank FROM h)
         |SELECT vec_id, centroid_id, rank FROM r WHERE rank <= 10""".stripMargin,
    // d2 mirrors the encode kernel's left-to-right fold (list_reduce with
    // a 0.0 seed = the kernel's acc loop, bit-identical); codes pick the
    // min-distance centroid with cid ties ascending (kernel: strict <
    // over ids sorted asc); ADC re-folds the query-side distances in
    // subspace order; ranks order by the ROUNDED distance as the Spark
    // side feeds -round(adc, 6) to its bounded-heap top-k
    "x43_pq_adc" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve FROM embeddings),
        |cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id % 50 = 0),
        |$PqChainSql,
        |adc AS (SELECT qd.vec_id AS query_id, c2.vec_id AS neighbor_id,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(qd.dist ORDER BY qd.s)), (a, b) -> a + b) AS adist
        | FROM codes c2 JOIN d2 qd ON qd.cid = c2.code AND qd.s = c2.s
        | WHERE qd.vec_id IN (0, 1) AND c2.vec_id <> qd.vec_id
        | GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, round(adist, 6) AS adc_dist,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY round(adist, 6) ASC, neighbor_id ASC) AS INTEGER) AS rnk FROM adc)
        |SELECT query_id, neighbor_id, adc_dist, rnk FROM r WHERE rnk <= 5""".stripMargin,
    // x09's coarse assignment/probe chain composed with x43's code/ADC
    // chain: candidates = vectors whose coarse list is among the query's
    // nprobe=2 probed lists, scored by ADC over their PQ codes
    "x44_ivfpq" -> IvfPqSql,
    // the batch query-table face runs the same queries through one
    // codes-frame pass — same oracle: the hash match proves the batch
    // plan result-identical to the per-query plan
    "x47_ivfpq_batch" -> IvfPqSql,
    "x71_pq_recall" -> IvfPqRecallSql,
    "x48_winnow_fingerprints" ->
      s"""WITH $WinnowSql
         |SELECT doc_id, fingerprint FROM fp""".stripMargin,
    // the oracle states the naive all-pairs rule (cross join + exact
    // levenshtein — fine at oracle scale); the Spark side never cross
    // joins: deletion-neighborhood blocking with exact distance-1 recall.
    // Hash equality proves the blocked plan drops no pair.
    "x50_fuzzy_join" ->
      """WITH l AS (SELECT doc_id, 'user_' || CAST(doc_id AS VARCHAR) AS name
        | FROM documents),
        |r0 AS (SELECT doc_id AS typo_id, name,
        |  CAST(doc_id % length(name) + 1 AS INTEGER) AS p
        | FROM l WHERE doc_id % 3 = 0),
        |r AS (SELECT typo_id,
        |  substring(name, 1, p - 1) || substring(name, p + 1) AS typo_name
        | FROM r0)
        |SELECT l.doc_id AS left_id, r.typo_id AS right_id,
        | l.name AS left_key, r.typo_name AS right_key,
        | CAST(levenshtein(l.name, r.typo_name) AS INTEGER) AS distance
        |FROM l, r WHERE levenshtein(l.name, r.typo_name) <= 1""".stripMargin,
    // oracle states the uncapped pair rule (the bucket cap never triggers
    // on this fixture, the x11 convention); count(*) = distinct shared
    // fingerprints because fp is distinct per doc
    "x49_winnow_pairs" ->
      s"""WITH $WinnowSql
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | count(*) AS shared_fingerprints
         |FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint
         | AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "x10_lsh_bucket" ->
      s"""SELECT vec_id, CAST(${bucketExpr(Planes8, "ve")} AS BIGINT) AS bucket
         |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings)""".stripMargin,
    "x11_cosine_pairs" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         | FROM embeddings),
         |b AS (SELECT vec_id, v, CAST(${bucketExpr(Planes6, "v")} AS BIGINT) AS bucket FROM e),
         |p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.v AS va, b2.v AS vb
         | FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
         |sc AS (SELECT id_a, id_b, ${cosineSql("va", "vb")} AS cosine FROM p)
         |SELECT id_a, id_b, cosine, cosine >= 0.9 AS is_near_dup FROM sc""".stripMargin,
    // x08's naive rule with a NOT-EXISTS against x11's near-dup pairs
    // (symmetrized): exclusion precedes the per-query top-5
    "x77_hard_negatives" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < 5),
         |b AS (SELECT vec_id, ve, CAST(${bucketExpr(Planes6, "ve")} AS BIGINT) AS bucket FROM v),
         |pp AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         |  ${cosineSql("a.ve", "b2.ve")} AS cosine
         | FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
         |dup AS (SELECT id_a, id_b FROM pp WHERE cosine >= 0.9),
         |ds AS (SELECT id_a AS qid, id_b AS nid FROM dup
         | UNION SELECT id_b, id_a FROM dup),
         |sc AS (SELECT q.qid, v.vec_id AS nid, ${cosineSql("q.qv", "v.ve")} AS cosine
         | FROM v CROSS JOIN q WHERE v.vec_id <> q.qid
         |  AND NOT EXISTS (SELECT 1 FROM ds
         |   WHERE ds.qid = q.qid AND ds.nid = v.vec_id))
         |SELECT qid AS query_id, nid AS neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
         |FROM (SELECT qid, nid, cosine,
         | row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk FROM sc)
         |WHERE rnk <= 5""".stripMargin,
    "x12_media_metadata" ->
      """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS byte_len, md5(text) AS content_id,
        | CAST(floor(strlen(text) / 100.0) AS BIGINT) AS size_bucket
        |FROM documents""".stripMargin,
    "x13_media_decode" ->
      s"""WITH $DecodedFeatures
         |SELECT doc_id, CAST(byte_len AS BIGINT) AS byte_len, width, height,
         | channels, n_frames, brightness
         |FROM dec""".stripMargin,
    // Mirrors MediaHeaders.synthWidth/synthHeight/synthGifDepth — the
    // closed form of the synthesized container dimensions. The Spark side
    // writes real PNG/JPEG/GIF header bytes and parses them back; equality
    // here certifies every parsed field (offsets, endianness, CRC path).
    "x13_real_headers" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 7 = 0 THEN 'unknown'
        |      WHEN doc_id % 3 = 0 THEN 'png'
        |      WHEN doc_id % 3 = 1 THEN 'jpeg'
        |      ELSE 'gif' END AS format,
        | CASE WHEN doc_id % 7 = 0 THEN NULL
        |      ELSE CAST(16 + (doc_id * 7) % 1024 AS INTEGER) END AS width,
        | CASE WHEN doc_id % 7 = 0 THEN NULL
        |      ELSE CAST(16 + (doc_id * 13) % 768 AS INTEGER) END AS height,
        | CASE WHEN doc_id % 7 = 0 THEN NULL
        |      WHEN doc_id % 3 = 2 THEN CAST(1 + doc_id % 8 AS INTEGER)
        |      ELSE CAST(8 AS INTEGER) END AS bit_depth
        |FROM documents""".stripMargin,
    "x14_media_resize" ->
      s"""WITH $DecodedFeatures
         |SELECT doc_id, width, height, CAST(224 AS INTEGER) AS target_w,
         | CAST(224 AS INTEGER) AS target_h,
         | round(least(224.0 / CAST(width AS DOUBLE), 224.0 / CAST(height AS DOUBLE)), 6) AS scale
         |FROM dec""".stripMargin,
    "x15_frame_sample" ->
      s"""WITH $DecodedFeatures
         |SELECT doc_id, n_frames, CAST(unnest(generate_series(0, n_frames - 1, 5)) AS INTEGER) AS frame_idx
         |FROM dec""".stripMargin,
    "x24_decontaminate" -> DecontaminateSql,
    // the bloom variant's output is EXACTLY the broadcast variant's (the
    // exact join removes bloom false positives) — same oracle, and the
    // hash match proves the fpp leakage is fully contained
    "x41_decontaminate_bloom" -> DecontaminateSql,
    "x25_corpus_shuffle" ->
      s"""WITH h AS (SELECT doc_id, ${hashKeySql("doc_id", "shuffle")} AS hk FROM documents)
         |SELECT doc_id, (hk % ${graft.sampling.Sampling.Buckets}) % 8 AS bucket,
         | CAST(row_number() OVER (
         |   PARTITION BY (hk % ${graft.sampling.Sampling.Buckets}) % 8
         |   ORDER BY hk, doc_id) - 1 AS BIGINT) AS pos
         |FROM h""".stripMargin,
    "x26_embed_quantize" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        | FROM embeddings),
        |m AS (SELECT vec_id, ve,
        | coalesce(list_max(list_transform(ve, x -> abs(x))), 0.0) AS mx FROM v),
        |q AS (SELECT vec_id, mx,
        | CASE WHEN mx = 0 THEN CAST([] AS DOUBLE[])
        |  ELSE list_transform(ve, x -> floor(x / (mx / 127.0) + 0.5)) END AS qs,
        | CASE WHEN mx = 0 THEN 0.0
        |  ELSE list_max(list_transform(ve,
        |    x -> abs(floor(x / (mx / 127.0) + 0.5) * (mx / 127.0) - x))) END AS maxerr
        | FROM m)
        |SELECT vec_id,
        | round(CASE WHEN mx = 0 THEN 0.0 ELSE mx / 127.0 END, 9) AS scale,
        | CAST(coalesce(list_sum(qs), 0) AS BIGINT) AS qsum,
        | CAST(coalesce(list_sum(list_transform(qs, x -> x * x)), 0) AS BIGINT) AS qnorm2,
        | round(maxerr, 9) AS max_abs_err
        |FROM q""".stripMargin,
    "x27_dedup_apply" ->
      s"""WITH RECURSIVE $NearDupChain,
         |pairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         | UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
         | UNION SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
         |dropped AS (SELECT u FROM (SELECT u, min(r) AS mr FROM reach GROUP BY u)
         | WHERE u <> mr)
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT u FROM dropped)""".stripMargin,
    "a28_seasonal_outliers" ->
      """WITH stats AS (SELECT event_type, hour(ts) AS hr,
        |  avg(value) AS mu, stddev_samp(value) AS sd
        | FROM events GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, CAST(hour(e.ts) AS INTEGER) AS hr
        |FROM events e
        |JOIN stats s ON e.event_type = s.event_type AND hour(e.ts) = s.hr
        |WHERE s.sd > 0 AND abs((e.value - s.mu) / s.sd) > 3.0""".stripMargin,
    "a17_zscore_outliers" ->
      """WITH stats AS (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        | FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type FROM events e
        |JOIN stats s ON e.event_type = s.event_type
        |WHERE s.sd > 0 AND abs((e.value - s.mu) / s.sd) > 3.0""".stripMargin,
    // median = percentile_cont(0.5), the same interpolated definition as
    // Spark's exact percentile; (3.5 * 1.4826) folds to the identical
    // IEEE product the Spark side computes at plan time
    "a20_mad_outliers" ->
      """WITH m AS (SELECT event_type AS g, median(value) AS med
        | FROM events GROUP BY 1),
        |d AS (SELECT e.event_id, e.event_type, e.value, m.med
        | FROM events e JOIN m ON e.event_type = m.g),
        |md AS (SELECT event_type AS g2, median(abs(value - med)) AS mad
        | FROM d GROUP BY 1)
        |SELECT d.event_id, d.event_type FROM d
        |JOIN md ON d.event_type = md.g2
        |WHERE md.mad > 0 AND abs(d.value - d.med) > (3.5 * 1.4826) * md.mad""".stripMargin,
    // Mirrors QualityRules.report with its default Thresholds: the mean
    // word length divides as double/double in the same order; list len is
    // 32-bit in Spark
    "x28_quality_rules" ->
      s"""WITH $QualityRuleChainSql
         |SELECT doc_id, n_words, round(mean_len, 6) AS mean_word_len,
         | n_stop AS n_distinct_stopwords,
         | n_words >= 25 AND n_words <= 80 AS ok_word_count,
         | mean_len >= 3.0 AND mean_len <= 10.0 AS ok_word_len,
         | n_stop >= 2 AS ok_stopwords,
         | alpha_ratio >= 0.8 AS ok_alpha_words,
         | bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3 AS ok_lines,
         | $PassesAllSql AS passes_all
         |FROM r""".stripMargin,
    // PSI of the token-count distribution across the x28 quality gate:
    // fixed 64-token buckets capped at index 16, add-one smoothed shares,
    // arithmetic mirroring Drift.psiGateShift's expression tree
    "x85_quality_gate_psi" ->
      s"""WITH $QualityRuleChainSql,
         |f AS (SELECT least(CAST(floor(CAST(n_words AS DOUBLE) / 64.0)
         |    AS BIGINT), 16) AS bucket,
         |  $PassesAllSql AS passes FROM r),
         |cb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_before,
         |  CAST(count(CASE WHEN passes THEN 1 END) AS BIGINT) AS c_after
         | FROM f GROUP BY bucket),
         |tot AS (SELECT CAST(sum(c_before) AS BIGINT) AS tb,
         |  CAST(sum(c_after) AS BIGINT) AS ta,
         |  CAST(count(*) AS BIGINT) AS nb FROM cb)
         |SELECT bucket, c_before, c_after,
         | round(((CAST(c_before AS DOUBLE) + 1.0)
         |     / (CAST(tb AS DOUBLE) + CAST(nb AS DOUBLE))
         |   - (CAST(c_after AS DOUBLE) + 1.0)
         |     / (CAST(ta AS DOUBLE) + CAST(nb AS DOUBLE)))
         |  * ln(((CAST(c_before AS DOUBLE) + 1.0)
         |     / (CAST(tb AS DOUBLE) + CAST(nb AS DOUBLE)))
         |   / ((CAST(c_after AS DOUBLE) + 1.0)
         |     / (CAST(ta AS DOUBLE) + CAST(nb AS DOUBLE)))), 6) AS psi_term
         |FROM cb CROSS JOIN tot""".stripMargin,
    // tf = cnt/doc_len, idf = ln(N/df) — doubles divide/multiply in the
    // same order as the Spark expressions; ln is transcendental so values
    // are far from 6-dp rounding knife edges. row_number is 32-bit.
    "x29_tfidf_topk" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS doc_len,
         |  unnest(toks) AS term FROM (SELECT doc_id, $Toks AS toks FROM documents)),
         |tc AS (SELECT doc_id, doc_len, term, CAST(count(*) AS BIGINT) AS cnt
         | FROM t GROUP BY 1, 2, 3),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM tc GROUP BY term),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |s AS (SELECT tc.doc_id, tc.term, tc.cnt,
         |  (CAST(tc.cnt AS DOUBLE) / CAST(tc.doc_len AS DOUBLE)) *
         |    ln(CAST(n.n_docs AS DOUBLE) / CAST(dfq.dfreq AS DOUBLE)) AS tfidf
         | FROM tc JOIN dfq USING (term) CROSS JOIN n),
         |r AS (SELECT doc_id, term, cnt, tfidf, CAST(row_number() OVER (
         |  PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
         | FROM s)
         |SELECT doc_id, term, cnt, round(tfidf, 6) AS tfidf, rank
         |FROM r WHERE rank <= 3""".stripMargin,
    "x30_vocab_stats" ->
      s"""WITH t AS (SELECT doc_id, unnest(toks) AS term
         | FROM (SELECT doc_id, $Toks AS toks FROM documents))
         |SELECT term, CAST(count(*) AS BIGINT) AS occurrences,
         | CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
         |FROM t GROUP BY term
         |ORDER BY occurrences DESC, term ASC LIMIT 20""".stripMargin,
    // Patterns are in the Java-regex/RE2 agreement subset; DuckDB
    // regexp_replace needs the 'g' flag to match Spark's replace-all.
    // Counts are taken before each pattern's own replacement, after all
    // earlier ones (phones counted on the email-scrubbed text).
    // the injection CASE chain renders from SparkEntry.PiiInjections —
    // the single shared fixture table (adversarial regex-agreement rows
    // included), so the two engines cannot drift by hand-edit
    "x31_pii_redact" -> {
      val inj = SparkEntry.PiiInjections.map { case (m, lead, pad, trail) =>
        val idSql = pad.fold("CAST(doc_id AS VARCHAR)") {
          case (w, c) => s"lpad(CAST(doc_id AS VARCHAR), $w, '$c')"
        }
        s"  CASE WHEN doc_id % $m = 0 THEN '$lead' || $idSql || '$trail' ELSE '' END"
      }.mkString(" ||\n|")
      s"""WITH p AS (SELECT doc_id, text ||
         |$inj AS text
         | FROM documents),""".stripMargin + "\n" +
      raw"""e AS (SELECT doc_id, text,
        |  regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS after_email
        | FROM p)
        |SELECT doc_id,
        | regexp_replace(after_email, '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS clean_text,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INTEGER) AS n_emails,
        | CAST(len(regexp_extract_all(after_email, '\+?\d[\d -]{7,}\d')) AS INTEGER) AS n_phones
        |FROM e""".stripMargin
    },
    "x32_domain_stats" ->
      s"""WITH ${urlEnrichSql(SparkEntry.DomainStatsRules)},
         |d AS (SELECT doc_id, unnest(regexp_extract_all(text, '${graft.text.Urls.domainPattern}', 1)) AS domain FROM p)
         |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         | CAST(count(*) AS BIGINT) AS n_urls
         |FROM d GROUP BY domain""".stripMargin,
    // Tolerance oracle, same pattern as a07: the Count-Min estimate is
    // sketch-valued (no cross-engine twin) but must satisfy the CMS
    // guarantee exact <= est <= exact + ceil(eps*N) deterministically at
    // the fixed seed.
    "a19_cms_frequency" ->
      """SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n_exact,
        | TRUE AS within_bound
        |FROM events GROUP BY event_type""".stripMargin,
    // Tolerance oracle, same pattern as a07: the GK sketch value is
    // merge-order-dependent in its last ranks, but must stay within its
    // rank-error guarantee of the exact percentile under any partitioning.
    "a08_approx_quartiles" ->
      """SELECT event_type, TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        |FROM events GROUP BY event_type""".stripMargin,
    // -ln(cnt/total) is transcendental (far from 6-dp knife edges) and the
    // per-doc mean's merge-order jitter is ~1e-13 relative — plain avg is
    // safe at round 6, same argument as corr/stddev
    "x33_unigram_surprise" ->
      s"""WITH t AS (SELECT doc_id, unnest(toks) AS term
         | FROM (SELECT doc_id, $Toks AS toks FROM documents)),
         |f AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY term),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM t)
         |SELECT doc_id,
         | round(avg(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))), 6) AS surprise,
         | CAST(count(*) AS BIGINT) AS n_tokens
         |FROM t JOIN f USING (term) CROSS JOIN tot GROUP BY doc_id""".stripMargin,
    // the PMI tree mirrors the Spark expression operation-for-operation:
    // (pair/nbig) / ((up/ntok) * (uc/ntok)), ln, round 6; (prev, cur) is
    // unique in bf so the top-k boundary has no tie ambiguity
    "x54_pmi_collocations" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |u AS (SELECT unnest(toks) AS term FROM t),
         |uf AS (SELECT term, CAST(count(*) AS BIGINT) AS uc FROM u GROUP BY 1),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS ntok FROM u),
         |b AS (SELECT unnest(toks[1:len(toks) - 1]) AS prev,
         |  unnest(toks[2:len(toks)]) AS cur FROM t WHERE len(toks) >= 2),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS nbig FROM b),
         |bf AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS pair_count
         | FROM b GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT prev, cur, pair_count,
         | round(ln((CAST(pair_count AS DOUBLE) / CAST(nbig AS DOUBLE)) /
         |   ((CAST(up.uc AS DOUBLE) / CAST(ntok AS DOUBLE)) *
         |    (CAST(ucr.uc AS DOUBLE) / CAST(ntok AS DOUBLE)))), 6) AS pmi
         |FROM bf JOIN uf up ON bf.prev = up.term
         | JOIN uf ucr ON bf.cur = ucr.term
         | CROSS JOIN nb CROSS JOIN nt
         |ORDER BY pmi DESC, prev ASC, cur ASC LIMIT 50""".stripMargin,
    // fingerprint = md5 of ws-normalized text (the x04 expression), so
    // whitespace churn is not a "change"; statuses partition the id union
    "x55_snapshot_diff" ->
      """WITH bf AS (SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f
        | FROM documents WHERE doc_id % 13 <> 0),
        |af AS (SELECT doc_id,
        |  md5(regexp_replace(trim(lower(CASE WHEN doc_id % 7 = 0
        |    THEN text || ' [edited]' ELSE text END)), '\s+', ' ', 'g')) AS f
        | FROM documents WHERE doc_id % 11 <> 0)
        |SELECT coalesce(bf.doc_id, af.doc_id) AS doc_id,
        | CASE WHEN bf.doc_id IS NULL THEN 'added'
        |      WHEN af.doc_id IS NULL THEN 'removed'
        |      WHEN af.f IS NOT DISTINCT FROM bf.f THEN 'unchanged'
        |      ELSE 'changed' END AS status
        |FROM bf FULL OUTER JOIN af ON bf.doc_id = af.doc_id""".stripMargin,
    // parallel unnests of the two token slices zip positionally in DuckDB
    // — the same (prev, cur) stream as Spark's sequence-of-structs
    // explode; the interpolation tree mirrors the Spark expression
    // operation-for-operation (mul, mul, add on double divisions)
    "x52_bigram_surprise" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |u AS (SELECT unnest(toks) AS term FROM t),
         |uf AS (SELECT term, CAST(count(*) AS BIGINT) AS uc FROM u GROUP BY term),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM u),
         |b AS (SELECT doc_id, unnest(toks[1:len(toks) - 1]) AS prev,
         |  unnest(toks[2:len(toks)]) AS cur FROM t WHERE len(toks) >= 2),
         |bf AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS bc FROM b GROUP BY 1, 2),
         |hf AS (SELECT prev, CAST(count(*) AS BIGINT) AS hc FROM b GROUP BY 1)
         |SELECT doc_id,
         | round(avg(-ln(0.75 * (CAST(bc AS DOUBLE) / CAST(hc AS DOUBLE))
         |   + 0.25 * (CAST(uc AS DOUBLE) / CAST(total AS DOUBLE)))), 6) AS surprise,
         | CAST(count(*) AS BIGINT) AS n_bigrams
         |FROM b JOIN bf USING (prev, cur) JOIN hf USING (prev)
         | JOIN uf ON b.cur = uf.term CROSS JOIN tot
         |GROUP BY doc_id""".stripMargin,
    // interpolated Kneser-Ney: max(bc-d,0)/hc + (d*n1p/hc)*(n1c/types);
    // every aggregate derives from the bigram pair counts, as in Spark
    "x74_kn_surprise" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |b AS (SELECT doc_id, unnest(toks[1:len(toks) - 1]) AS prev,
         |  unnest(toks[2:len(toks)]) AS cur FROM t WHERE len(toks) >= 2),
         |bf AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS bc FROM b GROUP BY 1, 2),
         |hf AS (SELECT prev, CAST(sum(bc) AS BIGINT) AS hc,
         |  CAST(count(*) AS BIGINT) AS n1p FROM bf GROUP BY 1),
         |cf AS (SELECT cur, CAST(count(*) AS BIGINT) AS n1c FROM bf GROUP BY 1),
         |ty AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM bf)
         |SELECT doc_id,
         | round(avg(-ln((greatest(CAST(bc AS DOUBLE) - 0.75, 0.0)
         |   + 0.75 * CAST(n1p AS DOUBLE)
         |     * (CAST(n1c AS DOUBLE) / CAST(bt AS DOUBLE)))
         |   / CAST(hc AS DOUBLE))), 6) AS kn_surprise,
         | CAST(count(*) AS BIGINT) AS n_bigrams
         |FROM b JOIN bf USING (prev, cur) JOIN hf USING (prev)
         | JOIN cf USING (cur) CROSS JOIN ty
         |GROUP BY doc_id""".stripMargin,
    // Parallel unnests zip in DuckDB, giving (line, idx); string_agg with
    // ORDER BY idx mirrors Spark's array_sort-by-position reassembly.
    "x34_line_dedup" ->
      """WITH p AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter for updates' || chr(10) || 'all rights reserved' ELSE '' END AS text
        | FROM documents),
        |s AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM p),
        |l AS (SELECT doc_id, CAST(len(lines) AS INTEGER) AS total,
        |  unnest(lines) AS line, unnest(range(1, len(lines) + 1)) AS idx FROM s),
        |n AS (SELECT doc_id, total, line, idx, trim(line) AS norm FROM l),
        |b AS (SELECT norm FROM (SELECT norm, count(DISTINCT doc_id) AS d
        |  FROM n GROUP BY norm) WHERE d > 5)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS clean_text,
        | CAST(count(*) AS BIGINT) AS n_kept_lines,
        | CAST(any_value(total) - count(*) AS BIGINT) AS n_dropped_lines
        |FROM n WHERE norm NOT IN (SELECT norm FROM b)
        |GROUP BY doc_id""".stripMargin,
    // idf and tf_norm mirror the Spark expression tree term by term; the
    // per-doc sum is <= 3 values so merge-order jitter is ~1e-16 relative
    // against round-6, and ln keeps scores off rounding knife edges. The
    // final ORDER BY runs on the ALREADY-ROUNDED score with doc_id
    // tie-break, so the top-25 cut is identical across engines.
    "x36_bm25_topk" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS doc_len,
         |  unnest(toks) AS term FROM (SELECT doc_id, $Toks AS toks FROM documents)),
         |tc AS (SELECT doc_id, doc_len, term, CAST(count(*) AS BIGINT) AS cnt
         | FROM t WHERE term IN (${SparkEntry.Bm25Terms.map(q => s"'$q'").mkString(", ")})
         | GROUP BY 1, 2, 3),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM tc GROUP BY term),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  avg(CAST(len($Toks) AS INTEGER)) AS avgdl FROM documents),
         |sc AS (SELECT tc.doc_id,
         |  ln(1.0 + (CAST(st.n_docs AS DOUBLE) - CAST(dfq.dfreq AS DOUBLE) + 0.5) /
         |    (CAST(dfq.dfreq AS DOUBLE) + 0.5)) *
         |  ((CAST(tc.cnt AS DOUBLE) * 2.2) / (CAST(tc.cnt AS DOUBLE) + 1.2 *
         |    (0.25 + 0.75 * (CAST(tc.doc_len AS DOUBLE) / st.avgdl)))) AS term_score
         | FROM tc JOIN dfq USING (term) CROSS JOIN st)
         |SELECT doc_id, round(sum(term_score), 6) AS score,
         | CAST(count(*) AS BIGINT) AS n_matched
         |FROM sc GROUP BY doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 25""".stripMargin,
    // same scoring tree as x36 with a query TABLE: distinct (query, term)
    // pairs join the token stream; df stays corpus-wide per term
    "x45_bm25_batch" ->
      s"""WITH $Bm25BatchChain
         |SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= 10""".stripMargin,
    // lexical (x45 chain, k=10) + semantic (x08 chain over queries 1/2,
    // k=10) rankings fused by reciprocal rank: 1/(60+rnk) summed, rounded
    // at 6, re-ranked. Doc-id domains of the two rankers are opaque to
    // the fusion — a doc missing from one side contributes 0 from it.
    "x53_rrf_fusion" ->
      s"""WITH $Bm25BatchChain,
         |lex AS (SELECT query_id, doc_id, rnk FROM r WHERE rnk <= 10),
         |v2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |qv AS (SELECT vec_id AS qid, ve AS qvec FROM v2 WHERE vec_id IN (1, 2)),
         |asim AS (SELECT qv.qid, v2.vec_id AS nid, ${cosineSql("qv.qvec", "v2.ve")} AS cosine
         | FROM v2 CROSS JOIN qv WHERE v2.vec_id <> qv.qid),
         |ar AS (SELECT qid, nid, CAST(row_number() OVER (
         |  PARTITION BY qid ORDER BY cosine DESC, nid) AS INTEGER) AS rnk FROM asim),
         |ann AS (SELECT qid AS query_id, nid AS doc_id, rnk FROM ar WHERE rnk <= 10),
         |f AS (SELECT coalesce(a.query_id, b.query_id) AS query_id,
         |  coalesce(a.doc_id, b.doc_id) AS doc_id,
         |  round(coalesce(1.0 / (60.0 + CAST(a.rnk AS DOUBLE)), 0.0)
         |    + coalesce(1.0 / (60.0 + CAST(b.rnk AS DOUBLE)), 0.0), 6) AS rrf_score
         | FROM lex a FULL OUTER JOIN ann b
         |  ON a.query_id = b.query_id AND a.doc_id = b.doc_id)
         |SELECT query_id, doc_id, rrf_score, rnk FROM (
         | SELECT query_id, doc_id, rrf_score, CAST(row_number() OVER (
         |  PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS INTEGER) AS rnk
         | FROM f) WHERE rnk <= 10""".stripMargin,
    // x11's candidate chain (Planes6 buckets, id_a < id_b, round-6 cosine)
    // with the greedy keep-lowest-id apply: drop every distinct id_b of a
    // >= 0.9 pair, keep the rest of the corpus
    "x37_semantic_dedup" ->
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
         | UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 20 = 0),
         |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         | FROM base),
         |b AS (SELECT vec_id, v, CAST(${bucketExpr(Planes6, "v")} AS BIGINT) AS bucket FROM e),
         |p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.v AS va, b2.v AS vb
         | FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
         |drops AS (SELECT DISTINCT id_b FROM p WHERE ${cosineSql("va", "vb")} >= 0.9)
         |SELECT vec_id FROM base
         |WHERE vec_id NOT IN (SELECT id_b FROM drops)""".stripMargin,
    // smoothing constants (source total + vocab, target total) are exact
    // BIGINTs on both sides; ln(pt) - ln(ps) mirrors the Spark column
    // order; avg merge jitter ~1e-13 relative against round-6
    "x38_importance_weights" ->
      s"""WITH toks AS (SELECT doc_id, unnest(toks) AS term FROM (
         |  SELECT doc_id, $Toks AS toks FROM documents WHERE doc_id % 10 <> 0)),
         |tokt AS (SELECT unnest(toks) AS term FROM (
         |  SELECT $Toks AS toks FROM documents WHERE doc_id % 10 = 0)),
         |fs AS (SELECT term, CAST(count(*) AS BIGINT) AS cs FROM toks GROUP BY term),
         |ft AS (SELECT term, CAST(count(*) AS BIGINT) AS ct FROM tokt GROUP BY term),
         |sc AS (SELECT CAST(sum(cs) AS BIGINT) AS ts, CAST(count(*) AS BIGINT) AS v,
         |  (SELECT CAST(sum(ct) AS BIGINT) FROM ft) AS tt FROM fs)
         |SELECT doc_id,
         | round(avg(
         |  ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + CAST(v AS DOUBLE))) -
         |  ln((CAST(cs AS DOUBLE) + 1.0) / (CAST(ts AS DOUBLE) + CAST(v AS DOUBLE)))), 6) AS log_ratio,
         | CAST(count(*) AS BIGINT) AS n_tokens
         |FROM toks JOIN fs USING (term) LEFT JOIN ft USING (term) CROSS JOIN sc
         |GROUP BY doc_id""".stripMargin,
    // two-class naive-Bayes LLR: smoothing constants are exact BIGINTs;
    // the OOV branch is a single ln of a quotient on both sides and the
    // in-vocab branch mirrors the Spark expression order term-for-term,
    // so the per-token doubles are bit-identical and round-6 absorbs the
    // avg merge jitter (the x38 argument)
    "x79_quality_classifier" ->
      s"""WITH tkp AS (SELECT unnest(toks) AS term FROM (
         |  SELECT $Toks AS toks FROM documents WHERE source = 'src0')),
         |tkn AS (SELECT unnest(toks) AS term FROM (
         |  SELECT $Toks AS toks FROM documents WHERE source = 'src1')),
         |fp AS (SELECT term, CAST(count(*) AS BIGINT) AS cp FROM tkp GROUP BY term),
         |fn AS (SELECT term, CAST(count(*) AS BIGINT) AS cn FROM tkn GROUP BY term),
         |m AS (SELECT term, cp, cn FROM fp FULL OUTER JOIN fn USING (term)),
         |sc AS (SELECT CAST(sum(coalesce(cp, 0)) AS BIGINT) AS tp,
         |  CAST(sum(coalesce(cn, 0)) AS BIGINT) AS tn,
         |  CAST(count(*) AS BIGINT) AS v FROM m),
         |toks AS (SELECT doc_id, unnest(toks) AS term FROM (
         |  SELECT doc_id, $Toks AS toks FROM documents
         |  WHERE source <> 'src0' AND source <> 'src1')),
         |s AS (SELECT doc_id,
         |  CASE WHEN m.cp IS NULL AND m.cn IS NULL
         |   THEN ln((CAST(tn AS DOUBLE) + CAST(v AS DOUBLE)) / (CAST(tp AS DOUBLE) + CAST(v AS DOUBLE)))
         |   ELSE ln((CAST(coalesce(cp, 0) AS DOUBLE) + 1.0) / (CAST(tp AS DOUBLE) + CAST(v AS DOUBLE))) -
         |    ln((CAST(coalesce(cn, 0) AS DOUBLE) + 1.0) / (CAST(tn AS DOUBLE) + CAST(v AS DOUBLE)))
         |  END AS llr
         | FROM toks LEFT JOIN m USING (term) CROSS JOIN sc)
         |SELECT doc_id, round(avg(llr), 6) AS llr_score,
         | CAST(count(*) AS BIGINT) AS n_tokens,
         | round(avg(llr), 6) > 0.0 AS is_positive
         |FROM s GROUP BY doc_id""".stripMargin,
    // the oracle states the SELECTION RULE directly (global-order running
    // sum <= budget, score ties broken by the salted content hash then
    // id); the Spark side reproduces it with a two-level bucket-prefix
    // cumsum that never global-sorts — equality here proves the
    // distributed decomposition exact, including the hash-cell split of
    // repeated-score buckets. Token counts are integers, so the running
    // sum has no float hazard; DuckDB's BIGINT sum widens to HUGEINT,
    // hence the cast.
    "x40_budget_select" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
         |q AS (SELECT doc_id, $QualitySql AS score,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  ${hashKeySql("doc_id", "budget")} AS tie FROM t),
         |c AS (SELECT doc_id, score, n_tokens,
         |  CAST(sum(n_tokens) OVER (ORDER BY score DESC, tie ASC, doc_id ASC
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM q)
         |SELECT doc_id, score, n_tokens, cum_tokens
         |FROM c WHERE cum_tokens <= ${SparkEntry.TokenBudget}""".stripMargin,
    // the heap orders (score desc, id asc) — exactly row_number's order
    // here; quality is round-6 on both sides (QualitySql = the x02 tree)
    "x46_topk_per_group" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $Toks AS toks FROM documents),
         |q AS (SELECT lang, doc_id, $QualitySql AS quality FROM t),
         |r AS (SELECT lang, doc_id, quality, CAST(row_number() OVER (
         |  PARTITION BY lang ORDER BY quality DESC, doc_id ASC) AS INTEGER) AS rnk
         | FROM q)
         |SELECT lang, doc_id, quality, rnk FROM r WHERE rnk <= 10""".stripMargin,
    // DuckDB list slice l[a:b] is 1-based end-inclusive and clamps at the
    // list end, matching Spark's slice(arr, start, length) tail behavior;
    // generate_series(0, n-1, stride) gives the same window starts, and
    // the parallel unnest of range(0, #starts) zips the same 0-based
    // chunk index (the x34 zip pattern)
    "x42_chunk_windows" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |w AS (SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS n,
         |  unnest(generate_series(0, len(toks) - 1, 24)) AS s,
         |  unnest(range(0, len(generate_series(0, len(toks) - 1, 24)))) AS ci
         | FROM t)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
         | array_to_string(toks[CAST(s + 1 AS INTEGER):CAST(s + 32 AS INTEGER)], ' ') AS chunk_text,
         | CAST(least(32, n - CAST(s AS INTEGER)) AS INTEGER)
         |  AS n_chunk_tokens
         |FROM w""".stripMargin,
    // bit-interleave generated from the same Scala loop as the Spark
    // column — integer adds/shifts, so association order is irrelevant
    "x39_zorder_layout" ->
      s"""SELECT event_id,
         |  ${zValueSql("floor(value)", "user_id", SparkEntry.ZBits)} AS zval,
         |  (${zValueSql("floor(value)", "user_id", SparkEntry.ZBits)} >> ${2 * SparkEntry.ZBits - 4}) AS file_bucket
         |FROM events""".stripMargin,
    // one round-6 projection per plane, zipped with its 0-based component
    // index (the x42 parallel-unnest pattern); 1/sqrt(16) = 0.25 exactly
    "x58_jl_projection" -> {
      val inv = 1.0 / math.sqrt(SparkEntry.PlanesJL.size.toDouble)
      val comps = SparkEntry.PlanesJL.map(p =>
        s"round(list_dot_product(v, ${planeList(p)}) * $inv, 6)")
        .mkString("[", ",\n  ", "]")
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         | FROM embeddings)
         |SELECT vec_id,
         | CAST(unnest(range(0, ${SparkEntry.PlanesJL.size})) AS INTEGER) AS dim,
         | unnest($comps) AS val
         |FROM e""".stripMargin
    },
    // fixed-point moments (scale 4): round(x*1e4) is an exact integer in
    // double, so avg's internal sums match Spark's at any merge order
    "x59_embed_standardize" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |d AS (SELECT vec_id, CAST(unnest(range(0, len(v))) AS INTEGER) AS dim,
        |  unnest(v) AS x FROM e),
        |s AS (SELECT dim, avg(round(x * 10000.0)) / 10000.0 AS m,
        |  avg(round(x * 10000.0) * round(x * 10000.0)) / 100000000.0 AS m2
        | FROM d GROUP BY dim),
        |s2 AS (SELECT dim, m, sqrt(greatest(m2 - m * m, 0.0)) AS sd FROM s)
        |SELECT d.vec_id, d.dim,
        | CASE WHEN sd = 0 OR isnan(sd) THEN 0.0
        |      ELSE round((x - m) / sd, 6) END AS z
        |FROM d JOIN s2 ON d.dim = s2.dim""".stripMargin,
    // list(ORDER BY) states the naive sorted posting list; the Spark side
    // builds it through the bounded heap — the hash match proves the heap
    // emits exactly the ascending-id prefix
    "x60_posting_lists" ->
      s"""WITH t AS (SELECT doc_id, unnest(toks) AS term
         |  FROM (SELECT doc_id, $Toks AS toks FROM documents)),
         |tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt
         | FROM t GROUP BY 1, 2),
         |l AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
         |  CAST(sum(cnt) AS BIGINT) AS term_freq,
         |  list_slice(list(doc_id ORDER BY doc_id), 1, 32) AS ids
         | FROM tc GROUP BY term HAVING count(*) >= 3)
         |SELECT term, doc_freq, term_freq,
         | CAST(unnest(range(0, len(ids))) AS INTEGER) AS pos,
         | unnest(list_transform(range(1, len(ids) + 1),
         |  i -> CASE WHEN i = 1 THEN ids[i] ELSE ids[i] - ids[i - 1] END)) AS delta
         |FROM l""".stripMargin,
    // powered masses quantized to integers (x1e6) before the denominator
    // sum — merge-order-exact, same construction as fixedPointAvg
    "x61_temperature_mix" ->
      s"""WITH c AS (SELECT source, CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
         | FROM documents GROUP BY source),
         |p AS (SELECT source, n_tokens,
         |  round(power(CAST(n_tokens AS DOUBLE), 0.3) * 1000000.0) AS pw FROM c),
         |d AS (SELECT sum(pw) AS dn FROM p)
         |SELECT source, n_tokens, round(pw / dn, 6) AS weight,
         | round(pw / dn * 200000.0 / CAST(n_tokens AS DOUBLE), 6) AS epochs
         |FROM p CROSS JOIN d""".stripMargin,
    // five chained integer-arithmetic rank rounds over the co-citation
    // graph of x32-style deterministic outlinks: every op is BIGINT
    // (// division, * damping, + base), so ranks are exact integers and
    // the iterative loop hash-matches with no float tolerance anywhere
    // x62's loop with the teleport (and dangling mass) restricted to the
    // SparkEntry.PprSeeds set — seed list, seed count, and the derived
    // base/init constants all come from the same Scala values the Spark
    // entry uses, so the two sides cannot desynchronize
    "x95_personalized_pagerank" -> {
      val seeds = SparkEntry.PprSeeds
      val sn = seeds.length.toLong
      val seedList = seeds.map(d => s"'$d'").mkString(", ")
      val seedInit = 1000000000L / sn
      val seedBase = ((100L - 85L) * seedInit) / 100L
      val rounds = (1 to 5).map { k =>
        s"""rk$k AS (SELECT n0.node,
           | CASE WHEN n0.node IN ($seedList)
           |  THEN CAST($seedBase AS BIGINT) + ((CAST(85 AS BIGINT) *
           |   (COALESCE(c.inn, CAST(0 AS BIGINT)) + (d$k.dm // CAST($sn AS BIGINT)))) // 100)
           |  ELSE (CAST(85 AS BIGINT) * COALESCE(c.inn, CAST(0 AS BIGINT))) // 100
           | END AS rank_fp
           | FROM nodes n0
           | CROSS JOIN (SELECT CAST(COALESCE(sum(rank_fp), 0) AS BIGINT) AS dm
           |   FROM rk${k - 1} WHERE node NOT IN (SELECT node FROM deg)) d$k
           | LEFT JOIN (SELECT e.dst AS node,
           |    CAST(sum(r.rank_fp // g.dg) AS BIGINT) AS inn
           |   FROM ed e JOIN rk${k - 1} r ON e.src = r.node
           |   JOIN deg g ON e.src = g.node
           |   GROUP BY e.dst) c ON n0.node = c.node)"""
      }.mkString(",\n")
      s"""WITH $DomainGraphChainSql,
         |nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS dg
         | FROM ed GROUP BY src),
         |rk0 AS (SELECT node,
         | CASE WHEN node IN ($seedList) THEN CAST($seedInit AS BIGINT)
         |  ELSE CAST(0 AS BIGINT) END AS rank_fp FROM nodes),
         |$rounds
         |SELECT node AS domain, CAST(rank_fp AS BIGINT) AS rank_fp FROM rk5""".stripMargin
    },
    "x62_domain_pagerank" ->
      s"""WITH $DomainGraphChainSql,
         |${pageRankSql(5)}
         |SELECT node AS domain, CAST(rank_fp AS BIGINT) AS rank_fp FROM rk5""".stripMargin,
    // TextRank keywords: the SAME pageRankSql rounds (one macro behind
    // x62 and x198 so the fixed-point arithmetic cannot drift) over the
    // distinct symmetrized adjacent-token graph; top-15 rank desc, term
    // asc — exact longs, so LIMIT picks the same set on both engines
    "x198_textrank" ->
      s"""WITH tk AS (SELECT doc_id, $Toks AS toks FROM documents),
         |lt AS (SELECT toks, len(toks) AS n FROM tk WHERE len(toks) >= 2),
         |bp0 AS (SELECT toks, unnest(range(1, n)) AS i FROM lt),
         |bp AS (SELECT list_extract(toks, CAST(i AS INTEGER)) AS a,
         |  list_extract(toks, CAST(i + 1 AS INTEGER)) AS b FROM bp0),
         |pd AS (SELECT DISTINCT a, b FROM bp WHERE a <> b),
         |ed AS (SELECT DISTINCT src, dst FROM (
         |  SELECT a AS src, b AS dst FROM pd
         |  UNION ALL SELECT b, a FROM pd)),
         |${pageRankSql(5)}
         |SELECT node AS term, CAST(rank_fp AS BIGINT) AS rank_fp FROM rk5
         |ORDER BY rank_fp DESC, term LIMIT 15""".stripMargin,
    // mirror of Encoding.looTargetEncode at smoothing=10, target
    // (lang = 'en'): per-source (sum, count), global prior, LOO mean
    // null on singletons, shrinkage in the Spark association order
    "x199_loo_encoding" ->
      """WITH b AS (SELECT doc_id AS id, source AS "group",
        |  CAST(CAST(lang = 'en' AS INTEGER) AS DOUBLE) AS y
        | FROM documents),
        |g AS (SELECT "group", sum(y) AS s, CAST(count(*) AS BIGINT) AS n
        | FROM b GROUP BY 1),
        |p AS (SELECT avg(y) AS prior FROM b)
        |SELECT id, "group", y,
        | round(CASE WHEN n > 1
        |  THEN (s - y) / CAST(n - 1 AS DOUBLE) END, 6) AS loo_raw,
        | round((s - y + 10.0 * prior)
        |  / (CAST(n - 1 AS DOUBLE) + 10.0), 6) AS enc
        |FROM b JOIN g USING ("group") CROSS JOIN p""".stripMargin,
    // B-cubed of the resolution run on 6-char TRUNCATED keys (a lossy
    // upstream) against truth = rid // 3: truncation both breaks true
    // matches (recall ~0.77) and collides strangers (precision ~0.97) —
    // the metric face stays live, unlike the exact-key run's flat 1.0.
    // Per-cell c^2/|p| and c^2/|t| sums, F1 from the unrounded averages
    "x200_bcubed" ->
      s"""WITH RECURSIVE ${entityChainSql(k => s"substring($k, 1, 6)")},
         |asg AS (SELECT rid, entity_id, rid // 3 AS truth_id FROM lab),
         |ct AS (SELECT entity_id AS p, truth_id AS t,
         |  CAST(count(*) AS BIGINT) AS c FROM asg GROUP BY 1, 2),
         |ps AS (SELECT p, CAST(sum(c) AS BIGINT) AS ps FROM ct GROUP BY 1),
         |ts AS (SELECT t, CAST(sum(c) AS BIGINT) AS ts FROM ct GROUP BY 1),
         |pr AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |  sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) / CAST(ps AS DOUBLE))
         |   AS sp,
         |  sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) / CAST(ts AS DOUBLE))
         |   AS sr
         | FROM ct JOIN ps USING (p) JOIN ts USING (t))
         |SELECT n AS n_records,
         | (SELECT CAST(count(*) AS BIGINT) FROM ps) AS n_pred_entities,
         | (SELECT CAST(count(*) AS BIGINT) FROM ts) AS n_truth_entities,
         | round(sp / CAST(n AS DOUBLE), 6) AS bcubed_precision,
         | round(sr / CAST(n AS DOUBLE), 6) AS bcubed_recall,
         | round(2.0 * (sp / CAST(n AS DOUBLE)) * (sr / CAST(n AS DOUBLE))
         |  / ((sp / CAST(n AS DOUBLE)) + (sr / CAST(n AS DOUBLE))), 6)
         |  AS bcubed_f1
         |FROM pr""".stripMargin,
    // mirror of Valuation.knnShapley (Jia et al. closed form, K=3,
    // probes vec_id < 8): round-6 cosine ranks (ties on vec_id), the
    // telescoped per-rank term quantized to 1e-12 longs BEFORE the
    // suffix sum (integer window sums are fold-order exact — DuckDB's
    // segment-tree window sum would drift by ulps on doubles)
    "x205_knn_shapley" ->
      s"""WITH v AS (SELECT vec_id, label,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |q AS (SELECT vec_id AS qid, label AS qlabel, ve AS qv FROM v
         | WHERE vec_id < 8),
         |c AS (SELECT vec_id, label, ve FROM v WHERE vec_id >= 8),
         |sc AS (SELECT c.vec_id, c.label, q.qid,
         |  ${cosineSql("c.ve", "q.qv")} AS cos,
         |  CASE WHEN c.label = q.qlabel THEN 1.0 ELSE 0.0 END AS m
         | FROM c CROSS JOIN q),
         |r AS (SELECT vec_id, label, qid, m,
         |  row_number() OVER w AS i,
         |  count(*) OVER (PARTITION BY qid) AS n,
         |  lead(m) OVER w AS mnext
         | FROM sc WINDOW w AS (PARTITION BY qid ORDER BY cos DESC, vec_id)),
         |t AS (SELECT vec_id, label, qid, i,
         |  CASE WHEN i = n THEN m / CAST(n AS DOUBLE)
         |   ELSE (m - mnext) / 3.0 * least(3.0, CAST(i AS DOUBLE))
         |    / CAST(i AS DOUBLE) END AS term FROM r),
         |tq AS (SELECT vec_id, label, qid, i,
         |  CAST(round(term * 1e12) AS BIGINT) AS tq FROM t),
         |s AS (SELECT vec_id, label,
         |  sum(tq) OVER (PARTITION BY qid ORDER BY i DESC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sq
         | FROM tq)
         |SELECT vec_id, CAST(label AS BIGINT) AS label,
         | CAST(count(*) AS BIGINT) AS n_probes,
         | round(CAST(sum(sq) AS DOUBLE) / (count(*) * 1e12), 6) AS shapley
         |FROM s GROUP BY 1, 2""".stripMargin,
    // mirror of Valuation.blockingAudit on the x200 lossy blocking
    // (6-char truncated keys) against the rid//3 truth: every pair count
    // from a size histogram — C(c,2) sums, no pair enumeration
    "x206_blocking_audit" ->
      s"""WITH $RegistrySql,
         |b AS (SELECT rid, substring(rkey, 1, 6) AS bk, rid // 3 AS tr
         | FROM reg),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
         |cand AS (SELECT coalesce(CAST(sum(c*(c-1)//2) AS BIGINT), 0)
         |  AS cp, CAST(count(*) AS BIGINT) AS nb
         | FROM (SELECT count(*) AS c FROM b GROUP BY bk)),
         |tru AS (SELECT coalesce(CAST(sum(c*(c-1)//2) AS BIGINT), 0) AS tp
         | FROM (SELECT count(*) AS c FROM b GROUP BY tr)),
         |cov AS (SELECT coalesce(CAST(sum(c*(c-1)//2) AS BIGINT), 0) AS vp
         | FROM (SELECT count(*) AS c FROM b GROUP BY bk, tr))
         |SELECT n, nb AS n_blocks,
         | CAST(n*(n-1)//2 AS BIGINT) AS total_pairs,
         | cp AS candidate_pairs, tp AS true_pairs, vp AS covered_pairs,
         | round(1.0 - CAST(cp AS DOUBLE) / CAST(n*(n-1)//2 AS DOUBLE), 6)
         |  AS reduction_ratio,
         | round(CAST(vp AS DOUBLE) / CAST(tp AS DOUBLE), 6)
         |  AS pairs_completeness,
         | round(CAST(vp AS DOUBLE) / CAST(cp AS DOUBLE), 6)
         |  AS pairs_quality
         |FROM tot, cand, tru, cov""".stripMargin,
    // mirror of Dedup.normalizationLadder over the same perturbed corpus
    // (%17 exact copies, %7 upper-cased, %11 space-doubled, %13
    // '!!'-suffixed); 'g' flags — Spark regexp_replace is global
    "x209_dedup_ladder" ->
      s"""WITH base AS (SELECT text FROM documents
         | UNION ALL SELECT text FROM documents WHERE doc_id % 17 = 0
         | UNION ALL SELECT upper(text) FROM documents WHERE doc_id % 7 = 0
         | UNION ALL SELECT regexp_replace(text, ' ', '  ', 'g')
         |  FROM documents WHERE doc_id % 11 = 0
         | UNION ALL SELECT text || '!!' FROM documents
         |  WHERE doc_id % 13 = 0),
         |m AS (SELECT text AS l0, lower(text) AS l1,
         |  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS l2,
         |  regexp_replace(trim(regexp_replace(lower(text), '\\s+', ' ',
         |   'g')), '[^a-z0-9 ]', '', 'g') AS l3 FROM base),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(DISTINCT l0) AS BIGINT) AS d0,
         |  CAST(count(DISTINCT l1) AS BIGINT) AS d1,
         |  CAST(count(DISTINCT l2) AS BIGINT) AS d2,
         |  CAST(count(DISTINCT l3) AS BIGINT) AS d3 FROM m)
         |SELECT 0 AS level, 'raw' AS normalization, n AS n_docs,
         | d0 AS n_distinct, n-d0 AS dups, n-d0 AS marginal_dups,
         | round(CAST(n-d0 AS DOUBLE)/CAST(n AS DOUBLE), 6) AS dup_rate
         |FROM a
         |UNION ALL SELECT 1, 'casefold', n, d1, n-d1, d0-d1,
         | round(CAST(n-d1 AS DOUBLE)/CAST(n AS DOUBLE), 6) FROM a
         |UNION ALL SELECT 2, 'whitespace', n, d2, n-d2, d1-d2,
         | round(CAST(n-d2 AS DOUBLE)/CAST(n AS DOUBLE), 6) FROM a
         |UNION ALL SELECT 3, 'alnum', n, d3, n-d3, d2-d3,
         | round(CAST(n-d3 AS DOUBLE)/CAST(n AS DOUBLE), 6) FROM a""".stripMargin,
    // mirror of Confusables.spoofGroups over the same %19 Cyrillic
    // perturbation; the fold pair must match Confusables.CyrillicConfusable
    "x208_homoglyphs" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
         | UNION ALL SELECT doc_id + 5000000,
         |  translate(text, 'aeo', 'аео') FROM documents
         |  WHERE doc_id % 19 = 0),
         |k AS (SELECT doc_id, text,
         |  translate(lower(text), '${graft.text.Confusables.CyrillicConfusable}',
         |   '${graft.text.Confusables.LatinFold}') AS sk FROM base),
         |g AS (SELECT sk, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT text) AS BIGINT) AS n_variants,
         |  CAST(sum(CASE WHEN lower(text) <> sk
         |   AND regexp_matches(lower(text), '[a-z]') THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_mixed,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         | FROM k GROUP BY sk)
         |SELECT min_doc, max_doc, n_docs, n_variants, n_mixed,
         | CAST(length(sk) AS INTEGER) AS skeleton_len
         |FROM g WHERE n_variants > 1""".stripMargin,
    // mirror of Segmentation.cutReport at w=20: integer term counts make
    // dot/norms exact longs; sims round at 6 before the depth arithmetic;
    // edge neighbors coalesce to the boundary's own sim (Hearst depth)
    "x207_texttiling" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         |tk AS (SELECT doc_id, unnest(toks) AS term,
         |  unnest(range(0, len(toks))) AS pos FROM t),
         |tc AS (SELECT doc_id, pos // 20 AS blk, term,
         |  CAST(count(*) AS BIGINT) AS c
         | FROM tk WHERE term <> '' GROUP BY 1, 2, 3),
         |dt AS (SELECT a.doc_id, a.blk,
         |  CAST(sum(a.c * b.c) AS BIGINT) AS dot
         | FROM tc a JOIN tc b ON a.doc_id = b.doc_id AND a.term = b.term
         |  AND b.blk = a.blk + 1
         | GROUP BY 1, 2),
         |nn AS (SELECT doc_id, blk, CAST(sum(c * c) AS BIGINT) AS nn
         | FROM tc GROUP BY 1, 2),
         |sims AS (SELECT n1.doc_id, n1.blk AS boundary,
         |  round(CAST(coalesce(dt.dot, 0) AS DOUBLE) /
         |   sqrt(CAST(n1.nn * n2.nn AS DOUBLE)), 6) AS sim
         | FROM nn n1 JOIN nn n2 ON n1.doc_id = n2.doc_id
         |  AND n2.blk = n1.blk + 1
         | LEFT JOIN dt ON dt.doc_id = n1.doc_id AND dt.blk = n1.blk),
         |d AS (SELECT doc_id, boundary, sim,
         |  round(greatest(greatest(coalesce(lag(sim, 1) OVER w, sim),
         |    coalesce(lag(sim, 2) OVER w, sim)) - sim, 0) +
         |   greatest(greatest(coalesce(lead(sim, 1) OVER w, sim),
         |    coalesce(lead(sim, 2) OVER w, sim)) - sim, 0), 6) AS depth
         | FROM sims WINDOW w AS (PARTITION BY doc_id ORDER BY boundary)),
         |g AS (SELECT doc_id, boundary, depth,
         |  row_number() OVER (PARTITION BY doc_id
         |   ORDER BY depth DESC, boundary ASC) AS rn,
         |  count(*) OVER (PARTITION BY doc_id) AS nb,
         |  min(sim) OVER (PARTITION BY doc_id) AS ms FROM d)
         |SELECT doc_id, CAST(nb AS BIGINT) AS n_boundaries,
         | boundary AS top_boundary, depth AS top_depth,
         | round(ms, 6) AS min_sim
         |FROM g WHERE rn = 1""".stripMargin,
    // mirror of Distribution.robustOutliers at k=3: median and MAD round
    // at 6 BEFORE the threshold compare (quantile_cont ↔ exact
    // percentile, the a08 pairing); nulls excluded
    "x210_robust_outliers" ->
      s"""WITH v AS (SELECT event_type AS "group", CAST(value AS DOUBLE)
         |  AS x FROM events WHERE value IS NOT NULL),
         |m AS (SELECT "group", CAST(count(*) AS BIGINT) AS n,
         |  round(quantile_cont(x, 0.5), 6) AS median FROM v GROUP BY 1),
         |d AS (SELECT v."group", abs(x - median) AS ad, n, median
         | FROM v JOIN m USING ("group")),
         |md AS (SELECT "group", round(quantile_cont(ad, 0.5), 6) AS mad
         | FROM d GROUP BY 1),
         |f AS (SELECT d."group", max(n) AS n, max(median) AS median,
         |  max(mad) AS mad,
         |  CAST(sum(CASE WHEN ad > 3.0 * 1.4826 * mad THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_outliers
         | FROM d JOIN md USING ("group") GROUP BY 1)
         |SELECT "group", n, median, mad,
         | round(1.4826 * mad, 6) AS sigma_robust, n_outliers,
         | round(CAST(n_outliers AS DOUBLE) / CAST(n AS DOUBLE), 6)
         |  AS outlier_rate
         |FROM f""".stripMargin,
    // mirror of Entities.sortedNeighborhood at w=5 on the x206 registry:
    // global (rkey, rid) rank, pairs within rank distance < w via a
    // range join, true pairs from the size histogram
    "x211_sorted_neighborhood" ->
      s"""WITH $RegistrySql,
         |b AS (SELECT rid, rkey, rid // 3 AS tr,
         |  row_number() OVER (ORDER BY rkey, rid) AS r FROM reg),
         |p AS (SELECT a.tr AS ta, c.tr AS tb FROM b a JOIN b c
         | ON c.r > a.r AND c.r <= a.r + 4),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS cp,
         |  CAST(sum(CASE WHEN ta = tb THEN 1 ELSE 0 END) AS BIGINT) AS vp
         | FROM p),
         |tu AS (SELECT coalesce(CAST(sum(c*(c-1)//2) AS BIGINT), 0) AS tp
         | FROM (SELECT count(*) AS c FROM b GROUP BY tr)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
         |SELECT n, 5 AS window_size, cp AS candidate_pairs,
         | vp AS covered_pairs, tp AS true_pairs,
         | round(CAST(vp AS DOUBLE) / CAST(tp AS DOUBLE), 6)
         |  AS pairs_completeness,
         | round(CAST(vp AS DOUBLE) / CAST(cp AS DOUBLE), 6)
         |  AS pairs_quality
         |FROM tot, ag, tu""".stripMargin,
    // mirror of Layout.zoneMapAudit under both layouts: same zValueSql
    // bit-interleave as x39, same hashKey bucket, lo/hi 100/120
    "x218_zonemap_audit" -> {
      def side(layout: String, bucketExpr: String): String =
        s"""SELECT '$layout' AS layout,
           | CAST(count(*) AS BIGINT) AS n_buckets,
           | CAST(sum(CASE WHEN mx < 100.0 OR mn > 120.0 THEN 1 ELSE 0
           |  END) AS BIGINT) AS skippable_buckets,
           | round(1.0 - CAST(sum(CASE WHEN mx < 100.0 OR mn > 120.0
           |   THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE),
           |  6) AS bucket_scan_fraction,
           | CAST(sum(CASE WHEN mx < 100.0 OR mn > 120.0 THEN c ELSE 0
           |  END) AS BIGINT) AS skipped_rows,
           | CAST(sum(c) AS BIGINT) AS n_rows,
           | round(1.0 - CAST(sum(CASE WHEN mx < 100.0 OR mn > 120.0
           |   THEN c ELSE 0 END) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
           |  AS row_scan_fraction
           |FROM (SELECT $bucketExpr AS b, min(value) AS mn,
           |  max(value) AS mx, CAST(count(*) AS BIGINT) AS c
           | FROM events WHERE value IS NOT NULL GROUP BY 1)""".stripMargin
      side("hash", s"${hashKeySql("event_id", "layout")} % 16") +
        "\nUNION ALL\n" +
        side("zorder",
          s"(${zValueSql("floor(value)", "user_id", 9)} >> ${2 * 9 - 4})")
    },
    // mirror of Dedup.stitchCandidates over the same %23 pagination
    // split (m = n//2, halves share tokens[m-3 .. m+4]); md5 boundary
    // keys verified by actual window equality on both engines
    "x216_stitch" ->
      s"""WITH t0 AS (SELECT doc_id, text, $Toks AS t FROM documents),
         |sp AS (SELECT doc_id, t, len(t) AS n, len(t) // 2 AS m FROM t0
         | WHERE doc_id % 23 = 0 AND len(t) >= 24),
         |parts AS (SELECT doc_id + 6000000 AS doc_id,
         |  array_to_string(t[1 : CAST(m + 4 AS INTEGER)], ' ') AS text
         | FROM sp
         | UNION ALL SELECT doc_id + 7000000,
         |  array_to_string(t[CAST(m - 3 AS INTEGER) :
         |   CAST(n AS INTEGER)], ' ') FROM sp),
         |base0 AS (SELECT doc_id, text FROM documents
         | UNION ALL SELECT doc_id, text FROM parts),
         |b AS (SELECT doc_id, $Toks AS t FROM base0),
         |el AS (SELECT doc_id, t, len(t) AS n FROM b WHERE len(t) >= 16),
         |heads AS (SELECT doc_id AS doc_b,
         |  md5(array_to_string(t[1:8], chr(1))) AS k,
         |  t[1:8] AS h FROM el),
         |tails AS (SELECT doc_id AS doc_a,
         |  md5(array_to_string(t[CAST(n - 7 AS INTEGER) :
         |   CAST(n AS INTEGER)], chr(1))) AS k,
         |  t[CAST(n - 7 AS INTEGER) : CAST(n AS INTEGER)] AS tl FROM el),
         |ch AS (SELECT k FROM heads GROUP BY k HAVING count(*) <= 1000),
         |ct AS (SELECT k FROM tails GROUP BY k HAVING count(*) <= 1000)
         |SELECT doc_a, doc_b, 8 AS overlap_tokens
         |FROM tails JOIN heads USING (k)
         | JOIN ch USING (k) JOIN ct USING (k)
         |WHERE doc_a <> doc_b AND tl = h""".stripMargin,
    // mirror of Validation.qiSubsetSweep: the SAME subset enumeration
    // (scala combinations) rendered as unions over one finest-grain CTE
    "x217_qi_sweep" -> {
      val names = Seq("lang", "source", "len_bucket")
      val parts = (1 to names.size).flatMap(names.combinations).map { s =>
        val cols = s.mkString(", ")
        s"""SELECT '${s.mkString("+")}' AS qi_set, ${s.size} AS n_qi,
           | CAST(count(*) AS BIGINT) AS n_classes,
           | CAST(min(cs) AS BIGINT) AS min_class,
           | CAST(sum(CASE WHEN cs < 5 THEN cs ELSE 0 END) AS BIGINT)
           |  AS n_violating_records,
           | round(CAST(sum(CASE WHEN cs < 5 THEN cs ELSE 0 END)
           |   AS DOUBLE) / CAST(sum(cs) AS DOUBLE), 6) AS violation_rate
           |FROM (SELECT $cols, CAST(sum(c) AS BIGINT) AS cs FROM fin
           | GROUP BY $cols)""".stripMargin
      }
      s"""WITH fin AS (SELECT lang, source, n_chars // 128 AS len_bucket,
         |  CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2, 3)
         |${parts.mkString("\nUNION ALL\n")}""".stripMargin
    },
    // mirror of Joins.joinSizeEstimate: universe sampling at 2000/10000
    // buckets on the SAME hash both sides, Σ cA·cB scaled by 5.0
    "x215_join_size" ->
      s"""WITH lk AS (SELECT user_id AS k FROM events
         |  WHERE event_type = 'click'),
         |rk AS (SELECT user_id AS k FROM events
         |  WHERE event_type = 'purchase'),
         |sa AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM lk
         | WHERE ${bucketSql("k", "joinsize")} < 2000 GROUP BY 1),
         |sb AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM rk
         | WHERE ${bucketSql("k", "joinsize")} < 2000 GROUP BY 1),
         |ea AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM lk
         | GROUP BY 1),
         |eb AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM rk
         | GROUP BY 1),
         |e1 AS (SELECT CAST(count(*) AS BIGINT) AS sampled_keys,
         |  round(CAST(coalesce(sum(sa.c * sb.c), 0) AS DOUBLE) *
         |   ${graft.sampling.Sampling.Buckets.toDouble / 2000.0}, 6)
         |   AS est_rows
         | FROM sa JOIN sb USING (k)),
         |e2 AS (SELECT CAST(count(*) AS BIGINT) AS join_keys,
         |  CAST(coalesce(sum(ea.c * eb.c), 0) AS BIGINT) AS exact_rows
         | FROM ea JOIN eb USING (k))
         |SELECT sampled_keys, est_rows, join_keys, exact_rows,
         | round(est_rows / CAST(exact_rows AS DOUBLE), 6) AS est_ratio
         |FROM e1, e2""".stripMargin,
    // mirror of BudgetSelect.retentionCut at retain=.6: first crossing
    // of 0.6·total on the descending round-6 quality token spine; the
    // only double compare (cum >= 0.6·total) is identical on both sides
    "x213_retention_cut" ->
      s"""WITH t AS (SELECT doc_id, text, source, $Toks AS toks
         |  FROM documents),
         |b AS (SELECT source, $QualitySql AS q,
         |  CAST(len(toks) AS BIGINT) AS tk FROM t),
         |b2 AS (SELECT * FROM b WHERE q IS NOT NULL),
         |sp AS (SELECT q, CAST(sum(tk) AS BIGINT) AS c FROM b2 GROUP BY 1),
         |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM sp),
         |cm AS (SELECT q, CAST(sum(c) OVER (ORDER BY q DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |  AS cum FROM sp),
         |th AS (SELECT max(q) AS threshold FROM cm, tt
         | WHERE CAST(cum AS DOUBLE) >= 0.6 * CAST(t AS DOUBLE))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(CASE WHEN q >= threshold THEN 1 ELSE 0 END) AS BIGINT)
         |  AS kept_docs,
         | CAST(sum(tk) AS BIGINT) AS n_tokens,
         | CAST(sum(CASE WHEN q >= threshold THEN tk ELSE 0 END)
         |  AS BIGINT) AS kept_tokens,
         | round(CAST(sum(CASE WHEN q >= threshold THEN tk ELSE 0 END)
         |   AS DOUBLE) / CAST(sum(tk) AS DOUBLE), 6) AS retention,
         | min(threshold) AS threshold
         |FROM b2, th GROUP BY source""".stripMargin,
    // mirror of Sharding.strideInterleave: integer ⌊√count⌋ weights keep
    // every virtual time a single exact-input division, so the global
    // (vt, id) order is engine-portable; zero-filled source×prefix grid
    "x214_stride_interleave" ->
      s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS cs
         |  FROM documents GROUP BY 1),
         |w AS (SELECT source, cs, greatest(CAST(floor(sqrt(CAST(cs
         |  AS DOUBLE))) AS BIGINT), 1) AS ws FROM c),
         |tw AS (SELECT CAST(sum(ws) AS BIGINT) AS tws,
         |  CAST(sum(cs) AS BIGINT) AS n FROM w),
         |i AS (SELECT doc_id, source, row_number() OVER (
         |  PARTITION BY source
         |  ORDER BY ${hashKeySql("doc_id", "stride")}, doc_id) - 1 AS ix
         | FROM documents),
         |v AS (SELECT doc_id, i.source,
         |  (CAST(ix AS DOUBLE) + 0.5) / CAST(ws AS DOUBLE) AS vt
         | FROM i JOIN w USING (source)),
         |r AS (SELECT source, row_number() OVER (ORDER BY vt, doc_id)
         |  AS rnk FROM v),
         |p(prefix) AS (VALUES (CAST(64 AS BIGINT)), (256), (1024),
         |  (4096)),
         |g AS (SELECT prefix, source, CAST(count(*) AS BIGINT) AS ns
         | FROM r JOIN p ON rnk <= prefix GROUP BY 1, 2),
         |sel AS (SELECT p.prefix, w.source,
         |  coalesce(ns, CAST(0 AS BIGINT)) AS n_scheduled,
         |  round(CAST(coalesce(ns, 0) AS DOUBLE) /
         |   CAST(least(p.prefix, n) AS DOUBLE), 6) AS share,
         |  round(CAST(ws AS DOUBLE) / CAST(tws AS DOUBLE), 6)
         |   AS target_share
         | FROM w CROSS JOIN p CROSS JOIN tw
         | LEFT JOIN g ON g.prefix = p.prefix AND g.source = w.source)
         |SELECT prefix, source, n_scheduled, share, target_share,
         | round(abs(share - target_share), 6) AS abs_dev
         |FROM sel""".stripMargin,
    // mirror of Importance.clippedEss at p=.95 over the half-life-30
    // freshness weighting (x203's age construction; the rate literal is
    // the SAME Scala double); weights round at 6 on entry, the clip is
    // the round-6 exact percentile of those rounded weights
    "x212_weight_clip" ->
      s"""WITH b AS (SELECT source AS "group",
         |  round(exp(${math.log(0.5) / 30.0} *
         |   CAST(doc_id % 365 AS DOUBLE)), 6) AS w
         | FROM documents),
         |c AS (SELECT "group", CAST(count(*) AS BIGINT) AS n,
         |  round(quantile_cont(w, 0.95), 6) AS clip FROM b GROUP BY 1),
         |j AS (SELECT b."group", w, n, clip, least(w, clip) AS wc
         | FROM b JOIN c USING ("group")),
         |f AS (SELECT "group", max(n) AS n, max(clip) AS clip,
         |  sum(w) AS sw, sum(w*w) AS sw2, sum(wc) AS sc, sum(wc*wc) AS sc2,
         |  CAST(sum(CASE WHEN w > clip THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_clipped
         | FROM j GROUP BY 1)
         |SELECT "group", n, clip, round(sw*sw/sw2, 6) AS ess_raw,
         | round(sc*sc/sc2, 6) AS ess_clipped, n_clipped,
         | round(CAST(n_clipped AS DOUBLE)/CAST(n AS DOUBLE), 6)
         |  AS clipped_frac,
         | round(sc/sw, 6) AS mass_ratio
         |FROM f""".stripMargin,
    // synchronous majority label propagation replayed as CommunityRounds
    // chained CTE rounds on the x62 co-citation graph (the round count
    // derives from the SAME SparkEntry.CommunityRounds constant the Spark
    // entry passes, so the two sides cannot desynchronize): per node the
    // most frequent neighbor label, ties to the MIN label — exactly
    // Spark's min(struct(-count, label)). The edge frame is symmetrized
    // the same way on both sides (each direction appears twice; uniform
    // doubling preserves every majority and every tie). If Spark's
    // early-convergence check stops before the last round, the labels are
    // a fixed point and the oracle's extra rounds are the identity, so
    // equality still holds.
    "x78_domain_communities" ->
      s"""WITH $CommunityChain
         |SELECT node AS domain, label AS community FROM lab""".stripMargin,
    // modularity of the SAME community chain (one macro behind x78 and
    // x139 so the partition cannot drift between them): per community
    // Q_c = internal/2m − (degree/2m)², every count integer-exact
    "x139_modularity" ->
      s"""WITH $CommunityChain,
         |pl AS (SELECT 'lp' AS part, node, label FROM lab
         | UNION ALL SELECT 'singleton', node, node FROM lab),
         |ends AS (SELECT b.part, u.src, ls.label AS lsl, ld.label AS ldl
         |  FROM (SELECT DISTINCT part FROM pl) b
         |  CROSS JOIN und u
         |  JOIN pl ls ON ls.part = b.part AND u.src = ls.node
         |  JOIN pl ld ON ld.part = b.part AND u.dst = ld.node),
         |m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM und),
         |inc AS (SELECT part, lsl AS label, CAST(count(*) AS BIGINT) AS ie
         | FROM ends WHERE lsl = ldl GROUP BY 1, 2),
         |tot AS (SELECT part, lsl AS label,
         |  CAST(count(*) AS BIGINT) AS degree_sum,
         |  CAST(count(DISTINCT src) AS BIGINT) AS n_nodes
         | FROM ends GROUP BY 1, 2)
         |SELECT tot.label AS community, n_nodes,
         | COALESCE(ie, CAST(0 AS BIGINT)) AS internal_ends, degree_sum,
         | round(CAST(COALESCE(ie, 0) AS DOUBLE) / m2
         |  - (CAST(degree_sum AS DOUBLE) / m2)
         |    * (CAST(degree_sum AS DOUBLE) / m2), 6) AS contribution,
         | tot.part AS partition
         |FROM tot LEFT JOIN inc
         | ON tot.part = inc.part AND tot.label = inc.label
         |CROSS JOIN m2""".stripMargin,
    // mirror of Graph.triangles: simple-graph dedup, degree-ordered
    // orientation via row-value comparison ((deg, node) lexicographic =
    // the Spark struct order), wedge join + closing-edge EXISTS
    "x140_triangles" ->
      s"""WITH $DomainGraphChainSql,
         |simple AS (SELECT DISTINCT least(src, dst) AS lo,
         |  greatest(src, dst) AS hi FROM ed WHERE src <> dst),
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
         | (SELECT lo AS node FROM simple UNION ALL SELECT hi FROM simple)
         | GROUP BY node),
         |o AS (SELECT
         |  CASE WHEN (dl.degree, s.lo) < (dh.degree, s.hi) THEN s.lo ELSE s.hi END AS u,
         |  CASE WHEN (dl.degree, s.lo) < (dh.degree, s.hi) THEN s.hi ELSE s.lo END AS v
         | FROM simple s JOIN deg dl ON s.lo = dl.node
         |  JOIN deg dh ON s.hi = dh.node),
         |tri AS (SELECT a.u, a.v, b.v AS w3 FROM o a
         | JOIN o b ON a.u = b.u AND a.v < b.v
         | WHERE EXISTS (SELECT 1 FROM o c
         |  WHERE least(c.u, c.v) = a.v AND greatest(c.u, c.v) = b.v)),
         |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM
         | (SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
         |  UNION ALL SELECT w3 FROM tri) GROUP BY node)
         |SELECT d.node, d.degree,
         | COALESCE(pn.triangles, CAST(0 AS BIGINT)) AS triangles,
         | CASE WHEN d.degree >= 2 THEN
         |  round(2.0 * COALESCE(pn.triangles, 0) / (d.degree * (d.degree - 1)), 6)
         | END AS clustering
         |FROM deg d LEFT JOIN pn USING (node)""".stripMargin,
    // mirror of Graph.hits: HitsRounds unrolled half-round pairs, each a
    // join+sum then an L1 fixed-point renormalization (integer // only)
    "x141_hits" -> {
      val sc = 1000000L
      val rounds = (1 to SparkEntry.HitsRounds).map { k =>
        s"""ar$k AS (SELECT e.dst AS node, CAST(sum(h.f) AS BIGINT) AS raw
           | FROM ed e JOIN h${k - 1} h ON e.src = h.node GROUP BY e.dst),
           |at$k AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM ar$k),
           |a$k AS (SELECT n0.node,
           |  COALESCE(r.raw, CAST(0 AS BIGINT)) * CAST($sc AS BIGINT) // tot AS f
           | FROM nodes n0 LEFT JOIN ar$k r ON n0.node = r.node CROSS JOIN at$k),
           |hr$k AS (SELECT e.src AS node, CAST(sum(a.f) AS BIGINT) AS raw
           | FROM ed e JOIN a$k a ON e.dst = a.node GROUP BY e.src),
           |ht$k AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM hr$k),
           |h$k AS (SELECT n0.node,
           |  COALESCE(r.raw, CAST(0 AS BIGINT)) * CAST($sc AS BIGINT) // tot AS f
           | FROM nodes n0 LEFT JOIN hr$k r ON n0.node = r.node CROSS JOIN ht$k)"""
      }.mkString(",\n")
      val R = SparkEntry.HitsRounds
      s"""WITH $DomainGraphChainSql,
         |nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nodes),
         |h0 AS (SELECT node, CAST($sc AS BIGINT) // cnt AS f
         | FROM nodes CROSS JOIN nn),
         |$rounds
         |SELECT h.node, CAST(h.f AS BIGINT) AS hub_fp,
         | CAST(a.f AS BIGINT) AS auth_fp
         |FROM h$R h JOIN a$R a USING (node)""".stripMargin
    },
    // mirror of Evaluation.kappaBy over the shared lang-detect chain:
    // integer cell counts, kappa = (N·agree − Σ row·col)/(N² − Σ row·col)
    "x142_kappa" ->
      s"""WITH $LangDetectChain,
         |j AS (SELECT source AS grp, lang AS a, predicted AS b
         | FROM documents JOIN d USING (doc_id)),
         |cells AS (SELECT grp, a, b, CAST(count(*) AS BIGINT) AS c
         | FROM j GROUP BY 1, 2, 3),
         |n AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
         |di AS (SELECT grp, CAST(sum(c) AS BIGINT) AS agree FROM cells
         | WHERE a = b GROUP BY 1),
         |ra AS (SELECT grp, a, CAST(sum(c) AS BIGINT) AS ra FROM cells GROUP BY 1, 2),
         |cb AS (SELECT grp, b, CAST(sum(c) AS BIGINT) AS cb FROM cells GROUP BY 1, 2),
         |ex AS (SELECT ra.grp, CAST(sum(ra.ra * cb.cb) AS BIGINT) AS e
         | FROM ra JOIN cb ON ra.grp = cb.grp AND ra.a = cb.b GROUP BY ra.grp)
         |SELECT n.grp AS "group", n.n,
         | COALESCE(di.agree, CAST(0 AS BIGINT)) AS agree,
         | round(CAST(COALESCE(di.agree, 0) AS DOUBLE) / n.n, 6) AS po,
         | round(CAST(COALESCE(ex.e, 0) AS DOUBLE) / (n.n * n.n), 6) AS pe,
         | CASE WHEN n.n * n.n - COALESCE(ex.e, 0) <> 0 THEN
         |  round(CAST(n.n * COALESCE(di.agree, 0) - COALESCE(ex.e, 0) AS DOUBLE) /
         |   CAST(n.n * n.n - COALESCE(ex.e, 0) AS DOUBLE), 6)
         | END AS kappa
         |FROM n LEFT JOIN di ON n.grp = di.grp
         | LEFT JOIN ex ON n.grp = ex.grp""".stripMargin,
    // mirror of Distribution.quantileNormalize: mid-CDF per (source,
    // score) block, pooled inverse-CDF lookup via the sorted-merge
    // window (group blocks sort before pooled blocks at equal q)
    "x144_quantile_normalize" ->
      s"""WITH t AS (SELECT doc_id, text, source, $Toks AS toks FROM documents),
         |sq AS (SELECT source AS grp, $QualitySql AS s FROM t),
         |blocks AS (SELECT grp, s, CAST(count(*) AS BIGINT) AS c
         | FROM sq GROUP BY 1, 2),
         |sizes AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM blocks GROUP BY 1),
         |gq AS (SELECT b.grp, b.s, b.c,
         |  (2.0 * COALESCE(sum(b.c) OVER (PARTITION BY b.grp ORDER BY b.s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + b.c)
         |   / (2.0 * z.n) AS q
         | FROM blocks b JOIN sizes z ON b.grp = z.grp),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM blocks),
         |pool AS (SELECT s AS pv,
         |  CAST(sum(sum(c)) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
         |   AS DOUBLE) / CAST(nn AS DOUBLE) AS q
         | FROM blocks CROSS JOIN tot GROUP BY s, nn),
         |m AS (SELECT grp, s, c, q, 0 AS kind, CAST(NULL AS DOUBLE) AS pv
         |  FROM gq
         | UNION ALL SELECT CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
         |  CAST(NULL AS BIGINT), q, 1, pv FROM pool),
         |w AS (SELECT grp, s, c, q, kind,
         |  min(pv) OVER (ORDER BY q, kind
         |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv FROM m)
         |SELECT grp AS "group", s AS score, c AS n, round(q, 6) AS q,
         | nv AS normalized FROM w WHERE kind = 0""".stripMargin,
    // mirror of Pca.dominantComponent: global floor(x·1000 + 0.5) grid,
    // exact long Gram, // n normalization (floor division = floorDiv),
    // PcaRounds unrolled matvec + max-abs fixed-point renorm rounds
    "x145_dominant_pc" -> {
      val sc = SparkEntry.PcaScale
      val rounds = (1 to SparkEntry.PcaRounds).map { k =>
        s"""w$k AS (SELECT c.i, CAST(sum(c.c * v.f) AS BIGINT) AS w
           | FROM cells c JOIN v${k - 1} v ON c.j = v.i GROUP BY c.i),
           |m$k AS (SELECT CAST(max(abs(w)) AS BIGINT) AS m FROM w$k),
           |v$k AS (SELECT i, w * CAST($sc AS BIGINT) // m AS f
           | FROM w$k CROSS JOIN m$k)"""
      }.mkString(",\n")
      val R = SparkEntry.PcaRounds
      s"""WITH qv AS (SELECT list_transform(embedding,
         |  x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qs
         | FROM embeddings),
         |d1 AS (SELECT CAST(unnest(range(0, len(qs))) AS INTEGER) AS i,
         |  unnest(qs) AS qi, qs FROM qv),
         |d2 AS (SELECT i, qi,
         |  CAST(unnest(range(0, len(qs))) AS INTEGER) AS j,
         |  unnest(qs) AS qj FROM d1),
         |nr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         |cells AS (SELECT i, j,
         |  CAST(sum(qi * qj) AS BIGINT) // n AS c
         | FROM d2 CROSS JOIN nr GROUP BY i, j, n),
         |v0 AS (SELECT DISTINCT i, CAST($sc AS BIGINT) AS f FROM cells),
         |$rounds
         |SELECT i AS dim, CAST(f AS BIGINT) AS v_fp FROM v$R""".stripMargin
    },
    // mirror of Comparison.welchT: per-source (n, Σx, Σx²) longs, rest =
    // grand totals minus the group, identical floating expression tree
    "x146_welch_t" ->
      """WITH g AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS ss
        | FROM (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents)
        | GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(s) AS BIGINT) AS ts,
        |  CAST(sum(ss) AS BIGINT) AS tss FROM g),
        |e AS (SELECT grp, n, tn - n AS n2,
        |  CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
        |  CAST(ts - s AS DOUBLE) / CAST(tn - n AS DOUBLE) AS m2,
        |  (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |    / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS v1,
        |  (CAST(tss - ss AS DOUBLE) - CAST(ts - s AS DOUBLE)
        |    * CAST(ts - s AS DOUBLE) / CAST(tn - n AS DOUBLE))
        |   / CAST(tn - n - 1 AS DOUBLE) AS v2
        | FROM g CROSS JOIN t),
        |e2 AS (SELECT *, v1 / CAST(n AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS se2
        | FROM e)
        |SELECT grp AS "group", n, round(m1, 6) AS mean,
        | round(m2, 6) AS mean_rest,
        | CASE WHEN n >= 2 AND n2 >= 2 AND se2 > 0.0 THEN
        |  round((m1 - m2) / sqrt(se2), 6) END AS t,
        | CASE WHEN n >= 2 AND n2 >= 2 AND se2 > 0.0 THEN
        |  round(se2 * se2 /
        |   (v1 * v1 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |     * CAST(n - 1 AS DOUBLE)) +
        |    v2 * v2 / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |     * CAST(n2 - 1 AS DOUBLE))), 6) END AS df
        |FROM e2""".stripMargin,
    // BRUTE-FORCE statement of x148's exact Jaccard join: every doc pair
    // at distinct-3-gram-shingle jaccard >= 0.5 — the Spark side generates
    // candidates via rare-first prefix filtering, and the hash match
    // proves that blocking loses no pair (the x50 proof pattern). Shingles,
    // not unigrams: on this templated corpus unigram jaccard is degenerate
    // (>99 % of ALL pairs exceed 0.1), so the unigram join's output is
    // quadratic at any threshold; shingle sets keep word order and only
    // true near-dup families intersect.
    "x148_prefix_join" ->
      s"""WITH tk AS (SELECT doc_id, $Toks AS toks FROM documents),
         |t AS (SELECT doc_id, ${distinctGramsSql(3)} AS toks FROM tk),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |   greatest(CAST(len(a.toks) + len(b.toks) AS DOUBLE)
         |    - CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE), 1.0), 6)
         |   AS jaccard
         | FROM t a JOIN t b ON a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.5""".stripMargin,
    // mirror of TfIdf.heapsFit: 64 id-range buckets, per-bucket token
    // totals + first-occurrence type counts, running sums, ln-ln OLS
    "x149_heaps_fit" ->
      s"""WITH tok AS (SELECT doc_id, unnest($Toks) AS term FROM documents),
         |bounds AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM tok),
         |dt AS (SELECT doc_id, count(*) AS w FROM tok GROUP BY 1),
         |bt AS (SELECT CAST(floor(64 * (doc_id - mn) / (mx - mn + 1)) AS BIGINT)
         |  AS bucket, CAST(sum(w) AS BIGINT) AS toks
         | FROM dt CROSS JOIN bounds GROUP BY 1),
         |ft AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY 1),
         |bty AS (SELECT CAST(floor(64 * (fd - mn) / (mx - mn + 1)) AS BIGINT)
         |  AS bucket, CAST(count(*) AS BIGINT) AS types
         | FROM ft CROSS JOIN bounds GROUP BY 1),
         |curve AS (SELECT coalesce(bt.bucket, bty.bucket) AS b,
         |  coalesce(toks, 0) AS toks, coalesce(types, 0) AS types
         | FROM bt FULL OUTER JOIN bty ON bt.bucket = bty.bucket),
         |cum AS (SELECT sum(toks) OVER (ORDER BY b) AS ct,
         |  sum(types) OVER (ORDER BY b) AS cy FROM curve)
         |SELECT CAST(count(*) AS BIGINT) AS n_points,
         | round(regr_slope(ln(CAST(cy AS DOUBLE)), ln(CAST(ct AS DOUBLE))), 6)
         |  AS heaps_beta,
         | round(regr_intercept(ln(CAST(cy AS DOUBLE)), ln(CAST(ct AS DOUBLE))), 6)
         |  AS heaps_logk
         |FROM cum WHERE ct > 0 AND cy > 0""".stripMargin,
    // mirror of Comparison.mannWhitney: doubled integer midranks on the
    // pooled value spine, long rank-sum dot product, tie-corrected z
    "x150_mann_whitney" ->
      """WITH c AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
        |  CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        |spine AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM c GROUP BY 1),
        |sp AS (SELECT v, cv, CAST(coalesce(sum(cv) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |  AS cb FROM spine),
        |sp2 AS (SELECT v, cv, 2 * cb + cv + 1 AS mr2 FROM sp),
        |ties AS (SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tsum,
        |  CAST(sum(cv) AS BIGINT) AS nn FROM sp2),
        |g AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(c * mr2) AS BIGINT) AS r2
        | FROM c JOIN sp2 USING (v) GROUP BY 1),
        |e AS (SELECT grp, n, nn - n AS n2, tsum, nn,
        |  CAST(r2 - n * (n + 1) AS DOUBLE) / 2.0 AS u FROM g CROSS JOIN ties),
        |e2 AS (SELECT *, CASE WHEN n2 > 0 AND nn > 1 THEN
        |  CAST(n AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |   ((CAST(nn AS DOUBLE) + 1.0) - CAST(tsum AS DOUBLE) /
        |    (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))) END AS var_u
        | FROM e)
        |SELECT grp AS "group", n, round(u, 6) AS u,
        | CASE WHEN var_u > 0.0 THEN
        |  round((u - CAST(n AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        |   / sqrt(var_u), 6) END AS z
        |FROM e2""".stripMargin,
    // mirror of Fusion.rbo over the x53 arms: shared items contribute the
    // closed tail sum from depth max(ra, rb); p = 0.5 keeps every power
    // an exact binary double in both engines
    "x151_rank_overlap" ->
      s"""WITH $Bm25BatchChain,
         |lex AS (SELECT query_id, doc_id, CAST(rnk AS INTEGER) AS rnk
         | FROM r WHERE rnk <= 10),
         |v2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |qv AS (SELECT vec_id AS qid, ve AS qvec FROM v2 WHERE vec_id IN (1, 2)),
         |asim AS (SELECT qv.qid, v2.vec_id AS nid, ${cosineSql("qv.qvec", "v2.ve")} AS cosine
         | FROM v2 CROSS JOIN qv WHERE v2.vec_id <> qv.qid),
         |ar AS (SELECT qid, nid, CAST(row_number() OVER (
         |  PARTITION BY qid ORDER BY cosine DESC, nid) AS INTEGER) AS rnk FROM asim),
         |ann AS (SELECT qid AS query_id, nid AS doc_id, rnk FROM ar WHERE rnk <= 10),
         |sh AS (SELECT a.query_id, greatest(a.rnk, b.rnk) AS m
         | FROM lex a JOIN ann b ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
         |w AS (SELECT query_id, CAST(count(*) AS BIGINT) AS overlap,
         | sum(list_sum(list_transform(generate_series(m, 10),
         |   d -> pow(0.5, d - 1) / CAST(d AS DOUBLE)))) AS ws
         | FROM sh GROUP BY 1)
         |SELECT q.query_id, coalesce(overlap, 0) AS overlap,
         | round(coalesce(ws, 0.0) * 0.5, 6) AS rbo
         |FROM (SELECT DISTINCT query_id FROM lex) q
         |LEFT JOIN w USING (query_id)""".stripMargin,
    // mirror of TfIdf.chiSqTokens: 2x2 presence contingency per token for
    // the lang='en' class, chi2 from exact longs, (chi2 desc, term) top-50
    "x152_chi2_tokens" ->
      s"""WITH d AS (SELECT doc_id, text, (lang = 'en') AS c FROM documents),
         |tot AS (SELECT CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_pos, CAST(sum(CASE WHEN NOT c THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_neg FROM d),
         |pres AS (SELECT term,
         |  CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS df_pos,
         |  CAST(sum(CASE WHEN NOT c THEN 1 ELSE 0 END) AS BIGINT) AS df_neg
         | FROM (SELECT doc_id, c, unnest(list_distinct($Toks)) AS term FROM d)
         | GROUP BY 1 HAVING df_pos + df_neg >= 5),
         |e AS (SELECT term, df_pos, df_neg, n_pos, n_neg,
         |  CAST(df_pos AS DOUBLE) AS a, CAST(n_pos - df_pos AS DOUBLE) AS b,
         |  CAST(df_neg AS DOUBLE) AS cc, CAST(n_neg - df_neg AS DOUBLE) AS dd
         | FROM pres CROSS JOIN tot),
         |e2 AS (SELECT term, df_pos, df_neg,
         |  CASE WHEN (a + b) * (cc + dd) * (a + cc) * (b + dd) > 0.0 THEN
         |   round(CAST(n_pos + n_neg AS DOUBLE) * (a * dd - b * cc)
         |    * (a * dd - b * cc) /
         |    ((a + b) * (cc + dd) * (a + cc) * (b + dd)), 6) END AS chi2
         | FROM e)
         |SELECT term, chi2, df_pos, df_neg FROM e2 WHERE chi2 IS NOT NULL
         |ORDER BY chi2 DESC, term ASC LIMIT 50""".stripMargin,
    // mirror of Comparison.wassersteinDrift: |CDF gap| x spine interval,
    // long cumulative counts on the ksDrift grid
    "x153_wasserstein" ->
      """WITH c AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
        |  CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        |spine AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM c GROUP BY 1),
        |sp AS (SELECT v, CAST(sum(cv) OVER (ORDER BY v) AS BIGINT) AS cum_all,
        |  lead(v) OVER (ORDER BY v) - v AS gap FROM spine),
        |totals AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        |grand AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM c),
        |grid AS (SELECT t.grp, t.n, s.v, s.cum_all, s.gap, coalesce(c.c, 0) AS c
        | FROM totals t CROSS JOIN sp s
        | LEFT JOIN c ON c.grp = t.grp AND c.v = s.v),
        |cum AS (SELECT grp, n, v, cum_all, gap,
        |  CAST(sum(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum_g
        | FROM grid)
        |SELECT grp AS "group", max(n) AS n,
        | CASE WHEN max(nn) > max(n) THEN round(sum(
        |  CASE WHEN gap IS NOT NULL AND nn > n THEN
        |   abs(CAST(cum_g AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(cum_all - cum_g AS DOUBLE) / CAST(nn - n AS DOUBLE))
        |   * CAST(gap AS DOUBLE) ELSE 0.0 END), 6) END AS w1
        |FROM cum CROSS JOIN grand GROUP BY grp, nn""".stripMargin,
    // mirror of Similarity.mmrRerank over a brute-force cosine pool:
    // greedy steps unrolled (the per-step argmax on ROUND-6 scores with
    // doc-id ties is the determinism contract the Spark side states)
    "x155_mmr_rerank" -> MmrChainSql,
    // mirror of Evaluation.krippendorffAlpha over three lang raters:
    // declared label, full-text detector, truncated-text detector on
    // even doc ids (exercising the missing-rating path)
    "x156_krippendorff" ->
      s"""WITH ${langDetectChainSql("documents", "f")},
         |${langDetectChainSql(
             "(SELECT doc_id, substring(text, 1, 200) AS text" +
             " FROM documents WHERE doc_id % 2 = 0) trunc_docs", "u")},
         |rr AS (SELECT doc_id AS i, lang AS r FROM documents
         | UNION ALL SELECT doc_id, predicted FROM fd
         | UNION ALL SELECT doc_id, predicted FROM ud),
         |c AS (SELECT i, r, CAST(count(*) AS BIGINT) AS c FROM rr
         | GROUP BY 1, 2),
         |items AS (SELECT i, CAST(sum(c) AS BIGINT) AS m,
         |  CAST(sum(c * c) AS BIGINT) AS s2 FROM c GROUP BY 1
         | HAVING sum(c) >= 2),
         |kept AS (SELECT c.* FROM c JOIN items USING (i)),
         |classes AS (SELECT CAST(sum(nc * nc) AS BIGINT) AS sc2 FROM (
         |  SELECT r, CAST(sum(c) AS BIGINT) AS nc FROM kept GROUP BY 1)),
         |obs AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
         |  CAST(sum(m) AS BIGINT) AS nn,
         |  sum(CAST(m * m - s2 AS DOUBLE) / CAST(m - 1 AS DOUBLE)) AS dosum
         | FROM items)
         |SELECT n_items, nn AS n_ratings,
         | CASE WHEN nn * nn - sc2 > 0 AND nn >= 2 THEN
         |  round(1.0 - (dosum / CAST(nn AS DOUBLE)) /
         |   (CAST(nn * nn - sc2 AS DOUBLE) /
         |    (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))), 6) END AS alpha
         |FROM obs CROSS JOIN classes""".stripMargin,
    // the x50 chain + DuckDB's own jaro_winkler_similarity — the kernel's
    // REFERENCE implementation: any semantic drift (window, half
    // transpositions, byte prefixes, 0.7 boost gate) breaks the hash
    "x158_jw_pairs" ->
      """WITH l AS (SELECT doc_id, 'user_' || CAST(doc_id AS VARCHAR) AS name
        | FROM documents),
        |r0 AS (SELECT doc_id AS typo_id, name,
        |  CAST(doc_id % length(name) + 1 AS INTEGER) AS p
        | FROM l WHERE doc_id % 3 = 0),
        |r AS (SELECT typo_id,
        |  substring(name, 1, p - 1) || substring(name, p + 1) AS typo_name
        | FROM r0)
        |SELECT l.doc_id AS left_id, r.typo_id AS right_id,
        | l.name AS left_key, r.typo_name AS right_key,
        | CAST(levenshtein(l.name, r.typo_name) AS INTEGER) AS distance,
        | round(jaro_winkler_similarity(l.name, r.typo_name), 6) AS jw
        |FROM l, r WHERE levenshtein(l.name, r.typo_name) <= 1""".stripMargin,
    // mirror of Dedup.lshPlanner: the x115 sweep histogram integrated
    // against the banding collision curve 1 − (1 − t^r)^b at bucket mids
    "x159_lsh_planner" ->
      s"""WITH $NearDupChain,
         |b AS (SELECT CAST(floor(jaccard / CAST(0.05 AS DOUBLE)) AS BIGINT)
         |   AS bk, count(*) AS n_pairs
         | FROM scored GROUP BY 1),
         |sw AS (SELECT round(bk * CAST(0.05 AS DOUBLE), 2) AS threshold,
         |  n_pairs FROM b),
         |cfg AS (SELECT * FROM (VALUES (4, 2), (8, 2), (8, 4), (16, 4),
         |  (32, 4), (16, 8)) AS t(bands, rows_per_band)),
         |pg AS (SELECT bands, rows_per_band, threshold, n_pairs,
         |  1.0 - pow(1.0 - pow(threshold + 0.025,
         |   CAST(rows_per_band AS DOUBLE)), CAST(bands AS DOUBLE)) AS p
         | FROM sw CROSS JOIN cfg)
         |SELECT bands, rows_per_band,
         | round(sum(CAST(n_pairs AS DOUBLE) * p), 6) AS expected_candidates,
         | CASE WHEN sum(CASE WHEN threshold >= 0.7 THEN n_pairs ELSE 0 END) > 0
         |  THEN round(sum(CASE WHEN threshold >= 0.7
         |    THEN CAST(n_pairs AS DOUBLE) * p ELSE 0.0 END) /
         |   CAST(sum(CASE WHEN threshold >= 0.7 THEN n_pairs ELSE 0 END)
         |    AS DOUBLE), 6) END AS recall_high
         |FROM pg GROUP BY 1, 2""".stripMargin,
    // mirror of Correlation.theilSenByGroup over the x126 zipf points:
    // round-6 pairwise slopes, median = mean of the two middle ranks
    "x160_theil_sen" ->
      s"""WITH c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS f
         | FROM (SELECT source, unnest($Toks) AS term FROM documents)
         | GROUP BY 1, 2),
         |r AS (SELECT source, f, row_number() OVER (PARTITION BY source
         |  ORDER BY f DESC, term ASC) AS rnk FROM c),
         |pts AS (SELECT source, ln(CAST(rnk AS DOUBLE)) AS x,
         |  ln(CAST(f AS DOUBLE)) AS y FROM r WHERE rnk <= 40),
         |pr AS (SELECT a.source, round((b.y - a.y) / (b.x - a.x), 6) AS s
         | FROM pts a JOIN pts b ON a.source = b.source AND a.x < b.x),
         |cn AS (SELECT source, s,
         |  row_number() OVER (PARTITION BY source ORDER BY s) AS rn,
         |  count(*) OVER (PARTITION BY source) AS n FROM pr)
         |SELECT source AS "group", CAST(max(n) AS BIGINT) AS n_pairs,
         | round(avg(s), 6) AS ts_slope
         |FROM cn WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
         | OR rn = CAST(floor((n + 2) / 2.0) AS BIGINT)
         |GROUP BY 1""".stripMargin,
    // split conformal: exact ⌊α(n_cal+1)⌋-th smallest calibration score
    // via the round-6 score jump spine; x19's hash-bucket split (salt
    // "conformal"); vacuous (null thr, zero flags) when k < 1
    "x171_conformal_gate" ->
      s"""WITH t AS (SELECT doc_id, source AS grp, text, $Toks AS toks
         |  FROM documents),
         |s0 AS (SELECT grp, $QualitySql AS sc,
         |  ${bucketSql("doc_id", "conformal")} < 2000 AS cal FROM t),
         |s AS (SELECT * FROM s0 WHERE sc IS NOT NULL),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM s WHERE cal),
         |spine AS (SELECT sc, CAST(count(*) AS BIGINT) AS c
         | FROM s WHERE cal GROUP BY 1),
         |cum AS (SELECT sc, CAST(sum(c) OVER (ORDER BY sc
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |  AS cum FROM spine),
         |thr AS (SELECT min(sc) AS thr FROM cum, n
         | WHERE CAST(floor(CAST(0.1 AS DOUBLE) * (n_cal + 1)) AS BIGINT) >= 1
         |   AND cum >= CAST(floor(CAST(0.1 AS DOUBLE) * (n_cal + 1)) AS BIGINT))
         |SELECT grp AS "group", CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(count(*) FILTER (WHERE sc < thr) AS BIGINT) AS n_flagged,
         | round(CAST(count(*) FILTER (WHERE sc < thr) AS DOUBLE) /
         |   CAST(count(*) AS DOUBLE), 6) AS flag_rate,
         | min(thr) AS thr
         |FROM s, thr WHERE NOT cal GROUP BY grp""".stripMargin,
    // mirror of Sharding.shardManifest: hashKey-idiom 32-bit row hashes,
    // order-independent SUM checksum per hash-assigned shard
    "x173_shard_manifest" ->
      s"""WITH m AS (SELECT ${hashKeySql("doc_id", "manifest")} % 8 AS shard,
         |  doc_id, text, ${rowHashSql("doc_id", "text")} AS h
         | FROM documents)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(length(text)) AS BIGINT) AS n_chars,
         | min(doc_id) AS id_min, max(doc_id) AS id_max,
         | CAST(sum(h) AS BIGINT) AS checksum
         |FROM m GROUP BY shard""".stripMargin,
    // mirror of Evaluation.mondrianGate: x171's construction with the
    // spine window PARTITIONED BY group, per-group n_cal and threshold,
    // left join so eval-only / thin groups read null-thr vacuous
    "x174_mondrian_gate" ->
      s"""WITH t AS (SELECT doc_id, source AS grp, text, $Toks AS toks
         |  FROM documents),
         |s0 AS (SELECT grp, $QualitySql AS sc,
         |  ${bucketSql("doc_id", "conformal")} < 2000 AS cal FROM t),
         |s AS (SELECT * FROM s0 WHERE sc IS NOT NULL),
         |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_cal FROM s
         | WHERE cal GROUP BY 1),
         |spine AS (SELECT grp, sc, CAST(count(*) AS BIGINT) AS c
         | FROM s WHERE cal GROUP BY 1, 2),
         |cum AS (SELECT grp, sc, CAST(sum(c) OVER (PARTITION BY grp
         |  ORDER BY sc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |  AS BIGINT) AS cum FROM spine),
         |thr AS (SELECT grp, min(sc) AS thr FROM cum JOIN n USING (grp)
         | WHERE CAST(floor(CAST(0.25 AS DOUBLE) * (n_cal + 1)) AS BIGINT) >= 1
         |   AND cum >= CAST(floor(CAST(0.25 AS DOUBLE) * (n_cal + 1)) AS BIGINT)
         | GROUP BY 1)
         |SELECT grp AS "group", CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(count(*) FILTER (WHERE sc < thr) AS BIGINT) AS n_flagged,
         | round(CAST(count(*) FILTER (WHERE sc < thr) AS DOUBLE) /
         |   CAST(count(*) AS DOUBLE), 6) AS flag_rate,
         | min(thr) AS thr
         |FROM s LEFT JOIN thr USING (grp) WHERE NOT cal GROUP BY grp""".stripMargin,
    // mirror of Sharding.manifestDiff over the same two perturbed runs:
    // run A drops shard 5, run B drops shard 9, ~1% of rows
    // (hash % 97 = 0) and reverses ~1% of texts (hash % 89 = 1);
    // verdict precedence missing > count_drift > checksum_drift
    "x175_manifest_diff" ->
      s"""WITH db AS (SELECT doc_id,
         |  CASE WHEN ${hashKeySql("doc_id", "diffmut")} % 89 = 1
         |   THEN reverse(text) ELSE text END AS text
         | FROM documents
         | WHERE ${hashKeySql("doc_id", "diffdrop")} % 97 <> 0),
         |ma AS (SELECT shard, CAST(count(*) AS BIGINT) AS docs_a,
         |  CAST(sum(h) AS BIGINT) AS sum_a
         | FROM (SELECT ${hashKeySql("doc_id", "manifest")} % 64 AS shard,
         |   ${rowHashSql("doc_id", "text")} AS h FROM documents)
         | WHERE shard <> 5 GROUP BY 1),
         |mb AS (SELECT shard, CAST(count(*) AS BIGINT) AS docs_b,
         |  CAST(sum(h) AS BIGINT) AS sum_b
         | FROM (SELECT ${hashKeySql("doc_id", "manifest")} % 64 AS shard,
         |   ${rowHashSql("doc_id", "text")} AS h FROM db)
         | WHERE shard <> 9 GROUP BY 1)
         |SELECT COALESCE(ma.shard, mb.shard) AS shard, docs_a, docs_b,
         | CASE WHEN ma.shard IS NULL THEN 'missing_a'
         |      WHEN mb.shard IS NULL THEN 'missing_b'
         |      WHEN docs_a <> docs_b THEN 'count_drift'
         |      WHEN sum_a <> sum_b THEN 'checksum_drift'
         |      ELSE 'unchanged' END AS verdict
         |FROM ma FULL JOIN mb ON ma.shard = mb.shard""".stripMargin,
    // mirror of Comparison.sinkhornResiduals: x172's generated iteration
    // CTEs plus, per round, the coupling's worst marginal deviation per
    // side (raw u·k·v sums, max-abs-diff vs the round-6 marginal, round 6)
    "x176_sinkhorn_residual" -> {
      val iters = (1 to 5).map { i =>
        s"""v$i AS (SELECT vb,
           |  CASE WHEN s > 0 THEN round(wb / s, 6) ELSE 0.0 END AS uv
           | FROM (SELECT vb, sum(kij * u) AS s FROM k
           |   JOIN u${i - 1} USING (va) GROUP BY 1) JOIN b USING (vb)),
           |u$i AS (SELECT va,
           |  CASE WHEN s > 0 THEN round(wa / s, 6) ELSE 0.0 END AS u
           | FROM (SELECT va, sum(kij * uv) AS s FROM k
           |   JOIN v$i USING (vb) GROUP BY 1) JOIN a USING (va))"""
      }.mkString(",\n")
      val rows = (1 to 5).map { i =>
        s"""SELECT CAST($i AS INTEGER) AS iter,
           | (SELECT round(max(abs(s - wa)), 6) FROM (SELECT va,
           |   sum(u * kij * uv) AS s FROM k JOIN u$i USING (va)
           |   JOIN v$i USING (vb) GROUP BY 1) JOIN a USING (va)) AS res_a,
           | (SELECT round(max(abs(s - wb)), 6) FROM (SELECT vb,
           |   sum(u * kij * uv) AS s FROM k JOIN u$i USING (va)
           |   JOIN v$i USING (vb) GROUP BY 1) JOIN b USING (vb)) AS res_b"""
      }.mkString("\nUNION ALL\n")
      s"""WITH c AS (SELECT source AS grp, n_chars // 64 AS v,
         |  count(*) AS c FROM documents
         | WHERE source IN ('src0', 'src1') GROUP BY 1, 2),
         |a AS (SELECT v AS va, round(CAST(c AS DOUBLE) /
         |  (SELECT CAST(sum(c) AS DOUBLE) FROM c WHERE grp = 'src0'), 6)
         |  AS wa FROM c WHERE grp = 'src0'),
         |b AS (SELECT v AS vb, round(CAST(c AS DOUBLE) /
         |  (SELECT CAST(sum(c) AS DOUBLE) FROM c WHERE grp = 'src1'), 6)
         |  AS wb FROM c WHERE grp = 'src1'),
         |k AS (SELECT va, vb,
         |  round(exp(-abs(CAST(va AS DOUBLE) - CAST(vb AS DOUBLE)) / 2.0),
         |   6) AS kij
         | FROM (SELECT va FROM a) CROSS JOIN (SELECT vb FROM b)),
         |u0 AS (SELECT va, 1.0 AS u FROM a),
         |$iters
         |$rows""".stripMargin
    },
    // mirror of Comparison.sinkhornPlan: kernel + marginals rounded at 6,
    // 5 generated alternating-scaling iterations (the x170 discipline),
    // zero-sum rows scale to 0 via the same CASE
    "x172_sinkhorn_plan" -> {
      val iters = (1 to 5).map { i =>
        s"""v$i AS (SELECT vb,
           |  CASE WHEN s > 0 THEN round(wb / s, 6) ELSE 0.0 END AS uv
           | FROM (SELECT vb, sum(kij * u) AS s FROM k
           |   JOIN u${i - 1} USING (va) GROUP BY 1) JOIN b USING (vb)),
           |u$i AS (SELECT va,
           |  CASE WHEN s > 0 THEN round(wa / s, 6) ELSE 0.0 END AS u
           | FROM (SELECT va, sum(kij * uv) AS s FROM k
           |   JOIN v$i USING (vb) GROUP BY 1) JOIN a USING (va))"""
      }.mkString(",\n")
      s"""WITH c AS (SELECT source AS grp, n_chars // 64 AS v,
         |  count(*) AS c FROM documents
         | WHERE source IN ('src0', 'src1') GROUP BY 1, 2),
         |a AS (SELECT v AS va, round(CAST(c AS DOUBLE) /
         |  (SELECT CAST(sum(c) AS DOUBLE) FROM c WHERE grp = 'src0'), 6)
         |  AS wa FROM c WHERE grp = 'src0'),
         |b AS (SELECT v AS vb, round(CAST(c AS DOUBLE) /
         |  (SELECT CAST(sum(c) AS DOUBLE) FROM c WHERE grp = 'src1'), 6)
         |  AS wb FROM c WHERE grp = 'src1'),
         |k AS (SELECT va, vb,
         |  round(exp(-abs(CAST(va AS DOUBLE) - CAST(vb AS DOUBLE)) / 2.0),
         |   6) AS kij
         | FROM (SELECT va FROM a) CROSS JOIN (SELECT vb FROM b)),
         |u0 AS (SELECT va, 1.0 AS u FROM a),
         |$iters
         |SELECT va, vb, round(u * kij * uv, 6) AS mass,
         | round(round(u * kij * uv, 6) *
         |   abs(CAST(va AS DOUBLE) - CAST(vb AS DOUBLE)), 6) AS cell_cost
         |FROM k JOIN u5 USING (va) JOIN v5 USING (vb)
         |WHERE round(u * kij * uv, 6) > 0""".stripMargin
    },
    // mirror of Temporal.stationaryDistribution: the a43 chain with the
    // dangling self-loop patch, 8 generated power iterations, round-6
    // re-synchronized per step
    "x170_stationary_dist" -> {
      val iters = (1 to 8).map { k =>
        s"""pi$k AS (SELECT p.to_state AS s, round(sum(pi * prob), 6) AS pi
           | FROM p JOIN pi${k - 1} ON p.from_state = pi${k - 1}.s
           | GROUP BY 1)"""
      }.mkString(",\n")
      s"""WITH pairs AS (SELECT event_type AS s,
         |  lag(event_type) OVER (PARTITION BY user_id
         |   ORDER BY ts, event_id) AS prev FROM events),
         |tm0 AS (SELECT prev AS from_state, s AS to_state, count(*) AS cnt
         | FROM pairs WHERE prev IS NOT NULL GROUP BY 1, 2),
         |ft AS (SELECT from_state, sum(cnt) AS t FROM tm0 GROUP BY 1),
         |tm AS (SELECT from_state, to_state,
         |  round(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE), 6) AS prob
         | FROM tm0 JOIN ft USING (from_state)),
         |states AS (SELECT DISTINCT s FROM (
         |  SELECT from_state AS s FROM tm
         |  UNION ALL SELECT to_state FROM tm)),
         |dang AS (SELECT s AS from_state, s AS to_state, 1.0 AS prob
         | FROM states WHERE s NOT IN (SELECT from_state FROM tm)),
         |p AS (SELECT * FROM tm UNION ALL SELECT * FROM dang),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM states),
         |pi0 AS (SELECT s, round(1.0 / n, 6) AS pi FROM states CROSS JOIN nn),
         |$iters
         |SELECT s AS state, pi FROM pi8""".stripMargin
    },
    // mirror of Distribution.amsSelfJoinAudit over the token key: the 64
    // tug-of-war counters from the 64 low bits of one md5 per token, mean
    // of squares beside the exact Σ c² — all-integer until the two final
    // divisions
    "x177_ams_selfjoin" -> {
      val xs = (0 until 64).map { i =>
        val c = i / 4 + 1
        val b = 1 << (i % 4)
        s"""CAST(sum(CASE WHEN ((instr('0123456789abcdef',
           |  substring(hx, $c, 1)) - 1) & $b) > 0
           |  THEN 1 ELSE -1 END) AS BIGINT) AS x$i""".stripMargin
      }.mkString(",\n ")
      val sq = (0 until 64).map(i => s"x$i * x$i").mkString(" + ")
      s"""WITH t AS (SELECT unnest($Toks) AS tok FROM documents),
         |h AS (SELECT md5(tok) AS hx FROM t),
         |sk AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
         | $xs
         | FROM h),
         |est AS (SELECT n_rows,
         |  round(CAST($sq AS DOUBLE) / 64.0, 6) AS est_f2 FROM sk),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(sum(c * c) AS BIGINT) AS exact_f2
         | FROM (SELECT tok, count(*) AS c FROM t GROUP BY 1))
         |SELECT n_rows, n_distinct, exact_f2, est_f2,
         | round(abs(est_f2 - CAST(exact_f2 AS DOUBLE))
         |  / CAST(exact_f2 AS DOUBLE), 6) AS rel_err
         |FROM est CROSS JOIN ex""".stripMargin
    },
    // mirror of Dedup.ophEstimate: one 32-bit hash per gram binned mod
    // 16, per-bin minima, clockwise densification via arg_min on modular
    // distance, matched densified slots / 16 per verified candidate pair
    "x178_oph_minhash" ->
      s"""WITH $NearDupChain,
         |ob AS (SELECT doc_id, h % 16 AS bin, min(h) AS mv FROM (
         |  SELECT doc_id, ${hashKeySql("gram", "oph")} AS h FROM (
         |   SELECT doc_id, unnest(grams) AS gram FROM g)) GROUP BY 1, 2),
         |dense AS (SELECT o.doc_id, s.slot,
         |  arg_min(o.mv, (o.bin - s.slot + 16) % 16) AS v
         | FROM ob o CROSS JOIN (SELECT unnest(range(16)) AS slot) s
         | GROUP BY 1, 2),
         |est AS (SELECT s.doc_a, s.doc_b, s.jaccard,
         |  CAST(sum(CASE WHEN da.v = db.v THEN 1 ELSE 0 END) AS DOUBLE)
         |   / 16.0 AS m
         | FROM scored s JOIN dense da ON s.doc_a = da.doc_id
         |  JOIN dense db ON s.doc_b = db.doc_id AND da.slot = db.slot
         | GROUP BY 1, 2, 3)
         |SELECT doc_a, doc_b, jaccard AS j_exact, round(m, 6) AS j_oph
         |FROM est""".stripMargin,
    // mirror of FeatureHash.collisionAudit: corpus term counts, then the
    // 64-dim hashed-slot aggregate with signed cancellation
    "x179_feature_hashing" ->
      s"""WITH t AS (SELECT unnest($Toks) AS tok FROM documents),
         |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
         |h AS (SELECT ${hashKeySql("tok", "fh")} % 64 AS dim,
         |  1 - 2 * (${hashKeySql("tok", "fhsign")} % 2) AS sgn, c FROM c)
         |SELECT dim, CAST(sum(c) AS BIGINT) AS n_tokens,
         | CAST(count(*) AS BIGINT) AS n_distinct,
         | CAST(sum(sgn * c) AS BIGINT) AS net_weight,
         | count(*) > 1 AS collision
         |FROM h GROUP BY 1""".stripMargin,
    // mirror of Curriculum.schedule: |distinct n_chars| jump spine with a
    // cumulative share, √(e/5) competence frame, boundary drawn on the
    // identical k/N double division
    "x180_curriculum" ->
      """WITH spine AS (SELECT CAST(n_chars AS DOUBLE) AS v,
        |  CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM spine),
        |r AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS cum FROM spine),
        |p AS (SELECT v, c, CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) AS pr
        | FROM r CROSS JOIN n),
        |e AS (SELECT CAST(e AS INTEGER) AS epoch,
        |  sqrt(CAST(e AS DOUBLE) / 5.0) AS competence FROM range(1, 6) t(e))
        |SELECT epoch, round(competence, 6) AS competence,
        | CAST(sum(c) AS BIGINT) AS n_docs,
        | round(sum(v * CAST(c AS DOUBLE)) / CAST(sum(c) AS DOUBLE), 6)
        |  AS mean_difficulty
        |FROM p JOIN e ON pr <= competence GROUP BY 1, 2""".stripMargin,
    // mirror of TfIdf.vocabCoverage: count-of-counts spine, cumulative
    // terms/mass above each frequency class, coverage(k) lands in exactly
    // one class (k clamped to the vocabulary size)
    "x181_vocab_coverage" ->
      s"""WITH t AS (SELECT unnest($Toks) AS tok FROM documents),
         |cc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM (
         |  SELECT tok, count(*) AS c FROM t GROUP BY 1) GROUP BY 1),
         |r AS (SELECT c, m,
         |  CAST(coalesce(sum(m) OVER w, 0) AS BIGINT) AS rb,
         |  CAST(coalesce(sum(c * m) OVER w, 0) AS BIGINT) AS mb
         | FROM cc WINDOW w AS (ORDER BY c DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |tot AS (SELECT CAST(sum(m) AS BIGINT) AS nk,
         |  CAST(sum(c * m) AS BIGINT) AS nm FROM cc),
         |ks AS (SELECT CAST(k AS BIGINT) AS k
         | FROM (VALUES (5), (10), (20), (1000)) t(k))
         |SELECT k, least(k, nk) AS n_vocab_used,
         | round(CAST(mb + (least(k, nk) - rb) * c AS DOUBLE)
         |  / CAST(nm AS DOUBLE), 6) AS coverage
         |FROM r CROSS JOIN tot JOIN ks
         | ON rb < least(k, nk) AND rb + m >= least(k, nk)""".stripMargin,
    // mirror of Similarity.kCenterCoreset: generated greedy steps — seed
    // = min id, then per step the farthest row from the selected set
    // (running min-distance frame), ties to the smaller id
    "x182_kcenter_coreset" -> {
      val steps = (2 to 5).map { i =>
        val prevSel = (1 until i).map(j => s"SELECT vec_id FROM p$j")
          .mkString(" UNION ALL ")
        val dNext = if (i < 5)
          s""",
             |d$i AS (SELECT x.vec_id, x.ve,
             |  least(x.d, round(1.0 - ${cosineSql("x.ve", "p.ve")}, 6)) AS d
             | FROM d${i - 1} x CROSS JOIN p$i p)""".stripMargin
        else ""
        s"""p$i AS (SELECT vec_id, ve, d FROM d${i - 1}
           | WHERE vec_id NOT IN ($prevSel)
           | ORDER BY d DESC, vec_id LIMIT 1)$dNext""".stripMargin
      }.mkString(",\n")
      val picks = (2 to 5).map(i =>
        s"SELECT CAST($i AS INTEGER) AS pick, vec_id, d AS radius FROM p$i")
        .mkString("\nUNION ALL ")
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |p1 AS (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT 1),
         |d1 AS (SELECT v.vec_id, v.ve,
         |  round(1.0 - ${cosineSql("v.ve", "p.ve")}, 6) AS d
         | FROM v CROSS JOIN p1 p WHERE v.vec_id <> p.vec_id),
         |$steps
         |SELECT CAST(1 AS INTEGER) AS pick, vec_id,
         | CAST(NULL AS DOUBLE) AS radius FROM p1
         |UNION ALL $picks""".stripMargin
    },
    // mirror of Evaluation.bootstrapCi: 32 hash-seeded Poisson(1)
    // replicate means of n_chars from one aggregate (8 md5s per row,
    // 4 32-bit uniforms each), 2nd/31st order statistics as the interval;
    // thresholds interpolated from the SAME Scala constants
    "x183_bootstrap_ci" -> {
      val cs = graft.analytics.Evaluation.PoissonCdf
      def uExpr(b: Int): String = {
        val g = b / 4
        val s = (b % 4) * 8 + 1
        s"""(list_reduce(list_transform(range($s, ${s + 8}),
           | i -> CAST(instr('0123456789abcdef', substring(h$g, i, 1)) - 1
           |  AS BIGINT)), (a, b) -> a * 16 + b) / 4294967296.0)""".stripMargin
      }
      def wExpr(b: Int): String = {
        val whens = cs.zipWithIndex.map { case (c, j) =>
          s"WHEN u$b < $c THEN $j" }.mkString(" ")
        s"CASE $whens ELSE 6 END"
      }
      val hs = (0 until 8).map(g =>
        s"md5('boot$g:' || CAST(doc_id AS VARCHAR)) AS h$g").mkString(",\n  ")
      val us = (0 until 32).map(b => s"${uExpr(b)} AS u$b").mkString(",\n  ")
      val sums = (0 until 32).map { b =>
        s"""CAST(sum((${wExpr(b)}) * x) AS BIGINT) AS sx$b,
           | CAST(sum(${wExpr(b)}) AS BIGINT) AS sw$b""".stripMargin
      }.mkString(",\n ")
      val ms = (0 until 32).map(b =>
        s"round(CAST(sx$b AS DOUBLE) / CAST(sw$b AS DOUBLE), 6)")
        .mkString(", ")
      s"""WITH hx AS (SELECT n_chars AS x,
         |  $hs
         | FROM documents),
         |ux AS (SELECT x,
         |  $us
         | FROM hx),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(x) AS BIGINT) AS tx,
         | $sums
         | FROM ux),
         |m AS (SELECT n_rows, tx, list_sort([$ms]) AS ms FROM a)
         |SELECT n_rows,
         | round(CAST(tx AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS mean,
         | ms[2] AS ci_lo, ms[31] AS ci_hi FROM m""".stripMargin
    },
    // mirror of Evaluation.clusterAgreement over the x105 IVF assignment:
    // contingency pair counts exact, ARI/NMI arithmetic mirrors the Spark
    // tree term for term (k(k−1) halved in double)
    "x184_cluster_agreement" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |cent AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id % 50 = 0),
         |asg AS (SELECT vec_id, cid FROM (
         | SELECT v.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c) WHERE rn = 1),
         |ct AS (SELECT CAST(e.label AS BIGINT) AS a, g.cid AS b,
         |  CAST(count(*) AS BIGINT) AS nij
         | FROM asg g JOIN embeddings e ON g.vec_id = e.vec_id GROUP BY 1, 2),
         |ma AS (SELECT a, CAST(sum(nij) AS BIGINT) AS ai FROM ct GROUP BY 1),
         |mb AS (SELECT b, CAST(sum(nij) AS BIGINT) AS bj FROM ct GROUP BY 1),
         |tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM ct),
         |sij AS (SELECT CAST(sum(nij * (nij - 1)) AS DOUBLE) / 2.0 AS sij
         | FROM ct),
         |sa AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(sum(ai * (ai - 1)) AS DOUBLE) / 2.0 AS sa FROM ma),
         |sb AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(bj * (bj - 1)) AS DOUBLE) / 2.0 AS sb FROM mb),
         |mi AS (SELECT sum((CAST(nij AS DOUBLE) / CAST(n AS DOUBLE)) *
         |  ln(CAST(n AS DOUBLE) * CAST(nij AS DOUBLE) /
         |   (CAST(ai AS DOUBLE) * CAST(bj AS DOUBLE)))) AS mi
         | FROM ct JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot),
         |ha AS (SELECT -sum((CAST(ai AS DOUBLE) / CAST(n AS DOUBLE)) *
         |  ln(CAST(ai AS DOUBLE) / CAST(n AS DOUBLE))) AS ha
         | FROM ma CROSS JOIN tot),
         |hb AS (SELECT -sum((CAST(bj AS DOUBLE) / CAST(n AS DOUBLE)) *
         |  ln(CAST(bj AS DOUBLE) / CAST(n AS DOUBLE))) AS hb
         | FROM mb CROSS JOIN tot)
         |SELECT n, n_classes, n_clusters,
         | CASE WHEN (sa + sb) / 2.0 - sa * sb /
         |   (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0) <> 0.0
         |  THEN round((sij - sa * sb /
         |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)) /
         |   ((sa + sb) / 2.0 - sa * sb /
         |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)), 6)
         |  END AS ari,
         | CASE WHEN ha + hb <> 0.0 THEN round(2.0 * mi / (ha + hb), 6)
         |  END AS nmi
         |FROM tot CROSS JOIN sij CROSS JOIN sa CROSS JOIN sb
         | CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb""".stripMargin,
    // mirror of Evaluation.sprtGate: ordered per-source LLR walk with
    // constants computed by the SAME Scala expressions the operator uses
    // (1−0.3 ≠ the literal 0.7 in doubles — the shared arithmetic, not
    // shared decimals, is what keeps the crossings identical)
    "x185_sprt_gate" -> {
      val (p0, p1, al, be) = (0.3, 0.5, 0.05, 0.05)
      val lrD = math.log(p1 / p0)
      val lrO = math.log((1 - p1) / (1 - p0))
      val thrA = math.log((1 - be) / al)
      val thrB = math.log(be / (1 - al))
      s"""WITH t AS (SELECT source AS g, doc_id AS o,
         |  CASE WHEN len($Toks) < 45 THEN CAST($lrD AS DOUBLE)
         |   ELSE CAST($lrO AS DOUBLE) END AS l
         | FROM documents),
         |r AS (SELECT g, CAST(row_number() OVER w AS BIGINT) AS rn,
         |  sum(l) OVER w AS cum FROM t
         | WINDOW w AS (PARTITION BY g ORDER BY o)),
         |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(min(CASE WHEN cum >= CAST($thrA AS DOUBLE)
         |    OR cum <= CAST($thrB AS DOUBLE) THEN rn END)
         |   AS BIGINT) AS n_seen
         | FROM r GROUP BY 1)
         |SELECT a.g AS "group", n_docs, n_seen,
         | CASE WHEN n_seen IS NULL THEN 'undecided'
         |      WHEN fc.cum >= CAST($thrA AS DOUBLE) THEN 'reject'
         |      ELSE 'accept' END
         |  AS decision,
         | round(fr.cum, 6) AS llr_final
         |FROM a LEFT JOIN r fc ON a.g = fc.g AND a.n_seen = fc.rn
         | JOIN r fr ON a.g = fr.g AND a.n_docs = fr.rn""".stripMargin
    },
    // mirror of TfIdf.negativeSamplingTable: c^0.75 via sqrt(c·sqrt(c))
    // (sqrt is correctly rounded, pow is not — same identity both sides)
    "x189_negative_sampling" ->
      s"""WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (
         |  SELECT unnest($Toks) AS tok FROM documents) GROUP BY 1),
         |s AS (SELECT tok, cnt,
         |  sqrt(CAST(cnt AS DOUBLE) * sqrt(CAST(cnt AS DOUBLE))) AS sm
         | FROM c),
         |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, sum(sm) AS z FROM s)
         |SELECT tok, cnt,
         | round(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_raw,
         | round(sm / z, 6) AS p_smoothed,
         | round((sm / z) / (CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         |  AS boost
         |FROM s CROSS JOIN t""".stripMargin,
    // mirror of Distribution.cmsAudit: vocabulary counts, 3x8 counter
    // grid summed per (row, slot), top-20 cut (count desc, tok asc),
    // min-over-rows point estimate; `overcount` dodges the OVER keyword
    "x190_cms_audit" -> {
      val sk = (0 until 3).map(d =>
        s"SELECT $d AS row_d, ${hashKeySql("tok", s"cms$d")} % 8 AS slot," +
          " exact FROM c").mkString("\n  UNION ALL ")
      val pr = (0 until 3).map(d =>
        s"SELECT tok, exact, $d AS row_d," +
          s" ${hashKeySql("tok", s"cms$d")} % 8 AS slot FROM top")
        .mkString("\n  UNION ALL ")
      s"""WITH t AS (SELECT unnest($Toks) AS tok FROM documents),
         |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact
         | FROM t GROUP BY 1),
         |sk AS (SELECT row_d, slot, CAST(sum(exact) AS BIGINT) AS counter
         | FROM ($sk) GROUP BY 1, 2),
         |top AS (SELECT tok, exact FROM c ORDER BY exact DESC, tok LIMIT 20),
         |pr AS ($pr),
         |est AS (SELECT p.tok AS key, p.exact,
         |  min(s.counter) AS cms_est
         | FROM pr p JOIN sk s ON p.row_d = s.row_d AND p.slot = s.slot
         | GROUP BY 1, 2)
         |SELECT key, exact, cms_est, cms_est - exact AS overcount
         |FROM est""".stripMargin
    },
    // mirror of Linkage.fieldWeights: x06 verified pairs as matches,
    // offset-171 pairs as the non-match sample, null-safe per-field
    // agreement, add-half smoothing, base-2 LLRs as ln-ratios over ln(2)
    "x191_fellegi_sunter" ->
      s"""WITH $NearDupChain,
         |$FsWeightChain
         |SELECT field, n_match, n_nonmatch,
         | round(mp, 6) AS m_prob, round(up, 6) AS u_prob,
         | round(ln(mp / up) / ln(2), 6) AS w_agree,
         | round(ln((1.0 - mp) / (1.0 - up)) / ln(2), 6) AS w_disagree
         |FROM w""".stripMargin,
    // mirror of Linkage.scorePairs over the x191 model: every LSH
    // candidate (the chain's un-thresholded `scored` frame) scored by
    // the ROUNDED weights the model face publishes, beside its exact
    // Jaccard — fs_match cuts the rounded score at 0
    "x195_fs_score" ->
      s"""WITH $NearDupChain,
         |$FsWeightChain,
         |wr AS (SELECT field,
         |  round(ln(mp / up) / ln(2), 6) AS w_agree,
         |  round(ln((1.0 - mp) / (1.0 - up)) / ln(2), 6) AS w_disagree
         | FROM w),
         |pj AS (SELECT s.doc_a, s.doc_b, ${fsAgreeExprs("a", "b")}
         | FROM scored s JOIN attrs a ON s.doc_a = a.doc_id
         |  JOIN attrs b ON s.doc_b = b.doc_id),
         |pst AS (${fsUnpivotSql("pj", "doc_a, doc_b")}),
         |sc AS (SELECT doc_a, doc_b,
         |  CAST(sum(CASE WHEN agree THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_agree,
         |  round(sum(CASE WHEN agree THEN w_agree ELSE w_disagree END), 6)
         |   AS score
         | FROM pst JOIN wr USING (field) GROUP BY 1, 2)
         |SELECT sc.doc_a, sc.doc_b, n_agree, score, score > 0 AS fs_match,
         | s2.jaccard, s2.jaccard >= 0.3 AS content_match
         |FROM sc JOIN scored s2
         | ON sc.doc_a = s2.doc_a AND sc.doc_b = s2.doc_b""".stripMargin,
    // mirror of Similarity.silhouetteByCluster over the x105 centroid
    // set: nearest/second-nearest centroid cosine distances per vector,
    // s = (b - a)/max(a, b), per-cluster mean and worst
    "x197_silhouette" ->
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         | FROM embeddings),
         |cent AS (SELECT vec_id AS cid, ve AS cv FROM v
         | WHERE vec_id % 50 = 0),
         |d AS (SELECT v.vec_id, c.cid, ${cosineSql("v.ve", "c.cv")} AS cs,
         |  row_number() OVER (PARTITION BY v.vec_id
         |   ORDER BY ${cosineSql("v.ve", "c.cv")} DESC, c.cid) AS rn
         | FROM v CROSS JOIN cent c),
         |per AS (SELECT vec_id,
         |  max(CASE WHEN rn = 1 THEN cid END) AS centroid_id,
         |  max(CASE WHEN rn = 1 THEN 1.0 - cs END) AS a,
         |  max(CASE WHEN rn = 2 THEN 1.0 - cs END) AS b
         | FROM d WHERE rn <= 2 GROUP BY 1),
         |sil AS (SELECT centroid_id,
         |  CASE WHEN b IS NULL THEN 0.0
         |   WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
         |   ELSE 0.0 END AS s
         | FROM per)
         |SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_vecs,
         | round(avg(s), 6) AS mean_silhouette,
         | round(min(s), 6) AS min_silhouette
         |FROM sil GROUP BY 1""".stripMargin,
    // mirror of Validation.dpNoisyCounts at eps=0.8, threshold=24: the
    // -1/eps literal is the SAME Scala double (not a re-derived
    // decimal), the uniform offsets +0.5/2^32, suppression compares the
    // unrounded noisy count
    "x192_dp_release" ->
      s"""WITH g AS (SELECT source AS key, CAST(count(*) AS BIGINT)
         |  AS n_true FROM documents GROUP BY 1),
         |n AS (SELECT key, n_true,
         |  (CAST(${hashKeySql("key", "dplap")} AS DOUBLE) + 0.5)
         |   / 4294967296.0 - 0.5 AS c FROM g),
         |z AS (SELECT key, n_true,
         |  ${-1.0 / 0.8} * CAST(sign(c) AS DOUBLE)
         |   * ln(1.0 - 2.0 * abs(c)) AS noise FROM n)
         |SELECT key, n_true, round(noise, 6) AS noise,
         | round(CAST(n_true AS DOUBLE) + noise, 6) AS noisy_count,
         | CAST(n_true AS DOUBLE) + noise >= 24.0 AS released
         |FROM z""".stripMargin,
    // mirror of Postings.compressionPlan: distinct (doc, term) frame,
    // per-term lag gaps (first posting absolute), varint bytes =
    // ceil(bitlen/7) with bitlen = length(bin(v)) — integer/string
    // built-ins only, no float log at a power-of-two boundary
    "x193_posting_bytes" ->
      s"""WITH t AS (SELECT doc_id, unnest($Toks) AS tok FROM documents),
         |dt AS (SELECT DISTINCT tok AS term, doc_id FROM t),
         |g AS (SELECT term,
         |  coalesce(doc_id - lag(doc_id)
         |    OVER (PARTITION BY term ORDER BY doc_id), doc_id) AS v
         | FROM dt),
         |b AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
         |  CAST(sum((length(bin(v)) + 6) // 7) AS BIGINT) AS vb
         | FROM g GROUP BY 1)
         |SELECT CAST(length(bin(df)) AS INTEGER) AS df_band,
         | CAST(count(*) AS BIGINT) AS n_terms,
         | CAST(sum(df) AS BIGINT) AS n_postings,
         | CAST(sum(df) * 8 AS BIGINT) AS raw_bytes,
         | CAST(sum(vb) AS BIGINT) AS varint_bytes,
         | round(CAST(sum(vb) AS DOUBLE) / CAST(sum(df) * 8 AS DOUBLE), 6)
         |  AS ratio
         |FROM b GROUP BY 1""".stripMargin,
    // mirror of Stylometry.burrowsDelta: (source, term) counts, top-15
    // cut (count desc, term asc), zero-completed grid via cross join,
    // per-term z over a partitioned window, pairwise mean |z_a - z_b|
    "x194_burrows_delta" ->
      s"""WITH t AS (SELECT source, unnest($Toks) AS term FROM documents),
         |st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
         | FROM t GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot
         | FROM st GROUP BY 1),
         |top AS (SELECT term FROM (
         |  SELECT term, sum(c) AS cc FROM st GROUP BY 1)
         | ORDER BY cc DESC, term LIMIT 15),
         |grid AS (SELECT s.source, p.term,
         |  CAST(coalesce(c.c, 0) AS DOUBLE) / CAST(s.tot AS DOUBLE) AS f
         | FROM tot s CROSS JOIN top p
         |  LEFT JOIN st c ON c.source = s.source AND c.term = p.term),
         |z AS (SELECT source, term,
         |  CASE WHEN stddev_pop(f) OVER (PARTITION BY term) > 0
         |   THEN (f - avg(f) OVER (PARTITION BY term))
         |     / stddev_pop(f) OVER (PARTITION BY term)
         |   ELSE 0.0 END AS z
         | FROM grid)
         |SELECT a.source AS source_a, b.source AS source_b,
         | round(avg(abs(a.z - b.z)), 6) AS delta
         |FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,
    // mirror of TextAnalysis.bigramCompressionReport over the one-word-
    // wall fixture: char bigrams by position, per-doc entropy in nats,
    // bits as hn/ln(2), flag compares the unrounded ratio
    "x196_compress_gate" ->
      """WITH d AS (SELECT doc_id, CASE WHEN doc_id % 50 = 0
        |  THEN repeat('spam ', 40) ELSE text END AS text FROM documents),
        |tt AS (SELECT doc_id, lower(trim(text)) AS t FROM d),
        |f AS (SELECT doc_id, t, CAST(length(t) - 1 AS BIGINT) AS n
        | FROM tt WHERE length(t) >= 2),
        |bi0 AS (SELECT doc_id, n, t,
        |  unnest(range(1, 1 + n)) AS i FROM f),
        |bi AS (SELECT doc_id, n,
        |  substring(t, CAST(i AS INTEGER), 2) AS b FROM bi0),
        |c AS (SELECT doc_id, n, b, CAST(count(*) AS BIGINT) AS c
        | FROM bi GROUP BY 1, 2, 3),
        |h AS (SELECT doc_id, n AS n_bigrams,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  sum(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |   * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) AS hn
        | FROM c GROUP BY 1, 2)
        |SELECT doc_id, n_bigrams, n_distinct,
        | round(hn / ln(2), 6) AS bits_per_bigram,
        | round(hn / ln(2) / 16.0, 6) AS est_ratio,
        | hn / ln(2) / 16.0 < 0.25 AS flagged
        |FROM h""".stripMargin,
    // mirror of TfIdf.goodTuring: count-of-counts spine self-joined on
    // r+1; sparse classes read null r*
    "x186_good_turing" ->
      s"""WITH cc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM (
         |  SELECT tok, count(*) AS c FROM (
         |   SELECT unnest($Toks) AS tok FROM documents) GROUP BY 1)
         | GROUP BY 1)
         |SELECT a.c AS r, a.m AS n_r,
         | round(CAST(a.c + 1 AS DOUBLE) * CAST(b.m AS DOUBLE)
         |  / CAST(a.m AS DOUBLE), 6) AS r_star
         |FROM cc a LEFT JOIN cc b ON b.c = a.c + 1
         |ORDER BY r LIMIT 10""".stripMargin,
    // mirror of TfIdf.vocabRichness: GT unseen mass + Chao1 from one
    // spine aggregate; N2 = 0 reads null Chao1
    "x187_vocab_richness" ->
      s"""WITH cc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM (
         |  SELECT tok, count(*) AS c FROM (
         |   SELECT unnest($Toks) AS tok FROM documents) GROUP BY 1)
         | GROUP BY 1),
         |s AS (SELECT CAST(sum(c * m) AS BIGINT) AS n_tokens,
         |  CAST(sum(m) AS BIGINT) AS vocab,
         |  CAST(coalesce(sum(CASE WHEN c = 1 THEN m END), 0) AS BIGINT) AS n1,
         |  CAST(coalesce(sum(CASE WHEN c = 2 THEN m END), 0) AS BIGINT) AS n2
         | FROM cc)
         |SELECT n_tokens, vocab, n1, n2,
         | round(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         |  AS p0_unseen,
         | CASE WHEN n2 > 0 THEN round(CAST(vocab AS DOUBLE)
         |  + CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
         |   / (2.0 * CAST(n2 AS DOUBLE)), 6) END AS chao1
         |FROM s""".stripMargin,
    // mirror of Dedup.bBitEstimate: the NearDupChain's verified pairs +
    // the last hex char of each signature slice; (M − 2^-4)/(1 − 2^-4)
    "x168_bbit_minhash" ->
      s"""WITH $NearDupChain,
         |bb AS (SELECT doc_id, substring(sig0, 8, 1) AS b0,
         |  substring(sig1, 8, 1) AS b1, substring(sig2, 8, 1) AS b2,
         |  substring(sig3, 8, 1) AS b3 FROM sig),
         |est AS (SELECT s.doc_a, s.doc_b, s.jaccard,
         |  CAST(((CASE WHEN a.b0 = b.b0 THEN 1 ELSE 0 END)
         |   + (CASE WHEN a.b1 = b.b1 THEN 1 ELSE 0 END)
         |   + (CASE WHEN a.b2 = b.b2 THEN 1 ELSE 0 END)
         |   + (CASE WHEN a.b3 = b.b3 THEN 1 ELSE 0 END)) AS DOUBLE) / 4.0
         |   AS m
         | FROM scored s JOIN bb a ON s.doc_a = a.doc_id
         |  JOIN bb b ON s.doc_b = b.doc_id)
         |SELECT doc_a, doc_b, jaccard AS j_exact, m,
         | round((m - 0.0625) / 0.9375, 6) AS j_bbit
         |FROM est""".stripMargin,
    // mirror of Similarity.intraListSimilarity over the MMR chain: mean
    // pairwise pool cosine of the pure top-4 vs the MMR-selected 4
    "x169_rerank_diversity" ->
      s"""WITH $MmrChainBody,
         |t4 AS (SELECT query_id, doc_id FROM (
         |  SELECT query_id, doc_id, row_number() OVER (
         |   PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
         |  FROM pool) WHERE rn <= 4),
         |d1 AS (SELECT s.query_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(avg(s.s), 6) AS mean_sim_top
         | FROM sims s JOIN t4 a ON s.query_id = a.query_id AND s.da = a.doc_id
         |  JOIN t4 b ON s.query_id = b.query_id AND s.db = b.doc_id
         | WHERE s.da < s.db GROUP BY 1),
         |d2 AS (SELECT s.query_id, round(avg(s.s), 6) AS mean_sim_mmr
         | FROM sims s JOIN all4 a ON s.query_id = a.query_id AND s.da = a.doc_id
         |  JOIN all4 b ON s.query_id = b.query_id AND s.db = b.doc_id
         | WHERE s.da < s.db GROUP BY 1)
         |SELECT d1.query_id, n_pairs, mean_sim_top, mean_sim_mmr
         |FROM d1 JOIN d2 ON d1.query_id = d2.query_id""".stripMargin,
    // mirror of Profile.benfordAudit: integer-scaled leading digit via
    // string rendering, round-6 share minus round-6 expectation
    "x164_benford" ->
      """WITH u AS (SELECT CAST(round(CAST(value AS DOUBLE) * 100.0, 0)
        |  AS BIGINT) AS u FROM events),
        |c AS (SELECT CAST(substring(CAST(u AS VARCHAR), 1, 1) AS INTEGER)
        |  AS digit, CAST(count(*) AS BIGINT) AS n
        | FROM u WHERE u > 0 GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM c)
        |SELECT digit, n,
        | round(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share,
        | round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford,
        | round(round(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE), 6)
        |  - round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6), 6) AS delta
        |FROM c CROSS JOIN t""".stripMargin,
    // mirror of TextAnalysis.langIdMargin: sorted 5-score list, top minus
    // runner-up, abstain below 2 marker hits
    "x165_langid_margin" ->
      s"""WITH ${langDetectChainSql("documents", "")},
         |sr AS (SELECT doc_id, list_sort([score_de, score_en, score_es,
         |  score_fr, score_zh]) AS ls FROM sc),
         |mg AS (SELECT d.predicted AS detected_lang,
         |  sr.ls[5] - sr.ls[4] AS m
         | FROM d JOIN sr ON d.doc_id = sr.doc_id)
         |SELECT detected_lang, CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(CASE WHEN m < 2 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_abstain,
         | round(avg(CAST(m AS DOUBLE)), 6) AS avg_margin,
         | round(CAST(sum(CASE WHEN m < 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |  / CAST(count(*) AS DOUBLE), 6) AS abstain_rate
         |FROM mg GROUP BY 1""".stripMargin,
    // mirror of Temporal.kaplanMeier: integer day spans, censoring flag,
    // at-risk running remainder, product as exp(sum ln) with the
    // all-churn duration handled as a flag (never ln(0))
    "x166_kaplan_meier" ->
      """WITH s AS (SELECT user_id, min(ts) AS f, max(ts) AS l FROM events
        | GROUP BY 1),
        |e AS (SELECT max(ts) AS oe FROM events),
        |pk AS (SELECT CAST(date_diff('day', CAST(f AS DATE), CAST(l AS DATE))
        |   AS BIGINT) AS t,
        |  (date_diff('day', CAST(l AS DATE), CAST(oe AS DATE)) > 3) AS churn
        | FROM s CROSS JOIN e),
        |bt AS (SELECT t,
        |  CAST(sum(CASE WHEN churn THEN 1 ELSE 0 END) AS BIGINT) AS n_churn,
        |  CAST(sum(CASE WHEN NOT churn THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_censored
        | FROM pk GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_churn + n_censored) AS BIGINT) AS al
        | FROM bt),
        |rk AS (SELECT t, n_churn, n_censored,
        |  al - CAST(coalesce(sum(n_churn + n_censored) OVER (ORDER BY t
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |   AS n_risk
        | FROM bt CROSS JOIN tot),
        |km AS (SELECT t, n_risk, n_churn, n_censored,
        |  max(CASE WHEN n_churn = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead,
        |  sum(CASE WHEN n_churn < n_risk THEN
        |    ln(1.0 - CAST(n_churn AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |   ELSE 0.0 END) OVER (ORDER BY t
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum
        | FROM rk)
        |SELECT t AS t_days, n_risk, n_churn, n_censored,
        | CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lsum), 6) END
        |  AS survival
        |FROM km""".stripMargin,
    // mirror of Profile.jsonFieldHistogram: json_extract_string + cast,
    // floor bucketing, null bucket kept
    "x167_json_props" ->
      """WITH k AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
        |  AS kk FROM events),
        |b AS (SELECT CASE WHEN kk IS NOT NULL THEN
        |   CAST(floor(CAST(kk AS DOUBLE) / 10) AS BIGINT) * 10 END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM k GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM b)
        |SELECT bucket, n,
        | round(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share
        |FROM b CROSS JOIN t""".stripMargin,
    // mirror of Packing.paddingWaste: CASE-chain bucket assignment over
    // the x01 token-count expression, |edges|-row aggregate
    "x162_padding_waste" ->
      s"""WITH t AS (SELECT CAST(len($Toks) AS BIGINT) AS tt FROM documents),
         |b AS (SELECT tt, CAST(CASE WHEN tt <= 16 THEN 16
         |  WHEN tt <= 32 THEN 32 WHEN tt <= 64 THEN 64
         |  ELSE 128 END AS BIGINT) AS seq_len FROM t)
         |SELECT seq_len, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(tt) AS BIGINT) AS total_tokens,
         | CAST(count(*) * max(seq_len) AS BIGINT) AS padded_tokens,
         | CAST(sum(greatest(tt - seq_len, 0)) AS BIGINT) AS truncated_tokens,
         | round(1.0 - CAST(sum(least(tt, seq_len)) AS DOUBLE)
         |  / CAST(count(*) * max(seq_len) AS DOUBLE), 6) AS waste_ratio
         |FROM b GROUP BY 1""".stripMargin,
    // mirror of Validation.skewStrategy: count-of-counts Gini (rank-block
    // arithmetic in longs), round-6 top1 share feeding the rule verdict
    "x163_skew_strategy" ->
      """WITH k AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
        | FROM events GROUP BY 1),
        |cc AS (SELECT cnt AS c, CAST(count(*) AS BIGINT) AS m FROM k
        | GROUP BY 1),
        |r AS (SELECT c, m, CAST(coalesce(sum(m) OVER (ORDER BY c
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |  AS r0 FROM cc),
        |s AS (SELECT CAST(sum(c * m) AS BIGINT) AS n,
        |  CAST(sum(m) AS BIGINT) AS n_keys, CAST(max(c) AS BIGINT) AS mx,
        |  CAST(sum(c * (m * r0 + CAST(floor(CAST(m * (m + 1) AS DOUBLE)
        |   / 2.0) AS BIGINT))) AS BIGINT) AS sr FROM r),
        |e AS (SELECT n, n_keys,
        |  round(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS top1_share,
        |  round(2.0 * CAST(sr AS DOUBLE)
        |    / (CAST(n_keys AS DOUBLE) * CAST(n AS DOUBLE))
        |   - (CAST(n_keys AS DOUBLE) + 1.0) / CAST(n_keys AS DOUBLE), 6)
        |   AS gini FROM s)
        |SELECT n, n_keys, top1_share, gini,
        | CASE WHEN top1_share >= 0.2 THEN 'broadcast_dim_else_salt'
        |  WHEN top1_share >= 0.05 THEN 'aqe_skew_join'
        |  ELSE 'plain_shuffle_join' END AS strategy
        |FROM e""".stripMargin,
    // mirror of TfIdf.hillTailIndex: top-20 order statistics against the
    // 21st, H in one avg, alpha = 1/H (raw H, rounded on emission)
    "x161_hill_tail" ->
      s"""WITH c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS f
         | FROM (SELECT source, unnest($Toks) AS term FROM documents)
         | GROUP BY 1, 2),
         |r AS (SELECT source, f, row_number() OVER (PARTITION BY source
         |  ORDER BY f DESC, term ASC) AS rnk FROM c),
         |kth AS (SELECT source, f AS fk FROM r WHERE rnk = 21),
         |top AS (SELECT r.source, r.f, kth.fk FROM r
         | JOIN kth ON r.source = kth.source WHERE r.rnk <= 20),
         |h AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
         |  avg(ln(CAST(f AS DOUBLE) / CAST(fk AS DOUBLE))) AS hr
         | FROM top GROUP BY 1)
         |SELECT source, n_terms, round(hr, 6) AS h,
         | CASE WHEN hr > 0.0 THEN round(1.0 / hr, 6) END AS alpha
         |FROM h""".stripMargin,
    // mirror of Evaluation.cuped: morning activity as the covariate for
    // afternoon outcome, pooled theta/xbar rounded before the apply
    "x157_cuped" ->
      """WITH u AS (SELECT user_id,
        |  round(sum(CASE WHEN date_part('hour', ts) < 12 THEN value
        |    ELSE 0.0 END), 6) AS x,
        |  round(sum(CASE WHEN date_part('hour', ts) >= 12 THEN value
        |    ELSE 0.0 END), 6) AS y
        | FROM events GROUP BY 1),
        |uv AS (SELECT user_id % 2 AS variant, CAST(x AS DOUBLE) AS x,
        |  CAST(y AS DOUBLE) AS y FROM u),
        |fit AS (SELECT round(sum(x) / CAST(count(*) AS DOUBLE), 6) AS xbar,
        |  round(CASE WHEN sum(x * x) - sum(x) * sum(x)
        |     / CAST(count(*) AS DOUBLE) > 0.0
        |   THEN (sum(x * y) - sum(x) * sum(y) / CAST(count(*) AS DOUBLE)) /
        |    (sum(x * x) - sum(x) * sum(x) / CAST(count(*) AS DOUBLE))
        |   ELSE 0.0 END, 6) AS theta
        | FROM uv),
        |adj AS (SELECT variant, x, y, y - theta * (x - xbar) AS a, theta
        | FROM uv CROSS JOIN fit)
        |SELECT variant, CAST(count(*) AS BIGINT) AS n,
        | round(avg(y), 6) AS mean_y, round(avg(a), 6) AS mean_y_cuped,
        | round(var_samp(y), 6) AS var_y, round(var_samp(a), 6) AS var_y_cuped,
        | round(max(theta), 6) AS theta
        |FROM adj GROUP BY 1""".stripMargin,
    // mirror of Temporal.fanoFactor: (key, hour) integer cells, corpus
    // hour spine, fano = (H·Σc² − n²)/(H·n)
    "x147_fano_burstiness" ->
      """WITH cells AS (SELECT event_type AS k, date_trunc('hour', ts) AS h,
        |  CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |sp AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS hh FROM cells),
        |a AS (SELECT k, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(c * c) AS BIGINT) AS ss FROM cells GROUP BY 1)
        |SELECT k AS key, n AS n_events, hh AS n_hours,
        | round(CAST(hh * ss - n * n AS DOUBLE) / CAST(hh * n AS DOUBLE), 6)
        |  AS fano
        |FROM a CROSS JOIN sp""".stripMargin,
    // mirror of Graph.assortativity: four integer sums over the
    // symmetrized edge-end degree pairs, one final division
    "x143_assortativity" ->
      s"""WITH $DomainGraphChainSql,
         |und AS (SELECT src, dst FROM ed
         | UNION ALL SELECT dst AS src, src AS dst FROM ed),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
         | FROM und GROUP BY 1),
         |en AS (SELECT dx.d AS x, dy.d AS y FROM und u
         | JOIN deg dx ON u.src = dx.node JOIN deg dy ON u.dst = dy.node),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
         |  CAST(sum(x * y) AS BIGINT) AS sxy FROM en)
         |SELECT k AS m_ends,
         | CASE WHEN k * sxx - sx * sx <> 0 THEN
         |  round(CAST(k * sxy - sx * sx AS DOUBLE) /
         |   CAST(k * sxx - sx * sx AS DOUBLE), 6)
         | END AS assortativity
         |FROM s""".stripMargin,
    // GROUPING() in DuckDB and grouping_id() in Spark both put the FIRST
    // cube column in the most significant bit (Postgres bit order)
    "a22_cube_report" ->
      """WITH e AS (SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour, value
        | FROM events)
        |SELECT event_type, hour, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(value), 2) AS sum_value,
        | CAST(GROUPING(event_type, hour) AS INTEGER) AS gid
        |FROM e GROUP BY CUBE(event_type, hour)""".stripMargin,
    // capacity 8 > 5 distinct keys: no Misra-Gries decrement ever fires,
    // so the summary equals the exact counts the oracle states
    "a23_heavy_hitters" ->
      """SELECT event_type AS item, CAST(count(*) AS BIGINT) AS est_count
        |FROM events GROUP BY event_type""".stripMargin,
    // roundtrip identity through the JSONL format: the oracle states the
    // aggregate over the original table (the s05 proof shape)
    // the streaming drain emits each first-seen (user_id, event_type) once
    // (watermark > span ⇒ no eviction ⇒ exact distinct)
    "s08_stream_parity" ->
      """SELECT user_id, event_type FROM events
        |GROUP BY user_id, event_type""".stripMargin,
    // the sentinel-flushed streaming window drain equals the full batch
    // tumbling aggregate (see Pipeline.windowDrainParity)
    "s09_window_drain" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws,
        | event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the sentinel-flushed streaming SESSION drain equals batch gap-island
    // sessionization (Pipeline.sessionDrainParity). No tie-break column in
    // the lag order: islands depend only on each key's sorted ts multiset
    // (tied rows have gap 0 and join the same session under any order),
    // and cnt/sum are order-invariant within a session
    "s11_session_drain" ->
      """WITH o AS (SELECT user_id, ts, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        | FROM events),
        |s AS (SELECT user_id, ts, value,
        |  sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL '1800 seconds'
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM o)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        | epoch_us(max(ts) + INTERVAL '1800 seconds') AS session_end_us,
        | count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // the ordered-replay EWMA drain equals the batch recursive filter;
    // the CTE steps with the same double expression the fold computes
    // (CASTs force double arithmetic — bare literals would be DECIMAL).
    // 3-decimal rounding: see Ewma.drainParity on cross-engine fold ULPs.
    // rn orders by (ts, value) — the same deterministic tie-break the
    // Spark fold sorts by, so same-microsecond rows fold identically on
    // both engines ((ts, value) ties are order-invariant by algebra)
    "s10_ewma_drain" ->
      """WITH RECURSIVE o AS (SELECT CAST(user_id AS VARCHAR) AS station_id,
        |  ts, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, value) AS rn
        | FROM events),
        |r AS (
        | SELECT station_id, ts, value, rn, value AS ewma FROM o WHERE rn = 1
        | UNION ALL
        | SELECT o.station_id, o.ts, o.value, o.rn,
        |  CAST(0.35 AS DOUBLE) * o.value +
        |  (CAST(1 AS DOUBLE) - CAST(0.35 AS DOUBLE)) * r.ewma AS ewma
        | FROM o JOIN r ON o.station_id = r.station_id AND o.rn = r.rn + 1)
        |SELECT station_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value,
        | round(ewma, 3) AS ewma FROM r""".stripMargin,
    // the bucketed-path join must equal the plain join (bucketing is a
    // physical layout, never a semantics change); j13 fixed-point sums
    "j15_bucketed_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        | sum(round(l_quantity * 100)) / 100 AS total_qty,
        | sum(round(l_extendedprice * (1 - l_discount) * 10000)) / 10000
        |  AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    // mirror of Evaluation.aucBy: x125's half-rank BIGINT arithmetic,
    // partitioned per source; one-class groups are NULL
    "x128_auc_by_source" ->
      s"""WITH t AS (SELECT doc_id, text, lang, source, $Toks AS toks
         | FROM documents),
         |q AS (SELECT source, $QualitySql AS s,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM t),
         |b AS (SELECT source, s, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(y) AS BIGINT) AS p FROM q GROUP BY source, s),
         |r AS (SELECT source, p, n, coalesce(sum(n) OVER (PARTITION BY source
         |  ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |   AS cum FROM b),
         |g AS (SELECT source, CAST(sum(p) AS BIGINT) AS n_pos,
         |  CAST(sum(n - p) AS BIGINT) AS n_neg,
         |  sum(p * (2 * cum + n + 1)) AS rp2 FROM r GROUP BY source)
         |SELECT source, n_pos, n_neg,
         | CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |  round(CAST(rp2 - n_pos * (n_pos + 1) AS DOUBLE) /
         |   (2.0 * n_pos * n_neg), 6) END AS auc
         |FROM g""".stripMargin,
    // the stateless stream-static enrichment equals the batch join
    "s14_enrich_drain" ->
      """SELECT e.user_id, e.event_id, e.event_type,
        | c.c_mktsegment AS segment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,
    // the two-sided join-buffer drain equals the batch interval join
    // (inclusive bounds on both ends, inner emission is symmetric)
    "s12_join_drain" ->
      """SELECT p.user_id, p.event_id AS p_event_id,
        | CAST(epoch_us(p.ts) AS BIGINT) AS p_us,
        | c.event_id AS c_event_id, CAST(epoch_us(c.ts) AS BIGINT) AS c_us,
        | c.value AS c_value
        |FROM events p JOIN events c ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts BETWEEN p.ts - INTERVAL '2 hours' AND p.ts""".stripMargin,
    // the s12 join restated LEFT OUTER: every purchase appears, clickless
    // ones with nulls — the null-completion face the streaming drain must
    // force out via watermark eviction before it stops
    "s15_outer_join_drain" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events
        | WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id, ts, value FROM events
        | WHERE event_type = 'click')
        |SELECT p.user_id, p.event_id AS p_event_id,
        | CAST(epoch_us(p.ts) AS BIGINT) AS p_us,
        | c.event_id AS c_event_id, CAST(epoch_us(c.ts) AS BIGINT) AS c_us,
        | c.value AS c_value
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        | AND c.ts BETWEEN p.ts - INTERVAL '2 hours' AND p.ts""".stripMargin,
    // the versioned foreachBatch upsert equals batch latest-per-key:
    // (ts, event_id) last-writer-wins, event_id unique ⇒ tie-free
    "s13_upsert_drain" ->
      """WITH r AS (SELECT user_id, ts, event_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id
        |   ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
        | event_type, value
        |FROM r WHERE rn = 1""".stripMargin,
    "s07_jsonl_roundtrip" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    // pair explode over the distinct-word vocabulary, weighted by word
    // count; l/r char extraction via the parallel-unnest zip; ties are a
    // total lexicographic order so both engines cut the same top-20
    "x63_bpe_pairs" ->
      s"""WITH t AS (SELECT unnest($Toks) AS term FROM documents),
         |v AS (SELECT term, CAST(count(*) AS BIGINT) AS wc FROM t GROUP BY term),
         |p AS (SELECT wc,
         |  unnest(list_transform(range(1, length(term)), i -> term[i:i])) AS lhs,
         |  unnest(list_transform(range(1, length(term)), i -> term[i+1:i+1])) AS rhs
         | FROM v WHERE length(term) >= 2)
         |SELECT lhs, rhs, CAST(sum(wc) AS BIGINT) AS pair_count
         |FROM p GROUP BY lhs, rhs
         |ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 20""".stripMargin,
    // naive global-sort statement of the E-S rule on the same
    // deterministic keys; ln and division are bit-identical on identical
    // inputs, so the orderings agree and the bounded heap must match
    "x68_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
         |q AS (SELECT doc_id, $QualitySql AS w,
         |  (${hashKeySql("doc_id", "wsample")} + 1) / 4294967296.0 AS u FROM t),
         |k AS (SELECT doc_id, CASE WHEN w <= 0.0 THEN CAST('-infinity' AS DOUBLE)
         |  ELSE ln(u) / w END AS ky FROM q),
         |r AS (SELECT doc_id, ky, CAST(row_number() OVER (
         |  ORDER BY ky DESC, doc_id ASC) AS INTEGER) AS rnk FROM k)
         |SELECT doc_id, round(ky, 6) AS es_key, rnk FROM r WHERE rnk <= 100""".stripMargin,
    // the x06 chain instantiated over the corpus ∪ clone batch, filtered
    // to pairs touching the batch — the incremental pass must equal the
    // full-union pass minus old x old (its defining property)
    "x67_delta_neardup" -> {
      val chain = nearDupChainSql(4, 2, src = "p0")
      s"""WITH p0 AS (SELECT doc_id, text FROM documents
         | UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents
         |  WHERE doc_id % 20 = 0),
         |$chain
         |SELECT doc_a, doc_b, jaccard,
         | doc_a >= 100000 AS new_a, doc_b >= 100000 AS new_b
         |FROM scored
         |WHERE jaccard >= 0.3 AND (doc_a >= 100000 OR doc_b >= 100000)""".stripMargin
    },
    // x29's tf-idf tree quantized at 1e-4 over df<=25 terms (the
    // synthetic topic/aspect markers); the pair self-join, dot, norms,
    // and ratio mirror the Spark association order
    "x66_sparse_allpairs" ->
      s"""WITH p0 AS (SELECT doc_id, text || ' topic' || CAST(doc_id % 25 AS VARCHAR)
         |   || ' aspect' || CAST(doc_id % 40 AS VARCHAR) AS text
         | FROM documents),
         |t AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS doc_len,
         |  unnest(toks) AS term FROM (SELECT doc_id, $Toks AS toks FROM p0)),
         |tc AS (SELECT doc_id, doc_len, term, CAST(count(*) AS BIGINT) AS cnt
         | FROM t GROUP BY 1, 2, 3),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM tc GROUP BY term),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |w AS (SELECT doc_id, term,
         |  round((CAST(cnt AS DOUBLE) / CAST(doc_len AS DOUBLE)) *
         |    ln(CAST(n_docs AS DOUBLE) / CAST(dfreq AS DOUBLE)) * 10000.0) AS wq
         | FROM tc JOIN dfq USING (term) CROSS JOIN nn WHERE dfreq <= 25),
         |norms AS (SELECT doc_id, sqrt(sum(wq * wq)) AS nrm FROM w GROUP BY doc_id),
         |d AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.wq * b.wq) AS dot
         | FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         | GROUP BY 1, 2),
         |s AS (SELECT doc_a, doc_b,
         |  round(dot / (na.nrm * nb.nrm), 6) AS cosine
         | FROM d JOIN norms na ON d.doc_a = na.doc_id
         |  JOIN norms nb ON d.doc_b = nb.doc_id)
         |SELECT doc_a, doc_b, cosine FROM s WHERE cosine >= 0.05""".stripMargin,
    // grid from each key's own bounds; bracketing observations via the
    // j07 row_number-asof idiom in both directions; interpolation ratio
    // in integer microseconds so the double math mirrors Spark's tree
    "d24_resample_interpolate" ->
      """WITH o AS (SELECT event_type AS k, ts AS t, max(value) AS v
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT k, min(t) AS lo, max(t) AS hi FROM o GROUP BY k),
        |g AS (SELECT k, unnest(generate_series(lo, hi, INTERVAL 21600 SECOND)) AS t
        | FROM b),
        |p AS (SELECT g.k, g.t, o.t AS pt, o.v AS pv, row_number() OVER (
        |  PARTITION BY g.k, g.t ORDER BY o.t DESC) AS rn
        | FROM g JOIN o ON g.k = o.k AND o.t <= g.t),
        |pp AS (SELECT k, t, pt, pv FROM p WHERE rn = 1),
        |n AS (SELECT g.k, g.t, o.t AS nt, o.v AS nv, row_number() OVER (
        |  PARTITION BY g.k, g.t ORDER BY o.t ASC) AS rn
        | FROM g JOIN o ON g.k = o.k AND o.t >= g.t),
        |nx AS (SELECT k, t, nt, nv FROM n WHERE rn = 1)
        |SELECT pp.k AS event_type, pp.t AS ts,
        | round(CASE WHEN epoch_us(nt) = epoch_us(pt) THEN pv
        |  ELSE pv + (nv - pv) *
        |   (CAST(epoch_us(pp.t) - epoch_us(pt) AS DOUBLE) /
        |    CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE)) END, 6) AS value
        |FROM pp JOIN nx ON pp.k = nx.k AND pp.t = nx.t""".stripMargin,
    // NOAA sunrise/sunset worksheet transliterated, mirroring the Spark
    // expression tree's association order exactly (radians/degrees written
    // as explicit multiplies by pi()/180-style folded constants so both
    // engines run the same double ops); outputs round at 6 dp so 1-ulp
    // trig differences can't flip the hash
    "d25_astral_gate" ->
      """WITH e AS (SELECT event_id, ts, value,
        |  CASE event_id % 3 WHEN 0 THEN 'BSPP' WHEN 1 THEN 'KOSPP'
        |   ELSE 'ZFSPP' END AS station_id,
        |  CASE event_id % 3 WHEN 0 THEN 24.4539 WHEN 1 THEN 24.4764
        |   ELSE 29.1097 END AS lat,
        |  CASE event_id % 3 WHEN 0 THEN 32.7469 WHEN 1 THEN 32.9447
        |   ELSE 32.5964 END AS lon,
        |  (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DOUBLE)
        |   + 2440588.0 - 2451545.0) / 36525.0 AS t,
        |  CAST(epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS DOUBLE)
        |   / 6.0e7 AS mins
        | FROM events),
        |c1 AS (SELECT *,
        |  fmod(280.46646 + t * (36000.76983 + t * 0.0003032), 360.0) AS l0,
        |  357.52911 + t * (35999.05029 - t * 0.0001537) AS m,
        |  0.016708634 - t * (0.000042037 + t * 0.0000001267) AS e,
        |  125.04 - t * 1934.136 AS omega
        | FROM e),
        |c2 AS (SELECT *,
        |  l0 + (sin(m * (pi() / 180.0))
        |        * (1.914602 - t * (0.004817 + t * 0.000014))
        |      + sin((m * 2) * (pi() / 180.0)) * (0.019993 - t * 0.000101)
        |      + sin((m * 3) * (pi() / 180.0)) * 0.000289)
        |    - 0.00569 - sin(omega * (pi() / 180.0)) * 0.00478 AS app,
        |  (23.0 + (26.0 + (21.448 - t * (46.815 + t * (0.00059
        |     - t * 0.001813))) / 60.0) / 60.0)
        |    + cos(omega * (pi() / 180.0)) * 0.00256 AS eps
        | FROM c1),
        |c3 AS (SELECT *,
        |  asin(sin(eps * (pi() / 180.0)) * sin(app * (pi() / 180.0)))
        |    * (180.0 / pi()) AS decl,
        |  power(tan((eps / 2) * (pi() / 180.0)), 2) AS y
        | FROM c2),
        |c4 AS (SELECT *,
        |  ((y * sin((l0 * 2) * (pi() / 180.0))
        |    - e * sin(m * (pi() / 180.0)) * 2
        |    + e * y * sin(m * (pi() / 180.0))
        |        * cos((l0 * 2) * (pi() / 180.0)) * 4
        |    - y * y * sin((l0 * 4) * (pi() / 180.0)) * 0.5
        |    - e * e * sin((m * 2) * (pi() / 180.0)) * 1.25)
        |   * (180.0 / pi())) * 4 AS eot,
        |  acos(greatest(-1.0, least(1.0,
        |    cos(90.833 * (pi() / 180.0))
        |      / (cos(lat * (pi() / 180.0)) * cos(decl * (pi() / 180.0)))
        |    - tan(lat * (pi() / 180.0)) * tan(decl * (pi() / 180.0)))))
        |   * (180.0 / pi()) AS ha
        | FROM c3),
        |c5 AS (SELECT *,
        |  (720.0 - lon * 4 - eot) - ha * 4 AS sunrise,
        |  (720.0 - lon * 4 - eot) + ha * 4 AS sunset
        | FROM c4)
        |SELECT station_id,
        | count(CASE WHEN mins >= sunrise AND mins <= sunset THEN 1 END)
        |   AS day_rows,
        | round(sum(CASE WHEN mins >= sunrise AND mins <= sunset THEN value
        |   ELSE 0.0 END), 2) AS sum_gated,
        | round(min(sunrise), 6) AS min_sunrise,
        | round(max(sunset), 6) AS max_sunset
        |FROM c5 GROUP BY station_id""".stripMargin,
    // naive statement of the per-source calibration rule: one window per
    // source over (score desc, tie hash, id); the Spark side runs the
    // grouped bucket/cell decomposition — the hash match proves it exact
    "x65_source_calibration" ->
      s"""WITH t AS (SELECT doc_id, source, text, $Toks AS toks FROM documents),
         |q AS (SELECT source, doc_id, $QualitySql AS score,
         |  ${hashKeySql("doc_id", "budget")} AS tie FROM t),
         |r AS (SELECT source, doc_id, score,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY score DESC, tie ASC, doc_id ASC) AS BIGINT) AS rnk,
         |  count(*) OVER (PARTITION BY source) AS n FROM q)
         |SELECT source, doc_id, score, rnk,
         | CASE WHEN n <= 1 THEN 0.0
         |  ELSE round(CAST(rnk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE), 6)
         | END AS pct_rank
         |FROM r""".stripMargin,
    // naive statement of the reservoir rule: per-lang row_number over the
    // full hash order; the Spark side never materializes a group's
    // membership (bounded heap) — the hash match proves the equivalence
    "x64_reservoir_sample" ->
      s"""WITH h AS (SELECT lang, doc_id,
         |  ${hashKeySql("doc_id", "reservoir")} AS hk FROM documents),
         |r AS (SELECT lang, doc_id, CAST(row_number() OVER (
         |  PARTITION BY lang ORDER BY hk ASC, doc_id ASC) AS INTEGER) AS rnk
         | FROM h)
         |SELECT lang, doc_id, rnk FROM r WHERE rnk <= 25""".stripMargin,
    // the naive substring rule: positional 4-grams, exact gram equality,
    // maximal consecutive runs per alignment diagonal (gaps-and-islands).
    // The Spark side reaches the same spans through winnow-fingerprint
    // candidate pre-filtering + capped gram blocking — hash equality
    // proves the two-stage plan drops no span on this fixture
    "x75_self_repeats" ->
      s"""WITH $SelfSpanChainSql
         |SELECT doc_id, a_start, b_start, span_len FROM sp""".stripMargin,
    "x76_repeat_fraction" ->
      s"""WITH $SelfSpanChainSql,
         |iv AS (SELECT doc_id,
         |  CAST(unnest(range(b_start, b_start + span_len)) AS INTEGER) AS pos
         | FROM sp),
         |dp AS (SELECT DISTINCT doc_id, pos FROM iv),
         |rc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_repeated
         | FROM dp GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         | coalesce(rc.n_repeated, 0) AS n_repeated,
         | CASE WHEN len(toks) > 0
         |   THEN round(coalesce(rc.n_repeated, 0) / len(toks), 6)
         |   ELSE 0.0 END AS rep_fraction
         |FROM t LEFT JOIN rc USING (doc_id)""".stripMargin,
    "x69_shared_spans" ->
      s"""WITH $SharedSpanChainSql
         |SELECT doc_a, doc_b, a_start, b_start, span_len FROM sp""".stripMargin,
    // the apply step over the same span evidence: intervals explode to
    // (doc, position) rows (DISTINCT collapses overlapping spans), an
    // anti-join drops them from the token stream, and each doc
    // re-assembles in position order — the higher-id copy of every span
    // is removed, the lowest-id copy survives
    "x73_span_removal" ->
      s"""WITH $SharedSpanChainSql,
         |iv AS (SELECT doc_b AS doc_id,
         |  CAST(unnest(range(b_start, b_start + span_len)) AS INTEGER) AS pos
         | FROM sp),
         |dp AS (SELECT DISTINCT doc_id, pos FROM iv),
         |tp AS (SELECT doc_id,
         |  CAST(unnest(range(0, len(toks))) AS INTEGER) AS pos,
         |  unnest(toks) AS tok FROM t),
         |kept AS (SELECT tp.doc_id, tp.pos, tp.tok
         | FROM tp ANTI JOIN dp USING (doc_id, pos)),
         |ka AS (SELECT doc_id,
         |  array_to_string(list(tok ORDER BY pos), ' ') AS text_clean
         | FROM kept GROUP BY doc_id),
         |rm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
         | FROM dp GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(ka.text_clean, '') AS text_clean,
         | coalesce(rm.n_removed, 0) AS n_removed
         |FROM t LEFT JOIN ka USING (doc_id) LEFT JOIN rm USING (doc_id)""".stripMargin,
    // the x69 naive positional-gram chain over probes ∪ shifted corpus,
    // restricted to cross-boundary pairs, then the x73 removal rule over
    // the corpus side only; the id shift is undone in the final select
    "x84_surgical_decontaminate" ->
      s"""WITH cor AS (SELECT doc_id + 1000000 AS doc_id,
         |  CASE WHEN doc_id % 40 = 0 THEN text || ' ${SparkEntry.SharedSpan1}'
         |       WHEN doc_id % 40 = 7 THEN text || ' ${SparkEntry.SharedSpan2}'
         |       ELSE text END AS text FROM documents),
         |pr AS (SELECT CAST(1 AS BIGINT) AS doc_id,
         |   '${SparkEntry.SharedSpan1}' AS text
         | UNION ALL SELECT CAST(2 AS BIGINT), '${SparkEntry.SharedSpan2}'),
         |ad AS (SELECT doc_id, text FROM pr
         | UNION ALL SELECT doc_id, text FROM cor),
         |t AS (SELECT doc_id, $Toks AS toks FROM ad),
         |tf AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 4),
         |p AS (SELECT doc_id, toks,
         |  CAST(unnest(range(0, len(toks) - 3)) AS INTEGER) AS pos FROM tf),
         |g AS (SELECT doc_id, pos,
         |  array_to_string(toks[pos+1:pos+4], ' ') AS gram FROM p),
         |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.pos AS apos, b.pos AS bpos
         | FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
         |r AS (SELECT doc_a, doc_b, apos - bpos AS diag, apos,
         |  apos - row_number() OVER (PARTITION BY doc_a, doc_b, apos - bpos
         |    ORDER BY apos) AS island FROM m),
         |s AS (SELECT doc_a, doc_b, diag, island, min(apos) AS a_start,
         |  count(*) + 3 AS span_len FROM r GROUP BY 1, 2, 3, 4),
         |sp AS (SELECT doc_a, doc_b, CAST(a_start AS BIGINT) AS a_start,
         |  CAST(a_start - diag AS BIGINT) AS b_start,
         |  CAST(span_len AS BIGINT) AS span_len
         | FROM s WHERE span_len >= 12),
         |cx AS (SELECT * FROM sp WHERE doc_a < 1000000 AND doc_b >= 1000000),
         |iv AS (SELECT doc_b AS doc_id,
         |  CAST(unnest(range(b_start, b_start + span_len)) AS INTEGER) AS pos
         | FROM cx),
         |dp AS (SELECT DISTINCT doc_id, pos FROM iv),
         |tc AS (SELECT doc_id, $Toks AS toks FROM cor),
         |tp AS (SELECT doc_id,
         |  CAST(unnest(range(0, len(toks))) AS INTEGER) AS pos,
         |  unnest(toks) AS tok FROM tc),
         |kept AS (SELECT tp.doc_id, tp.pos, tp.tok
         | FROM tp ANTI JOIN dp USING (doc_id, pos)),
         |ka AS (SELECT doc_id,
         |  array_to_string(list(tok ORDER BY pos), ' ') AS text_clean
         | FROM kept GROUP BY doc_id),
         |rm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
         | FROM dp GROUP BY doc_id)
         |SELECT tc.doc_id - 1000000 AS doc_id,
         | coalesce(ka.text_clean, '') AS text_clean,
         | coalesce(rm.n_removed, 0) AS n_removed
         |FROM tc LEFT JOIN ka USING (doc_id) LEFT JOIN rm USING (doc_id)""".stripMargin,
    // chained-CTE replay of the 8-round BPE training loop over the same
    // marker-delimited segmentation: round i recounts adjacent symbol
    // pairs from v{i-1}, cuts the deterministic argmax m{i}, and applies
    // the literal "(l) (r)" -> "(lr)" replace to form v{i}
    "x70_bpe_train" -> bpeTrainSql(8),
    "x72_bpe_encode" -> bpeEncodeSql(8),
    // mirror of Bpe.swapAudit: the full encode chain twice (4- and
    // 8-merge tables) as nested-WITH CTEs, joined per doc, rolled up per
    // source
    "x188_bpe_swap" ->
      s"""WITH ea AS (${bpeEncodeSql(4)}),
         |eb AS (${bpeEncodeSql(8)}),
         |j AS (SELECT d.source, ea.n_pieces AS na, eb.n_pieces AS nb
         | FROM documents d JOIN ea ON d.doc_id = ea.doc_id
         |  JOIN eb ON d.doc_id = eb.doc_id)
         |SELECT source AS "group", CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(na) AS BIGINT) AS tokens_a,
         | CAST(sum(nb) AS BIGINT) AS tokens_b,
         | CAST(sum(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_changed,
         | round(CAST(sum(nb) AS DOUBLE) / CAST(sum(na) AS DOUBLE), 6)
         |  AS ratio
         |FROM j GROUP BY 1""".stripMargin
  )

  /** Chained-CTE replay of [[graft.text.Bpe.train]]'s merge loop (see the
    * x70 map comment). `replace` scans left-to-right non-overlapping in
    * both engines, so the re-segmentation is bit-identical; ties in the
    * argmax are a total (count desc, lhs, rhs) order so both engines cut
    * the same merge every round.
    */
  private def bpeTrainSql(numMerges: Int): String = {
    // AS MATERIALIZED is load-bearing: each round references the previous
    // segmentation twice and the argmax row four times, so inlined CTEs
    // would expand to ~5^numMerges copies of the corpus scan
    val rounds = (1 to numMerges).map { i =>
      s"""p$i AS MATERIALIZED (SELECT lhs, rhs, CAST(sum(wc) AS BIGINT) AS pair_count
         | FROM (SELECT wc,
         |   unnest(list_transform(range(1, len(syms)), j -> syms[j][2:-2])) AS lhs,
         |   unnest(list_transform(range(1, len(syms)), j -> syms[j+1][2:-2])) AS rhs
         |  FROM (SELECT string_split(seg, ' ') AS syms, wc FROM v${i - 1}))
         | GROUP BY lhs, rhs),
         |m$i AS MATERIALIZED (SELECT CAST($i AS INTEGER) AS merge_rank, lhs, rhs, pair_count
         | FROM p$i ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
         |v$i AS MATERIALIZED (SELECT replace(seg,
         |   '(' || (SELECT lhs FROM m$i) || ') (' || (SELECT rhs FROM m$i) || ')',
         |   '(' || (SELECT lhs FROM m$i) || (SELECT rhs FROM m$i) || ')') AS seg, wc
         | FROM v${i - 1})""".stripMargin
    }.mkString(",\n")
    val union = (1 to numMerges).map(i => s"SELECT * FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH t AS (SELECT unnest($Toks) AS term FROM documents),
       |w AS MATERIALIZED (SELECT term, CAST(count(*) AS BIGINT) AS wc FROM t GROUP BY term),
       |v0 AS MATERIALIZED (SELECT trim(regexp_replace(term, '(.)', '(\\1) ', 'g')) AS seg, wc FROM w),
       |$rounds
       |SELECT merge_rank, lhs, rhs, pair_count FROM ($union)""".stripMargin
  }

  /** x72: tokenizer inference replayed in SQL. Same training chain as
    * [[bpeTrainSql]] but the vocabulary rounds CARRY THE TERM, so the final
    * round's segmentation IS each term's encoding (the exact-replay
    * equivalence the Spark face relies on); document tokens then join that
    * term→pieces map and re-assemble in token order.
    */
  private def bpeEncodeSql(numMerges: Int): String = {
    val rounds = (1 to numMerges).map { i =>
      s"""p$i AS MATERIALIZED (SELECT lhs, rhs, CAST(sum(wc) AS BIGINT) AS pair_count
         | FROM (SELECT wc,
         |   unnest(list_transform(range(1, len(syms)), j -> syms[j][2:-2])) AS lhs,
         |   unnest(list_transform(range(1, len(syms)), j -> syms[j+1][2:-2])) AS rhs
         |  FROM (SELECT string_split(seg, ' ') AS syms, wc FROM v${i - 1}))
         | GROUP BY lhs, rhs),
         |m$i AS MATERIALIZED (SELECT lhs, rhs
         | FROM p$i ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
         |v$i AS MATERIALIZED (SELECT term, replace(seg,
         |   '(' || (SELECT lhs FROM m$i) || ') (' || (SELECT rhs FROM m$i) || ')',
         |   '(' || (SELECT lhs FROM m$i) || (SELECT rhs FROM m$i) || ')') AS seg, wc
         | FROM v${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (SELECT unnest($Toks) AS term FROM documents),
       |w AS MATERIALIZED (SELECT term, CAST(count(*) AS BIGINT) AS wc FROM t GROUP BY term),
       |v0 AS MATERIALIZED (SELECT term,
       |  trim(regexp_replace(term, '(.)', '(\\1) ', 'g')) AS seg, wc FROM w),
       |$rounds,
       |enc AS (SELECT term,
       |  list_transform(string_split(seg, ' '), s -> s[2:-2]) AS pieces
       | FROM v$numMerges),
       |dt AS (SELECT doc_id, unnest(toks) AS term,
       |  CAST(unnest(range(len(toks))) AS INTEGER) AS pos
       | FROM (SELECT doc_id, $Toks AS toks FROM documents)),
       |agg AS (SELECT dt.doc_id, flatten(list(enc.pieces ORDER BY dt.pos)) AS allp
       | FROM dt JOIN enc USING (term) GROUP BY dt.doc_id)
       |SELECT d.doc_id, coalesce(array_to_string(agg.allp, ' '), '') AS encoded,
       | CAST(coalesce(len(agg.allp), 0) AS INTEGER) AS n_pieces
       |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin
  }
}
