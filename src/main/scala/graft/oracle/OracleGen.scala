package graft.oracle

import graft.functions.Vec

/** Generators for the heavyweight DuckDB oracle SQL (minhash/simhash/
  * LSH queries). The SQL mirrors the Spark operators step by step —
  * same md5-60 token hash, same permutation constants, same ordered
  * double folds — so results hash-match exactly.
  */
object OracleGen {

  private val P = Vec.MinhashPrime

  private def md560(e: String) = s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** ordered left-fold sum with 0.0 init, matching Spark's aggregate() */
  private def lsum(listExpr: String) =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $listExpr), (a, b) -> a + b)"

  private def dotPlane(vecExpr: String, plane: Array[Double]): String = {
    val lit = plane.map(_.toString).mkString("[", ", ", "]")
    lsum(s"list_transform(range(1, len($vecExpr)+1), i -> CAST($vecExpr[i] AS DOUBLE) * ($lit)[i])")
  }

  /** sign-bit LSH bucket id, mirroring Vec.lshBucket */
  private def bucketExpr(vecExpr: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (plane, p) =>
      s"(CASE WHEN ${dotPlane(vecExpr, plane)} > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", "\n      + ", ")")

  private def cosineExpr(a: String, b: String): String = {
    val dot = lsum(s"list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))")
    val na = lsum(s"list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))")
    val nb = lsum(s"list_transform(range(1, len($b)+1), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))")
    s"$dot / (sqrt($na) * sqrt($nb))"
  }

  /** mirror of TextDemos.dedupCanonicalize: the recursive-CTE cluster
    * labels (as a parenthesized subquery — its own WITH RECURSIVE
    * nests there) scored by token count; rank-1 per cluster on
    * (n_tokens DESC, doc_id) is canonical. */
  def dedupCanonicalizeSql(k: Int = 32, bands: Int = 8, minEst: Double = 0.25): String = {
    val clusters = dedupClustersSql(k, bands, minEst)
      .replaceAll("(?s)\\s*ORDER BY doc_id\\s*$", "")
    s"""WITH scored AS (
       |  SELECT c.doc_id, c.cluster,
       |         CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM (
       |$clusters
       |  ) c JOIN documents d ON d.doc_id = c.doc_id
       |)
       |SELECT doc_id, cluster, n_tokens,
       |       (ROW_NUMBER() OVER (PARTITION BY cluster
       |                           ORDER BY n_tokens DESC, doc_id) = 1) AS is_canonical
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** mirror of TextDemos.minhashLshEval: the C2 prediction CTE joined
    * against exact shingle-Jaccard ground truth (shingle self-join —
    * only pairs sharing a shingle can exceed 0), one summary row. */
  def minhashLshEvalSql(k: Int = 32, bands: Int = 8, minEst: Double = 0.25,
                        jacT: Double = 0.25): String = {
    // keep only the CTE chain (t .. cand/sig); the prediction SELECT
    // is re-stated below as its own `pred` CTE
    val chain = minhashLshSql(k, bands, minEst)
      .replaceAll("(?s)\\nSELECT c\\.id_a.*$", "")
      .replaceFirst("^WITH ", "")
    val matches = (0 until k)
      .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $chain, tt AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents
       |), ss AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh2
       |  FROM tt
       |), ex2 AS (
       |  SELECT doc_id, unnest(sh2) AS g FROM ss WHERE len(sh2) > 0
       |), sz AS (
       |  SELECT doc_id, CAST(len(sh2) AS BIGINT) AS sz FROM ss
       |), cap AS (
       |  SELECT GREATEST(CAST(5 AS BIGINT), CAST(COUNT(*) AS BIGINT) // 100) AS df_cap
       |  FROM documents
       |), dfq AS (
       |  SELECT g, CAST(COUNT(*) AS BIGINT) AS d FROM ex2 GROUP BY g
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i,
       |         CAST(COALESCE(SUM(CASE WHEN f.d <= (SELECT df_cap FROM cap)
       |                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS ic
       |  FROM ex2 a
       |  JOIN dfq f ON f.g = a.g
       |  JOIN ex2 b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |), truth AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sz sa ON sa.doc_id = id_a
       |  JOIN sz sb ON sb.doc_id = id_b
       |  WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= $jacT
       |), truthc AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sz sa ON sa.doc_id = id_a
       |  JOIN sz sb ON sb.doc_id = id_b
       |  WHERE CAST(ic AS DOUBLE) / CAST(sa.sz + sb.sz - ic AS DOUBLE) >= $jacT
       |), pred AS (
       |  SELECT c.id_a, c.id_b
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.id_a
       |  JOIN sig sb ON sb.doc_id = c.id_b
       |  WHERE CAST($matches AS DOUBLE) / $k >= $minEst
       |), counts AS (
       |  SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       |         CAST((SELECT COUNT(*) FROM pred) AS BIGINT) AS n_pred,
       |         CAST((SELECT COUNT(*) FROM pred p JOIN truth t
       |                 ON p.id_a = t.id_a AND p.id_b = t.id_b) AS BIGINT) AS n_hit,
       |         (SELECT df_cap FROM cap) AS df_cap,
       |         CAST((SELECT COUNT(*) FROM dfq WHERE d > (SELECT df_cap FROM cap)) AS BIGINT) AS n_hot,
       |         CAST((SELECT COUNT(*) FROM truthc) AS BIGINT) AS n_truth_capped,
       |         CAST((SELECT COUNT(*) FROM pred p JOIN truthc t
       |                 ON p.id_a = t.id_a AND p.id_b = t.id_b) AS BIGINT) AS n_hit_capped
       |)
       |SELECT n_truth, n_pred, n_hit,
       |       CASE WHEN n_pred > 0 THEN CAST(n_hit AS DOUBLE) / CAST(n_pred AS DOUBLE) ELSE 0.0 END AS precision,
       |       CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE) ELSE 0.0 END AS recall,
       |       df_cap, n_hot, n_truth_capped, n_hit_capped,
       |       CASE WHEN n_pred > 0 THEN CAST(n_hit_capped AS DOUBLE) / CAST(n_pred AS DOUBLE) ELSE 0.0 END AS precision_capped,
       |       CASE WHEN n_truth_capped > 0 THEN CAST(n_hit_capped AS DOUBLE) / CAST(n_truth_capped AS DOUBLE) ELSE 0.0 END AS recall_capped
       |FROM counts""".stripMargin
  }

  /** mirror of TextDemos.clusterRepresentative: argmax quality score
    * per minhash-LSH cluster, ties to the smallest doc_id (the quality
    * expression is the quality_score oracle's, verbatim). */
  def clusterRepresentativeSql(k: Int = 32, bands: Int = 8, minEst: Double = 0.25): String = {
    val clusters = dedupClustersSql(k, bands, minEst)
      .replaceAll("(?s)\\s*ORDER BY doc_id\\s*$", "")
    s"""WITH q AS (
       |  SELECT doc_id,
       |    0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
       |    + 0.3 * (CASE WHEN CAST(len(toks) AS DOUBLE) > 0 THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END)
       |    + 0.3 * (CASE WHEN length(text) > 0 THEN CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) ELSE 0.0 END) AS score
       |  FROM (SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents)
       |), j AS (
       |  SELECT c.cluster, c.doc_id, q.score FROM (
       |$clusters
       |  ) c JOIN q ON q.doc_id = c.doc_id
       |), r AS (
       |  SELECT cluster, doc_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY score DESC, doc_id) AS rn,
       |         COUNT(*) OVER (PARTITION BY cluster) AS n_members
       |  FROM j
       |)
       |SELECT cluster, doc_id AS rep_doc_id, score AS rep_score,
       |       CAST(n_members AS BIGINT) AS n_members
       |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin
  }

  /** mirror of TextDemos.randProjReduce — the sign literals come from
    * the SAME graft.operators.Similarity.jlSign call the Spark
    * expression inlines, so both engines multiply by the same matrix;
    * the sums are integer (post-quantization), hence order-free. */
  def randProjSql(dim: Int = 64, outDim: Int = 16): String = {
    val cols = (0 until outDim).map { j =>
      val signs = (0 until dim)
        .map(i => graft.operators.Similarity.jlSign(i, j, outDim))
        .mkString("[", ", ", "]")
      s"CAST(list_sum(list_transform(range(1, ${dim + 1}), i -> " +
        s"CAST(round(CAST(embedding[i] AS DOUBLE) * 1000.0, 0) AS BIGINT) * ($signs)[i])) AS BIGINT) AS p$j"
    }.mkString(",\n  ")
    s"""SELECT vec_id,
       |  $cols
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  /** the basis TextDemos.pcaProjectOracle fitted in this process; the
    * projection oracle interpolates its literals. Verify runs queries
    * BEFORE dumping oracle SQL, so the recorded model is the one the
    * committed parquet used. */
  @volatile private var pcaModel: Option[graft.operators.Similarity.PcaModel] = None
  def recordPcaModel(m: graft.operators.Similarity.PcaModel): Unit =
    pcaModel = Some(m)

  /** mirror of TextDemos.pcaProjectOracle — PROJECTION only, against
    * the recorded fit (eigendecomposition is spec-gated, not mirrored).
    * Determinism: the Spark side projects with float components
    * (graft_dot: ordered double fold of float×float widened products),
    * and float→double widening is exact, so each component interpolates
    * as the double values of its floats; the centering offset is the
    * driver's scalar verbatim (same arrays, same fold order). Shortest
    * double repr round-trips through DuckDB's parser bit-exactly. */
  def pcaProjectSql(dim: Int = 64, k: Int = 8): String = pcaModel match {
    case None =>
      // evaluated without the demo having run in this process — only
      // possible outside the Verify contract; fail this row loudly
      // rather than comparing against nothing
      "SELECT 'pca_project oracle requested before the demo fitted a model' AS err"
    case Some(m) =>
      val cols = m.components.take(k).zipWithIndex.map { case (comp, j) =>
        val cf = comp.map(_.toFloat)
        val lits = cf.map(f => f.toDouble.toString).mkString("[", ", ", "]")
        val offset = cf.zip(m.mean).map { case (c, mm) => c.toDouble * mm }.sum
        s"round(${lsum(s"list_transform(range(1, ${dim + 1}), i -> " +
          s"CAST(embedding[i] AS DOUBLE) * ($lits)[i])")} - ($offset), 6) AS p$j"
      }.mkString(",\n  ")
      s"""SELECT vec_id,
         |  $cols
         |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  /** mirror of TextDemos.trainingShuffle (md5-60 seed-keyed order) */
  def trainingShuffleSql(seed: String = "42", nShards: Int = 8): String =
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |         ${md560(s"(CAST(doc_id AS VARCHAR) || '_$seed')")} AS k
       |  FROM documents
       |)
       |SELECT doc_id, CAST(k % $nShards AS BIGINT) AS shard,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY k % $nShards
       |                               ORDER BY k, doc_id) AS BIGINT) AS pos
       |FROM keyed ORDER BY doc_id""".stripMargin

  /** mirror of TextDemos.trainingPrepTail: canonical survivors →
    * seed-keyed epoch shuffle → per-shard concat-and-chunk pack, the
    * three stage oracles composed in the same order. */
  def trainingPrepSql(capacity: Int = 2048, seed: String = "42",
                      nShards: Int = 8): String = {
    val canon = dedupCanonicalizeSql()
      .replaceAll("(?s)\\s*ORDER BY doc_id\\s*$", "")
    s"""WITH surv AS (
       |  SELECT doc_id, n_tokens FROM (
       |$canon
       |  ) WHERE is_canonical
       |), keyed AS (
       |  SELECT doc_id, n_tokens,
       |         ${md560(s"(CAST(doc_id AS VARCHAR) || '_$seed')")} AS k
       |  FROM surv
       |), epoch AS (
       |  SELECT doc_id, n_tokens, CAST(k % $nShards AS BIGINT) AS shard,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY k % $nShards
       |                                 ORDER BY k, doc_id) AS BIGINT) AS pos
       |  FROM keyed
       |), w AS (
       |  SELECT doc_id, shard, pos, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS e
       |  FROM epoch
       |)
       |SELECT doc_id, shard, pos, n_tokens, e - n_tokens AS start_off,
       |  CAST((e - n_tokens) // $capacity AS BIGINT) AS first_chunk,
       |  CASE WHEN n_tokens > 0 THEN CAST((e - 1) // $capacity AS BIGINT)
       |       ELSE CAST((e - n_tokens) // $capacity AS BIGINT) END AS last_chunk,
       |  CASE WHEN n_tokens > 0
       |       THEN CAST((e - 1) // $capacity - (e - n_tokens) // $capacity + 1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS n_chunks
       |FROM w ORDER BY doc_id""".stripMargin
  }

  /** shared CTE chain for the duplicate-span oracles: positional
    * k-token window hashes → ≥minDocs-distinct-doc duplicate set →
    * per-doc island merge into [span_start, span_end] intervals —
    * mirroring Dedup.duplicateSpans step by step (md5-60 window hash,
    * same overlap-or-adjacent merge rule). */
  /** the span-detection CTE chain parameterized by the training-side
    * WHERE and the dirty-hash-set CTE — shared by the within-corpus
    * (C30) and benchmark-overlap (C83) forms. */
  private def spanCore(k: Int, trainWhere: String, dirtyCtes: String): String = {
    val gram = (0 until k).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents$trainWhere
       |), g AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - $k + 2),
       |    i -> struct_pack(pos := i - 1, h := ${md560(s"($gram)")}))) AS u
       |  FROM t WHERE len(toks) >= $k
       |), w AS (
       |  SELECT doc_id, u.pos AS pos, u.h AS h FROM g
       |), $dirtyCtes, hits AS (
       |  SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)
       |), marked AS (
       |  SELECT doc_id, pos,
       |    MAX(pos + ${k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
       |  FROM hits
       |), islands AS (
       |  SELECT doc_id, pos,
       |    SUM(CASE WHEN prev_max_end IS NULL OR pos > prev_max_end + 1 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
       |  FROM marked
       |), spans AS (
       |  SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       |         CAST(MAX(pos) + ${k - 1} AS BIGINT) AS span_end,
       |         CAST(COUNT(*) AS BIGINT) AS n_windows
       |  FROM islands GROUP BY doc_id, island
       |)""".stripMargin
  }

  private def dupSpanCore(k: Int, minDocs: Int): String =
    spanCore(k, "",
      s"""dup AS (
         |  SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= $minDocs
         |)""".stripMargin)

  /** the C83 form: the dirty set is the %20 benchmark slice's distinct
    * window hashes; the training side excludes the benchmark. */
  private def contamSpanCore(k: Int): String = {
    val gram = (0 until k).map(j => s"btoks[i+$j]").mkString(" || ' ' || ")
    spanCore(k, " WHERE doc_id % 20 <> 0",
      s"""bt AS (
         |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS btoks
         |  FROM documents WHERE doc_id % 20 = 0
         |), bg AS (
         |  SELECT unnest(list_transform(range(1, len(btoks) - $k + 2),
         |    i -> ${md560(s"($gram)")})) AS h
         |  FROM bt WHERE len(btoks) >= $k
         |), dup AS (
         |  SELECT DISTINCT h FROM bg
         |)""".stripMargin)
  }

  /** the order-preserving rebuild tail shared by the two scrub
    * mirrors; `docWhere` restricts the surviving-document spine. */
  private def scrubTail(docWhere: String): String =
    s""", tokpos AS (
       |  SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |      i -> struct_pack(pos := i - 1, tok := toks[i]))) AS u
       |    FROM t) q
       |), surviving AS (
       |  SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
       |  WHERE NOT EXISTS (SELECT 1 FROM spans s
       |    WHERE s.doc_id = tp.doc_id
       |      AND tp.pos BETWEEN s.span_start AND s.span_end)
       |)
       |SELECT d.doc_id,
       |       coalesce(string_agg(sv.tok, ' ' ORDER BY sv.pos), '') AS scrubbed_text
       |FROM (SELECT doc_id FROM documents$docWhere) d
       |LEFT JOIN surviving sv ON sv.doc_id = d.doc_id
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** mirror of TextDemos.dupSpanDetect */
  def dupSpansSql(k: Int = 8, minDocs: Int = 2): String =
    s"""WITH ${dupSpanCore(k, minDocs)}
       |SELECT doc_id, span_start, span_end, n_windows
       |FROM spans ORDER BY doc_id, span_start""".stripMargin

  /** mirror of TextDemos.dupSpanScrub: tokens not covered by any span
    * rebuild the document order-preserving; every doc survives. */
  def dupSpanScrubSql(k: Int = 8, minDocs: Int = 2): String =
    s"WITH ${dupSpanCore(k, minDocs)}${scrubTail("")}"

  /** mirror of TextDemos.contaminationSpansDemo */
  def contamSpansSql(k: Int = 8): String =
    s"""WITH ${contamSpanCore(k)}
       |SELECT doc_id, span_start, span_end, n_windows
       |FROM spans ORDER BY doc_id, span_start""".stripMargin

  /** mirror of TextDemos.contaminationScrubDemo */
  def contamScrubSql(k: Int = 8): String =
    s"WITH ${contamSpanCore(k)}${scrubTail(" WHERE doc_id % 20 <> 0")}"

  /** mirror of TextDemos.dedupClusters: connected components over the
    * minhash pairs, as a recursive CTE computing per-node min reachable
    * label (exact fixpoint, like the iterative Spark propagation). */
  def dedupClustersSql(k: Int = 32, bands: Int = 8, minEst: Double = 0.25): String = {
    val pairsCore = minhashLshSql(k, bands, minEst)
      .replaceAll("(?s)\\s*ORDER BY c.id_a, c.id_b\\s*$", "")
    s"""WITH RECURSIVE pairs AS (
       |$pairsCore
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), walk(src, lbl) AS (
       |  SELECT doc_id AS src, doc_id AS lbl FROM documents
       |  UNION
       |  SELECT e.src, w.lbl FROM edges e JOIN walk w ON e.dst = w.src
       |)
       |SELECT src AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster
       |FROM walk GROUP BY src ORDER BY doc_id""".stripMargin
  }

  /** mirror of TextDemos.dedupMinhashLsh (md5-60 hash, string band keys) */
  def minhashLshSql(k: Int = 32, bands: Int = 8, minEst: Double = 0.25): String = {
    val rows = k / bands
    val mins = (0 until k).map { i =>
      val a = 2L * i + 1
      val b = (i * 2654435761L) % P
      s"MIN(($a * hh + $b) % $P) AS m$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rows).map(r => s"CAST(m${b * rows + r} AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val matches = (0 until k).map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM t
       |), ex AS (
       |  SELECT doc_id, unnest(sh) AS tok FROM s WHERE len(sh) > 0
       |), h AS (
       |  SELECT doc_id, ${md560("tok")} % $P AS hh FROM ex
       |), sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM h GROUP BY doc_id
       |), bands AS (
       |  $bandSelects
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |)
       |SELECT c.id_a, c.id_b, CAST($matches AS DOUBLE) / $k AS est_sim
       |FROM cand c
       |JOIN sig sa ON sa.doc_id = c.id_a
       |JOIN sig sb ON sb.doc_id = c.id_b
       |WHERE CAST($matches AS DOUBLE) / $k >= $minEst
       |ORDER BY c.id_a, c.id_b""".stripMargin
  }

  /** mirror of TextDemos.setsimJoin (SetSim.prefixJaccardJoin): the
    * prefix/length/positional filters are exact prunes, so the oracle
    * reproduces them literally — same rarity order (df asc, md5-60
    * hash asc), same probing prefix `s - ceil(t*s) + 1`, same
    * PPJoin positional bound — and verifies the survivors with the
    * identical exact-Jaccard algebra. Every ceil carries the same
    * `- 1e-9` epsilon guard as SetSim.ceilEps (here and in the
    * containment/R-S mirrors below): t·s in binary doubles can land
    * 1 ulp above an exact integer and inflate the overlap requirement
    * by 1 — both engines must round the same way or the prune sets
    * diverge at exact-boundary thresholds. */
  def setSimJoinSql(threshold: Double = 0.5, n: Int = 3): String = {
    val t = threshold
    val ratio = threshold / (1.0 + threshold)
    val gram = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""WITH t0 AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |), s0 AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - ${n - 2}),
       |    i -> ($gram))) AS sh
       |  FROM t0 WHERE len(toks) >= $n
       |), hs AS (
       |  SELECT doc_id, list_distinct(list_transform(sh, g -> ${md560("g")})) AS hset
       |  FROM s0 WHERE len(sh) > 0
       |), ex AS (
       |  SELECT doc_id, unnest(hset) AS h FROM hs
       |), dfc AS (
       |  SELECT h, COUNT(*) AS df FROM ex GROUP BY h
       |), ord AS (
       |  SELECT e.doc_id, list(e.h ORDER BY d.df, e.h) AS otoks,
       |         CAST(COUNT(*) AS BIGINT) AS s
       |  FROM ex e JOIN dfc d USING (h) GROUP BY e.doc_id
       |), pre AS (
       |  SELECT doc_id, s, u.pos AS pos, u.h AS h
       |  FROM (SELECT doc_id, s,
       |          unnest(list_transform(
       |            range(1, s - CAST(ceil(CAST(s AS DOUBLE) * $t - 1e-9) AS BIGINT) + 2),
       |            i -> struct_pack(pos := CAST(i AS BIGINT), h := otoks[i]))) AS u
       |        FROM ord)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM pre a JOIN pre b ON b.h = a.h AND a.doc_id < b.doc_id
       |  WHERE CAST(least(a.s, b.s) AS DOUBLE) >= CAST(greatest(a.s, b.s) AS DOUBLE) * $t
       |    AND CAST(1 + least(a.s - a.pos, b.s - b.pos) AS DOUBLE)
       |        >= ceil(CAST(a.s + b.s AS DOUBLE) * $ratio - 1e-9)
       |), v AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_filter(x.hset, e -> list_contains(y.hset, e))) AS BIGINT) AS overlap,
       |    CAST(len(x.hset) AS BIGINT) AS sz_a, CAST(len(y.hset) AS BIGINT) AS sz_b
       |  FROM cand c
       |  JOIN hs x ON x.doc_id = c.id_a
       |  JOIN hs y ON y.doc_id = c.id_b
       |)
       |SELECT id_a, id_b, overlap,
       |  sz_a + sz_b - overlap AS union_size,
       |  round(CAST(overlap AS DOUBLE) / (sz_a + sz_b - overlap), 6) AS jaccard
       |FROM v
       |WHERE round(CAST(overlap AS DOUBLE) / (sz_a + sz_b - overlap), 6) >= $t
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** mirror of TextDemos.containJoinDemo (SetSim.containmentJoin):
    * same shingle/rarity CTEs as setSimJoinSql, probe prefix with the
    * same lemma formula, the B side exploded IN FULL (containment
    * admits no B-prefix), the asymmetric length/positional prunes
    * (both against ceil(t*s_a)), exact-intersection verify on
    * |A∩B| / |A|. */
  def containJoinSql(threshold: Double = 0.8, n: Int = 3): String = {
    val t = threshold
    val gram = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""WITH t0 AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |), s0 AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - ${n - 2}),
       |    i -> ($gram))) AS sh
       |  FROM t0 WHERE len(toks) >= $n
       |), hs AS (
       |  SELECT doc_id, list_distinct(list_transform(sh, g -> ${md560("g")})) AS hset
       |  FROM s0 WHERE len(sh) > 0
       |), ex AS (
       |  SELECT doc_id, unnest(hset) AS h FROM hs
       |), dfc AS (
       |  SELECT h, COUNT(*) AS df FROM ex GROUP BY h
       |), ord AS (
       |  SELECT e.doc_id, list(e.h ORDER BY d.df, e.h) AS otoks,
       |         CAST(COUNT(*) AS BIGINT) AS s
       |  FROM ex e JOIN dfc d USING (h) GROUP BY e.doc_id
       |), pre AS (
       |  SELECT doc_id, s, u.pos AS pos, u.h AS h
       |  FROM (SELECT doc_id, s,
       |          unnest(list_transform(
       |            range(1, s - CAST(ceil(CAST(s AS DOUBLE) * $t - 1e-9) AS BIGINT) + 2),
       |            i -> struct_pack(pos := CAST(i AS BIGINT), h := otoks[i]))) AS u
       |        FROM ord)
       |), bfull AS (
       |  SELECT doc_id, s, u.pos AS pos, u.h AS h
       |  FROM (SELECT doc_id, s,
       |          unnest(list_transform(range(1, s + 1),
       |            i -> struct_pack(pos := CAST(i AS BIGINT), h := otoks[i]))) AS u
       |        FROM ord)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM pre a JOIN bfull b ON b.h = a.h AND a.doc_id <> b.doc_id
       |  WHERE CAST(b.s AS DOUBLE) >= ceil(CAST(a.s AS DOUBLE) * $t - 1e-9)
       |    AND CAST(1 + least(a.s - a.pos, b.s - b.pos) AS DOUBLE)
       |        >= ceil(CAST(a.s AS DOUBLE) * $t - 1e-9)
       |), v AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_filter(x.hset, e -> list_contains(y.hset, e))) AS BIGINT) AS overlap,
       |    CAST(len(x.hset) AS BIGINT) AS sz_a, CAST(len(y.hset) AS BIGINT) AS sz_b
       |  FROM cand c
       |  JOIN hs x ON x.doc_id = c.id_a
       |  JOIN hs y ON y.doc_id = c.id_b
       |)
       |SELECT id_a, id_b, overlap, sz_a, sz_b,
       |  round(CAST(overlap AS DOUBLE) / CAST(sz_a AS DOUBLE), 6) AS containment
       |FROM v
       |WHERE round(CAST(overlap AS DOUBLE) / CAST(sz_a AS DOUBLE), 6) >= $t
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** mirror of TextDemos.setsimJoinRs (SetSim.prefixJaccardJoinRS):
    * the two-sided form — probe = %7 batch, index = the rest, df
    * dictionary from the INDEX side only (probe-only tokens order
    * first as df 0), same prefix/length/positional prunes, pairs
    * (batch, corpus) only. */
  def setSimJoinRsSql(threshold: Double = 0.5, n: Int = 3): String = {
    val t = threshold
    val ratio = threshold / (1.0 + threshold)
    val gram = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    def preCte(name: String, ordRel: String) =
      s"""$name AS (
         |  SELECT doc_id, s, u.pos AS pos, u.h AS h
         |  FROM (SELECT doc_id, s,
         |          unnest(list_transform(
         |            range(1, s - CAST(ceil(CAST(s AS DOUBLE) * $t - 1e-9) AS BIGINT) + 2),
         |            i -> struct_pack(pos := CAST(i AS BIGINT), h := otoks[i]))) AS u
         |        FROM $ordRel)
         |)""".stripMargin
    s"""WITH t0 AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |), s0 AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - ${n - 2}),
       |    i -> ($gram))) AS sh
       |  FROM t0 WHERE len(toks) >= $n
       |), hs AS (
       |  SELECT doc_id, list_distinct(list_transform(sh, g -> ${md560("g")})) AS hset
       |  FROM s0 WHERE len(sh) > 0
       |), hsA AS (SELECT * FROM hs WHERE doc_id % 7 = 0
       |), hsB AS (SELECT * FROM hs WHERE doc_id % 7 <> 0
       |), exA AS (SELECT doc_id, unnest(hset) AS h FROM hsA
       |), exB AS (SELECT doc_id, unnest(hset) AS h FROM hsB
       |), dfc AS (SELECT h, COUNT(*) AS df FROM exB GROUP BY h
       |), ordA AS (
       |  SELECT e.doc_id, list(e.h ORDER BY COALESCE(d.df, 0), e.h) AS otoks,
       |         CAST(COUNT(*) AS BIGINT) AS s
       |  FROM exA e LEFT JOIN dfc d USING (h) GROUP BY e.doc_id
       |), ordB AS (
       |  SELECT e.doc_id, list(e.h ORDER BY d.df, e.h) AS otoks,
       |         CAST(COUNT(*) AS BIGINT) AS s
       |  FROM exB e JOIN dfc d USING (h) GROUP BY e.doc_id
       |), ${preCte("preA", "ordA")}, ${preCte("preB", "ordB")}, cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM preA a JOIN preB b ON b.h = a.h
       |  WHERE CAST(least(a.s, b.s) AS DOUBLE) >= CAST(greatest(a.s, b.s) AS DOUBLE) * $t
       |    AND CAST(1 + least(a.s - a.pos, b.s - b.pos) AS DOUBLE)
       |        >= ceil(CAST(a.s + b.s AS DOUBLE) * $ratio - 1e-9)
       |), v AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_filter(x.hset, e -> list_contains(y.hset, e))) AS BIGINT) AS overlap,
       |    CAST(len(x.hset) AS BIGINT) AS sz_a, CAST(len(y.hset) AS BIGINT) AS sz_b
       |  FROM cand c
       |  JOIN hsA x ON x.doc_id = c.id_a
       |  JOIN hsB y ON y.doc_id = c.id_b
       |)
       |SELECT id_a, id_b, overlap,
       |  sz_a + sz_b - overlap AS union_size,
       |  round(CAST(overlap AS DOUBLE) / (sz_a + sz_b - overlap), 6) AS jaccard
       |FROM v
       |WHERE round(CAST(overlap AS DOUBLE) / (sz_a + sz_b - overlap), 6) >= $t
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** mirror of TextDemos.budgetSelectDemo (Sampling.budgetSelect):
    * DuckDB states the semantics as the single global window the
    * Spark side decomposes into the two-phase range-partitioned scan —
    * integer running sums over the same (score desc, doc_id) total
    * order, so the decomposition must be bit-identical. The score is
    * the C9 quality formula (same expression as the quality_score
    * row). */
  def budgetSelectSql(budgetFrac: Double = 0.25): String =
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, text, CAST(len(toks) AS DOUBLE) AS n_tok,
       |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS DOUBLE) AS stop_hits,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha_hits
       |  FROM t
       |), sc AS (
       |  SELECT doc_id,
       |    0.4 * least(n_tok / 100.0, 1.0)
       |    + 0.3 * (CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0.0 END)
       |    + 0.3 * (CASE WHEN length(text) > 0 THEN alpha_hits / CAST(length(text) AS DOUBLE) ELSE 0.0 END) AS score,
       |    CAST(n_tok AS BIGINT) AS toks
       |  FROM m
       |), b AS (
       |  SELECT CAST(floor($budgetFrac * SUM(toks)) AS BIGINT) AS budget FROM sc
       |), c AS (
       |  SELECT doc_id, score, toks,
       |    CAST(SUM(toks) OVER (ORDER BY score DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM sc
       |)
       |SELECT doc_id, score, toks, cum_tokens
       |FROM c, b WHERE cum_tokens <= budget
       |ORDER BY cum_tokens""".stripMargin

  /** mirror of TextDemos.matryoshkaEvalDemo (Similarity
    * .matryoshkaEval): same prefix-sliced brute top-k per probed dim
    * — UNROUNDED cosine ordering with cand_id tie-break, the
    * embed_cosine_topk discipline (identical left-fold arithmetic on
    * both engines) — unioned and hit-counted against the full-dim
    * truth. */
  def matryoshkaEvalSql(dims: Seq[Int] = Seq(16, 32, 64),
                        fullDim: Int = 64, k: Int = 5): String = {
    def top(d: Int, name: String): String =
      s"""$name AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY ${cosineExpr(s"(qv[1:$d])", s"(cv[1:$d])")} DESC, cand_id) AS rn
         |    FROM q, c)
         |  WHERE rn <= $k
         |)""".stripMargin
    val variantCtes = dims.map(d => top(d, s"t$d")).mkString(",\n")
    val union = dims.map(d => s"SELECT $d AS dim, query_id, cand_id FROM t$d")
      .mkString("\n  UNION ALL\n  ")
    val dimValues = dims.map(d => s"($d)").mkString(", ")
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 97 = 0
       |), c AS (
       |  SELECT vec_id AS cand_id, embedding AS cv FROM embeddings WHERE vec_id % 97 <> 0
       |), $variantCtes,
       |truth AS (SELECT query_id, cand_id FROM t$fullDim),
       |variants AS (
       |  $union
       |), hits AS (
       |  SELECT dim, COUNT(*) AS n_hits
       |  FROM variants JOIN truth USING (query_id, cand_id)
       |  GROUP BY dim
       |)
       |SELECT d.dim, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / ($k * (SELECT COUNT(*) FROM q)), 6) AS recall
       |FROM (VALUES $dimValues) d(dim) LEFT JOIN hits h ON h.dim = d.dim
       |ORDER BY d.dim""".stripMargin
  }

  /** mirror of TextDemos.robotsGateDemo (Robots.parseRules + gate):
    * same synthesis, same two-group line regexp, same
    * longest-match / Allow-wins-tie pick via an identical window. */
  def robotsGateSql(): String = {
    // raw triple-quote: single backslashes and a bare $ anchor — this
    // val is spliced into the s-string below, not re-interpolated;
    // (?i) = RFC 9309 case-insensitive field names, comments stripped
    // before the match
    val linePat = """(?i)^(allow|disallow):\s*(\S+)\s*$"""
    s"""WITH rb AS (
       |  SELECT DISTINCT source || '.example.com' AS domain,
       |    'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10)
       |    || 'Allow: /private/ok' || chr(10) || 'disallow: /tmp # scratch space' || chr(10)
       |    || 'Disallow: /search?' || chr(10) || 'Allow:' || chr(10) || 'Crawl-delay: 5'
       |    || (CASE WHEN CAST(regexp_extract(source, '([0-9]+)$$', 1) AS INTEGER) % 2 = 0
       |        THEN '' ELSE chr(10) || 'Disallow: /p' END) AS content
       |  FROM documents
       |), lines AS (
       |  SELECT domain, regexp_replace(unnest(string_split(content, chr(10))), '#.*$$', '') AS line
       |  FROM rb
       |), rules AS (
       |  SELECT domain,
       |    CASE WHEN lower(regexp_extract(line, '$linePat', 1)) = 'allow'
       |         THEN 'Allow' ELSE 'Disallow' END AS r_type,
       |    regexp_extract(line, '$linePat', 2) AS r_path
       |  FROM lines
       |  WHERE regexp_extract(line, '$linePat', 1) <> ''
       |    AND regexp_extract(line, '$linePat', 2) <> ''
       |), urls AS (
       |  SELECT 'https://' || source || '.example.com'
       |    || (CASE WHEN doc_id % 5 = 0 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
       |             WHEN doc_id % 5 = 1 THEN '/private/ok/doc' || CAST(doc_id AS VARCHAR)
       |             WHEN doc_id % 5 = 2 THEN '/pub/doc' || CAST(doc_id AS VARCHAR)
       |             WHEN doc_id % 5 = 3 THEN '/tmp/x' || CAST(doc_id AS VARCHAR)
       |             ELSE '/search?q=' || CAST(doc_id AS VARCHAR) END) AS url
       |  FROM documents
       |), parsed AS (
       |  SELECT url,
       |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS domain,
       |    CASE WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) = ''
       |         THEN '/' ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) END AS path
       |  FROM urls
       |), j AS (
       |  SELECT p.url, p.domain, p.path, r.r_type, r.r_path
       |  FROM parsed p LEFT JOIN rules r
       |    ON r.domain = p.domain AND starts_with(p.path, r.r_path)
       |), rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY url
       |    ORDER BY length(r_path) DESC, r_type, r_path) AS rn
       |  FROM j
       |)
       |SELECT url, domain, path,
       |  COALESCE(r_type, '') AS rule_type,
       |  COALESCE(r_path, '') AS rule_path,
       |  (COALESCE(r_type, '') <> 'Disallow') AS allowed
       |FROM rk WHERE rn = 1 ORDER BY url""".stripMargin
  }

  /** mirror of TextDemos.bitextMineDemo (BitextMine.mine): same
    * round-6 cosines, exact decimal neighborhood sums feeding the
    * cross-multiplied ratio margin `2k*sim / (sumF+sumB)` (never
    * round the /k means — they land on decimal .5 boundaries
    * structurally), and the (margin desc, tgt_id) best-per-source
    * pick. */
  def bitextMineSql(k: Int = 4, threshold: Double = 1.1): String =
    s"""WITH a AS (
       |  SELECT d.doc_id AS src_id, e.embedding AS qv
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
       |  WHERE d.lang = 'en'
       |), b AS (
       |  SELECT d.doc_id AS tgt_id, e.embedding AS cv
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
       |  WHERE d.lang <> 'en'
       |), x AS (
       |  SELECT src_id, tgt_id, round(${cosineExpr("qv", "cv")}, 6) AS sim
       |  FROM a, b
       |), f AS (
       |  SELECT src_id, SUM(CAST(sim AS DECIMAL(18,6))) AS sum_f
       |  FROM (SELECT src_id, sim,
       |          row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, tgt_id) AS rn
       |        FROM x)
       |  WHERE rn <= $k GROUP BY src_id
       |), g AS (
       |  SELECT tgt_id, SUM(CAST(sim AS DECIMAL(18,6))) AS sum_b
       |  FROM (SELECT tgt_id, sim,
       |          row_number() OVER (PARTITION BY tgt_id ORDER BY sim DESC, src_id) AS rn
       |        FROM x)
       |  WHERE rn <= $k GROUP BY tgt_id
       |), m AS (
       |  SELECT x.src_id, x.tgt_id, x.sim,
       |    round((x.sim * ${2 * k}) / CAST(f.sum_f + g.sum_b AS DOUBLE), 6) AS margin
       |  FROM x JOIN f USING (src_id) JOIN g USING (tgt_id)
       |  WHERE CAST(f.sum_f + g.sum_b AS DOUBLE) > 0.0
       |), best AS (
       |  SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rn
       |  FROM m
       |)
       |SELECT src_id, tgt_id, sim, margin
       |FROM best WHERE rn = 1 AND margin >= $threshold
       |ORDER BY src_id""".stripMargin

  /** mirror of TextDemos.dedupSimhash (md5-60 hash, 60 bits, 4 bands) */
  def simhashSql(bits: Int = 60, maxHamming: Int = 16): String = {
    val w = bits / 4
    val mask = (1L << w) - 1
    val votes = (0 until bits).map { j =>
      s"SUM(CASE WHEN (hh >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j"
    }.mkString(",\n    ")
    val assemble = (0 until bits).map { j =>
      s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents
       |), ex AS (
       |  SELECT doc_id, unnest(toks) AS tok FROM t
       |), h AS (
       |  SELECT doc_id, ${md560("tok")} AS hh FROM ex
       |), v AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM h GROUP BY doc_id
       |), sh AS (
       |  SELECT doc_id, CAST($assemble AS BIGINT) AS s FROM v
       |), bands AS (
       |  SELECT doc_id, s, b.band, (s >> (b.band * $w)) & $mask AS key
       |  FROM sh, (VALUES (0), (1), (2), (3)) b(band)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM cand
       |WHERE bit_count(xor(sa, sb)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** mirror of TextDemos.sftValidateDemo: same synthesized turn table
    * (row_number by doc_id within doc_id % 40, %17 forced-user and %23
    * blanked-content plants), same four per-conversation checks via a
    * lag window. */
  /** the shared C94/C113 CTE chain: the synthesized turn table (the
    * sftSynthTurns plants) and the four per-conversation checks. */
  private def sftChecksCtes: String =
    s"""turns AS (
       |  SELECT doc_id % 40 AS conv_id,
       |         (ROW_NUMBER() OVER (PARTITION BY doc_id % 40 ORDER BY doc_id) - 1) AS turn_idx,
       |         CASE WHEN doc_id % 17 = 0 THEN 'user'
       |              WHEN (ROW_NUMBER() OVER (PARTITION BY doc_id % 40 ORDER BY doc_id) - 1) % 2 = 0 THEN 'user'
       |              ELSE 'assistant' END AS role,
       |         CASE WHEN doc_id % 23 = 0 THEN '' ELSE text END AS content
       |  FROM documents
       |), lagged AS (
       |  SELECT conv_id, turn_idx, role, content,
       |         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
       |  FROM turns
       |), checks AS (
       |  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
       |         min_by(role, turn_idx) = 'user' AS first_role_ok,
       |         CAST(COALESCE(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END), 0) AS BIGINT) = 0 AS alternation_ok,
       |         CAST(SUM(CASE WHEN content IS NULL OR content = '' THEN 1 ELSE 0 END) AS BIGINT) = 0 AS no_empty_ok,
       |         max_by(role, turn_idx) = 'assistant' AS ends_assistant_ok
       |  FROM lagged GROUP BY conv_id
       |)""".stripMargin

  def sftValidateSql(): String =
    s"""WITH $sftChecksCtes
       |SELECT conv_id, n_turns, first_role_ok, alternation_ok, no_empty_ok,
       |       ends_assistant_ok,
       |       first_role_ok AND alternation_ok AND no_empty_ok AND ends_assistant_ok AS valid
       |FROM checks ORDER BY conv_id""".stripMargin

  /** mirror of TextDemos.sftPackDemo (Sft.packConversations): valid
    * conversations packed concat-and-chunk at conversation granularity
    * (shard = conv % 2), per-turn offsets from the two nested cumsums,
    * loss mask on the assistant role. */
  def sftPackSql(capacity: Int = 512): String =
    s"""WITH $sftChecksCtes, valid AS (
       |  SELECT conv_id FROM checks
       |  WHERE first_role_ok AND alternation_ok AND no_empty_ok AND ends_assistant_ok
       |), tc AS (
       |  SELECT t.conv_id, t.turn_idx, t.role,
       |         CAST(len(list_filter(string_split(t.content, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM turns t JOIN valid USING (conv_id)
       |), conv AS (
       |  SELECT conv_id, conv_id % 2 AS shard, SUM(n_tokens) AS conv_tokens
       |  FROM tc GROUP BY conv_id
       |), pk AS (
       |  SELECT conv_id, shard,
       |         SUM(conv_tokens) OVER (PARTITION BY shard ORDER BY conv_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - conv_tokens AS conv_start
       |  FROM conv
       |), off AS (
       |  SELECT pk.shard, tc.conv_id, tc.turn_idx, tc.role, tc.n_tokens,
       |         pk.conv_start + SUM(tc.n_tokens) OVER (PARTITION BY tc.conv_id ORDER BY tc.turn_idx
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tc.n_tokens AS start_off
       |  FROM tc JOIN pk USING (conv_id)
       |)
       |SELECT shard, conv_id, turn_idx, role, n_tokens,
       |       CAST(start_off AS BIGINT) AS start_off,
       |       CAST(start_off // $capacity AS BIGINT) AS first_chunk,
       |       CAST(CASE WHEN n_tokens > 0 THEN (start_off + n_tokens - 1) // $capacity
       |                 ELSE start_off // $capacity END AS BIGINT) AS last_chunk,
       |       role = 'assistant' AS loss_mask
       |FROM off ORDER BY shard, conv_id, turn_idx""".stripMargin

  /** mirror of TextDemos.shardBalanceDemo (Sampling.shardBalance):
    * global cumsum in doc_id order (the oracle may use the one-task
    * window the Spark side two-phases), starting-offset shard
    * boundary in exact integer algebra, per-shard summary. */
  def shardBalanceSql(nShards: Int = 8): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(COALESCE(len(list_filter(string_split(text, ' '), x -> x <> '')), 0) AS BIGINT) AS toks
       |  FROM documents
       |), tot AS (
       |  SELECT CAST(COALESCE(SUM(toks), 0) AS BIGINT) AS total FROM t
       |), c AS (
       |  SELECT doc_id, toks,
       |         SUM(toks) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t
       |), a AS (
       |  -- the total > 0 guard mirrors the Spark side's degenerate
       |  -- branch: an all-empty-token corpus is one shard-0 row
       |  SELECT doc_id, toks,
       |         CAST(CASE WHEN tot.total > 0
       |                   THEN least(((cum - toks) * $nShards) // tot.total,
       |                              ${nShards - 1})
       |                   ELSE 0 END AS BIGINT) AS shard
       |  FROM c, tot
       |)
       |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(toks) AS BIGINT) AS shard_tokens,
       |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
       |       CASE WHEN tot.total > 0
       |            THEN round(CAST(SUM(toks) * $nShards AS DOUBLE) / CAST(tot.total AS DOUBLE) - 1.0, 6)
       |            ELSE 0.0 END AS rel_dev
       |FROM a, tot GROUP BY shard, tot.total ORDER BY shard""".stripMargin

  /** mirror of TextDemos.weightedSampleDemo (Sampling.weightedSample):
    * same integer ticket race — weight w = clamp(1 + n_chars//100,
    * 1, 64), race key = min of w md5-60 tickets over "id#r", global
    * top-m on (key, id). Pure integer arithmetic end to end, so the
    * sampled SET (not just its size) is bit-identical cross-engine. */
  def weightedSampleSql(m: Int = 200, maxWeight: Int = 64): String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         least(greatest(COALESCE(1 + n_chars // 100, 1), 1), $maxWeight) AS weight
       |  FROM documents
       |), k AS (
       |  SELECT doc_id, CAST(weight AS BIGINT) AS weight,
       |         list_min(list_transform(range(1, CAST(weight AS BIGINT) + 1),
       |           r -> ${md560("(CAST(doc_id AS VARCHAR) || '#' || CAST(r AS VARCHAR))")})) AS race_key
       |  FROM w
       |)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY race_key, doc_id) AS BIGINT) AS rank,
       |       doc_id, weight, race_key
       |FROM k ORDER BY race_key, doc_id LIMIT $m""".stripMargin

  /** mirror of TextDemos.tokenizerEntropy: the bpeEncodeSql CTE chain
    * feeds the bpe12 frequency table, whitespace words the other; each
    * entropy term quantized to DECIMAL(38,12) before the exact sum
    * (the order-free discipline — see the demo doc for the ulp
    * analysis), IEEE divisions and log2 on the exact decimal-sum
    * doubles. */
  def tokenizerEntropySql(n: Int = 12): String = {
    val chain = bpeEncodeSql(n)
      .replaceAll("(?s)\\nSELECT d\\.doc_id.*$", "")
      .replaceFirst("^WITH ", "")
    val pExpr = "(CAST(f.c AS DOUBLE) / CAST(t.total_tokens AS DOUBLE))"
    s"""WITH $chain, wsf AS (
       |  SELECT 'ws' AS tokenizer, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
       |        FROM documents)
       |  GROUP BY tok
       |), bpef AS (
       |  SELECT 'bpe12' AS tokenizer, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(list_filter(string_split(bpe_text, chr(1)), x -> x <> '')) AS tok
       |        FROM enc)
       |  GROUP BY tok
       |), freq AS (
       |  SELECT * FROM wsf UNION ALL SELECT * FROM bpef
       |), tot AS (
       |  SELECT tokenizer, CAST(COUNT(*) AS BIGINT) AS vocab_size,
       |         CAST(SUM(c) AS BIGINT) AS total_tokens
       |  FROM freq GROUP BY tokenizer
       |), s AS (
       |  SELECT f.tokenizer,
       |         CAST(SUM(CAST($pExpr * log2($pExpr) AS DECIMAL(38,12))) AS DOUBLE) AS ssh,
       |         CAST(SUM(CAST(pow($pExpr, 2.5) AS DECIMAL(38,12))) AS DOUBLE) AS sr
       |  FROM freq f JOIN tot t USING (tokenizer)
       |  GROUP BY f.tokenizer
       |)
       |SELECT t.tokenizer, t.vocab_size, t.total_tokens,
       |       round(-s.ssh, 6) AS shannon_bits,
       |       round(log2(s.sr) / (-1.5), 6) AS renyi25_bits,
       |       CASE WHEN t.vocab_size > 1
       |            THEN round((log2(s.sr) / (-1.5)) / log2(CAST(t.vocab_size AS DOUBLE)), 6)
       |            ELSE 0.0 END AS renyi_efficiency
       |FROM tot t JOIN s USING (tokenizer)
       |ORDER BY t.tokenizer""".stripMargin
  }

  /** mirror of TextDemos.bpeFertility: the bpeEncodeSql CTE chain up
    * to `enc`, left-joined back to documents (wordless docs count 0
    * tokens), grouped by lang with exact-int sums and IEEE divisions
    * on the totals. */
  def bpeFertilitySql(n: Int = 12): String = {
    val chain = bpeEncodeSql(n)
      .replaceAll("(?s)\\nSELECT d\\.doc_id.*$", "")
      .replaceFirst("^WITH ", "")
    s"""WITH $chain, base AS (
       |  SELECT d.lang,
       |         CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT) AS words,
       |         CAST(length(d.text) AS BIGINT) AS chars,
       |         CAST(COALESCE(e.n_tokens, 0) AS BIGINT) AS n_tokens
       |  FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id
       |)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(words) AS BIGINT) AS total_words,
       |       CAST(SUM(n_tokens) AS BIGINT) AS total_bpe_tokens,
       |       CAST(SUM(chars) AS BIGINT) AS total_chars,
       |       CASE WHEN SUM(words) > 0
       |            THEN CAST(SUM(n_tokens) AS DOUBLE) / CAST(SUM(words) AS DOUBLE)
       |            ELSE 0.0 END AS fertility,
       |       CASE WHEN SUM(n_tokens) > 0
       |            THEN CAST(SUM(chars) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
       |            ELSE 0.0 END AS chars_per_token
       |FROM base GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** mirror of TextDemos.charEntropy: codepoint split (string_split
    * with '' splits per character, matching the surrogate-safe
    * charTokens), counts folded in sorted-character order so the
    * entropy double-sum is engine-identical, left join back for empty
    * docs. */
  def charEntropySql(): String = {
    val terms = "list_transform(cs, c -> (c / CAST(n_total AS DOUBLE)) " +
      "* log2(c / CAST(n_total AS DOUBLE)))"
    s"""WITH ch AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ''), x -> x <> '')) AS ch
       |  FROM documents
       |), cnt AS (
       |  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c FROM ch GROUP BY doc_id, ch
       |), agg AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_total,
       |         CAST(COUNT(*) AS BIGINT) AS n_distinct,
       |         list(CAST(c AS DOUBLE) ORDER BY ch) AS cs
       |  FROM cnt GROUP BY doc_id
       |), ent AS (
       |  SELECT doc_id, n_total, n_distinct,
       |         round(-(${lsum(terms)}), 6) AS entropy
       |  FROM agg
       |)
       |SELECT d.doc_id,
       |       CAST(COALESCE(e.n_total, 0) AS BIGINT) AS n_total,
       |       CAST(COALESCE(e.n_distinct, 0) AS BIGINT) AS n_distinct,
       |       COALESCE(e.entropy, 0.0) AS entropy,
       |       COALESCE(e.entropy, 0.0) >= 2.0 AS keep
       |FROM documents d LEFT JOIN ent e ON e.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** mirror of Similarity.kcenterSelect (k=8 over embeddings): the
    * greedy farthest-point argmax unrolled as one MATERIALIZED CTE per
    * step — sᵢ references every s₀..sᵢ₋₁, so without materialization
    * the chain re-evaluates its whole prefix per reference
    * (exponentially); same seed (smallest id), same squared-L2 fold,
    * same (d DESC, vec_id) tie-break. */
  def kcenterSelectSql(k: Int = 8): String = {
    def dist(v: String, c: String) = {
      val diff = s"(CAST($v[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))"
      lsum(s"list_transform(range(1, len($v)+1), i -> $diff * $diff)")
    }
    val ctes = new StringBuilder(
      "e AS MATERIALIZED (SELECT vec_id, embedding AS v FROM embeddings),\n" +
      "s0 AS MATERIALIZED (SELECT vec_id, v, CAST(0.0 AS DOUBLE) AS d, 0 AS rank FROM e ORDER BY vec_id LIMIT 1)")
    for (i <- 1 until k) {
      val centers = (0 until i).map(j => s"SELECT vec_id, v FROM s$j").mkString(" UNION ALL ")
      ctes ++= s""",
m$i AS (
  SELECT e.vec_id, e.v, MIN(${dist("e.v", "c.v")}) AS d
  FROM e CROSS JOIN ($centers) c
  WHERE e.vec_id NOT IN (SELECT vec_id FROM ($centers) x)
  GROUP BY e.vec_id, e.v
),
s$i AS MATERIALIZED (SELECT vec_id, v, d, $i AS rank FROM m$i ORDER BY d DESC, vec_id LIMIT 1)"""
    }
    val union = (0 until k).map(j =>
      s"SELECT rank, vec_id, round(d, 6) AS dist FROM s$j").mkString("\nUNION ALL ")
    s"WITH $ctes\n$union\nORDER BY rank"
  }

  /** mirror of TextDemos.simhashEval: the simhashSql CTE chain up to
    * the (unfiltered) 4-band candidate set, plus a 7-disjoint-band
    * pigeonhole truth (exact for hamming ≤ 6 on 60 bits), one summary
    * row of counts and exact-int IEEE P/R divisions. */
  def simhashEvalSql(bits: Int = 60, maxHamming: Int = 6): String = {
    // keep the t..cand CTE chain; the final verify SELECT is replaced
    // by the eval counts below
    val chain = simhashSql(bits, maxHamming)
      .replaceAll("(?s)\\nSELECT id_a.*$", "")
      .replaceFirst("^WITH ", "")
    s"""WITH $chain, tb AS (
       |  SELECT doc_id, s, b.band,
       |    CASE WHEN b.band < 6 THEN (s >> (b.band * 8)) & 255
       |         ELSE (s >> 48) & 4095 END AS key
       |  FROM sh, (VALUES (0), (1), (2), (3), (4), (5), (6)) b(band)
       |), tcand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
       |  FROM tb a JOIN tb b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |), truth AS (
       |  SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |  FROM tcand WHERE bit_count(xor(sa, sb)) <= $maxHamming
       |), pcand AS (
       |  SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming FROM cand
       |), nt AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
       |         CAST(COALESCE(SUM(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_truth_le3
       |  FROM truth
       |), nc AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
       |         CAST(COALESCE(SUM(CASE WHEN hamming <= $maxHamming THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit,
       |         CAST(COALESCE(SUM(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit_le3
       |  FROM pcand
       |)
       |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
       |       n_truth, n_cand, n_hit, n_truth_le3, n_hit_le3,
       |       CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / CAST(n_cand AS DOUBLE) ELSE 0.0 END AS precision,
       |       CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE) ELSE 0.0 END AS recall
       |FROM nt, nc""".stripMargin
  }

  /** mirror of ImageHash.imagePhashDedup: regenerate the synthetic
    * gray values relationally (same integer arithmetic as synthGray —
    * the Spark side must survive a REAL PNG encode→decode roundtrip to
    * land on the same numbers), area-average 4×4 cells, assemble the
    * 56-bit dHash, band 7×8 bits, exact-hamming verify. */
  def imagePhashSql(maxHamming: Int = 6): String = {
    val bandRows = (0 until 7).map(b => s"($b)").mkString(", ")
    s"""WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       |px AS (
       |  SELECT id, CAST(t.range AS BIGINT) AS x, CAST(s.range AS BIGINT) AS y
       |  FROM ids, range(0, ${ImagePhashW}) t, range(0, ${ImagePhashH}) s
       |), g0 AS (
       |  SELECT id, x, y,
       |    ((id % 80) * 5741 + (x // 4) * 7919 + (y // 4) * 6007)
       |      * ((id % 80) * 5741 + (x // 4) * 7919 + (y // 4) * 6007) % 100019 % 249 AS v0
       |  FROM px
       |), gv AS (
       |  SELECT id, x, y,
       |    (CASE WHEN id // 80 > 0 AND ((x // 4) * 7 + (y // 4) * 11 + (id // 80) * 5) % 19 = 0
       |          THEN (v0 + 120) % 249 ELSE v0 END) + (x * 5 + y * 3) % 8 AS pix
       |  FROM g0
       |), cells AS (
       |  SELECT id, x // 4 AS cx, y // 4 AS cy, SUM(pix) // 16 AS gray
       |  FROM gv GROUP BY id, x // 4, y // 4
       |), bits AS (
       |  SELECT l.id, l.cy * 8 + l.cx AS j,
       |         CASE WHEN l.gray > r.gray THEN 1 ELSE 0 END AS bit
       |  FROM cells l JOIN cells r ON r.id = l.id AND r.cy = l.cy AND r.cx = l.cx + 1
       |  WHERE l.cx < 8
       |), h AS (
       |  SELECT id, SUM(CASE WHEN bit = 1 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS sh
       |  FROM bits GROUP BY id
       |), bands AS (
       |  SELECT id, sh, b.band, (sh >> (b.band * 8)) & 255 AS key
       |  FROM h, (VALUES $bandRows) b(band)
       |), cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sa, b.sh AS sb
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id
       |)
       |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM cand
       |WHERE bit_count(xor(sa, sb)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  private val ImagePhashW = graft.multimodal.ImageHash.SynthW
  private val ImagePhashH = graft.multimodal.ImageHash.SynthH

  /** mirror of TextDemos.urlCanonicalize: the same synthesized messy
    * URLs, the same canonicalization algebra (lowercase scheme/host,
    * default-port drop, trailing-slash strip, tracking-param drop +
    * sort, fragment drop) in DuckDB string/regex/list functions. */
  /** the Norm.canonicalizeUrl mirror as reusable CTE bodies: given a
    * source relation with a `url` column (plus `carry` columns to
    * thread through), emits `<prefix>_parts` / `<prefix>_norm` CTEs
    * and a final SELECT-able canon expression via [[urlCanonExpr]].
    * Shared by the C55 row and the C87 anchor aggregation so the two
    * mirrors can never drift. */
  private def urlCanonCtes(src: String, carry: Seq[String], prefix: String): String = {
    val c = carry.map(_ + ",\n    ").mkString
    s"""${prefix}_parts AS (
       |  SELECT ${c}url,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
       |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
       |    regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS query
       |  FROM $src
       |), ${prefix}_norm AS (
       |  SELECT ${c}url, scheme, auth,
       |    lower(regexp_extract(string_split(auth, '@')[-1], '^([^:]*)', 1)) AS host,
       |    regexp_extract(string_split(auth, '@')[-1], ':([0-9]+)$$', 1) AS port,
       |    CASE WHEN regexp_replace(path0, '/+$$', '') = '' THEN '/'
       |         ELSE regexp_replace(path0, '/+$$', '') END AS path_c,
       |    array_to_string(list_sort(list_filter(string_split(query, '&'),
       |      p -> p <> '' AND NOT (p LIKE 'utm_%' OR p LIKE 'gclid=%' OR p LIKE 'fbclid=%'))), '&') AS query_c
       |  FROM ${prefix}_parts
       |)""".stripMargin
  }

  /** the canon_url expression over a [[urlCanonCtes]] `<prefix>_norm`
    * row — single-line: callers embed it inside stripMargin templates,
    * where a line-leading `||` would lose a pipe to the margin strip.
    * Mirrors Norm.canonicalizeUrl exactly: credentials drop
    * (user:pass@host -> host via the '@' split in the norm CTE) and
    * schemeless / bracketed-IPv6 inputs pass through untouched. */
  private val urlCanonExpr: String =
    "(CASE WHEN scheme = '' OR contains(auth, '[') THEN url ELSE " +
      "scheme || '://' || host || (CASE WHEN port <> '' AND NOT " +
      "((scheme = 'http' AND port = '80') OR (scheme = 'https' AND port = '443')) " +
      "THEN ':' || port ELSE '' END) || path_c || " +
      "(CASE WHEN query_c <> '' THEN '?' || query_c ELSE '' END) END)"

  /** mirror of TextDemos.anchorAggDemo (Anchors.anchorAgg): same page
    * synthesis, same two-group regexp anchor extraction, the SHARED
    * [[urlCanonCtes]] canonicalization, and the same
    * (count desc, text) top-m pick per canonical target. */
  def anchorAggSql(m: Int = 3): String = {
    val pat = """<a[^>]*href=[''"]([^''"]+)[''"][^>]*>([^<]*)</a>"""
    s"""WITH pages AS (
       |  SELECT '<div><a href=''HTTP://Example.COM/t/' || CAST(doc_id % 97 AS VARCHAR)
       |      || '?utm_source=x&q=1''>link &amp; ' || source || '</a> '
       |      || '<a href="https://example.com/t/' || CAST((doc_id * 7) % 97 AS VARCHAR)
       |      || '/">' || COALESCE(list_filter(string_split(text, ' '), x -> x <> '')[1], 'x') || '</a> '
       |      || '<a href=''https://example.com/t/' || CAST(doc_id % 97 AS VARCHAR)
       |      || '#frag''>read more</a></div>' AS html
       |  FROM documents
       |), ax AS (
       |  SELECT regexp_extract_all(replace(html, '&amp;', '&'), '$pat', 1) AS hrefs,
       |         regexp_extract_all(replace(html, '&amp;', '&'), '$pat', 2) AS texts
       |  FROM pages
       |), pr AS (
       |  SELECT u.h AS url, trim(u.t) AS text
       |  FROM (SELECT unnest(list_transform(range(1, len(hrefs) + 1),
       |          j -> struct_pack(h := hrefs[j], t := texts[j]))) AS u
       |        FROM ax)
       |), ${urlCanonCtes("pr", Seq("text"), "a")}, canon AS (
       |  SELECT $urlCanonExpr AS target_url, text
       |  FROM a_norm
       |  WHERE ($urlCanonExpr) <> '' AND text <> ''
       |), cnts AS (
       |  SELECT target_url, text, COUNT(*) AS cnt FROM canon GROUP BY 1, 2
       |), rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY target_url
       |    ORDER BY cnt DESC, text) AS rnk
       |  FROM cnts
       |)
       |SELECT target_url,
       |  CAST(SUM(cnt) AS BIGINT) AS n_anchors,
       |  CAST(COUNT(*) AS BIGINT) AS n_texts,
       |  array_to_string(list(text ORDER BY rnk) FILTER (WHERE rnk <= $m), '|') AS top_texts
       |FROM rk GROUP BY target_url ORDER BY target_url""".stripMargin
  }

  def urlCanonicalizeSql(): String =
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END)
       |    || 'WWW.Src' || source || '.Example.COM'
       |    || (CASE WHEN doc_id % 3 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
       |             WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END)
       |    || '/Doc/' || CAST(doc_id AS VARCHAR)
       |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
       |    || (CASE WHEN doc_id % 2 = 0
       |             THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x&b=2'
       |             ELSE '?b=2&gclid=abc&id=' || CAST(doc_id AS VARCHAR) END)
       |    || (CASE WHEN doc_id % 3 = 0 THEN '#sec' || CAST(doc_id AS VARCHAR) ELSE '' END)
       |    AS url
       |  FROM documents
       |), ${urlCanonCtes("raw", Seq("doc_id"), "u")}
       |SELECT doc_id, url,
       |  $urlCanonExpr AS canon_url,
       |  host
       |FROM u_norm ORDER BY doc_id""".stripMargin

  /** mirror of TextDemos.sourceQualityGate: the C9 quality score with
    * `source` riding along, per-source exact interpolated median via
    * the shared percentile SQL, broadcast-threshold keep. */
  def sourceQualityGateSql(q: Double = 0.5): String = {
    val thr = interpolatedPercentilesSql("sc", "source", "score",
      Seq("threshold" -> q))
    s"""WITH t AS (
       |  SELECT doc_id, source, text,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, source, text, CAST(len(toks) AS DOUBLE) AS n_tok,
       |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS DOUBLE) AS stop_hits,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha_hits
       |  FROM t
       |), sc AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    0.4 * least(n_tok / 100.0, 1.0)
       |    + 0.3 * (CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0.0 END)
       |    + 0.3 * (CASE WHEN length(text) > 0 THEN alpha_hits / CAST(length(text) AS DOUBLE) ELSE 0.0 END) AS score
       |  FROM m
       |), thr AS (
       |$thr
       |)
       |SELECT doc_id, source, score, threshold
       |FROM sc JOIN thr USING (source)
       |WHERE score >= threshold
       |ORDER BY doc_id""".stripMargin
  }

  /** mirror of TextDemos.hardNegatives: the C52 corpus + shared BM25
    * chain, dense top-5 removed by NOT EXISTS. */
  def hardNegativesSql(mLex: Int = 20, kDense: Int = 5): String =
    s"""WITH corpus AS MATERIALIZED (
       |  SELECT d.doc_id, d.text, e.embedding
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
       |), ${bm25Ctes("corpus")},
       |dq AS (
       |  SELECT doc_id AS query_id, embedding AS qv FROM corpus WHERE doc_id % 97 = 0
       |), dx AS (
       |  SELECT dq.query_id, c.doc_id, ${cosineExpr("dq.qv", "c.embedding")} AS sim
       |  FROM dq CROSS JOIN corpus c
       |), denseranked AS (
       |  SELECT query_id, doc_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY sim DESC, doc_id) AS BIGINT) AS rank
       |  FROM dx
       |)
       |SELECT l.query_id, l.doc_id, l.score, l.rank AS bm25_rank
       |FROM lexranked l
       |WHERE l.rank <= $mLex AND NOT EXISTS (
       |  SELECT 1 FROM denseranked d
       |  WHERE d.query_id = l.query_id AND d.doc_id = l.doc_id AND d.rank <= $kDense)
       |ORDER BY l.query_id, l.rank""".stripMargin

  /** mirror of TextDemos.mmrRerank: dense top-m candidates + pairwise
    * sims (both ROUND 6), then the greedy MMR rounds unrolled as CTEs
    * (the quality-classifier discipline): each round joins the
    * pairwise table to the selected set, max-aggregates, and argmaxes
    * by (mmr desc, doc_id). λ and 1−λ interpolate from the SAME Scala
    * doubles the Spark side multiplies with. */
  def mmrRerankSql(m: Int = 20, k: Int = 5, lambda: Double = 0.7): String = {
    val lam = lambda.toString
    val oneMinus = (1 - lambda).toString
    val rounds = (2 to k).map { t =>
      s"""s$t AS MATERIALIZED (
         |  SELECT query_id, doc_id, CAST($t AS INT) AS mmr_round, mmr_score FROM (
         |    SELECT c.query_id, c.doc_id,
         |           $lam * c.rel - $oneMinus * ms.maxsim AS mmr_score,
         |           ROW_NUMBER() OVER (PARTITION BY c.query_id
         |             ORDER BY $lam * c.rel - $oneMinus * ms.maxsim DESC, c.doc_id) AS rn
         |    FROM cand c
         |    JOIN (SELECT p.query_id, p.doc_a AS doc_id, MAX(p.ps) AS maxsim
         |          FROM psim p JOIN sel${t - 1} s
         |            ON s.query_id = p.query_id AND s.doc_id = p.doc_b
         |          GROUP BY p.query_id, p.doc_a) ms
         |      ON ms.query_id = c.query_id AND ms.doc_id = c.doc_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s
         |                      WHERE s.query_id = c.query_id AND s.doc_id = c.doc_id))
         |  WHERE rn = 1
         |), sel$t AS (
         |  SELECT query_id, doc_id FROM sel${t - 1}
         |  UNION ALL SELECT query_id, doc_id FROM s$t)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val unionAll = (1 to k).map(t => s"SELECT * FROM s$t").mkString("\n  UNION ALL ")
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 97 = 0
       |), x AS (
       |  SELECT query_id, e.vec_id AS doc_id, ${cosineExpr("qv", "e.embedding")} AS sim,
       |         e.embedding AS cv
       |  FROM q CROSS JOIN embeddings e
       |), rr AS (
       |  SELECT query_id, doc_id, sim, cv,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rk
       |  FROM x
       |), cand AS MATERIALIZED (
       |  SELECT query_id, doc_id, ROUND(sim, 6) AS rel, cv FROM rr WHERE rk <= $m
       |), psim AS MATERIALIZED (
       |  SELECT a.query_id, a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         ROUND(${cosineExpr("a.cv", "b.cv")}, 6) AS ps
       |  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
       |), s1 AS MATERIALIZED (
       |  SELECT query_id, doc_id, CAST(1 AS INT) AS mmr_round, mmr_score FROM (
       |    SELECT query_id, doc_id, $lam * rel - $oneMinus * 0.0 AS mmr_score,
       |           ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY $lam * rel - $oneMinus * 0.0 DESC, doc_id) AS rn
       |    FROM cand)
       |  WHERE rn = 1
       |), sel1 AS (
       |  SELECT query_id, doc_id FROM s1
       |)$rounds
       |SELECT query_id, doc_id, mmr_round, mmr_score FROM (
       |  $unionAll)
       |ORDER BY query_id, mmr_round""".stripMargin
  }

  /** mirror of TextDemos.annLshTopk (8 planes, 1 probe bit, top-5) */
  def annLshSql(nPlanes: Int = 8, dim: Int = 64, k: Int = 5, probeBits: Int = 1): String = {
    val planes = Vec.hyperplanes(nPlanes, dim)
    // same Hamming-ball probe enumeration as Similarity.lshTopK
    val flips = graft.operators.Similarity.hammingBallMasks(nPlanes, probeBits)
      .mkString("[", ", ", "]")
    s"""WITH q0 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |c0 AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings WHERE vec_id >= 5),
       |cb AS (SELECT cand_id, cv, ${bucketExpr("cv", planes)} AS bucket FROM c0),
       |qb0 AS (SELECT query_id, qv, ${bucketExpr("qv", planes)} AS bucket0 FROM q0),
       |qb AS (SELECT query_id, qv, xor(bucket0, u.f) AS bucket
       |       FROM qb0 CROSS JOIN (SELECT unnest($flips) AS f) u),
       |x AS (SELECT query_id, cand_id, ${cosineExpr("qv", "cv")} AS sim
       |      FROM qb JOIN cb USING (bucket)),
       |r AS (SELECT query_id, cand_id, sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
       |      FROM x)
       |SELECT query_id, cand_id, round(sim, 6) AS sim, rank
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** mirror of TextDemos.dupRateBySource: the C2 prediction CTE (the
    * minhashLshEvalSql surgery) for near-dup membership, a windowed
    * md5 copy count for exact membership, one per-source summary. */
  def dupRateBySourceSql(k: Int = 32, bands: Int = 8, minEst: Double = 0.25): String = {
    val chain = minhashLshSql(k, bands, minEst)
      .replaceAll("(?s)\\nSELECT c\\.id_a.*$", "")
      .replaceFirst("^WITH ", "")
    val matches = (0 until k)
      .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $chain, pred AS (
       |  SELECT c.id_a, c.id_b
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.id_a
       |  JOIN sig sb ON sb.doc_id = c.id_b
       |  WHERE CAST($matches AS DOUBLE) / $k >= $minEst
       |), near AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT id_a AS doc_id FROM pred
       |    UNION ALL SELECT id_b AS doc_id FROM pred)
       |), exd AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, COUNT(*) OVER (PARTITION BY md5(text)) AS n
       |    FROM documents) WHERE n > 1
       |)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(COALESCE(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_exact_dup,
       |       CAST(COALESCE(SUM(CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_near_dup,
       |       CAST(COALESCE(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS DOUBLE)
       |         / CAST(COUNT(*) AS DOUBLE) AS exact_rate,
       |       CAST(COALESCE(SUM(CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS DOUBLE)
       |         / CAST(COUNT(*) AS DOUBLE) AS near_rate
       |FROM documents d
       |LEFT JOIN exd e ON e.doc_id = d.doc_id
       |LEFT JOIN near nr ON nr.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  /** mirror of TextDemos.lshRecallCurve: the annLshSql probe chain per
    * probe width, one shared brute-truth CTE, bucket sizes joined for
    * the exact scan fraction; the corpus bucket table and truth
    * MATERIALIZE (each is referenced by every width's block). */
  def lshRecallCurveSql(nPlanes: Int = 8, dim: Int = 64, k: Int = 5,
                        probes: Seq[Int] = Seq(0, 1, 2, 8)): String = {
    val planes = Vec.hyperplanes(nPlanes, dim)
    val blocks = probes.map { pb =>
      val flips = graft.operators.Similarity.hammingBallMasks(nPlanes, pb)
        .mkString("[", ", ", "]")
      s""",
         |pr$pb AS (
         |  SELECT query_id, qv, xor(bucket0, u.f) AS bucket
         |  FROM qb0 CROSS JOIN (SELECT unnest($flips) AS f) u
         |), sx$pb AS (
         |  SELECT query_id, cand_id, ${cosineExpr("qv", "cv")} AS sim
         |  FROM pr$pb JOIN cb USING (bucket)
         |), iv$pb AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
         |    FROM sx$pb) WHERE rank <= $k
         |), row$pb AS (
         |  SELECT $pb AS probe_bits,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM bt) AS n_truth,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM iv$pb i JOIN bt t
         |            ON i.query_id = t.query_id AND i.cand_id = t.cand_id) AS n_hits,
         |         (SELECT CAST(COALESCE(SUM(ls.n_cand), 0) AS BIGINT)
         |          FROM pr$pb a JOIN ls ON ls.bucket = a.bucket) AS scanned
         |)""".stripMargin
    }.mkString
    val union = probes.map(pb =>
      s"""SELECT probe_bits, n_truth, n_hits,
         |  CASE WHEN n_truth > 0 THEN CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE) ELSE 0.0 END AS recall,
         |  CAST(scanned AS DOUBLE) / CAST((SELECT COUNT(*) FROM q0) * (SELECT COUNT(*) FROM c0) AS DOUBLE) AS scan_frac
         |FROM row$pb""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH q0 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |c0 AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings WHERE vec_id >= 5),
       |cb AS MATERIALIZED (
       |  SELECT cand_id, cv, ${bucketExpr("cv", planes)} AS bucket FROM c0
       |), ls AS MATERIALIZED (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_cand FROM cb GROUP BY bucket
       |), qb0 AS MATERIALIZED (
       |  SELECT query_id, qv, ${bucketExpr("qv", planes)} AS bucket0 FROM q0
       |), bt AS MATERIALIZED (
       |  SELECT query_id, cand_id FROM (
       |    SELECT q0.query_id, c0.cand_id,
       |           ROW_NUMBER() OVER (PARTITION BY q0.query_id
       |             ORDER BY ${cosineExpr("q0.qv", "c0.cv")} DESC, c0.cand_id) AS rank
       |    FROM q0 CROSS JOIN c0) WHERE rank <= $k
       |)$blocks
       |$union
       |ORDER BY probe_bits""".stripMargin
  }

  /** mirror of TextDemos.retrievalEval: the annLshSql run chain and
    * the exact-cosine qrels chain (gain 11 − rank over the brute
    * top-10), then the TREC algebra — discounted gains rounded to 6
    * into decimal sums (partial-agg-order-proof), ideal DCG from the
    * qrels window, final ratios divided as doubles and rounded 6. */
  def retrievalEvalSql(nPlanes: Int = 8, dim: Int = 64, k: Int = 5,
                       kRel: Int = 10, probeBits: Int = 1): String = {
    val planes = Vec.hyperplanes(nPlanes, dim)
    val flips = graft.operators.Similarity.hammingBallMasks(nPlanes, probeBits)
      .mkString("[", ", ", "]")
    def gain(rel: String, pos: String) =
      s"CAST(round((pow(2.0, $rel) - 1.0) / log2($pos + 1.0), 6) AS DECIMAL(27,6))"
    // the TREC algebra applied to one arm's run CTE
    def arm(name: String, runCte: String) =
      s"""SELECT '$name' AS run_name, got.query_id,
         |  CASE WHEN n_rel IS NULL OR n_rel = 0 THEN 0.0
         |       ELSE round(CAST(hits AS DOUBLE) / n_rel, 6) END AS recall_at_k,
         |  CASE WHEN first_rel IS NULL THEN 0.0
         |       ELSE round(1.0 / first_rel, 6) END AS mrr,
         |  CASE WHEN idcg IS NULL OR idcg = 0 THEN 0.0
         |       ELSE round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) END AS ndcg_at_k
         |FROM (
         |  SELECT query_id,
         |    SUM(${gain("rel", "rank")}) AS dcg,
         |    SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits,
         |    MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel
         |  FROM (SELECT r.query_id, r.rank, COALESCE(qr.rel, 0) AS rel
         |        FROM $runCte r
         |        LEFT JOIN qr ON r.query_id = qr.query_id AND r.doc_id = qr.doc_id)
         |  GROUP BY query_id) got
         |LEFT JOIN ideal USING (query_id)""".stripMargin
    s"""WITH q0 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |c0 AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings WHERE vec_id >= 5),
       |ex AS (SELECT query_id, cand_id, ${cosineExpr("qv", "cv")} AS sim FROM q0, c0),
       |exr AS MATERIALIZED (SELECT query_id, cand_id,
       |          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rnk
       |        FROM ex),
       |qr AS (SELECT query_id, cand_id AS doc_id, CAST(${kRel + 1} - rnk AS BIGINT) AS rel
       |       FROM exr WHERE rnk <= $kRel),
       |exact_run AS (SELECT query_id, cand_id AS doc_id, rnk AS rank
       |              FROM exr WHERE rnk <= $k),
       |cb AS (SELECT cand_id, cv, ${bucketExpr("cv", planes)} AS bucket FROM c0),
       |qb0 AS (SELECT query_id, qv, ${bucketExpr("qv", planes)} AS bucket0 FROM q0),
       |qb AS (SELECT query_id, qv, xor(bucket0, u.f) AS bucket
       |       FROM qb0 CROSS JOIN (SELECT unnest($flips) AS f) u),
       |lx AS (SELECT query_id, cand_id, ${cosineExpr("qv", "cv")} AS sim
       |       FROM qb JOIN cb USING (bucket)),
       |lsh_run AS (SELECT query_id, cand_id AS doc_id, rnk AS rank FROM (
       |          SELECT query_id, cand_id,
       |            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rnk
       |          FROM lx) WHERE rnk <= $k),
       |ideal AS (SELECT query_id,
       |            SUM(CASE WHEN pos <= $k THEN ${gain("rel", "pos")} END) AS idcg,
       |            SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_rel
       |          FROM (SELECT query_id, rel, doc_id,
       |                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS pos
       |                FROM qr)
       |          GROUP BY query_id)
       |${arm("exact", "exact_run")}
       |UNION ALL
       |${arm("lsh", "lsh_run")}
       |ORDER BY run_name, query_id""".stripMargin
  }

  /** mirror of TextDemos.knnGraphDemo: the annLshSql shape with the
    * corpus on both sides, self-pairs excluded before ranking, then
    * the mutual (both-directions top-k) symmetrization. */
  def knnGraphSql(nPlanes: Int = 8, dim: Int = 64, k: Int = 5,
                  probeBits: Int = 1): String =
    s"""WITH ${knnTopCtes(nPlanes, dim, k, probeBits)}
       |SELECT a.query_id AS id_a, a.cand_id AS id_b, round(a.sim, 6) AS sim
       |FROM t a JOIN t b ON a.query_id = b.cand_id AND a.cand_id = b.query_id
       |WHERE a.query_id < a.cand_id
       |ORDER BY id_a, id_b""".stripMargin

  /** the LSH-probed top-k chain (through CTE `t`) shared by
    * knnGraphSql and pagerankCentralitySql */
  private def knnTopCtes(nPlanes: Int, dim: Int, k: Int, probeBits: Int): String = {
    val planes = Vec.hyperplanes(nPlanes, dim)
    val flips = graft.operators.Similarity.hammingBallMasks(nPlanes, probeBits)
      .mkString("[", ", ", "]")
    s"""c0 AS (SELECT vec_id, embedding FROM embeddings),
       |cb AS MATERIALIZED (SELECT vec_id AS cand_id, embedding AS cv,
       |       ${bucketExpr("embedding", planes)} AS bucket FROM c0),
       |qb AS (SELECT cand_id AS query_id, cv AS qv, xor(bucket, u.f) AS bucket
       |       FROM cb CROSS JOIN (SELECT unnest($flips) AS f) u),
       |x AS (SELECT query_id, cand_id, ${cosineExpr("qv", "cv")} AS sim
       |      FROM qb JOIN cb USING (bucket) WHERE query_id <> cand_id),
       |r AS MATERIALIZED (
       |      SELECT query_id, cand_id, sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
       |      FROM x),
       |t AS (SELECT query_id, cand_id, sim FROM r WHERE rank <= $k)""".stripMargin
  }

  /** mirror of TextDemos.labelPropagationDemo: the same mutual-kNN
    * edge chain as the PageRank mirror, then `iters` unrolled
    * synchronous LPA rounds — per round, the plurality neighbor label
    * per node (COUNT per (dst, label), rank 1 by count DESC then
    * label ASC — exactly Spark's min(struct(-count, label))), nodes
    * with no neighbors carrying their previous label. All integer
    * arithmetic: the match is bit-for-bit. */
  def labelPropagationSql(iters: Int = 4, nPlanes: Int = 8, dim: Int = 64,
                          k: Int = 5, probeBits: Int = 1): String = {
    val rounds = (1 to iters).map { i =>
      s"""w$i AS (SELECT id, lab FROM (
         |      SELECT e.dst AS id, l.lab, COUNT(*) AS c,
         |             ROW_NUMBER() OVER (PARTITION BY e.dst
         |                 ORDER BY COUNT(*) DESC, l.lab) AS rn
         |      FROM l${i - 1} l JOIN ed e ON l.id = e.src
         |      GROUP BY e.dst, l.lab) WHERE rn = 1),
         |l$i AS (SELECT p.id, COALESCE(w.lab, p.lab) AS lab
         |      FROM l${i - 1} p LEFT JOIN w$i w ON p.id = w.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${knnTopCtes(nPlanes, dim, k, probeBits)},
       |mut AS (SELECT a.query_id AS id_a, a.cand_id AS id_b
       |        FROM t a JOIN t b ON a.query_id = b.cand_id AND a.cand_id = b.query_id
       |        WHERE a.query_id < a.cand_id),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM mut
       |       UNION ALL SELECT id_b AS src, id_a AS dst FROM mut),
       |nodes AS (SELECT vec_id AS id FROM embeddings),
       |l0 AS (SELECT id, id AS lab FROM nodes),
       |$rounds
       |SELECT id AS vec_id, lab AS community
       |FROM l$iters ORDER BY vec_id""".stripMargin
  }

  /** mirror of TextDemos.pagerankCentrality: the C46 mutual-kNN edge
    * chain, both directions, then `iters` unrolled PageRank rounds in
    * the SAME scaled-integer arithmetic as Graph.pageRank — BIGINT
    * ranks in units of 10^-15, `//` mirroring Spark's `DIV`, sums
    * CAST back from HUGEINT. Every value is exact integer math, so
    * the match is bit-for-bit (the rank double is one mirrored IEEE
    * divide at the end). */
  def pagerankCentralitySql(iters: Int = 6, nPlanes: Int = 8, dim: Int = 64,
                            k: Int = 5, probeBits: Int = 1,
                            dampNum: Long = 85L, dampDen: Long = 100L,
                            scale: Long = 1000000000000000L): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst AS id, CAST(SUM(r.r // o.outdeg) AS BIGINT) AS contrib
         |      FROM r${i - 1} r JOIN ed e ON r.id = e.src JOIN odeg o ON e.src = o.src
         |      GROUP BY e.dst),
         |d$i AS (SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS dang
         |      FROM r${i - 1} r WHERE r.id NOT IN (SELECT src FROM odeg)),
         |r$i AS (SELECT n0.id,
         |        ((${(dampDen - dampNum) * scale} // nn.n) + $dampNum *
         |         (COALESCE(c.contrib, CAST(0 AS BIGINT)) + d.dang // nn.n)) // $dampDen AS r
         |      FROM nodes n0 CROSS JOIN nn CROSS JOIN d$i d LEFT JOIN c$i c ON n0.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${knnTopCtes(nPlanes, dim, k, probeBits)},
       |mut AS (SELECT a.query_id AS id_a, a.cand_id AS id_b
       |        FROM t a JOIN t b ON a.query_id = b.cand_id AND a.cand_id = b.query_id
       |        WHERE a.query_id < a.cand_id),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM mut
       |       UNION ALL SELECT id_b AS src, id_a AS dst FROM mut),
       |nodes AS (SELECT vec_id AS id FROM embeddings),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |odeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM ed GROUP BY src),
       |r0 AS (SELECT id, CAST($scale AS BIGINT) // (SELECT n FROM nn) AS r FROM nodes),
       |$rounds
       |SELECT id, r AS rank_e15, CAST(r AS DOUBLE) / $scale.0 AS rank
       |FROM r$iters ORDER BY id""".stripMargin
  }

  private val centroidsCore =
    """WITH e AS (
      |  SELECT label, CAST(u.i - 1 AS INT) AS pos, embedding[u.i] AS v
      |  FROM embeddings CROSS JOIN UNNEST(range(1, 65)) AS u(i)
      |), cent AS (
      |  -- Spark casts float->decimal by widening to double and then
      |  -- taking the shortest-roundtrip string (BigDecimal.valueOf);
      |  -- the double+varchar hops reproduce that bit-for-bit
      |  SELECT label, pos,
      |         CAST(SUM(CAST(CAST(CAST(v AS DOUBLE) AS VARCHAR) AS DECIMAL(27,20))) AS DOUBLE) / COUNT(v) AS centroid
      |  FROM e GROUP BY label, pos
      |)""".stripMargin

  /** mirror of TextDemos.clusterBalance: the centroidsCore + full-
    * corpus nearest-centroid assignment (the ivfAssign chain without
    * the query filter), then the C44 temperature keep rule per
    * cluster and the per-cluster before/kept summary. */
  def clusterBalanceSql(alpha: Double = 0.5): String =
    s"""$centroidsCore, c2 AS (
       |  SELECT label, list(centroid ORDER BY pos) AS cv FROM cent GROUP BY label
       |), q AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvd
       |  FROM embeddings
       |), x AS (
       |  SELECT vec_id, label, ${cosineExpr("qvd", "cv")} AS sim
       |  FROM q CROSS JOIN c2
       |), asg AS (
       |  SELECT vec_id, label AS cluster FROM (
       |    SELECT vec_id, label,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, label) AS rn
       |    FROM x) WHERE rn = 1
       |), c AS (
       |  SELECT cluster, COUNT(*) AS n_before FROM asg GROUP BY cluster
       |), m AS (SELECT MIN(n_before) AS nmin FROM c),
       |f AS (
       |  SELECT cluster, n_before,
       |         pow(CAST(n_before AS DOUBLE) / CAST(m.nmin AS DOUBLE), ${alpha - 1.0}) AS keep_frac
       |  FROM c CROSS JOIN m
       |)
       |, kept AS (
       |  SELECT a.cluster, COUNT(*) AS n_kept
       |  FROM asg a JOIN f USING (cluster)
       |  WHERE CAST(${md560("CAST(a.vec_id AS VARCHAR)")}
       |             % 1000000 AS DOUBLE) < f.keep_frac * 1000000.0
       |  GROUP BY a.cluster
       |)
       |SELECT f.cluster, f.n_before, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       |       round(f.keep_frac, 6) AS keep_frac
       |FROM f LEFT JOIN kept k USING (cluster)
       |ORDER BY f.cluster""".stripMargin

  /** mirror of TextDemos.corpusDrift: the C71 v1/v2 synthesis, the C9
    * quality score per version, fixed-edge bucketing from the SAME
    * Scala doubles, Laplace-smoothed PSI terms rounded 6. */
  def corpusDriftSql(edges: Seq[Double] = (1 to 9).map(_ / 10.0)): String = {
    val nB = edges.size + 1
    val bucket = edges.map(e =>
        s"(CASE WHEN q >= CAST($e AS DOUBLE) THEN 1 ELSE 0 END)")
      .mkString("CAST((", " + ", ") AS BIGINT)")
    def qcte(src: String, name: String) =
      s"""$name AS (
         |  SELECT
         |    0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
         |    + 0.3 * (CASE WHEN CAST(len(toks) AS DOUBLE) > 0 THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END)
         |    + 0.3 * (CASE WHEN length(text) > 0 THEN CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) ELSE 0.0 END) AS q
         |  FROM (SELECT text, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM $src)
         |)""".stripMargin
    s"""WITH v1 AS (SELECT text FROM documents WHERE doc_id % 7 <> 0),
       |v2 AS (SELECT CASE WHEN doc_id % 11 = 0 THEN text || ' v2-edit' ELSE text END AS text
       |       FROM documents WHERE doc_id % 5 <> 0),
       |${qcte("v1", "q1")},
       |${qcte("v2", "q2")},
       |b1 AS (SELECT $bucket AS bucket, COUNT(*) AS n FROM q1 GROUP BY 1),
       |b2 AS (SELECT $bucket AS bucket, COUNT(*) AS n FROM q2 GROUP BY 1),
       |spine AS (SELECT CAST(unnest(range(0, $nB)) AS BIGINT) AS bucket),
       |j AS (SELECT s.bucket,
       |        CAST(COALESCE(b1.n, 0) AS BIGINT) AS n_v1,
       |        CAST(COALESCE(b2.n, 0) AS BIGINT) AS n_v2
       |      FROM spine s
       |      LEFT JOIN b1 ON s.bucket = b1.bucket
       |      LEFT JOIN b2 ON s.bucket = b2.bucket),
       |t AS (SELECT CAST(SUM(n_v1) AS BIGINT) AS t1, CAST(SUM(n_v2) AS BIGINT) AS t2 FROM j)
       |SELECT bucket, n_v1, n_v2,
       |  round(((n_v1 + 1.0) / (t1 + $nB.0) - (n_v2 + 1.0) / (t2 + $nB.0))
       |        * ln(((n_v1 + 1.0) / (t1 + $nB.0)) / ((n_v2 + 1.0) / (t2 + $nB.0))), 6) AS psi
       |FROM j CROSS JOIN t ORDER BY bucket""".stripMargin
  }

  /** mirror of TextDemos.bpeTrain: `n` unrolled merge rounds, each a
    * mechanical copy of one template — adjacent-pair counts over the
    * previous round's symbol arrays, the (count desc, pair asc) argmax
    * rule, greedy left-to-right application via the island trick
    * (consecutive match runs keep even offsets — identical to the
    * Spark side's window algebra). Early exhaustion is consistent by
    * construction: an empty best{r} leaves w{r} = w{r-1} and
    * contributes no output row, exactly like the trainer's early
    * stop. */
  def bpeTrainSql(n: Int = 12): String =
    s"""WITH ${bpeRoundsCte(n)}
       |SELECT * FROM (
       |${(1 to n).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS rank, a AS "left", b AS "right", cnt AS n_occurrences FROM best$r""")
      .mkString("\nUNION ALL ")}
       |) ORDER BY rank""".stripMargin

  /** mirror of TextDemos.bpeEncode: the same `n` training rounds, then
    * the corpus segmented by the FINAL symbol table w{n} — per-doc
    * word list joined to the vocab, token streams rebuilt in word
    * order (chr(1)-separated, matching Bpe.Sep), wordless docs kept
    * with an empty stream via the trailing left join. */
  def bpeEncodeSql(n: Int = 12): String =
    s"""WITH ${bpeRoundsCte(n)},
       |dw AS (
       |  SELECT doc_id, u.pos AS pos, u.word AS word FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1), i ->
       |      struct_pack(pos := i, word := ws[i]))) AS u
       |    FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |          FROM documents))
       |), enc AS (
       |  SELECT dw.doc_id,
       |         CAST(SUM(len(w.syms)) AS BIGINT) AS n_tokens,
       |         array_to_string(flatten(list(w.syms ORDER BY dw.pos)), chr(1)) AS bpe_text
       |  FROM dw JOIN w$n w ON dw.word = w.word
       |  GROUP BY dw.doc_id
       |)
       |SELECT d.doc_id, CAST(COALESCE(e.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       COALESCE(e.bpe_text, '') AS bpe_text
       |FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** the C26 unigram-LM CTE chain over `documents`, ending in
    * `lm(doc_id, avg_logprob)` — the single source of the LM oracle
    * algebra (whitespace tokens, tf-weighted rounded-decimal log-prob
    * sums, double mean) every LM-composing oracle shares; a change to
    * the LM discipline edits this once or the oracles diverge from
    * TextDemos.lmScore. */
  private val lmCoreCtes: String =
    """toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
      |), ctf AS (
      |  SELECT tok, SUM(tf) AS ctf FROM tf GROUP BY tok
      |), tot AS (SELECT SUM(ctf) AS n_total FROM ctf),
      |lp AS (
      |  SELECT t.doc_id, t.tf,
      |         CAST(round(ln(CAST(c.ctf AS DOUBLE) / tot.n_total), 6)
      |              AS DECIMAL(27,6)) AS lp
      |  FROM tf t JOIN ctf c ON t.tok = c.tok CROSS JOIN tot
      |),
      |lm AS (SELECT doc_id, CAST(SUM(lp * tf) AS DOUBLE) / SUM(tf) AS avg_logprob
      |       FROM lp GROUP BY doc_id)""".stripMargin

  /** the C8 language-ID CTE chain over `src` — `lt`/`h`/`g` plus the
    * detected-language CASE (tie-break = LangProfiles declaration
    * order, 'und' on zero hits); `carry` columns ride alongside
    * doc_id. The single source of the LangProfiles scaffolding every
    * language-composing oracle shares. */
  private def langIdCtes(src: String,
                         carry: Seq[String] = Seq.empty): (String, String) = {
    val profiles = graft.functions.Text.LangProfiles
    val carryCols = ("doc_id" +: carry).mkString(", ")
    val hitCols = profiles.map { case (lang, stops) =>
      val list = stops.map(s => s"'$s'").mkString("[", ",", "]")
      s"CAST(len(list_filter(ltoks, x -> list_contains($list, x))) AS BIGINT) AS h_$lang"
    }.mkString(",\n    ")
    val great = profiles.map(p => s"h_${p._1}").mkString("greatest(", ", ", ")")
    val cases = profiles.map { case (lang, _) =>
      s"WHEN h_$lang = mx THEN '$lang'" }.mkString(" ")
    val ctes =
      s"""lt AS (
         |  SELECT $carryCols,
         |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ltoks
         |  FROM $src
         |), h AS (
         |  SELECT $carryCols,
         |    $hitCols
         |  FROM lt
         |), g AS (SELECT *, $great AS mx FROM h)""".stripMargin
    (ctes, s"CASE WHEN mx = 0 THEN 'und' $cases END")
  }

  /** mirror of TextDemos.langConfusionDemo: the shared C8 language
    * chain with the metadata lang carried through, cells + actual
    * totals, identical double division. */
  def langConfusionSql(): String = {
    val (langCtes, langCase) = langIdCtes("documents", carry = Seq("lang"))
    s"""WITH $langCtes,
       |p AS (SELECT lang AS actual, $langCase AS predicted FROM g),
       |cells AS (
       |  SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM p GROUP BY 1, 2
       |), t AS (SELECT actual, CAST(SUM(n_docs) AS BIGINT) AS tt FROM cells GROUP BY 1)
       |SELECT actual, predicted, n_docs,
       |       round(CAST(n_docs AS DOUBLE) / tt, 6) AS actual_frac
       |FROM cells JOIN t USING (actual)
       |ORDER BY actual, predicted""".stripMargin
  }

  /** mirror of TextDemos.mixtureReweightDemo: the shared LM chain
    * joined to documents for `source`, per-source and global
    * cross-entropy means through rounded-decimal sums, then the
    * DoReMi exponentiated-gradient step — excess rounded 6,
    * exp(η·excess) rounded 9 into an exact decimal normalizer,
    * smoothed weight rounded 6. Literals interpolate from the SAME
    * Scala doubles the operator uses. */
  def mixtureReweightSql(eta: Double = 50.0, smoothing: Double = 0.2): String =
    s"""WITH $lmCoreCtes,
       |j AS (SELECT d.source,
       |        CAST(round(-lm.avg_logprob, 6) AS DECIMAL(27,6)) AS nl
       |      FROM lm JOIN documents d USING (doc_id)),
       |ps AS (SELECT source,
       |         round(CAST(SUM(nl) AS DOUBLE) / COUNT(*), 6) AS proxy_loss
       |       FROM j GROUP BY source),
       |g AS (SELECT round(CAST(SUM(nl) AS DOUBLE) / COUNT(*), 6) AS ref_loss FROM j),
       |e AS (SELECT source, proxy_loss,
       |        round(greatest(proxy_loss - ref_loss, 0.0), 6) AS excess
       |      FROM ps CROSS JOIN g),
       |mx AS (SELECT MAX(excess) AS m FROM e),
       |s AS (SELECT source, proxy_loss, excess,
       |        CAST(round(exp($eta * (excess - m)), 9) AS DECIMAL(27,9)) AS w
       |      FROM e CROSS JOIN mx),
       |nrm AS (SELECT CAST(SUM(w) AS DOUBLE) AS denom, COUNT(*) AS n FROM s)
       |SELECT source, proxy_loss, excess,
       |  round(${1.0 - smoothing} * (CAST(w AS DOUBLE) / denom)
       |        + $smoothing / n, 6) AS weight
       |FROM s CROSS JOIN nrm ORDER BY source""".stripMargin

  /** mirror of TextDemos.ccnetBuckets: the shared LM chain for ppl,
    * the shared language chain for pred_lang, the shared per-key
    * interpolated quantile bars at the SAME Scala doubles 1/3 and
    * 2/3, `<=` bucket edges. */
  def ccnetBucketsSql(): String = {
    val (langCtes, langCase) = langIdCtes("documents")
    val bars = interpolatedPercentilesSql("scored", "pred_lang", "ppl",
      Seq("b_head" -> (1.0 / 3), "b_middle" -> (2.0 / 3)))
    s"""WITH $lmCoreCtes,
       |$langCtes,
       |lang AS (SELECT doc_id, $langCase AS pred_lang FROM g),
       |scored AS (SELECT lm.doc_id, lang.pred_lang,
       |             round(-lm.avg_logprob, 6) AS ppl
       |           FROM lm JOIN lang USING (doc_id)),
       |bars AS (
       |$bars
       |)
       |SELECT doc_id, pred_lang, ppl,
       |  CASE WHEN ppl <= b_head THEN 'head'
       |       WHEN ppl <= b_middle THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM scored JOIN bars USING (pred_lang)
       |ORDER BY doc_id""".stripMargin
  }

  /** mirror of TextDemos.groupSampleDemo: per-source ROW_NUMBER over
    * the same seed-keyed md5-60 priority (ties to doc_id — the
    * BoundedTopK (priority, id) tie-break), keep rank <= k. */
  def groupSampleSql(k: Int = 10, seed: Long = 17): String =
    s"""SELECT source, doc_id, rank FROM (
       |  SELECT source, doc_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY source
       |           ORDER BY ${md560(s"(CAST(doc_id AS VARCHAR) || '_$seed')")}, doc_id)
       |           AS BIGINT) AS rank
       |  FROM documents)
       |WHERE rank <= $k ORDER BY source, rank""".stripMargin

  /** mirror of TextDemos.bigramLmScore: same add-0.5 bigram model,
    * same 6-place-round-into-decimal per-bigram scores, identical
    * arithmetic shape so the final doubles are bit-equal. */
  /** the shared C39/C112 bigram-LM CTE chain over a given docs
    * relation: ws → bigrams → per-doc tf → corpus counts → smoothed
    * lp, KEEPING (a, b) so C112's rank tie-break can mirror exactly.
    * No line may start with `||` (caller-stripMargin embedding). */
  private def bigramLpCtes(docsRel: String): String =
    s"""ws AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM $docsRel
       |), bg AS (
       |  SELECT doc_id, u.a AS a, u.b AS b FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ws)), i ->
       |      struct_pack(a := ws[i], b := ws[i+1]))) AS u
       |    FROM ws WHERE len(ws) >= 2)
       |), tf2 AS MATERIALIZED (
       |  SELECT doc_id, a, b, CAST(COUNT(*) AS BIGINT) AS tf FROM bg GROUP BY doc_id, a, b
       |), cb AS MATERIALIZED (
       |  SELECT a, b, CAST(SUM(tf) AS BIGINT) AS cb FROM tf2 GROUP BY a, b
       |), cu AS (
       |  SELECT a, CAST(SUM(cb) AS BIGINT) AS cu FROM cb GROUP BY a
       |), v AS (
       |  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
       |  FROM (SELECT unnest(ws) AS tok FROM ws)
       |), lp AS (
       |  SELECT t.doc_id, t.a, t.b, t.tf,
       |         CAST(round(ln((c.cb + 0.5) / (u.cu + 0.5 * v.v)), 6)
       |              AS DECIMAL(27,6)) AS lp
       |  FROM tf2 t JOIN cb c ON t.a = c.a AND t.b = c.b
       |  JOIN cu u ON t.a = u.a CROSS JOIN v)""".stripMargin

  /** mirror of TextDemos.knLmScoreDemo: the same KN algebra — prefix
    * totals + distinct-continuation fan-outs over the shared bigram
    * CTEs, the same left-associated double arithmetic inside
    * round(ln(·), 6). */
  def knLmScoreSql(d: Double = 0.75, flagBelow: Double = -6.0): String =
    s"""WITH ${bigramLpCtes("documents")}, cup AS (
       |  SELECT a, CAST(SUM(cb) AS BIGINT) AS cu,
       |         CAST(COUNT(*) AS BIGINT) AS n1p_pre
       |  FROM cb GROUP BY a
       |), cont AS (
       |  SELECT b, CAST(COUNT(*) AS BIGINT) AS n1p_cont FROM cb GROUP BY b
       |), tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM cb),
       |knlp AS (
       |  SELECT t.doc_id, t.tf,
       |         CAST(round(ln((GREATEST(c.cb - $d, 0.0) +
       |               $d * u.n1p_pre * o.n1p_cont / tt.tt) / u.cu), 6)
       |              AS DECIMAL(27,6)) AS lp
       |  FROM tf2 t JOIN cb c ON t.a = c.a AND t.b = c.b
       |  JOIN cup u ON t.a = u.a JOIN cont o ON t.b = o.b CROSS JOIN tt)
       |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       |       CAST(SUM(lp * tf) AS DOUBLE) / SUM(tf) AS kn_logprob,
       |       (CAST(SUM(lp * tf) AS DOUBLE) / SUM(tf)) < $flagBelow AS flagged
       |FROM knlp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def bigramLmScoreSql(): String =
    s"""WITH ${bigramLpCtes("documents")}
       |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       |       CAST(SUM(lp * tf) AS DOUBLE) / SUM(tf) AS avg_logprob,
       |       (CAST(SUM(lp * tf) AS DOUBLE) / SUM(tf)) < -7.0 AS flagged
       |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** mirror of TextDemos.minkScoreDemo: same %31 memorization plant,
    * same lowest-m-occurrences selection (rank by (lp, a, b), whole
    * groups while they fit, partial integer weight at the cut), same
    * decimal sum / one IEEE division. */
  def minkSql(kFrac: Double = 0.2, flagAbove: Double = -3.4,
              passage: String): String = {
    def q(s: String) = s.replace("'", "''")
    s"""WITH p AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 31 = 0 THEN '${q(passage)}' ELSE text END AS text
       |  FROM documents
       |), ${bigramLpCtes("p")}, n AS (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams FROM lp GROUP BY doc_id
       |), m AS (
       |  SELECT doc_id, n_bigrams,
       |         GREATEST(1, CAST(FLOOR(n_bigrams * $kFrac + 1e-9) AS BIGINT)) AS m
       |  FROM n
       |), c AS (
       |  SELECT doc_id, a, b, tf, lp,
       |         SUM(tf) OVER (PARTITION BY doc_id ORDER BY lp, a, b
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM lp
       |), sel AS (
       |  SELECT c.doc_id, m.n_bigrams, m.m, c.lp,
       |         LEAST(c.tf, m.m - (c.cum - c.tf)) AS wt
       |  FROM c JOIN m USING (doc_id) WHERE c.cum - c.tf < m.m
       |)
       |SELECT doc_id, n_bigrams, m,
       |       CAST(SUM(lp * wt) AS DOUBLE) / CAST(m AS DOUBLE) AS mink_logprob,
       |       (CAST(SUM(lp * wt) AS DOUBLE) / CAST(m AS DOUBLE)) > $flagAbove AS flagged
       |FROM sel GROUP BY doc_id, n_bigrams, m ORDER BY doc_id""".stripMargin
  }

  /** mirror of Similarity.semanticDedup: label-bootstrap centroids
    * (the centroidsCore decimal discipline), per-member centroid
    * cosine, within-cluster pair join at the rounded threshold, the
    * SemDeDup keep-the-least-central drop rule as an EXISTS set. */
  def semanticDedupSql(threshold: Double = 0.25): String =
    s"""WITH ev AS (
       |  SELECT vec_id, label,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), e AS (
       |  SELECT label, CAST(u.i - 1 AS INT) AS pos, embedding[u.i] AS vv
       |  FROM embeddings CROSS JOIN UNNEST(range(1, 65)) AS u(i)
       |), cent AS (
       |  SELECT label, pos,
       |         CAST(SUM(CAST(CAST(CAST(vv AS DOUBLE) AS VARCHAR) AS DECIMAL(27,20))) AS DOUBLE) / COUNT(vv) AS centroid
       |  FROM e GROUP BY label, pos
       |), c2 AS (
       |  SELECT label, list(centroid ORDER BY pos) AS cv FROM cent GROUP BY label
       |), cs AS MATERIALIZED (
       |  SELECT ev.vec_id, ev.label, ev.v,
       |         round(${cosineExpr("ev.v", "c2.cv")}, 6) AS cent_sim
       |  FROM ev JOIN c2 ON ev.label = c2.label
       |), dropped AS (
       |  SELECT DISTINCT a.vec_id AS vec_id
       |  FROM cs a JOIN cs b ON a.label = b.label AND a.vec_id <> b.vec_id
       |  WHERE round(${cosineExpr("a.v", "b.v")}, 6) >= $threshold
       |    AND (b.cent_sim < a.cent_sim
       |         OR (b.cent_sim = a.cent_sim AND b.vec_id < a.vec_id))
       |)
       |SELECT cs.vec_id, cs.label, cs.cent_sim, (d.vec_id IS NULL) AS is_kept
       |FROM cs LEFT JOIN dropped d ON cs.vec_id = d.vec_id
       |ORDER BY cs.vec_id""".stripMargin

  /** mirror of Curation.dsirScore (target = lang 'en'): hashed-bucket
    * tf, one counts pass for both distributions, the smoothed
    * log-ratio λ table rounded into decimal, decimal per-doc sums,
    * selection at the corpus's interpolated `selectQ` quantile. */
  def dsirScoreSql(buckets: Int = 1024, selectQ: Double = 0.8): String = {
    val halfB = 0.5 * buckets
    val thrSql = interpolatedPercentilesSql(
      "(SELECT 1 AS _g, dsir_logweight FROM scored)", "_g", "dsir_logweight",
      Seq("_sel_thr" -> selectQ))
    s"""WITH toks AS (
       |  SELECT doc_id, t, ('0x'||substr(md5(tok),1,15))::BIGINT % $buckets AS b
       |  FROM (
       |    SELECT doc_id, (lang = 'en') AS t,
       |           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
       |    FROM documents)
       |), tf AS MATERIALIZED (
       |  SELECT doc_id, t, b, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks GROUP BY doc_id, t, b
       |), counts AS MATERIALIZED (
       |  SELECT b, CAST(SUM(CASE WHEN t THEN tf ELSE 0 END) AS BIGINT) AS ct,
       |         CAST(SUM(tf) AS BIGINT) AS cr
       |  FROM tf GROUP BY b
       |), tot AS (
       |  SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr
       |  FROM counts
       |), lam AS (
       |  SELECT b, CAST(round(ln(((ct + 0.5) / (tt + $halfB)) /
       |                          ((cr + 0.5) / (tr + $halfB))), 6)
       |              AS DECIMAL(27,6)) AS lam
       |  FROM counts CROSS JOIN tot
       |), scored AS MATERIALIZED (
       |  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       |         CAST(SUM(lam * tf) AS DOUBLE) AS dsir_logweight
       |  FROM tf JOIN lam ON tf.b = lam.b
       |  GROUP BY tf.doc_id
       |), thr AS (
       |$thrSql
       |)
       |SELECT doc_id, n_tokens, dsir_logweight,
       |       dsir_logweight >= thr._sel_thr AS selected
       |FROM scored CROSS JOIN thr ORDER BY doc_id""".stripMargin
  }

  /** mirror of Curation.winnowFingerprints: positional k-gram md5-40
    * hashes, the packed (hash, −pos) key, plain integer MIN over the
    * w-row frame, unpacked back to the rightmost-min fingerprint. */
  def winnowFingerprintSql(k: Int = 4, w: Int = 5): String = {
    val cap = 1L << 23
    s"""WITH ws AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
       |  FROM documents
       |), grams AS MATERIALIZED (
       |  SELECT doc_id, CAST(u.i - 1 AS INT) AS pos,
       |         ('0x'||substr(md5(array_to_string(ts[u.i:u.i+${k - 1}], ' ')),1,10))::BIGINT AS h40
       |  FROM ws CROSS JOIN UNNEST(range(1, len(ts) - $k + 2)) AS u(i)
       |  WHERE len(ts) >= $k
       |), m AS (
       |  SELECT doc_id, pos,
       |         min(h40 * $cap + (${cap - 1} - pos)) OVER (
       |           PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS mkey
       |  FROM grams
       |)
       |SELECT DISTINCT doc_id, ${cap - 1} - (mkey % $cap) AS pos,
       |       mkey // $cap AS hash
       |FROM m WHERE pos >= ${w - 1} ORDER BY doc_id, pos""".stripMargin
  }

  /** mirror of Classifier.logregScore: the same hashed BINARY-presence
    * features + bias pseudo-bucket, then `rounds` UNROLLED full-batch
    * GD rounds — margin (rounded-term decimal sum) → σ rounded to 6 →
    * gradient (rounded-term decimal sum) → weight round — exactly the
    * Spark loop's algebra, ending in the final scoring join. */
  def logregScoreSql(buckets: Int = 1024, rounds: Int = 12,
                     lr: Double = 20.0): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""m$r AS (
         |  SELECT fx.doc_id, fx.y,
         |         CAST(SUM(CAST(round(w.w * fx.x, 9) AS DECIMAL(27,9))) AS DOUBLE) AS m
         |  FROM fx JOIN w${r - 1} w ON fx.b = w.b GROUP BY fx.doc_id, fx.y
         |), p$r AS (
         |  SELECT doc_id, y, round(1.0 / (1.0 + exp(-m)), 6) AS p FROM m$r
         |), g$r AS (
         |  SELECT fx.b,
         |         CAST(SUM(CAST(round(fx.x * (p.y - p.p), 9) AS DECIMAL(27,9))) AS DOUBLE)
         |           / (SELECT nd FROM nd) AS g
         |  FROM fx JOIN p$r p ON fx.doc_id = p.doc_id GROUP BY fx.b
         |), w$r AS MATERIALIZED (
         |  SELECT w.b, round(w.w + $lr * COALESCE(g.g, 0.0), 6) AS w
         |  FROM w${r - 1} w LEFT JOIN g$r g ON w.b = g.b
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, y, ('0x'||substr(md5(tok),1,15))::BIGINT % $buckets AS b
       |  FROM (
       |    SELECT doc_id,
       |           CASE WHEN list_contains(list_filter(string_split(text, ' '),
       |                                               x -> x <> ''), 'key')
       |                THEN 1.0 ELSE 0.0 END AS y,
       |           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
       |    FROM documents)
       |), fx AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, y, b, 1.0 AS x FROM toks
       |  UNION ALL
       |  SELECT DISTINCT doc_id, y, CAST(-1 AS BIGINT) AS b, 1.0 AS x FROM toks
       |), w0 AS (
       |  SELECT DISTINCT b, 0.0 AS w FROM fx
       |), nd AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM fx WHERE b = -1
       |), $roundCtes, mf AS (
       |  SELECT fx.doc_id, fx.y,
       |         CAST(SUM(CAST(round(w.w * fx.x, 9) AS DECIMAL(27,9))) AS DOUBLE) AS m
       |  FROM fx JOIN w$rounds w ON fx.b = w.b GROUP BY fx.doc_id, fx.y
       |)
       |SELECT doc_id, y = 1.0 AS is_target,
       |       round(1.0 / (1.0 + exp(-m)), 6) AS score,
       |       round(1.0 / (1.0 + exp(-m)), 6) >= 0.5 AS predicted
       |FROM mf ORDER BY doc_id""".stripMargin
  }

  /** mirror of TextDemos.bm25Topk: posting table → dl/df/consts →
    * broadcast query terms → per-term BM25 rounded to 6 places into
    * decimal (the lm_score discipline) → decimal sum → dense top-k by
    * (score desc, doc_id). Constants interpolate from Bm25 so both
    * engines parse the SAME shortest-round-trip double literals. */
  /** mirror of TextDemos.qualityCalibration: the full logregScoreSql
    * chain as a subquery, fixed-width bins (score 1.0 folds into the
    * top bin), rounded-decimal mean scores, empirical positive rates.
    */
  def qualityCalibrationSql(nBins: Int = 10): String = {
    val scores = logregScoreSql()
    s"""WITH sc AS (
       |  SELECT least(CAST(floor(score * $nBins) AS BIGINT), ${nBins - 1}) AS bin,
       |         score,
       |         CASE WHEN is_target THEN 1 ELSE 0 END AS ypos
       |  FROM ($scores)
       |)
       |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       |  round(CAST(SUM(CAST(round(score, 6) AS DECIMAL(27,6))) AS DOUBLE)
       |        / COUNT(*), 6) AS mean_score,
       |  round(CAST(SUM(ypos) AS DOUBLE) / COUNT(*), 6) AS frac_pos
       |FROM sc GROUP BY bin ORDER BY bin""".stripMargin
  }

  /** mirror of TextDemos.bm25Index: per-term summary (df + exact
    * integer impact mass) of the precomputed-impact index — pins the
    * whole tokenize → posting → impact-precompute build. */
  def bm25IndexSql(): String = {
    import graft.operators.Bm25.{K1, B}
    s"""WITH tf AS MATERIALIZED (
       |  SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
       |    FROM documents)
       |  GROUP BY doc_id, tok
       |), dl AS MATERIALIZED (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
       |), dfx AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
       |), consts AS (
       |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n,
       |         (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
       |           / (SELECT COUNT(*) FROM documents) AS avgdl
       |), impacts AS (
       |  SELECT tf.term, tf.doc_id,
       |    CAST(CAST(ROUND(ln((c.n - dfx.df + 0.5) / (dfx.df + 0.5) + 1)
       |      * tf.tf * ${K1 + 1} / (tf.tf + $K1 * (${1 - B} + $B * dl.dl / c.avgdl)), 6)
       |      AS DECIMAL(27,6)) * 1000000 AS BIGINT) AS w_e6
       |  FROM tf JOIN dfx USING (term)
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN consts c
       |)
       |SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(w_e6) AS BIGINT) AS sum_w_e6
       |FROM impacts GROUP BY term ORDER BY term""".stripMargin
  }

  def bm25TopkSql(k: Int = 10): String =
    s"""WITH ${bm25Ctes("documents")}
       |SELECT query_id, doc_id, score, rank FROM lexranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** the BM25 CTE chain (tf … lexranked) over `corpus`(doc_id, text) —
    * shared by the bm25_topk oracle and the rrf_fusion oracle's
    * lexical leg. `lexranked` is the FULL ranking; consumers filter. */
  private def bm25Ctes(corpus: String): String = {
    import graft.operators.Bm25.{K1, B}
    s"""tf AS MATERIALIZED (
       |  SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
       |    FROM $corpus)
       |  GROUP BY doc_id, tok
       |), dl AS MATERIALIZED (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
       |), df AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
       |), consts AS (
       |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM $corpus) AS n,
       |         (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
       |           / (SELECT COUNT(*) FROM $corpus) AS avgdl
       |), qt AS (
       |  SELECT DISTINCT query_id, term FROM (
       |    SELECT doc_id AS query_id, unnest(ws[1:8]) AS term FROM (
       |      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |      FROM $corpus WHERE doc_id % 97 = 0))
       |), terms AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(ROUND(ln((c.n - df.df + 0.5) / (df.df + 0.5) + 1)
       |      * tf.tf * ${K1 + 1} / (tf.tf + $K1 * (${1 - B} + $B * dl.dl / c.avgdl)), 6)
       |      AS DECIMAL(27,6)) AS term_score
       |  FROM qt JOIN tf USING (term) JOIN df USING (term)
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN consts c
       |), scores AS (
       |  SELECT query_id, doc_id, CAST(SUM(term_score) AS DOUBLE) AS score
       |  FROM terms GROUP BY query_id, doc_id
       |), lexranked AS (
       |  SELECT query_id, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM scores)""".stripMargin
  }

  /** mirror of TextDemos.rrfFusion: the id-aligned (documents ⋈
    * embeddings) corpus, the SAME BM25 chain as bm25_topk plus a
    * brute-force dense cosine ranking, fused by integer RRF —
    * `1000000000 // (60 + rank)` is exact in both engines, so fused
    * scores are exact BIGINT sums with no float seam. */
  def rrfFusionSql(mLex: Int = 20, mDense: Int = 20, k: Int = 10,
                   rrfK: Int = 60): String = {
    s"""WITH corpus AS MATERIALIZED (
       |  SELECT d.doc_id, d.text, e.embedding
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
       |), ${bm25Ctes("corpus")},
       |dq AS (
       |  SELECT doc_id AS query_id, embedding AS qv FROM corpus WHERE doc_id % 97 = 0
       |), dx AS (
       |  SELECT dq.query_id, c.doc_id, ${cosineExpr("dq.qv", "c.embedding")} AS sim
       |  FROM dq CROSS JOIN corpus c
       |), denseranked AS (
       |  SELECT query_id, doc_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY sim DESC, doc_id) AS BIGINT) AS rank
       |  FROM dx
       |), contrib AS (
       |  SELECT query_id, doc_id, 1000000000 // ($rrfK + rank) AS c
       |  FROM lexranked WHERE rank <= $mLex
       |  UNION ALL
       |  SELECT query_id, doc_id, 1000000000 // ($rrfK + rank) AS c
       |  FROM denseranked WHERE rank <= $mDense
       |), fusedsc AS (
       |  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_score_e9
       |  FROM contrib GROUP BY query_id, doc_id
       |), fr AS (
       |  SELECT query_id, doc_id, rrf_score_e9,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY rrf_score_e9 DESC, doc_id) AS BIGINT) AS rank
       |  FROM fusedsc)
       |SELECT query_id, doc_id, rrf_score_e9, rank FROM fr WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** the shared unrolled-merge-round CTE chain (w0 … w{n},
    * best1 … best{n}) behind both BPE oracles. */
  private def bpeRoundsCte(n: Int): String = {
    val rounds = (1 to n).map { r =>
      s"""p$r AS (
         |  SELECT word, freq, unnest(list_transform(range(1, len(syms)), i ->
         |    struct_pack(pos := i - 1, a := syms[i], b := syms[i+1]))) AS u
         |  FROM w${r - 1} WHERE len(syms) >= 2
         |), pp$r AS MATERIALIZED (
         |  SELECT word, freq, u.pos AS pos, u.a AS a, u.b AS b FROM p$r
         |), best$r AS MATERIALIZED (
         |  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM pp$r
         |  GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
         |), mt$r AS (
         |  SELECT pp.word, pp.pos FROM pp$r pp JOIN best$r bs ON pp.a = bs.a AND pp.b = bs.b
         |), kp$r AS (
         |  SELECT word, pos FROM (
         |    SELECT word, pos, MIN(pos) OVER (PARTITION BY word, grp) AS run0 FROM (
         |      SELECT word, pos, pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
         |      FROM mt$r))
         |  WHERE (pos - run0) % 2 = 0
         |), ee$r AS (
         |  SELECT word, freq, u.pos AS pos, u.s AS s FROM (
         |    SELECT word, freq, unnest(list_transform(range(1, len(syms) + 1), i ->
         |      struct_pack(pos := i - 1, s := syms[i]))) AS u
         |    FROM w${r - 1})
         |), w$r AS MATERIALIZED (
         |  SELECT e.word, MIN(e.freq) AS freq,
         |         list(CASE WHEN k1.pos IS NOT NULL THEN (SELECT a || b FROM best$r) ELSE e.s END ORDER BY e.pos) AS syms
         |  FROM ee$r e
         |  LEFT JOIN kp$r k1 ON e.word = k1.word AND e.pos = k1.pos
         |  LEFT JOIN kp$r k2 ON e.word = k2.word AND e.pos = k2.pos + 1
         |  WHERE k2.pos IS NULL
         |  GROUP BY e.word
         |)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
       |         list_transform(range(1, length(word) + 1), i -> word[i]) AS syms
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
       |        FROM documents)
       |  GROUP BY word
       |),
       |$rounds""".stripMargin
  }

  /** shared CTE chain for the PQ oracles: per-subspace exploded
    * components → bootstrap codebooks (same double+varchar decimal hops
    * as centroidsCore) → per-(vector, subspace, code) squared L2 with
    * 6-place-rounded decimal terms (plain multiply, not pow — IEEE
    * pow(x,2) need not equal x*x) → argmin code per subspace. */
  private def pqCore(m: Int = 8, dim: Int = 64): String = {
    val sub = dim / m
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST((u.i - 1) // $sub AS INT) AS subspace,
       |         CAST((u.i - 1) % $sub AS INT) AS subpos, embedding[u.i] AS v
       |  FROM embeddings CROSS JOIN UNNEST(range(1, ${dim + 1})) AS u(i)
       |), books AS (
       |  SELECT subspace, label AS code, subpos,
       |         CAST(SUM(CAST(CAST(CAST(v AS DOUBLE) AS VARCHAR) AS DECIMAL(27,20))) AS DOUBLE) / COUNT(v) AS centroid
       |  FROM e GROUP BY subspace, label, subpos
       |), enc0 AS (
       |  SELECT e.vec_id, e.subspace, b.code,
       |         SUM(CAST(round((CAST(e.v AS DOUBLE) - b.centroid) * (CAST(e.v AS DOUBLE) - b.centroid), 6) AS DECIMAL(27,6))) AS l2
       |  FROM e JOIN books b ON e.subspace = b.subspace AND e.subpos = b.subpos
       |  GROUP BY e.vec_id, e.subspace, b.code
       |), enc AS (
       |  SELECT vec_id, subspace, code FROM (
       |    SELECT vec_id, subspace, code,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY l2, code) AS rn
       |    FROM enc0) WHERE rn = 1
       |)""".stripMargin
  }

  /** mirror of TextDemos.pqTrainDemo: the bootstrap codebooks
    * themselves (12-place-rounded centroids, the ivf_centroids hash
    * discipline) — the training half of the r9 pq_train / pq_topk
    * split, so the search row's cost is search, not training. */
  def pqTrainSql(): String =
    s"""${pqCore()}
       |SELECT subspace, code, subpos, round(centroid, 12) AS centroid
       |FROM books ORDER BY subspace, code, subpos""".stripMargin

  /** mirror of TextDemos.pqEncodeDemo */
  def pqEncodeSql(): String =
    s"""${pqCore()}
       |SELECT vec_id, subspace, code FROM enc ORDER BY vec_id, subspace""".stripMargin

  /** mirror of TextDemos.pqTopkDemo: ADC — each query's m×codes
    * subspace-distance table summed over the corpus codes, ranked by
    * the DOUBLE-cast distance (matching Spark's BoundedTopK on the
    * negated double), ties to the lowest cand_id. The vec_id < 5
    * query/candidate split is pinned to TextDemos.pqTopkDemo's. */
  def pqTopkSql(k: Int = 5): String =
    s"""${pqCore()}, sc AS (
       |  SELECT d.vec_id AS query_id, c.vec_id AS cand_id,
       |         CAST(SUM(d.l2) AS DOUBLE) AS dist
       |  FROM enc c JOIN enc0 d
       |    ON c.subspace = d.subspace AND c.code = d.code
       |  WHERE d.vec_id < 5 AND c.vec_id >= 5
       |  GROUP BY d.vec_id, c.vec_id
       |), r AS (
       |  SELECT query_id, cand_id, dist,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |                                 ORDER BY dist, cand_id) AS BIGINT) AS rank
       |  FROM sc)
       |SELECT query_id, cand_id, round(dist, 6) AS dist, rank
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** mirror of TextDemos.ivfCentroids */
  def ivfCentroidsSql(): String =
    s"""$centroidsCore
       |SELECT label, pos, round(centroid, 12) AS centroid
       |FROM cent ORDER BY label, pos""".stripMargin

  /** mirror of TextDemos.ivfAssign */
  def ivfAssignSql(): String =
    s"""$centroidsCore, c2 AS (
       |  SELECT label, list(centroid ORDER BY pos) AS cv FROM cent GROUP BY label
       |), q AS (
       |  SELECT vec_id AS query_id,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvd
       |  FROM embeddings WHERE vec_id < 5
       |), x AS (
       |  SELECT query_id, label, ${cosineExpr("qvd", "cv")} AS sim
       |  FROM q CROSS JOIN c2
       |), r AS (
       |  SELECT query_id, label, sim,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, label) AS rn
       |  FROM x)
       |SELECT query_id, label, round(sim, 6) AS sim
       |FROM r WHERE rn = 1 ORDER BY query_id""".stripMargin

  /** mirror of TextDemos.ivfTopk — C14+C15 closed into an end-to-end
    * posting-list search: nearest centroid per query, then exact cosine
    * top-k within that cluster's posting list only. */
  /** `candWhere`: extra predicate ANDed onto the candidate side — the
    * C82 filtered-search mirror (the index/centroids stay built over
    * the FULL corpus; the filter applies at query time). */
  def ivfTopkSql(k: Int = 5, candWhere: String = ""): String =
    s"""$centroidsCore, c2 AS (
       |  SELECT label, list(centroid ORDER BY pos) AS cv FROM cent GROUP BY label
       |), q AS (
       |  SELECT vec_id AS query_id, embedding AS qv,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvd
       |  FROM embeddings WHERE vec_id < 5
       |), x AS (
       |  SELECT query_id, label, ${cosineExpr("qvd", "cv")} AS sim
       |  FROM q CROSS JOIN c2
       |), r AS (
       |  SELECT query_id, label,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, label) AS rn
       |  FROM x
       |), a AS (
       |  SELECT q.query_id, q.qv, r.label
       |  FROM q JOIN r ON q.query_id = r.query_id AND r.rn = 1
       |), c AS (
       |  SELECT vec_id AS cand_id, embedding AS cv2, label
       |  FROM embeddings WHERE vec_id >= 5$candWhere
       |), s AS (
       |  SELECT a.query_id, c.cand_id, ${cosineExpr("a.qv", "c.cv2")} AS sim
       |  FROM a JOIN c ON a.label = c.label
       |), rr AS (
       |  SELECT query_id, cand_id, sim,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
       |  FROM s)
       |SELECT query_id, cand_id, round(sim, 6) AS sim, rank
       |FROM rr WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** mirror of TextDemos.ivfRecallCurve: the ivfTopkSql machinery per
    * probe width (rn <= nprobe), one brute-truth CTE shared by every
    * block, posting sizes joined for the exact scan fraction, one
    * summary row per nprobe. */
  def ivfRecallCurveSql(k: Int = 5, probes: Seq[Int] = Seq(1, 2, 4, 10)): String = {
    val blocks = probes.map { np =>
      s""",
         |a$np AS (
         |  SELECT q.query_id, q.qv, r.label
         |  FROM q JOIN r ON q.query_id = r.query_id AND r.rn <= $np
         |), s$np AS (
         |  SELECT a.query_id, c.cand_id, ${cosineExpr("a.qv", "c.cv2")} AS sim
         |  FROM a$np a JOIN c ON a.label = c.label
         |), iv$np AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
         |    FROM s$np) WHERE rank <= $k
         |), row$np AS (
         |  SELECT $np AS nprobe,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM bt) AS n_truth,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM iv$np i JOIN bt t
         |            ON i.query_id = t.query_id AND i.cand_id = t.cand_id) AS n_hits,
         |         (SELECT CAST(COALESCE(SUM(ls.n_cand), 0) AS BIGINT)
         |          FROM a$np a2 JOIN ls ON ls.label = a2.label) AS scanned
         |)""".stripMargin
    }.mkString
    val union = probes.map(np =>
      s"""SELECT nprobe, n_truth, n_hits,
         |  CASE WHEN n_truth > 0 THEN CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE) ELSE 0.0 END AS recall,
         |  CAST(scanned AS DOUBLE) / CAST((SELECT COUNT(*) FROM q) * (SELECT COUNT(*) FROM c) AS DOUBLE) AS scan_frac
         |FROM row$np""".stripMargin).mkString("\nUNION ALL\n")
    s"""$centroidsCore, c2 AS (
       |  SELECT label, list(centroid ORDER BY pos) AS cv FROM cent GROUP BY label
       |), q AS (
       |  SELECT vec_id AS query_id, embedding AS qv,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvd
       |  FROM embeddings WHERE vec_id < 5
       |), x AS (
       |  SELECT query_id, label, ${cosineExpr("qvd", "cv")} AS sim
       |  FROM q CROSS JOIN c2
       |), r AS (
       |  SELECT query_id, label,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, label) AS rn
       |  FROM x
       |), c AS (
       |  SELECT vec_id AS cand_id, embedding AS cv2, label
       |  FROM embeddings WHERE vec_id >= 5
       |), ls AS (
       |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_cand FROM c GROUP BY label
       |), bt AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT q.query_id, c.cand_id,
       |           ROW_NUMBER() OVER (PARTITION BY q.query_id
       |             ORDER BY ${cosineExpr("q.qv", "c.cv2")} DESC, c.cand_id) AS rank
       |    FROM q CROSS JOIN c) WHERE rank <= $k
       |)$blocks
       |$union
       |ORDER BY nprobe""".stripMargin
  }

  /** mirror of TextDemos.ivfPqTopkDemo — the full IVF-PQ chain:
    * coarse centroids (centroidsCore), 9-place residuals, sign-orthant
    * bootstrap residual books (the double→decimal VARCHAR hop, as
    * centroidsCore), PQ encoding of residuals, nprobe coarse probe by
    * cosine, per-(query, probed-cluster) ADC tables, distance sums
    * over the label-restricted codes, rank ties to the lowest
    * cand_id. */
  def ivfPqTopkSql(k: Int = 5, m: Int = 8, dim: Int = 64,
                   bootstrapBits: Int = 4, nprobe: Int = 2): String =
    // plain concatenation past the chain: the chain is already
    // margin-stripped (the c4GateAggSql lesson)
    ivfPqChain(m, dim, bootstrapBits, nprobe) + "\n" +
      s"""SELECT query_id, cand_id, round(dist, 6) AS dist, rank
         |FROM r2 WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** mirror of TextDemos.ivfPqRerankDemo: the same chain's ADC
    * ranking truncated at kCand, exact-cosine rescored against the
    * raw candidate vectors, re-ranked — the standard
    * compressed-candidate recall repair. Ranks on the UNROUNDED
    * cosine (the knnGraph discipline) so ties agree cross-engine. */
  def ivfPqRerankSql(k: Int = 5, kCand: Int = 20, m: Int = 8, dim: Int = 64,
                     bootstrapBits: Int = 4, nprobe: Int = 2): String =
    ivfPqChain(m, dim, bootstrapBits, nprobe) + ",\n" +
      s"""e2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvd
         |        FROM embeddings WHERE vec_id >= 5),
         |cand AS (SELECT query_id, cand_id FROM r2 WHERE rank <= $kCand),
         |ex AS (SELECT c.query_id, c.cand_id, ${cosineExpr("q.qvd", "e2.cvd")} AS sim
         |       FROM cand c JOIN q ON q.query_id = c.query_id
         |       JOIN e2 ON e2.vec_id = c.cand_id),
         |rr AS (SELECT query_id, cand_id, sim,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
         |       FROM ex)
         |SELECT query_id, cand_id, round(sim, 6) AS sim, rank
         |FROM rr WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** the IVF-PQ CTE chain through `r2` (ADC distance ranking over the
    * probed labels) — shared by ivfPqTopkSql and ivfPqRerankSql. */
  private def ivfPqChain(m: Int, dim: Int, bootstrapBits: Int, nprobe: Int): String = {
    val sub = dim / m
    s"""$centroidsCore, res AS (
       |  SELECT eb.vec_id, eb.label,
       |         CAST((u.i - 1) // $sub AS INT) AS subspace,
       |         CAST((u.i - 1) % $sub AS INT) AS subpos,
       |         round(CAST(eb.embedding[u.i] AS DOUBLE) - c.centroid, 9) AS rv
       |  FROM embeddings eb CROSS JOIN UNNEST(range(1, ${dim + 1})) AS u(i)
       |  JOIN cent c ON c.label = eb.label AND c.pos = u.i - 1
       |  WHERE eb.vec_id >= 5
       |), oc AS (
       |  SELECT vec_id, subspace,
       |         CAST(SUM(CASE WHEN rv > 0 THEN
       |                    (CASE WHEN subpos = 0 THEN 1 WHEN subpos = 1 THEN 2
       |                          WHEN subpos = 2 THEN 4 ELSE 8 END)
       |                  ELSE 0 END) AS INT) AS code
       |  FROM res WHERE subpos < $bootstrapBits GROUP BY vec_id, subspace
       |), books AS (
       |  SELECT r.subspace, o.code, r.subpos,
       |         CAST(SUM(CAST(CAST(r.rv AS VARCHAR) AS DECIMAL(27,20))) AS DOUBLE) / COUNT(r.rv) AS centroid
       |  FROM res r JOIN oc o ON o.vec_id = r.vec_id AND o.subspace = r.subspace
       |  GROUP BY r.subspace, o.code, r.subpos
       |), enc0 AS (
       |  SELECT r.vec_id, r.label, r.subspace, b.code,
       |         SUM(CAST(round((r.rv - b.centroid) * (r.rv - b.centroid), 6) AS DECIMAL(27,6))) AS l2
       |  FROM res r JOIN books b ON r.subspace = b.subspace AND r.subpos = b.subpos
       |  GROUP BY r.vec_id, r.label, r.subspace, b.code
       |), enc AS (
       |  SELECT vec_id, label, subspace, code FROM (
       |    SELECT vec_id, label, subspace, code,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY l2, code) AS rn
       |    FROM enc0) WHERE rn = 1
       |), c2 AS (
       |  SELECT label, list(centroid ORDER BY pos) AS cv FROM cent GROUP BY label
       |), q AS (
       |  SELECT vec_id AS query_id,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvd
       |  FROM embeddings WHERE vec_id < 5
       |), x AS (
       |  SELECT query_id, label, ${cosineExpr("qvd", "cv")} AS sim
       |  FROM q CROSS JOIN c2
       |), pr AS (
       |  SELECT query_id, label FROM (
       |    SELECT query_id, label,
       |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, label) AS rn
       |    FROM x) WHERE rn <= $nprobe
       |), qr AS (
       |  SELECT qe.vec_id AS query_id, p.label,
       |         CAST((u.i - 1) // $sub AS INT) AS subspace,
       |         CAST((u.i - 1) % $sub AS INT) AS subpos,
       |         round(CAST(qe.embedding[u.i] AS DOUBLE) - c.centroid, 9) AS rv
       |  FROM embeddings qe
       |  JOIN pr p ON p.query_id = qe.vec_id
       |  CROSS JOIN UNNEST(range(1, ${dim + 1})) AS u(i)
       |  JOIN cent c ON c.label = p.label AND c.pos = u.i - 1
       |  WHERE qe.vec_id < 5
       |), dt AS (
       |  SELECT qr.query_id, qr.label, qr.subspace, b.code,
       |         SUM(CAST(round((qr.rv - b.centroid) * (qr.rv - b.centroid), 6) AS DECIMAL(27,6))) AS dpart
       |  FROM qr JOIN books b ON qr.subspace = b.subspace AND qr.subpos = b.subpos
       |  GROUP BY qr.query_id, qr.label, qr.subspace, b.code
       |), sc AS (
       |  SELECT dt.query_id, e.vec_id AS cand_id, CAST(SUM(dt.dpart) AS DOUBLE) AS dist
       |  FROM enc e JOIN dt ON e.label = dt.label AND e.subspace = dt.subspace AND e.code = dt.code
       |  GROUP BY dt.query_id, e.vec_id
       |), r2 AS (
       |  SELECT query_id, cand_id, dist,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, cand_id) AS BIGINT) AS rank
       |  FROM sc)""".stripMargin
  }

  // --- synthesized geocode demo input (must match
  // RefDemos.synthAddrCorpus) + the Norm.* mirrors shared by the
  // geocode oracles ---
  private val synthAddrRaw =
    "(CASE WHEN c_custkey % 3 = 0 THEN '106 ' ELSE '' END) || " +
    "(CASE WHEN c_custkey % 4 = 0 THEN '台北市' WHEN c_custkey % 4 = 1 THEN '臺中市' " +
    "WHEN c_custkey % 4 = 2 THEN '高雄市' ELSE '' END) || " +
    "(CASE WHEN c_nationkey % 3 = 0 THEN '大安區' WHEN c_nationkey % 3 = 1 THEN '信義區' ELSE '' END) || " +
    "(CASE WHEN c_custkey % 5 = 0 THEN '關東里' ELSE '' END) || " +
    "(CASE WHEN c_custkey % 7 = 0 THEN repeat('龍', 125) || '路' " +
    "WHEN c_nationkey % 2 = 0 THEN '和平東路' ELSE '中山北路' END) || " +
    "(CASE WHEN c_custkey % 6 = 1 THEN '二段' WHEN c_custkey % 6 = 2 THEN '3段' ELSE '' END) || " +
    "(CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey % 30 + 1 AS VARCHAR) || '巷' ELSE '' END) || " +
    "(CASE WHEN c_custkey % 4 = 0 THEN CAST(c_nationkey % 9 + 1 AS VARCHAR) || '弄' ELSE '' END) || " +
    "CAST(c_custkey % 150 + 1 AS VARCHAR) || " +
    "(CASE WHEN c_custkey % 5 = 1 THEN '-' || CAST(c_nationkey % 4 + 1 AS VARCHAR) ELSE '' END) || " +
    "'號' || " +
    "(CASE WHEN c_custkey % 9 = 0 THEN ' (3樓備註)' ELSE '' END) || " +
    "(CASE WHEN c_custkey % 8 = 1 THEN '及信義路' || CAST(c_custkey % 99 + 1 AS VARCHAR) || '號' " +
    "WHEN c_custkey % 8 = 2 THEN '；轉介單位另記' " +
    "WHEN c_custkey % 8 = 5 THEN '，中山北路' || CAST(c_custkey % 88 + 1 AS VARCHAR) || '號' ELSE '' END)"
  private val synthOrgSql = "CASE WHEN c_custkey % 3 = 1 THEN '仁心診所' ELSE '' END"

  private def stripParens(e: String) = s"regexp_replace($e, '（[^）]*）|\\([^)]*\\)', '', 'g')"
  private def stripPostal(e: String) = s"regexp_replace($e, '^\\s*\\d{3,5}[-\\s]?', '')"
  private def stripSpaces(e: String) = s"regexp_replace($e, '\\s+', '', 'g')"
  private def foldTai(e: String)     = s"regexp_replace($e, '台', '臺', 'g')"
  private def stripCountry(e: String) = s"regexp_replace($e, '臺灣|(?i)RepublicofChina', '', 'g')"
  private def trimToHouseNoSql(e: String) =
    s"CASE WHEN regexp_extract($e, '^([^號]*號)', 1) <> '' " +
    s"THEN regexp_extract($e, '^([^號]*號)', 1) ELSE $e END"
  private val regionPatSql = "^([一-龥]{2,3}[縣市])([一-龥]{1,3}[區鄉鎮市])?"
  private def clampSql(e: String) = {
    val u = s"length(regexp_replace($e, '[^A-Za-z0-9_.!~*''()-]', '', 'g'))"
    s"CASE WHEN $u + 3 * (strlen($e) - $u) <= 512 THEN $e ELSE substr($e, 1, 120) END"
  }
  /** normalize chain shared by the geocode oracles (Norm order:
    * stripParens → stripPostal → stripSpaces → foldTai → stripCountry) */
  private def preSql(e: String) =
    stripCountry(foldTai(stripSpaces(stripPostal(stripParens(e)))))

  /** mirror of RefDemos.geocodeCandidates (expansion ladder, 6 variants) */
  /** Mirror of the full Geocode.expand ladder over the synthesized
    * addresses in RefDemos.geocodeCandidates. Every stage mirrors one
    * Norm helper; the 90-arm emission UNION is generated by the same
    * (base × hyphen × slot) loop the Spark side uses, so ranks align
    * by construction. */
  def geocodeCandidatesSql(): String = {
    val raw = synthAddrRaw
    val orgSql = synthOrgSql
    def removeLi(e: String) =
      s"regexp_replace($e, '[一-龥]{1,4}里([^號]*?(?:路|街|巷|弄|道|大道))', '\\1', 'g')"
    def trimToHouseNo(e: String) =
      s"CASE WHEN regexp_extract($e, '^([^號]*號)', 1) <> '' " +
      s"THEN regexp_extract($e, '^([^號]*號)', 1) ELSE $e END"
    def sectionArabic(e: String) =
      (1 to 10).foldLeft(e) { (acc, n) =>
        val zh = Seq("一","二","三","四","五","六","七","八","九","十")(n - 1)
        s"regexp_replace($acc, '${zh}段', '${n}段', 'g')"
      }
    val regionPat = "^([一-龥]{2,3}[縣市])([一-龥]{1,3}[區鄉鎮市])?"
    def hyphenZhi(e: String)  = s"regexp_replace($e, '(\\d+)-(\\d+)號', '\\1之\\2號', 'g')"
    def hyphenDrop(e: String) = s"regexp_replace($e, '(\\d+)-(\\d+)號', '\\1號', 'g')"
    def dropNong(e: String)   = s"regexp_replace($e, '\\d+(?:-\\d+)?弄', '', 'g')"
    def dropXiang(e: String)  = s"regexp_replace($e, '\\d+(?:-\\d+)?巷', '', 'g')"
    val roPat = "^(.+?(?:大道|道|路|街))(\\d+段)?(?:\\d+(?:-\\d+)?巷)?(?:\\d+(?:-\\d+)?弄)?(\\d+(?:-\\d+)?)號$"
    def roadOnly(secCol: String) =
      s"CASE WHEN regexp_matches($secCol, '$roPat') THEN " +
      s"regexp_extract($secCol, '$roPat', 1) || regexp_extract($secCol, '$roPat', 2) || " +
      s"regexp_extract($secCol, '$roPat', 3) || '號' ELSE '' END"
    def clamp(e: String) = {
      val u = s"length(regexp_replace($e, '[^A-Za-z0-9_.!~*''()-]', '', 'g'))"
      s"CASE WHEN $u + 3 * (strlen($e) - $u) <= 512 THEN $e ELSE substr($e, 1, 120) END"
    }
    def looksLike(e: String) =
      s"regexp_matches($e, '(路|街|巷|弄|道|大道)') AND regexp_matches($e, '號')"

    val pre = stripCountry(foldTai(stripSpaces(stripPostal(stripParens("addr")))))
    // conjunction split requires a preceding 號 (see Geocode.expand's
    // documented deviation — bare 及/和/與 would dismember 和平東路)
    val canon = s"regexp_replace(regexp_replace(" +
      s"${removeLi(removeLi("regexp_extract(pre, '^[^;；]*', 0)"))}, " +
      "'[，,。.]', '、', 'g'), '號[及和與]', '號、', 'g')"

    // --- per-h derived columns + emission, same block NUMBERING as
    // Geocode.expand's 4-base ladder [b0, ord(b0), sec(b0), ord(sec(b0))]
    // (baseIdx*3 + hyphenIdx, perSeg = 12 h-blocks). The demo corpus
    // contains NO 中文數字+街/巷/弄 tokens (lane/alley numbers are
    // synthesized as Arabic digits), so the ordinal blocks (baseIdx 1
    // and 3) are no-ops the Spark side provably skips — the mirror
    // omits them rather than inflating DuckDB's expression tree 2×
    // (the full 180-arm form exhausts its allocator). A corpus change
    // that introduced ordinal tokens would hash-mismatch here, not
    // silently pass. ---
    val baseIdxs = Seq(0, 2) // b0 and sec(b0); ordinal blocks 1/3 no-op
    val hDefs = (for (bi <- baseIdxs; hi <- 0 to 2) yield {
      val b = s"b$bi"
      val h = hi match { case 0 => b; case 1 => hyphenZhi(b); case 2 => hyphenDrop(b) }
      s"$h AS h$bi$hi"
    }).mkString(",\n    ")
    val secDefs = (for (bi <- baseIdxs; hi <- 0 to 2) yield
      s"${sectionArabic(s"h$bi$hi")} AS s$bi$hi").mkString(",\n    ")
    val dDefs = (for (bi <- baseIdxs; hi <- 0 to 2) yield {
      val ij = s"$bi$hi"
      s"${dropNong(s"h$ij")} AS n$ij, ${dropXiang(s"h$ij")} AS x$ij, " +
      s"${dropXiang(dropNong(s"h$ij"))} AS z$ij, ${roadOnly(s"s$ij")} AS ro$ij"
    }).mkString(",\n    ")
    val slotsPerH = 15
    val perSeg = 12 * slotsPerH
    val arms = (for (bi <- baseIdxs; hi <- 0 to 2) yield {
      val ij = s"$bi$hi"; val hIdx = bi * 3 + hi
      val slots: Seq[(String, String)] = Seq(
        (s"h$ij", "TRUE"),
        (s"org || h$ij", "org <> ''"),
        (s"ro$ij", s"ro$ij <> ''"),
        (s"org || ro$ij", s"org <> '' AND ro$ij <> ''"),
        (s"cty || ro$ij", s"ro$ij <> '' AND cty <> ''"),
        (s"org || cty || ro$ij", s"org <> '' AND ro$ij <> '' AND cty <> ''"),
        (s"dst || ro$ij", s"ro$ij <> '' AND dst <> ''"),
        (s"org || dst || ro$ij", s"org <> '' AND ro$ij <> '' AND dst <> ''"),
        (s"cty || dst || ro$ij", s"ro$ij <> '' AND (cty <> '' OR dst <> '')"),
        (s"n$ij", "TRUE"), (s"org || n$ij", "org <> ''"),
        (s"x$ij", "TRUE"), (s"org || x$ij", "org <> ''"),
        (s"z$ij", "TRUE"), (s"org || z$ij", "org <> ''"))
      slots.zipWithIndex.map { case ((e, cond), si) =>
        s"SELECT c_custkey, segi * $perSeg + ${hIdx * slotsPerH + si} AS rnk, $e AS q FROM d WHERE $cond"
      }.mkString("\n  UNION ALL\n  ")
    }).mkString("\n  UNION ALL\n  ")

    s"""WITH s AS (
       |  SELECT c_custkey, $raw AS addr, $orgSql AS org FROM customer
       |), p1 AS (
       |  SELECT c_custkey, org, $pre AS pre FROM s
       |), p2 AS (
       |  SELECT c_custkey, org,
       |    regexp_extract(pre, '$regionPat', 1) AS cty,
       |    regexp_extract(pre, '$regionPat', 2) AS dst,
       |    list_filter(string_split($canon, '、'), seg -> seg <> '') AS sl
       |  FROM p1
       |), seg AS (
       |  SELECT c_custkey, org, cty, dst, i - 1 AS segi, sl[i] AS seg
       |  FROM p2, (VALUES (1), (2), (3), (4)) t(i) WHERE len(sl) >= i
       |), b AS (
       |  SELECT c_custkey, org, cty, dst, segi,
       |    ${trimToHouseNo("(CASE WHEN regexp_matches(seg, '[縣市].*[區鄉鎮市]') " +
             "OR regexp_matches(seg, '[一-龥]{2,3}[縣市]') THEN seg ELSE cty || dst || seg END)")} AS b0
       |  FROM seg
       |), b2 AS (
       |  SELECT *, ${sectionArabic("b0")} AS b2 FROM b
       |), h AS (
       |  SELECT *,
       |    $hDefs
       |  FROM b2
       |), sec AS (
       |  SELECT *,
       |    $secDefs
       |  FROM h
       |), d AS MATERIALIZED (
       |  -- MATERIALIZED: the 90-arm UNION references d; inlining would
       |  -- replicate the whole regex-derivation pipeline into every arm
       |  -- and exhaust DuckDB's allocator on a shared connection
       |  SELECT *,
       |    $dDefs
       |  FROM sec
       |), u AS (
       |  $arms
       |), c0 AS MATERIALIZED (
       |  -- even ranks: canonical 臺 form (taiVariants first element);
       |  -- materialized so the twin branch below reuses the clamped rows
       |  SELECT c_custkey, ${clamp("q")} AS candidate, rnk * 2 AS rnk FROM u
       |), c AS (
       |  SELECT c_custkey, candidate, rnk FROM c0
       |  UNION ALL
       |  -- odd ranks: the all-台 twin, interleaved right after (geocode.js:278-283)
       |  SELECT c_custkey, replace(candidate, '臺', '台') AS candidate, rnk + 1 AS rnk
       |  FROM c0 WHERE contains(candidate, '臺')
       |)
       |SELECT c_custkey, candidate, CAST(MIN(rnk) AS INT) AS rank
       |FROM c WHERE ${looksLike("candidate")}
       |GROUP BY c_custkey, candidate ORDER BY c_custkey, rank""".stripMargin
  }

  /** Mirror of RefDemos.geocodeProviderChain (A15d — geocode.js:431,492
    * primary-then-backup ladder) over the SAME candidate universe as
    * [[geocodeCandidatesSql]], reused verbatim as a subquery so the two
    * mirrors can never drift. The chain's algebra: distinct candidates;
    * the primary (mod 10, keep 6) answers iff md5-60(q) % 10 < 6; the
    * backup (mod 7, keep 4) is consulted ONLY on primary miss —
    * first-hit-wins, so a candidate both could answer carries the
    * primary's coordinates and tag. Coordinates are pure integer
    * algebra on the same 60-bit hash (base + (h % k)/1000), all-DOUBLE
    * arithmetic on identical inputs — both engines agree bitwise (no
    * transcendentals). */
  def geocodeProviderChainSql(): String = {
    val lat = (base: String) =>
      s"CAST($base AS DOUBLE) + CAST(h % 4000 AS DOUBLE) / CAST(1000.0 AS DOUBLE)"
    val lng = (base: String) =>
      s"CAST($base AS DOUBLE) + CAST(h % 6000 AS DOUBLE) / CAST(1000.0 AS DOUBLE)"
    s"""WITH cand AS MATERIALIZED (
       |  SELECT DISTINCT candidate FROM (${geocodeCandidatesSql()})
       |), hh AS (
       |  SELECT candidate, ${md560("candidate")} AS h FROM cand
       |)
       |SELECT candidate,
       |  CASE WHEN h % 10 < 6 THEN ${lat("21.0")} ELSE ${lat("20.0")} END AS lat,
       |  CASE WHEN h % 10 < 6 THEN ${lng("119.0")} ELSE ${lng("118.0")} END AS lng,
       |  CASE WHEN h % 10 < 6 THEN 'opencage-sim' ELSE 'nominatim-sim' END AS provider
       |FROM hh
       |WHERE h % 10 < 6 OR h % 7 < 4
       |ORDER BY candidate""".stripMargin
  }

  /** Mirror of Geocode.streetCentroidCandidates over the same
    * synthesized corpus (buildStreetCentroidCandidates,
    * geocode.js:398-425): last road token in both 臺/台 spellings ×
    * region/org combos, plus the road-only base's own pair, clamp,
    * dedup to first emission index, longest-first try order. */
  def streetCentroidSql(): String = {
    val tokenPat = "[^\\d、，；;（）()\\s]+?(?:大道|道|路|街)"
    // emission order matches the Scala ladder's entries list exactly
    def comboArms(r: String, extra: String, offset: Int): Seq[String] = Seq(
      (s"cty || dst || r0", s"(cty <> '' OR dst <> '')"),
      (s"cty || r0", s"cty <> ''"),
      (s"dst || r0", s"dst <> ''"),
      (s"r0", "TRUE"),
      (s"org || cty || dst || r0", s"org <> '' AND (cty <> '' OR dst <> '')"),
      (s"org || cty || r0", s"org <> '' AND cty <> ''"),
      (s"org || dst || r0", s"org <> '' AND dst <> ''"),
      (s"org || r0", s"org <> ''")
    ).zipWithIndex.map { case ((e, cond), si) =>
      val q = e.replace("r0", r)
      val c = if (extra == "TRUE") cond else s"$extra AND ($cond)"
      s"SELECT c_custkey, ${offset + si} AS i, $q AS q FROM r WHERE $c"
    }
    val arms = (
      comboArms("road", "TRUE", 0) ++
      comboArms("replace(road, '臺', '台')", "contains(road, '臺')", 8) ++
      Seq(
        s"SELECT c_custkey, 16 AS i, base AS q FROM r " +
          "WHERE regexp_matches(base, '大道|道|路|街')",
        s"SELECT c_custkey, 17 AS i, replace(base, '臺', '台') AS q FROM r " +
          "WHERE regexp_matches(base, '大道|道|路|街') AND contains(base, '臺')")
    ).mkString("\n  UNION ALL\n  ")

    s"""WITH s AS (
       |  SELECT c_custkey, $synthAddrRaw AS addr, $synthOrgSql AS org FROM customer
       |), p1 AS (
       |  SELECT c_custkey, org, ${preSql("addr")} AS pre FROM s
       |), p2 AS (
       |  SELECT c_custkey, org, pre,
       |    regexp_replace(${trimToHouseNoSql("pre")}, '\\d+(?:-\\d+)?號.*$$', '') AS nohouse
       |  FROM p1
       |), r AS MATERIALIZED (
       |  SELECT c_custkey, org,
       |    regexp_extract(pre, '$regionPatSql', 1) AS cty,
       |    regexp_extract(pre, '$regionPatSql', 2) AS dst,
       |    base, toks[-1] AS road
       |  FROM (
       |    SELECT *, regexp_extract_all(base, '($tokenPat)', 1) AS toks
       |    FROM (SELECT *, CASE WHEN nohouse <> '' THEN nohouse ELSE pre END AS base FROM p2)
       |  ) WHERE len(toks) > 0
       |), u AS (
       |  $arms
       |), c AS (
       |  SELECT c_custkey, ${clampSql("q")} AS candidate, MIN(i) AS tie
       |  FROM u GROUP BY c_custkey, candidate
       |)
       |SELECT c_custkey, candidate,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey
       |       ORDER BY length(candidate) DESC, tie) AS INT) AS try_order
       |FROM c ORDER BY c_custkey, try_order""".stripMargin
  }

  /** Mirror of RefDemos.geocodeValidate: county containment with 臺/台
    * tolerance + squared-degree centroid distance, best hit via
    * row_number over (bad, d2, seq) — identical ordering to the Spark
    * side's min(struct). Distance arithmetic uses the same expression
    * shape so doubles agree bitwise. */
  def geocodeValidateSql(): String = {
    val centroids = graft.operators.Geocode.countyCentroids
      .map { case (c, la, ln) => s"('$c', $la, $ln)" }.mkString(",\n    ")
    val cty = "CASE WHEN c_custkey % 5 = 0 THEN '台北市' WHEN c_custkey % 5 = 1 THEN '臺中市' " +
      "WHEN c_custkey % 5 = 2 THEN '高雄市' WHEN c_custkey % 5 = 3 THEN '新竹市' ELSE '' END"
    val alt = "CASE WHEN c_custkey % 6 = 0 THEN '台南市安平區' " +
      "WHEN c_custkey % 5 = 0 THEN '台北市信義區' WHEN c_custkey % 5 = 1 THEN '台中市北區' " +
      "WHEN c_custkey % 5 = 2 THEN '高雄市左營區' WHEN c_custkey % 5 = 3 THEN '新竹市東區' ELSE '' END"
    // full normalize chain mirror (no-ops on this synth data, kept for fidelity)
    val norm = "regexp_replace(regexp_replace(regexp_replace(regexp_replace(addr, " +
      "'（[^）]*）|\\([^)]*\\)', '', 'g'), '^\\s*\\d{3,5}[-\\s]?', ''), " +
      "'\\s+', '', 'g'), '台', '臺', 'g')"
    val contains = (n: String) => s"contains(comp_city || '|' || formatted, $n)"
    s"""WITH cent(cc_county, cc_lat, cc_lng) AS (VALUES
       |    $centroids
       |), r AS (
       |  SELECT c_custkey,
       |    $cty || '大安區中山北路' || CAST(c_custkey % 150 + 1 AS VARCHAR) || '號' AS addr,
       |    CASE WHEN c_custkey % 6 = 0 THEN '臺南市' ELSE '' END AS county_field
       |  FROM customer
       |), e AS (
       |  SELECT c_custkey,
       |    CASE WHEN trim(county_field) <> '' THEN trim(county_field)
       |         ELSE regexp_extract($norm, '^([一-龥]{2,3}[縣市])([一-龥]{1,3}[區鄉鎮市])?', 1)
       |    END AS expected_county
       |  FROM r
       |), ec AS (
       |  SELECT e.c_custkey, e.expected_county, cent.cc_lat, cent.cc_lng
       |  FROM e LEFT JOIN cent ON e.expected_county = cent.cc_county
       |), base AS (
       |  SELECT c_custkey AS hit_id,
       |    22.0 + CAST(c_custkey % 70 AS DOUBLE) * 0.1 AS lat0,
       |    118.0 + CAST((c_custkey * 7) % 50 AS DOUBLE) * 0.1 AS lng0,
       |    $cty AS cty0, $alt AS alt
       |  FROM customer
       |), h AS (
       |  SELECT hit_id, 0 AS seq, cty0 || '大安區中山北路' AS formatted, cty0 AS comp_city,
       |         lat0 AS lat, lng0 AS lng FROM base
       |  UNION ALL
       |  SELECT hit_id, 1, '基隆市中正區', '基隆市', lat0 + 0.3, lng0 - 0.2 FROM base
       |  UNION ALL
       |  SELECT hit_id, 2, alt, '', lat0 - 0.4, lng0 + 0.25 FROM base
       |), j AS (
       |  SELECT ec.c_custkey, ec.expected_county,
       |    NOT (expected_county = '' OR ${contains("expected_county")}
       |         OR ${contains("replace(expected_county, '臺', '台')")}
       |         OR ${contains("replace(expected_county, '台', '臺')")}) AS bad,
       |    CASE WHEN cc_lat IS NOT NULL
       |         THEN (lat - cc_lat) * (lat - cc_lat) + (lng - cc_lng) * (lng - cc_lng)
       |         ELSE 999999.0 END AS d2,
       |    seq, lat, lng
       |  FROM h JOIN ec ON h.hit_id = ec.c_custkey
       |), w AS (
       |  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY bad, d2, seq) AS rn FROM j
       |)
       |SELECT c_custkey, expected_county, NOT bad AS county_ok, d2 AS dist2,
       |       CAST(seq AS INT) AS best_seq, lat, lng
       |FROM w WHERE rn = 1 ORDER BY c_custkey""".stripMargin
  }

  /** Mirror of Agg.interpolatedPercentiles: rank-window order
    * statistics + the explicit lo + (hi - lo) * frac interpolation,
    * same IEEE op order as the Spark side. Returns a SELECT producing
    * (key, <name...>) with UNROUNDED doubles. */
  def interpolatedPercentilesSql(src: String, key: String, value: String,
                                 qs: Seq[(String, Double)]): String = {
    // CAST(q AS DOUBLE): a bare 0.5 literal is DECIMAL in DuckDB and
    // drags the whole interpolation into decimal arithmetic, diverging
    // from the Spark side's double math
    val parts = qs.map { case (nm, q) =>
      val pos = s"((n - 1) * CAST($q AS DOUBLE))"
      val li = s"CAST(FLOOR($pos) AS BIGINT)"
      s"MAX(CASE WHEN rn = $li + 1 THEN v END) AS _lo_$nm,\n" +
      s"    MAX(CASE WHEN rn = LEAST($li + 2, n) THEN v END) AS _hi_$nm,\n" +
      s"    MAX(CASE WHEN rn = 1 THEN $pos - FLOOR($pos) END) AS _fr_$nm"
    }.mkString(",\n    ")
    val outs = qs.map { case (nm, _) =>
      s"_lo_$nm + (_hi_$nm - _lo_$nm) * _fr_$nm AS $nm" }.mkString(", ")
    s"""SELECT $key, $outs FROM (
       |  SELECT $key,
       |    $parts
       |  FROM (
       |    SELECT $key, CAST($value AS DOUBLE) AS v,
       |      row_number() OVER (PARTITION BY $key ORDER BY CAST($value AS DOUBLE)) AS rn,
       |      COUNT(*) OVER (PARTITION BY $key) AS n
       |    FROM $src
       |  ) GROUP BY $key
       |)""".stripMargin
  }

  /** mirror of TextDemos.contaminationCheck: distinct 3-gram md5-60
    * shingle hashes per doc, left join the benchmark's distinct hash
    * set (doc_id % 20 = 0), overlap ratio + flag. */
  def contaminationCheckSql(threshold: Double = 0.2): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM t
       |), ex AS (
       |  SELECT DISTINCT doc_id, ${md560("tok")} AS h
       |  FROM (SELECT doc_id, unnest(sh) AS tok FROM s WHERE len(sh) > 0)
       |), bm AS (
       |  SELECT DISTINCT h FROM ex WHERE doc_id % 20 = 0
       |), j AS (
       |  SELECT ex.doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |    CAST(SUM(CASE WHEN bm.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
       |  FROM ex LEFT JOIN bm ON ex.h = bm.h GROUP BY ex.doc_id
       |)
       |SELECT doc_id, n_shingles, n_contaminated,
       |  CASE WHEN n_shingles > 0 THEN CAST(n_contaminated AS DOUBLE) / n_shingles ELSE 0.0 END AS contamination,
       |  (CASE WHEN n_shingles > 0 THEN CAST(n_contaminated AS DOUBLE) / n_shingles ELSE 0.0 END) >= $threshold AS flagged
       |FROM j ORDER BY doc_id""".stripMargin

  /** mirror of TextDemos.corpusOverlapKmv: per-corpus KMV sketch =
    * `SELECT DISTINCT h ORDER BY h LIMIT k` (the sketch is a pure
    * order statistic, so SQL reproduces it exactly); estimator
    * arithmetic mirrors Dedup.corpusOverlapKmv shape-for-shape —
    * (k-1)*span as one folded product, then one divide — so the IEEE
    * doubles match bit-for-bit. md5-60 hash, span 2^60, lo 0. */
  def corpusOverlapKmvSql(k: Int = 1024): String = {
    // CASE WHEN size < k THEN exact ELSE (k-1)*2^60 / (max - 0.0)
    def est(sizeCol: String, maxCol: String) =
      s"""CASE WHEN $sizeCol < $k THEN CAST($sizeCol AS DOUBLE)
         |       ELSE ${k - 1}.0 * 1152921504606846976.0 / (CAST($maxCol AS DOUBLE) - 0.0) END""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM t
       |), ex AS (
       |  SELECT doc_id, ${md560("tok")} AS h
       |  FROM (SELECT doc_id, unnest(sh) AS tok FROM s WHERE len(sh) > 0)
       |), ka AS (SELECT DISTINCT h FROM ex WHERE doc_id % 20 <> 0 ORDER BY h LIMIT $k
       |), kb AS (SELECT DISTINCT h FROM ex WHERE doc_id % 20 = 0 ORDER BY h LIMIT $k
       |), u AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT $k
       |), z AS (SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ka) AS ka_size,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM kb) AS kb_size,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS u_size,
       |  (SELECT MAX(h) FROM ka) AS ka_max,
       |  (SELECT MAX(h) FROM kb) AS kb_max,
       |  (SELECT MAX(h) FROM u) AS u_max,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM u
       |     WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)) AS n_match
       |), e AS (SELECT *,
       |  CASE WHEN u_size > 0 THEN CAST(n_match AS DOUBLE) / u_size ELSE 0.0 END AS est_jaccard,
       |  ${est("ka_size", "ka_max")} AS est_distinct_a,
       |  ${est("kb_size", "kb_max")} AS est_distinct_b,
       |  ${est("u_size", "u_max")} AS est_distinct_union
       |  FROM z)
       |SELECT CAST($k AS BIGINT) AS k, ka_size, kb_size,
       |  est_distinct_a, est_distinct_b, est_distinct_union, n_match, est_jaccard,
       |  est_jaccard * est_distinct_union AS est_intersection
       |FROM e""".stripMargin
  }

  /** mirror of TextDemos.c4FiltersDemo: the same page synthesis
    * (7-word lines, punctuation cycle, javascript/lorem/brace
    * injections), then the same line and page rules over the re-split
    * page. */
  def c4FiltersSql(minWordsPerLine: Int = 5, minLines: Int = 3): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents
       |), l AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) >= 1 THEN
       |      list_transform(range(0, CAST(ceil(len(toks) / 7.0) AS BIGINT)), i ->
       |        array_to_string(toks[(i*7+1):(i*7+7)], ' ')
       |        || CASE WHEN i = 0 AND doc_id % 13 = 0 THEN ' javascript' ELSE '' END
       |        || CASE WHEN i % 3 = 0 THEN '.' WHEN i % 3 = 1 THEN '!' ELSE '' END)
       |    ELSE CAST([] AS VARCHAR[]) END AS lines
       |  FROM t
       |), p AS (
       |  SELECT doc_id,
       |    array_to_string(lines, chr(10))
       |    || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
       |    || CASE WHEN doc_id % 19 = 0 THEN chr(10) || '{ "config": 1 } end.' ELSE '' END AS page
       |  FROM l
       |), k AS (
       |  SELECT doc_id, page,
       |    string_split(page, chr(10)) AS plines,
       |    list_filter(string_split(page, chr(10)), ln ->
       |      regexp_matches(ln, '[.!?"]${"$"}')
       |      AND len(list_filter(string_split(ln, ' '), w -> w <> '')) >= $minWordsPerLine
       |      AND NOT contains(lower(ln), 'javascript')) AS keptl
       |  FROM p
       |)
       |SELECT doc_id,
       |  CAST(len(plines) AS BIGINT) AS n_lines,
       |  CAST(len(keptl) AS BIGINT) AS n_lines_kept,
       |  (len(keptl) >= $minLines
       |   AND NOT contains(lower(page), 'lorem ipsum')
       |   AND NOT contains(page, '{')) AS kept,
       |  CASE WHEN len(keptl) >= $minLines
       |        AND NOT contains(lower(page), 'lorem ipsum')
       |        AND NOT contains(page, '{')
       |       THEN array_to_string(keptl, chr(10)) ELSE '' END AS clean_text
       |FROM k ORDER BY doc_id""".stripMargin

  /** D9's batch-aggregate oracle: the c4FiltersSql chain rolled up to
    * per-(source, kept) counters — what the streaming gate's final
    * state must equal. */
  def c4GateAggSql(minWordsPerLine: Int = 5, minLines: Int = 3): String =
    // plain concatenation: an outer stripMargin would eat the embedded
    // SQL's leading `||` concat operators (margin char collision)
    "WITH base AS (\n" + c4FiltersSql(minWordsPerLine, minLines) + "\n)\n" +
      """SELECT d.source, b.kept,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(b.n_lines_kept) AS BIGINT) AS kept_lines
        |FROM base b JOIN documents d USING (doc_id)
        |GROUP BY d.source, b.kept
        |ORDER BY d.source, b.kept""".stripMargin

  /** D10's batch oracle: the corpus KMV sketch is a pure order
    * statistic, so the streamed sketch must equal
    * `SELECT DISTINCT h ORDER BY h LIMIT k`, posexploded. */
  def streamKmvSketchSql(k: Int = 1024): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM t
       |), ex AS (
       |  SELECT ${md560("tok")} AS h
       |  FROM (SELECT unnest(sh) AS tok FROM s WHERE len(sh) > 0)
       |), kk AS (SELECT DISTINCT h FROM ex ORDER BY h LIMIT $k)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY h) - 1 AS BIGINT) AS pos, h
       |FROM kk ORDER BY pos""".stripMargin

  /** mirror of TextDemos.crawlIngestE2e: the WARC round trip is
    * identity on (doc_id, text), so the funnel recomputes from the
    * table — language gate (the lang_id CTE), exact dedup (min id per
    * md5), decontamination (the C21 chain, benchmark = the %20 slice
    * of the full crawl), one count row per stage. */
  def crawlIngestE2eSql(flagThreshold: Double = 0.2): String = {
    val (langCtes, langCase) = langIdCtes("t", carry = Seq("text"))
    s"""WITH t AS (
       |  SELECT doc_id, text FROM documents
       |), $langCtes,
       |en AS (
       |  SELECT doc_id, text FROM g
       |  WHERE ($langCase) = 'en'
       |), ded AS (
       |  SELECT MIN(doc_id) AS doc_id FROM en GROUP BY md5(text)
       |), tt AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM t
       |), ss AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM tt
       |), ex AS (
       |  SELECT DISTINCT doc_id, ${md560("tok")} AS h
       |  FROM (SELECT doc_id, unnest(sh) AS tok FROM ss WHERE len(sh) > 0)
       |), bm AS (
       |  SELECT DISTINCT h FROM ex WHERE doc_id % 20 = 0
       |), cont AS (
       |  SELECT ex.doc_id,
       |    CAST(SUM(CASE WHEN bm.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS c
       |  FROM ex LEFT JOIN bm ON ex.h = bm.h GROUP BY ex.doc_id
       |), clean AS (
       |  SELECT d.doc_id FROM ded d LEFT JOIN cont ON d.doc_id = cont.doc_id
       |  WHERE COALESCE(cont.c, 0.0) < $flagThreshold
       |)
       |SELECT * FROM (
       |  SELECT 'f0_ingested' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM t
       |  UNION ALL SELECT 'f1_lang_en', CAST(COUNT(*) AS BIGINT) FROM en
       |  UNION ALL SELECT 'f2_deduped', CAST(COUNT(*) AS BIGINT) FROM ded
       |  UNION ALL SELECT 'f3_decontaminated', CAST(COUNT(*) AS BIGINT) FROM clean
       |) ORDER BY stage""".stripMargin
  }

  /** mirror of TextDemos.centralityGate: the full pagerank chain as a
    * nested CTE (plain concatenation — the c4GateAggSql margin
    * lesson), joined to sources, gated by the shared bit-exact
    * interpolated per-source median. */
  def centralityGateSql(q: Double = 0.5): String =
    "WITH pr AS (\n" + pagerankCentralitySql() + "\n), " +
      s"""j AS (
         |  SELECT d.doc_id, d.source, CAST(pr.rank_e15 AS DOUBLE) AS centrality
         |  FROM documents d JOIN pr ON pr.id = d.doc_id
         |), thr AS (
         |${interpolatedPercentilesSql("j", "source", "centrality", Seq("threshold" -> q))}
         |)
         |SELECT doc_id, source, centrality, threshold
         |FROM j JOIN thr USING (source)
         |WHERE centrality >= threshold
         |ORDER BY doc_id""".stripMargin

  /** mirror of TextDemos.sequencePack (capacity 2048, shard = doc_id % 4) */
  def sequencePackSql(capacity: Int = 2048): String =
    s"""WITH d AS (
       |  SELECT doc_id, doc_id % 4 AS shard,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), w AS (
       |  SELECT shard, doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS e
       |  FROM d
       |)
       |SELECT shard, doc_id, n_tokens, e - n_tokens AS start_off,
       |  CAST((e - n_tokens) // $capacity AS BIGINT) AS first_chunk,
       |  CASE WHEN n_tokens > 0 THEN CAST((e - 1) // $capacity AS BIGINT)
       |       ELSE CAST((e - n_tokens) // $capacity AS BIGINT) END AS last_chunk,
       |  CASE WHEN n_tokens > 0
       |       THEN CAST((e - 1) // $capacity - (e - n_tokens) // $capacity + 1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS n_chunks
       |FROM w ORDER BY shard, doc_id""".stripMargin

  /** mirror of TextDemos.embedNearDup (8 planes, threshold 0.2) */
  def embedNearDupSql(nPlanes: Int = 8, dim: Int = 64, threshold: Double = 0.2): String = {
    val planes = Vec.hyperplanes(nPlanes, dim)
    s"""WITH b AS (
       |  SELECT vec_id, embedding, ${bucketExpr("embedding", planes)} AS bucket FROM embeddings
       |), p AS (
       |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
       |         ${cosineExpr("a.embedding", "b2.embedding")} AS sim
       |  FROM b a JOIN b b2 USING (bucket)
       |  WHERE a.vec_id < b2.vec_id
       |)
       |SELECT id_a, id_b, round(sim, 6) AS sim
       |FROM p WHERE sim > $threshold ORDER BY id_a, id_b""".stripMargin
  }

  private val wsToks = "len(list_filter(string_split(text, ' '), x -> x <> ''))"

  /** mirror of TextDemos.unimaxMixDemo (Sampling.unimaxMix): same
    * ascending-(cap, lang) water-fill closed form — the capped flag's
    * product comparison runs in HUGEINT against Spark's DECIMAL(38,0)
    * (both exact), θ is the identical single IEEE division, and
    * alloc/epochs/weight derive from the ROUNDED alloc on both sides. */
  def unimaxSql(maxEpochs: Int = 2): String =
    s"""WITH tok AS (
       |  SELECT lang, CAST(SUM($wsToks) AS BIGINT) AS lang_tokens
       |  FROM documents GROUP BY lang
       |), b AS (
       |  SELECT (3 * SUM(lang_tokens)) // 2 AS budget FROM tok
       |), r AS (
       |  SELECT lang, lang_tokens,
       |         CAST(lang_tokens AS HUGEINT) * $maxEpochs AS cap,
       |         ROW_NUMBER() OVER (ORDER BY lang_tokens * $maxEpochs, lang) AS i,
       |         SUM(CAST(lang_tokens AS HUGEINT) * $maxEpochs)
       |           OVER (ORDER BY lang_tokens * $maxEpochs, lang
       |                 ROWS UNBOUNDED PRECEDING) AS cum,
       |         COUNT(*) OVER () AS n
       |  FROM tok
       |), c AS (
       |  SELECT *, cap * (n - i + 1) <= (SELECT budget FROM b) - (cum - cap) AS capped
       |  FROM r
       |), g AS (
       |  SELECT *, SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS kk,
       |            COALESCE(SUM(CASE WHEN capped THEN cap END) OVER (),
       |                     CAST(0 AS HUGEINT)) AS cumcap
       |  FROM c
       |), a AS (
       |  SELECT lang, lang_tokens, cap, capped,
       |         ROUND(CASE WHEN capped THEN CAST(cap AS DOUBLE)
       |               ELSE CAST((SELECT budget FROM b) - cumcap AS DOUBLE)
       |                    / CAST(n - kk AS DOUBLE) END, 6) AS alloc,
       |         CAST(CASE WHEN capped THEN cap
       |              ELSE ((SELECT budget FROM b) - cumcap) // (n - kk)
       |              END AS BIGINT) AS alloc_exact
       |  FROM g
       |)
       |SELECT lang, lang_tokens, CAST(cap AS BIGINT) AS cap, capped, alloc,
       |       alloc_exact,
       |       ROUND(alloc / CAST(lang_tokens AS DOUBLE), 6) AS epochs,
       |       ROUND(alloc / CAST((SELECT budget FROM b) AS DOUBLE), 6) AS weight
       |FROM a ORDER BY lang""".stripMargin

  /** mirror of TextDemos.unimaxApplyDemo: the C102 closed form as a
    * nested CTE, then the per-language hash-race cumsum cut at the
    * exact integer `alloc_exact` budget. */
  def unimaxApplySql(seed: Long = 5, maxEpochs: Int = 2): String = {
    val allocCore = unimaxSql(maxEpochs)
      .replaceAll("(?s)\\s*ORDER BY lang\\s*$", "")
    s"""WITH alloc AS (
       |$allocCore
       |), d AS (
       |  SELECT lang, doc_id, CAST($wsToks AS BIGINT) AS toks,
       |         ${md560(s"(CAST(doc_id AS VARCHAR) || '#$seed')")} AS pri
       |  FROM documents
       |), c AS (
       |  SELECT lang, doc_id, toks,
       |         SUM(toks) OVER (PARTITION BY lang ORDER BY pri, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d
       |)
       |SELECT c.lang, c.doc_id, c.toks, CAST(c.cum AS BIGINT) AS cum_tokens
       |FROM c JOIN alloc a USING (lang)
       |WHERE c.cum <= a.alloc_exact
       |ORDER BY lang, cum_tokens""".stripMargin
  }

  /** mirror of TextDemos.epochPlanDemo: the C102 closed form nested as
    * a CTE, the same per-language hash-race cumsum, and the exact
    * Long div/mod split of alloc_exact into full passes + fractional
    * prefix. */
  def epochPlanSql(seed: Long = 5, maxEpochs: Int = 2): String = {
    val allocCore = unimaxSql(maxEpochs)
      .replaceAll("(?s)\\s*ORDER BY lang\\s*$", "")
    s"""WITH alloc AS (
       |$allocCore
       |), d AS (
       |  SELECT lang, doc_id, CAST($wsToks AS BIGINT) AS toks,
       |         ${md560(s"(CAST(doc_id AS VARCHAR) || '#$seed')")} AS pri
       |  FROM documents
       |), c AS (
       |  SELECT lang, doc_id, toks,
       |         SUM(toks) OVER (PARTITION BY lang ORDER BY pri, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d
       |)
       |SELECT c.lang, c.doc_id, c.toks, CAST(c.cum AS BIGINT) AS cum_tokens,
       |       CAST(a.alloc_exact // GREATEST(a.lang_tokens, 1)
       |            + CASE WHEN c.cum <= a.alloc_exact % GREATEST(a.lang_tokens, 1)
       |                   THEN 1 ELSE 0 END AS BIGINT) AS n_reps
       |FROM c JOIN alloc a USING (lang)
       |ORDER BY lang, cum_tokens""".stripMargin
  }

  /** mirror of TextDemos.splitLeakageDemo: the C20 bucket assignment,
    * positional k-gram hashes, and the straddles-the-boundary leak
    * predicate. */
  def splitLeakageSql(k: Int = 8): String = {
    val gram = (0 until k).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80 THEN 'train'
       |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |), w AS (
       |  SELECT doc_id, split,
       |    unnest(list_transform(range(1, len(toks) - $k + 2),
       |      i -> ${md560(s"($gram)")})) AS h
       |  FROM t WHERE len(toks) >= $k
       |), leak AS (
       |  SELECT h FROM w GROUP BY h
       |  HAVING COUNT(DISTINCT CASE WHEN split = 'train' THEN doc_id END) >= 1
       |     AND COUNT(DISTINCT CASE WHEN split = 'test' THEN doc_id END) >= 1
       |)
       |SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_leaked_windows,
       |       CAST(COUNT(DISTINCT w.h) AS BIGINT) AS n_leaked_hashes
       |FROM w JOIN leak USING (h)
       |WHERE w.split = 'test'
       |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin
  }

  /** mirror of TextDemos.ngramNoveltyDemo: the splitLeakage window
    * CTE reshaped — odd ids are candidates, the even-id corpus reduces
    * to its distinct window-hash set, candidates LEFT JOIN it and the
    * per-doc novel-window fraction rounds to 6. */
  def ngramNoveltySql(k: Int = 8): String = {
    val gram = (0 until k).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % 2 = 1 AS is_cand,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |), w AS (
       |  SELECT doc_id, is_cand,
       |    unnest(list_transform(range(1, len(toks) - $k + 2),
       |      i -> ${md560(s"($gram)")})) AS h
       |  FROM t WHERE len(toks) >= $k
       |), seen AS (
       |  SELECT DISTINCT h FROM w WHERE NOT is_cand
       |)
       |SELECT w.doc_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_windows,
       |       CAST(SUM(CASE WHEN s.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |       round(CAST(SUM(CASE WHEN s.h IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |             / COUNT(*), 6) AS novelty
       |FROM w LEFT JOIN seen s ON w.h = s.h
       |WHERE w.is_cand
       |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin
  }

  /** mirror of StreamParity.streamNoveltyAdmitParity: the C122 window
    * CTE with an explicit batch column ((doc_id // 2) % nBatches for
    * odd ids), then the admission fold UNROLLED — round b's per-doc
    * novelty joins seen-set s_b, docs at novelty ≥ tau contribute
    * their window hashes to s_{b+1} (UNION = set semantics, matching
    * the sink's disjoint-union archive). Any divergence in the
    * incremental bookkeeping shows up as a changed later-round
    * novelty. */
  def streamNoveltyAdmitSql(k: Int = 8, nBatches: Int = 3,
                            tau: Double = 0.5): String = {
    val gram = (0 until k).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    val rounds = (0 until nBatches).map { b =>
      val seen = if (b == 0) "ref" else s"s$b"
      val verdict =
        s"""v$b AS (
           |  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
           |    CAST(SUM(CASE WHEN s.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           |    round(CAST(SUM(CASE WHEN s.h IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           |          / COUNT(*), 6) AS novelty
           |  FROM w LEFT JOIN $seen s ON w.h = s.h
           |  WHERE w.is_cand AND w.b = $b
           |  GROUP BY w.doc_id
           |)""".stripMargin
      val nextSeen =
        if (b == nBatches - 1) ""
        else s""", s${b + 1} AS (
                |  SELECT h FROM $seen
                |  UNION
                |  SELECT w.h FROM w JOIN v$b USING (doc_id)
                |  WHERE v$b.novelty >= $tau
                |)""".stripMargin
      verdict + nextSeen
    }.mkString(", ")
    val out = (0 until nBatches).map { b =>
      s"""SELECT doc_id, CAST($b AS BIGINT) AS batch_id, n_windows, n_novel,
         |       novelty, novelty >= $tau AS admitted FROM v$b""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % 2 = 1 AS is_cand,
       |    CAST((doc_id // 2) % $nBatches AS BIGINT) AS b,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |), w AS (
       |  SELECT doc_id, is_cand, b,
       |    unnest(list_transform(range(1, len(toks) - $k + 2),
       |      i -> ${md560(s"($gram)")})) AS h
       |  FROM t WHERE len(toks) >= $k
       |), ref AS (
       |  SELECT DISTINCT h FROM w WHERE NOT is_cand
       |), $rounds
       |$out
       |ORDER BY doc_id""".stripMargin
  }

  /** mirror of TextDemos.prefPairPrepDemo: consecutive-doc pairing,
    * the C9 quality-score formula inline per side, orientation repair
    * via CASE on the score comparison, the three row checks, then the
    * prompt-dedup window (row-ok pairs rank first, lowest pair_id
    * wins). Same planted violations (%41 identical B, %37 shared
    * prompt). */
  def prefPairPrepSql(minMargin: Double = 0.05,
                      maxLenRatio: Double = 3.0): String = {
    def qscore(tok: String, txt: String) =
      s"""0.4 * least(CAST(len($tok) AS DOUBLE) / 100.0, 1.0)
         |      + 0.3 * (CASE WHEN len($tok) > 0 THEN CAST(len(list_filter($tok, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS DOUBLE) / CAST(len($tok) AS DOUBLE) ELSE 0.0 END)
         |      + 0.3 * (CASE WHEN length($txt) > 0 THEN CAST(len(regexp_extract_all($txt, '[A-Za-z]')) AS DOUBLE) / CAST(length($txt) AS DOUBLE) ELSE 0.0 END)""".stripMargin
    s"""WITH a AS (
       |  SELECT CAST(doc_id // 2 AS BIGINT) AS pair_id, text AS resp_a
       |  FROM documents WHERE doc_id % 2 = 0
       |), b AS (
       |  SELECT CAST((doc_id - 1) // 2 AS BIGINT) AS pair_id, text AS resp_b
       |  FROM documents WHERE doc_id % 2 = 1
       |), p0 AS (
       |  SELECT a.pair_id, resp_a,
       |    CASE WHEN a.pair_id % 41 = 0 THEN resp_a ELSE resp_b END AS resp_b
       |  FROM a JOIN b USING (pair_id)
       |), p1 AS (
       |  SELECT pair_id, resp_a, resp_b,
       |    CASE WHEN pair_id % 37 = 0 THEN 'PLANTED duplicate prompt'
       |         ELSE array_to_string(list_slice(list_filter(string_split(resp_a, ' '), x -> x <> ''), 1, 12), ' ') END AS prompt,
       |    list_filter(string_split(resp_a, ' '), x -> x <> '') AS atoks,
       |    list_filter(string_split(resp_b, ' '), x -> x <> '') AS btoks
       |  FROM p0
       |), p2 AS (
       |  SELECT pair_id, prompt, resp_a, resp_b,
       |    ${qscore("atoks", "resp_a")} AS score_a,
       |    ${qscore("btoks", "resp_b")} AS score_b
       |  FROM p1
       |), s AS (
       |  SELECT pair_id, prompt,
       |    score_b > score_a AS swapped,
       |    CASE WHEN score_b > score_a THEN resp_b ELSE resp_a END AS chosen,
       |    CASE WHEN score_b > score_a THEN resp_a ELSE resp_b END AS rejected,
       |    CASE WHEN score_b > score_a THEN score_b - score_a
       |         ELSE score_a - score_b END AS margin
       |  FROM p2
       |), m AS (
       |  SELECT pair_id, prompt, swapped, margin,
       |    greatest(CAST(len(list_filter(string_split(chosen, ' '), x -> x <> '')) AS DOUBLE), 1.0) AS clen,
       |    greatest(CAST(len(list_filter(string_split(rejected, ' '), x -> x <> '')) AS DOUBLE), 1.0) AS rlen,
       |    chosen <> rejected AS ok_distinct
       |  FROM s
       |), f AS (
       |  SELECT pair_id, prompt, swapped, margin, ok_distinct,
       |    margin >= $minMargin AS ok_margin,
       |    greatest(clen, rlen) / least(clen, rlen) AS len_ratio,
       |    greatest(clen, rlen) / least(clen, rlen) <= $maxLenRatio AS ok_len_ratio
       |  FROM m
       |), r AS (
       |  SELECT *,
       |    ok_distinct AND ok_margin AND ok_len_ratio AS row_ok,
       |    row_number() OVER (PARTITION BY prompt
       |      ORDER BY CASE WHEN ok_distinct AND ok_margin AND ok_len_ratio THEN 0 ELSE 1 END, pair_id) AS rk
       |  FROM f
       |)
       |SELECT pair_id, swapped, ok_distinct, ok_margin, ok_len_ratio,
       |       row_ok AND rk = 1 AS kept,
       |       round(margin, 6) AS margin,
       |       round(len_ratio, 6) AS len_ratio
       |FROM r ORDER BY pair_id""".stripMargin
  }

  /** mirror of TextDemos.takedownPropagateDemo: the C13 recursive-CTE
    * cluster fixpoint, then listed ∪ tainted-cluster membership. */
  def takedownSql(mod: Int = 29): String = {
    val pairsCore = minhashLshSql()
      .replaceAll("(?s)\\s*ORDER BY c.id_a, c.id_b\\s*$", "")
    s"""WITH RECURSIVE pairs AS (
       |$pairsCore
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), walk(src, lbl) AS (
       |  SELECT doc_id AS src, doc_id AS lbl FROM documents
       |  UNION
       |  SELECT e.src, w.lbl FROM edges e JOIN walk w ON e.dst = w.src
       |), clusters AS (
       |  SELECT src AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster
       |  FROM walk GROUP BY src
       |), listed AS (
       |  SELECT doc_id FROM documents WHERE doc_id % $mod = 0
       |), bad AS (
       |  SELECT DISTINCT c.cluster FROM clusters c JOIN listed l USING (doc_id)
       |)
       |SELECT c.doc_id, c.cluster,
       |       CASE WHEN l.doc_id IS NOT NULL THEN 'listed' ELSE 'cluster' END AS reason
       |FROM clusters c JOIN bad USING (cluster) LEFT JOIN listed l USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** mirror of TextDemos.stratifiedSplitDemo: same md5-60 priority,
    * same ⌊n·frac + ε⌋ cut (the house epsilon-guarded floor). */
  def stratifiedSplitSql(frac: Double = 0.2, seed: Long = 7): String =
    s"""SELECT doc_id, lang, source,
       |  CASE WHEN rn <= FLOOR(CAST(n AS DOUBLE) * $frac + 1e-9)
       |       THEN 'test' ELSE 'train' END AS split
       |FROM (
       |  SELECT doc_id, lang, source,
       |    ROW_NUMBER() OVER (PARTITION BY lang, source
       |      ORDER BY ${md560(s"(CAST(doc_id AS VARCHAR) || '#$seed')")}, doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY lang, source) AS n
       |  FROM documents
       |) ORDER BY doc_id""".stripMargin

  /** mirror of TextDemos.mojibakeScoreDemo: identical plant (shared
    * string constants), identical literal-replace hit counting. */
  def mojibakeSql(): String = {
    def q(s: String) = s.replace("'", "''")
    val hits = graft.operators.Curation.MojibakePatterns.map { p =>
      s"(length(txt) - length(replace(txt, '${q(p)}', ''))) // ${p.length}"
    }.mkString("\n    + ")
    s"""WITH $mojibakePlantCte, h AS (
       |  SELECT doc_id, length(txt) AS n_chars,
       |    $hits AS hits
       |  FROM t
       |)
       |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       |       CAST(hits AS BIGINT) AS hits,
       |       ROUND(CAST(hits AS DOUBLE) / CAST(GREATEST(n_chars, 1) AS DOUBLE), 6)
       |         AS mojibake_score,
       |       hits >= 1 AS flagged
       |FROM h ORDER BY doc_id""".stripMargin
  }

  /** mirror of StreamParity.streamMojibakeParity (D14 ↔ C105): the
    * batch aggregate the streamed (lang, flagged) counters must land
    * on — same plant, same literal-replace hit algebra. */
  def streamMojibakeSql(): String = {
    def q(s: String) = s.replace("'", "''")
    val hits = graft.operators.Curation.MojibakePatterns.map { p =>
      s"(length(txt) - length(replace(txt, '${q(p)}', ''))) // ${p.length}"
    }.mkString("\n    + ")
    s"""WITH $mojibakePlantCte, h AS (
       |  SELECT doc_id, lang,
       |    $hits AS hits
       |  FROM t
       |)
       |SELECT lang, hits >= 1 AS flagged, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(hits) AS BIGINT) AS total_hits
       |FROM h GROUP BY lang, hits >= 1 ORDER BY lang, flagged""".stripMargin
  }

  /** mirror of TextDemos.kanonGeneralizeDemo (k-anonymity ladder) */
  def kanonSql(k: Long = 8): String =
    s"""WITH l0 AS (SELECT lang, source, COUNT(*) AS n0 FROM documents GROUP BY 1, 2),
       |     r1 AS (SELECT lang, SUM(n0) AS r1 FROM l0 WHERE n0 < $k GROUP BY 1),
       |     r2 AS (SELECT COALESCE(SUM(r1), 0) AS r2 FROM r1 WHERE r1 < $k)
       |SELECT d.doc_id,
       |  CASE WHEN n0 >= $k OR COALESCE(r1, 0) >= $k THEN d.lang
       |       WHEN r2 >= $k THEN '*' ELSE NULL END AS anon_lang,
       |  CASE WHEN n0 >= $k THEN d.source
       |       WHEN COALESCE(r1, 0) >= $k OR r2 >= $k THEN '*' ELSE NULL END AS anon_source,
       |  CAST(CASE WHEN n0 >= $k THEN 0 WHEN COALESCE(r1, 0) >= $k THEN 1
       |            WHEN r2 >= $k THEN 2 ELSE 3 END AS INT) AS level
       |FROM documents d JOIN l0 USING (lang, source)
       |LEFT JOIN r1 USING (lang) CROSS JOIN r2
       |ORDER BY doc_id""".stripMargin

  /** mirror of TextDemos.dpReleaseDemo: per-cell counts + the SAME
    * exact-Long geometric thresholds (generated by the one driver-side
    * CDF computation both engines share — the libm seam lives in the
    * constants, never per row) + the same count-of-thresholds noise
    * mapping. */
  def dpReleaseSql(epsilon: Double = 1.0, bound: Int = 40,
                   seed: Long = 23): String = {
    val arr = graft.operators.Governance.geometricThresholds(epsilon, bound)
      .mkString("[", ", ", "]")
    s"""WITH c AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
       |     u AS (SELECT lang, source, n,
       |             ${md560(s"(lang || '#' || source || '#$seed')")} AS u FROM c)
       |SELECT lang, source,
       |       CAST(GREATEST(0, n + len(list_filter($arr, t -> t <= u)) - $bound) AS BIGINT) AS n_released
       |FROM u ORDER BY lang, source""".stripMargin
  }

  /** mirror of TextDemos.spanCorruptDemo: the same block grid, the
    * same seeded per-(id, block) mask length, the same sentinel
    * interleave — as list algebra over the whitespace tokens. */
  def spanCorruptSql(grid: Int = 7, maxMask: Int = 3,
                     seed: Long = 17): String = {
    def len(bb: String) = s"least(${md560(
      s"(CAST(doc_id AS VARCHAR) || '#' || CAST($bb AS VARCHAR) || '#$seed')")} % ${maxMask + 1}, n - $bb*$grid)"
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
       |    CASE WHEN len(toks) > 0
       |         THEN range(CAST((len(toks) + ${grid - 1}) // $grid AS BIGINT))
       |         ELSE CAST([] AS BIGINT[]) END AS blocks
       |  FROM t
       |), m AS (
       |  SELECT doc_id, toks, n, blocks,
       |         list_filter(blocks, bb -> ${len("bb")} >= 1) AS masked
       |  FROM b
       |)
       |SELECT doc_id, n AS n_tokens,
       |  CAST(COALESCE(list_sum(list_transform(masked, bb -> ${len("bb")})), 0) AS BIGINT) AS n_masked,
       |  array_to_string(flatten(list_transform(blocks, bb ->
       |    CASE WHEN ${len("bb")} >= 1
       |      THEN ['<extra_id_' || CAST(list_position(masked, bb) - 1 AS VARCHAR) || '>']
       |             || toks[(bb*$grid + ${len("bb")} + 1):(bb*$grid + $grid)]
       |      ELSE toks[(bb*$grid + 1):(bb*$grid + $grid)] END)), ' ') AS input_text,
       |  COALESCE(array_to_string(flatten(list_transform(range(len(masked)), i ->
       |    ['<extra_id_' || CAST(i AS VARCHAR) || '>']
       |      || toks[(masked[i+1]*$grid + 1):(masked[i+1]*$grid + ${len("masked[i+1]")})])), ' '), '') AS target_text
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** mirror of TextDemos.skewDiagnoseDemo: exact-integer salt test,
    * identical double divisions for share/skew_ratio. */
  def skewDiagnoseSql(topN: Int = 10, partitions: Int = 32,
                      saltFactor: Int = 4): String =
    s"""WITH c AS (
       |  SELECT CAST(event_type AS VARCHAR) AS key, COUNT(*) AS cnt
       |  FROM events GROUP BY 1
       |), t AS (SELECT SUM(cnt) AS total, COUNT(*) AS nkeys FROM c)
       |SELECT key, cnt,
       |       ROUND(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       |       ROUND(CAST(cnt AS DOUBLE) * CAST(nkeys AS DOUBLE) / CAST(total AS DOUBLE), 6) AS skew_ratio,
       |       cnt * $partitions > total * $saltFactor AS salt_recommended
       |FROM c, t ORDER BY cnt DESC, key LIMIT $topN""".stripMargin

  /** the shared planted-corpus CTE for the C105/C109 mirrors.
    * NOTE: no line may START with `||` — callers embed this inside
    * their own stripMargin strings, which would eat the first pipe. */
  private def mojibakePlantCte: String = {
    def q(s: String) = s.replace("'", "''")
    s"""t AS (
       |  SELECT doc_id, lang,
       |    text ||
       |    CASE WHEN doc_id % 13 = 0
       |         THEN '${q(graft.operators.Curation.MojibakePlant13)}' ELSE '' END ||
       |    CASE WHEN doc_id % 29 = 0
       |         THEN '${q(graft.operators.Curation.MojibakePlant29)}' ELSE '' END AS txt
       |  FROM documents
       |)""".stripMargin
  }

  /** mirror of TextDemos.mojibakeRepairDemo: counts BEFORE repair
    * (C105's replace-delta), then the identical literal replace chain
    * built from the SHARED Curation.MojibakeRepairs constants. */
  def mojibakeRepairSql(): String = {
    def q(s: String) = s.replace("'", "''")
    val repairs = graft.operators.Curation.MojibakeRepairs
    val counts = repairs.map { case (p, _) =>
      s"(length(txt) - length(replace(txt, '${q(p)}', ''))) // ${p.length}"
    }.mkString("\n    + ")
    val repaired = repairs.foldLeft("txt") { case (e, (p, r)) =>
      s"replace($e, '${q(p)}', '${q(r)}')"
    }
    s"""WITH $mojibakePlantCte, h AS (
       |  SELECT doc_id,
       |    $repaired AS text,
       |    $counts AS n_repairs
       |  FROM t
       |)
       |SELECT doc_id, text, CAST(n_repairs AS BIGINT) AS n_repairs,
       |       n_repairs >= 1 AS repaired
       |FROM h ORDER BY doc_id""".stripMargin
  }

  /** mirror of TextDemos.packingSweepDemo: the C22 cumsum CTE is
    * capacity-independent, so one chain feeds every capacity's
    * summary block (UNION ALL). */
  def packingSweepSql(capacities: Seq[Int] = Seq(512, 1024, 2048, 4096)): String = {
    val blocks = capacities.map { c =>
      s"""SELECT CAST($c AS INT) AS capacity,
         |  CAST(SUM(docs) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS total_tokens,
         |  CAST(SUM(chunks) AS BIGINT) AS n_chunks,
         |  CAST(SUM(splits) AS BIGINT) AS docs_split,
         |  CAST(SUM(crossings) AS BIGINT) AS boundary_crossings,
         |  CAST(SUM(chunks) * $c - SUM(toks) AS BIGINT) AS tail_waste,
         |  ROUND(CASE WHEN SUM(chunks) > 0
         |        THEN CAST(SUM(toks) AS DOUBLE) / CAST(SUM(chunks) * $c AS DOUBLE)
         |        ELSE 0.0 END, 6) AS fill_rate
         |FROM (
         |  SELECT shard, SUM(n_tokens) AS toks, COUNT(*) AS docs,
         |    SUM(CASE WHEN nc >= 2 THEN 1 ELSE 0 END) AS splits,
         |    SUM(CASE WHEN nc >= 2 THEN nc - 1 ELSE 0 END) AS crossings,
         |    CASE WHEN SUM(n_tokens) > 0 THEN (SUM(n_tokens) + ${c - 1}) // $c
         |         ELSE 0 END AS chunks
         |  FROM (
         |    SELECT shard, n_tokens,
         |      CASE WHEN n_tokens > 0 THEN (e - 1) // $c - (e - n_tokens) // $c + 1
         |           ELSE 0 END AS nc
         |    FROM w
         |  ) GROUP BY shard
         |)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (
       |  SELECT doc_id, doc_id % 4 AS shard,
       |    CAST($wsToks AS BIGINT) AS n_tokens
       |  FROM documents
       |), w AS (
       |  SELECT shard, doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS e
       |  FROM d
       |)
       |$blocks
       |ORDER BY capacity""".stripMargin
  }

  /** mirror of TextDemos.vocabCoverageDemo (top-v corpus vocabulary,
    * per-language occurrence/type coverage). */
  def vocabCoverageSql(v: Int = 500): String =
    s"""WITH wds AS (
       |  SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
       |  FROM documents
       |), lw AS (
       |  SELECT lang, word, COUNT(*) AS occ FROM wds GROUP BY 1, 2
       |), vocab AS (
       |  SELECT word FROM (
       |    SELECT word, SUM(occ) AS tot FROM lw GROUP BY 1
       |    ORDER BY tot DESC, word LIMIT $v
       |  )
       |), agg AS (
       |  SELECT lang,
       |    SUM(occ) AS n_occurrences,
       |    COUNT(*) AS n_types,
       |    COALESCE(SUM(CASE WHEN vocab.word IS NOT NULL THEN occ END), 0) AS occ_covered,
       |    COALESCE(SUM(CASE WHEN vocab.word IS NOT NULL THEN 1 END), 0) AS types_covered
       |  FROM lw LEFT JOIN vocab USING (word) GROUP BY lang
       |)
       |SELECT lang, CAST(n_occurrences AS BIGINT) AS n_occurrences,
       |       CAST(n_types AS BIGINT) AS n_types,
       |       CAST(occ_covered AS BIGINT) AS occ_covered,
       |       CAST(types_covered AS BIGINT) AS types_covered,
       |       ROUND(CAST(occ_covered AS DOUBLE) /
       |             CAST(GREATEST(n_occurrences, 1) AS DOUBLE), 6) AS occ_coverage,
       |       ROUND(CAST(types_covered AS DOUBLE) /
       |             CAST(GREATEST(n_types, 1) AS DOUBLE), 6) AS type_coverage
       |FROM agg ORDER BY lang""".stripMargin

  /** mirror of TextDemos.curriculumOrderDemo: same even-spread-slice
    * integer algebra (⌊(rank−1)·k/n⌋ + 1 — remainder rows spread
    * evenly, NOT SQL NTILE's front-loading), same md5-60 within-stage
    * shuffle. */
  def curriculumSql(nStages: Int = 4, seed: Long = 11): String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST($wsToks AS BIGINT) AS difficulty FROM documents
       |), r AS (
       |  SELECT doc_id, difficulty,
       |         ROW_NUMBER() OVER (ORDER BY difficulty, doc_id) AS rnk,
       |         COUNT(*) OVER () AS n
       |  FROM t
       |), s AS (
       |  SELECT doc_id, difficulty,
       |         CAST((rnk - 1) * $nStages // n + 1 AS BIGINT) AS stage
       |  FROM r
       |)
       |SELECT doc_id, difficulty, stage,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY stage
       |         ORDER BY ${md560(s"(CAST(doc_id AS VARCHAR) || '#$seed')")}, doc_id)
       |         AS BIGINT) AS stage_order
       |FROM s ORDER BY stage, stage_order""".stripMargin
}
