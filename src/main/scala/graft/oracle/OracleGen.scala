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

  /** mirror of TextDemos.annLshTopk (8 planes, 1 probe bit, top-5) */
  def annLshSql(nPlanes: Int = 8, dim: Int = 64, k: Int = 5, probeBits: Int = 1): String = {
    val planes = Vec.hyperplanes(nPlanes, dim)
    // same Hamming-ball probe enumeration as Similarity.lshTopK
    val flips = (0L until (1L << nPlanes))
      .filter(f => java.lang.Long.bitCount(f) <= probeBits)
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

  /** mirror of RefDemos.geocodeCandidates (expansion ladder, 6 variants) */
  def geocodeCandidatesSql(): String = {
    val raw = "CAST(c_custkey % 900 + 100 AS VARCHAR) || ' 台北市大安區和平東路' || " +
      "CAST(c_custkey % 30 + 1 AS VARCHAR) || '巷' || " +
      "CAST(c_nationkey % 9 + 1 AS VARCHAR) || '弄' || " +
      "CAST(c_custkey % 150 + 1 AS VARCHAR) || " +
      "(CASE WHEN c_custkey % 2 = 0 THEN '-' || CAST(c_custkey % 5 + 1 AS VARCHAR) ELSE '' END) || " +
      "'號 (註)'"
    val looks = (v: String) =>
      s"regexp_matches($v, '(路|街|巷|弄|大道)') AND regexp_matches($v, '號')"
    val unions = (0 to 5).map { r =>
      val notEarlier = (0 until r).map(i => s"v$r <> v$i").mkString(" AND ")
      val cond = if (r == 0) looks(s"v$r") else s"${looks(s"v$r")} AND $notEarlier"
      s"SELECT c_custkey, v$r AS candidate, $r AS rank FROM v WHERE $cond"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH s AS (
       |  SELECT c_custkey, $raw AS addr FROM customer
       |), n AS (
       |  SELECT c_custkey,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(addr,
       |      '^\\s*\\d{3,5}[-\\s]?', ''),
       |      '（[^）]*）|\\([^)]*\\)', '', 'g'),
       |      '\\s+', '', 'g'),
       |      '台', '臺', 'g') AS folded
       |  FROM s
       |), b AS (
       |  SELECT c_custkey,
       |    CASE WHEN regexp_extract(folded, '^([^號]*號)', 1) <> ''
       |         THEN regexp_extract(folded, '^([^號]*號)', 1) ELSE folded END AS v0
       |  FROM n
       |), v AS (
       |  SELECT c_custkey, v0,
       |    regexp_replace(v0, '(\\d+)-(\\d+)號', '\\1之\\2號', 'g') AS v1,
       |    regexp_replace(v0, '(\\d+)-(\\d+)號', '\\1號', 'g') AS v2,
       |    regexp_replace(regexp_replace(v0, '(\\d+)-(\\d+)號', '\\1號', 'g'),
       |                   '\\d+(?:-\\d+)?弄', '', 'g') AS v3,
       |    regexp_replace(regexp_replace(regexp_replace(v0, '(\\d+)-(\\d+)號', '\\1號', 'g'),
       |                   '\\d+(?:-\\d+)?弄', '', 'g'),
       |                   '\\d+(?:-\\d+)?巷', '', 'g') AS v4,
       |    CASE WHEN regexp_extract(regexp_replace(v0, '(\\d+)-(\\d+)號', '\\1號', 'g'), '^(.*?(?:大道|路|街))', 1) <> ''
       |          AND regexp_extract(regexp_replace(v0, '(\\d+)-(\\d+)號', '\\1號', 'g'), '(\\d+(?:之\\d+)?號)', 1) <> ''
       |         THEN regexp_extract(regexp_replace(v0, '(\\d+)-(\\d+)號', '\\1號', 'g'), '^(.*?(?:大道|路|街))', 1)
       |              || regexp_extract(regexp_replace(v0, '(\\d+)-(\\d+)號', '\\1號', 'g'), '(\\d+(?:之\\d+)?號)', 1)
       |         ELSE '' END AS v5
       |  FROM b
       |), u AS (
       |  $unions
       |)
       |SELECT c_custkey, candidate, rank FROM u ORDER BY c_custkey, rank""".stripMargin
  }

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
}
