package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextDemos}

/** C63 PCA + C59 JL projection: independent-reference checks — the
  * moment aggregate against hand math, the eigensolver against known
  * eigenpairs, the fitted basis against its algebraic contract, and
  * the distributed projections against naive driver arithmetic. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("VecGram moments match hand math and merge across partitions") {
    val rows = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 6.0f))
    // 4 partitions over 3 rows forces partial-buffer merges
    val buf = rows.toDF("v").repartition(4)
      .select(call_function("graft_gram", col("v"), lit(2)).as("g"))
      .head().getSeq[Double](0).toArray
    // [n, Σx0, Σx1, Σx0x0, Σx0x1, Σx1x1]
    assert(buf.toSeq == Seq(3.0, 9.0, 12.0, 35.0, 44.0, 56.0))
  }

  test("VecGram rejects ragged vectors loudly") {
    val e = intercept[Exception] {
      Seq(Seq(1.0f, 2.0f), Seq(3.0f)).toDF("v")
        .select(call_function("graft_gram", col("v"), lit(2))).head()
    }
    assert(e.getMessage != null)
  }

  test("jacobiEigen reproduces known eigenpairs") {
    // [[2,1],[1,2]] has eigenvalues 3 (vector [1,1]/√2) and 1
    val (vals, vecs) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // the eigenvector of 3 is proportional to [1,1]
    val c3 = vals.indexWhere(v => math.abs(v - 3.0) < 1e-9)
    assert(math.abs(math.abs(vecs(0)(c3)) - math.abs(vecs(1)(c3))) < 1e-12)
  }

  test("pcaFit: orthonormal components, descending eigvals, variance accounting") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val dim = 64
    val m = Similarity.pcaFit(emb, "embedding", dim, k = dim)
    // descending eigenvalues, all >= -epsilon (covariance is PSD)
    assert(m.eigvals.zip(m.eigvals.tail).forall { case (a, b) => a >= b - 1e-9 })
    assert(m.eigvals.forall(_ >= -1e-9))
    // full-rank fit: eigenvalue sum == total variance (trace)
    assert(math.abs(m.eigvals.sum - m.totalVar) < 1e-6 * math.max(1.0, m.totalVar))
    // orthonormality
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"<c$i, c$j> = $dot")
    }
    // sign pin: each component's largest-|coord| entry is positive
    m.components.foreach { c =>
      assert(c(c.indices.maxBy(ix => (math.abs(c(ix)), -ix))) >= 0)
    }
  }

  test("pcaProject matches naive driver arithmetic exactly") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val model = Similarity.pcaFit(emb, "embedding", 64, k = 4)
    val got = Similarity.pcaProject(emb, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getDouble).toSeq).toMap
    val raw = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // replicate the float-literal dot: float basis, double accumulation
    raw.foreach { case (id, v) =>
      val want = model.components.map { comp =>
        val cf = comp.map(_.toFloat)
        val dot = v.indices.map(i => v(i).toDouble * cf(i).toDouble).sum
        val off = cf.zip(model.mean).map { case (c, mn) => c.toDouble * mn }.sum
        dot - off
      }.toSeq
      assert(got(id) == want, s"vec $id: ${got(id)} vs $want")
    }
  }

  test("projections decorrelate: off-diagonal covariance ~ 0, variances = eigvals") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val model = Similarity.pcaFit(emb, "embedding", 64, k = 3)
    val p = Similarity.pcaProject(emb, "vec_id", "embedding", model)
      .collect().map(r => (1 to 3).map(r.getDouble).toArray)
    val n = p.length.toDouble
    for (a <- 0 until 3; b <- a until 3) {
      val ma = p.map(_(a)).sum / n
      val mb = p.map(_(b)).sum / n
      val cov = p.map(r => (r(a) - ma) * (r(b) - mb)).sum / n
      if (a == b) assert(math.abs(cov - model.eigvals(a)) < 1e-4 * math.max(1.0, model.eigvals(a)),
        s"var(p$a) = $cov vs eigval ${model.eigvals(a)}")
      else assert(math.abs(cov) < 1e-4, s"cov(p$a, p$b) = $cov")
    }
  }

  test("randProjectInt matches naive driver math; is map-only (no exchange)") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val out = Similarity.randProjectInt(emb, "vec_id", "embedding", 64, 16)
    val got = out.collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toSeq).toMap
    val raw = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    raw.take(20).foreach { case (id, v) =>
      // replicate Spark's round(x, 0): BigDecimal HALF_UP (half away
      // from zero — embeddings straddle 0, so the mode matters)
      val q = v.map { x =>
        // valueOf (shortest-string), matching Spark's round()
        java.math.BigDecimal.valueOf(x.toDouble * 1000.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }.toArray
      val want = (0 until 16).map(j =>
        (0 until 64).map(i => q(i) * Similarity.jlSign(i, j, 16)).sum).toSeq
      assert(got(id) == want, s"vec $id")
    }
    // map-only: no Exchange in the executed plan
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"JL projection must not shuffle:\n$plan")
  }

  test("jlSign columns are balanced and mutually low-correlation") {
    val cols = (0 until 16).map(j => (0 until 64).map(i => Similarity.jlSign(i, j, 16).toDouble))
    for (a <- 0 until 16; b <- a + 1 until 16) {
      val corr = cols(a).zip(cols(b)).map { case (x, y) => x * y }.sum / 64.0
      assert(math.abs(corr) <= 0.5, s"cols $a,$b corr $corr")
    }
  }
}
