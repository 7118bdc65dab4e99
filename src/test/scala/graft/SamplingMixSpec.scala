package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** C102/C104/C108: UniMax water-fill allocation, exact stratified
  * splitting, and curriculum ordering — each checked against a
  * plain-Scala reference of the same recurrence/count semantics.
  */
class SamplingMixSpec extends SparkSpec {
  import spark.implicits._

  // ---- C102 unimax_mix ----------------------------------------------

  /** the sequential water-fill the closed form must reproduce */
  private def refUnimax(toks: Map[String, Long], budget: Long,
                        maxEpochs: Int): Map[String, Double] = {
    val caps = toks.map { case (l, t) => l -> t * maxEpochs.toLong }
    var remaining = budget.toDouble
    var pool = caps.toSeq.sortBy { case (l, c) => (c, l) }
    var n = pool.size
    val out = scala.collection.mutable.Map.empty[String, Double]
    pool.foreach { case (l, c) =>
      val fair = remaining / n
      val a = math.min(c.toDouble, fair)
      out(l) = a; remaining -= a; n -= 1
    }
    out.toMap
  }

  private def runUnimax(toks: Map[String, Long], budget: Long,
                        maxEpochs: Int): Map[String, (Boolean, Double)] = {
    val df = toks.toSeq.flatMap { case (l, t) =>
      // split each lang's mass over a few rows to exercise the agg
      val a = t / 2; Seq((l, a), (l, t - a))
    }.toDF("lang", "toks")
    Sampling.unimaxMix(df, "lang", col("toks"), budget, maxEpochs)
      .collect().map(r => r.getString(0) -> (r.getBoolean(3), r.getDouble(4)))
      .toMap
  }

  test("C102 matches the sequential water-fill on a mixed capped/uncapped case") {
    val toks = Map("en" -> 1000L, "de" -> 300L, "fr" -> 100L, "zh" -> 250L)
    val budget = 1600L
    val want = refUnimax(toks, budget, maxEpochs = 2)
    val got = runUnimax(toks, budget, maxEpochs = 2)
    assert(got.keySet == want.keySet)
    want.foreach { case (l, a) =>
      assert(math.abs(got(l)._2 - a) < 1e-6, s"lang $l: ${got(l)._2} vs $a")
    }
    // fr caps (200 < fair), en does not
    assert(got("fr")._1 && !got("en")._1)
    // allocations exhaust the budget when caps don't bind overall
    assert(math.abs(got.values.map(_._2).sum - budget) < 1e-6)
  }

  test("C102 budget >= total capacity: everything caps, weight sums < 1") {
    val toks = Map("a" -> 10L, "b" -> 20L)
    val got = runUnimax(toks, budget = 1000L, maxEpochs = 2)
    assert(got("a") == ((true, 20.0)) && got("b") == ((true, 40.0)))
  }

  test("C102 tiny budget: nobody caps, uniform split") {
    val got = runUnimax(Map("a" -> 1000L, "b" -> 2000L), budget = 10L,
      maxEpochs = 1)
    assert(got("a")._2 == 5.0 && got("b")._2 == 5.0)
    assert(!got("a")._1 && !got("b")._1)
  }

  test("C102 randomized: closed form == sequential fill over 200 draws") {
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { i =>
      val langs = (1 to 2 + rnd.nextInt(6)).map(j => s"l$j")
      val toks = langs.map(_ -> (1L + rnd.nextInt(500).toLong)).toMap
      val budget = 1L + rnd.nextInt(3000).toLong
      val e = 1 + rnd.nextInt(3)
      val want = refUnimax(toks, budget, e)
      val got = runUnimax(toks, budget, e)
      want.foreach { case (l, a) =>
        assert(math.abs(got(l)._2 - a) < 1e-5,
          s"draw $i lang $l: ${got(l)._2} vs $a (toks=$toks b=$budget e=$e)")
      }
    }
  }

  /** exact Long mirror of the closed form: capped prefix by
    * cap·(n−i+1) ≤ B − cum_{i−1}, uncapped get ⌊residual/(n−k)⌋ */
  private def refUnimaxExact(toks: Map[String, Long], budget: Long,
                             maxEpochs: Int): Map[String, Long] = {
    val sorted = toks.map { case (l, t) => l -> t * maxEpochs }
      .toSeq.sortBy { case (l, c) => (c, l) }
    val n = sorted.size
    val cums = sorted.scanLeft(0L)(_ + _._2)
    val flags = sorted.zipWithIndex.map { case ((_, c), i) =>
      c * (n - i) <= budget - cums(i)
    }
    val kk = flags.count(identity)
    val capSum = sorted.zip(flags).collect { case ((_, c), true) => c }.sum
    val theta = if (kk == n) 0L else (budget - capSum) / (n - kk)
    sorted.zip(flags).map { case ((l, c), f) => l -> (if (f) c else theta) }
      .toMap
  }

  test("C102 alloc_exact matches the exact Long fill; exact above 2^53") {
    val rnd = new scala.util.Random(29)
    (1 to 100).foreach { i =>
      val langs = (1 to 2 + rnd.nextInt(6)).map(j => s"l$j")
      val toks = langs.map(_ -> (1L + rnd.nextInt(500).toLong)).toMap
      val budget = 1L + rnd.nextInt(3000).toLong
      val e = 1 + rnd.nextInt(3)
      val want = refUnimaxExact(toks, budget, e)
      val df = toks.toSeq.toDF("lang", "toks")
      val got = Sampling.unimaxMix(df, "lang", col("toks"), budget, e)
        .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
      assert(got == want, s"draw $i toks=$toks b=$budget e=$e")
    }
    // the case the display double CANNOT represent: residual 2^54 − 6
    // (doubles at 2^54 are multiples of 4). alloc_exact must be exact.
    val big = Map("a" -> (1L << 54), "b" -> 3L)
    val budget = 1L << 54
    val got = Sampling.unimaxMix(big.toSeq.toDF("lang", "toks"), "lang",
        col("toks"), budget, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> (r.getBoolean(3), r.getLong(5)))
      .toMap
    assert(got("b") == ((true, 6L)))
    assert(got("a") == ((false, (1L << 54) - 6L)))
    assert(got == refUnimaxExact(big, budget, 2).map { case (l, a) =>
      l -> ((l == "b", a)) })
  }

  // ---- C115 unimax_apply ----------------------------------------------

  test("C115 take-while-fits per language at the integer budget; capped lang keeps all") {
    val docs = (1L to 20L).map(i => (i, if (i <= 15) "big" else "small", 10L))
      .toDF("id", "lang", "toks")
    // big: 150 tokens, budget 95 -> exactly 9 docs (90 tokens) by hash
    // order; small: 50 tokens, budget 50 (capped) -> all 5 docs
    val alloc = Seq(("big", 95L), ("small", 50L)).toDF("lang", "alloc_exact")
    val got = Sampling.unimaxApply(docs, "lang", "id", col("toks"), alloc,
        seed = 9)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val (big, small) = got.partition(_._1 == "big")
    assert(big.length == 9 && big.map(_._3).max == 90L)
    assert(small.length == 5 && small.map(_._3).max == 50L)
    // the kept big-set is the hash-race prefix: re-deriving it from
    // the reference race agrees exactly
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wantBig = (1L to 15L)
      .sortBy(i => (java.lang.Long.parseLong(md5hex(s"$i#9").take(15), 16), i))
      .take(9).toSet
    assert(big.map(_._2).toSet == wantBig)
  }

  test("C115 membership is partitioning-independent and seed-keyed") {
    val docs = (1L to 100L).map(i => (i, (i % 3).toString, 1L + i % 7))
      .toDF("id", "lang", "toks")
    val alloc = Seq(("0", 50L), ("1", 60L), ("2", 40L)).toDF("lang", "alloc_exact")
    def ids(parts: Int, seed: Long) =
      Sampling.unimaxApply(docs.repartition(parts), "lang", "id",
        col("toks"), alloc, seed).collect().map(_.getLong(1)).toSet
    assert(ids(1, 3) == ids(13, 3))
    assert(ids(1, 3) != ids(1, 4))
  }

  // ---- C120 epoch_plan -------------------------------------------------

  test("C120 repetition plan: capped langs repeat fully; budget conserved; sub-pass == C115 set") {
    val docs = (1L to 30L).map { i =>
      val lang = if (i <= 20) "big" else "small"
      (i, lang, 10L)
    }.toDF("id", "lang", "toks")
    // big: 200 tokens; small: 100 tokens. budget 360, maxEpochs 2:
    // caps are 400/200; sorted by cap: small 200·2=... small cap 200,
    // big cap 400. small capped iff 200·2 <= 360 -> false; so nobody
    // caps: theta = 180 each. big: 180 = 1·200? no — 180 < 200 ->
    // full 0, rem 180 -> 18 docs once. small: 180 > 100 -> full 1,
    // rem 80 -> 8 docs twice, rest once.
    val alloc = Sampling.unimaxMix(docs, "lang", col("toks"),
      budget = 360L, maxEpochs = 2)
    val plan = Sampling.epochPlan(docs, "lang", "id", col("toks"), alloc,
      seed = 9).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val byLang = plan.groupBy(_._1)
    // conservation: sum(n_reps * toks) <= alloc_exact, gap < one doc
    val exact = alloc.collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    byLang.foreach { case (l, rows) =>
      val used = rows.map(r => r._4 * r._3).sum
      assert(used <= exact(l), s"$l used $used > ${exact(l)}")
      assert(exact(l) - used < 10L, s"$l under-fill ${exact(l) - used}")
    }
    // big is sub-one-pass: its n_reps=1 set must equal unimaxApply's
    // selected set at the same seed
    val planBig = plan.filter(r => r._1 == "big" && r._4 == 1L).map(_._2).toSet
    val applied = Sampling.unimaxApply(docs, "lang", "id", col("toks"),
        alloc, seed = 9)
      .filter(col("lang") === "big").collect().map(_.getLong(1)).toSet
    assert(planBig == applied)
    assert(plan.filter(r => r._1 == "big" && r._4 == 0L).length == 2)
    // small: full pass + fractional prefix -> reps in {1, 2}, eight 2s
    val smallReps = plan.filter(_._1 == "small").map(_._4)
    assert(smallReps.count(_ == 2L) == 8 && smallReps.count(_ == 1L) == 2)
    // a genuinely capped language repeats exactly maxEpochs everywhere
    val capAlloc = Sampling.unimaxMix(docs, "lang", col("toks"),
      budget = 1000L, maxEpochs = 2) // 600 = total caps <= 1000: all cap
    val capPlan = Sampling.epochPlan(docs, "lang", "id", col("toks"),
        capAlloc, seed = 9)
      .collect().map(_.getLong(4))
    assert(capPlan.forall(_ == 2L))
  }

  // ---- C104 stratified_split -----------------------------------------

  test("C104 exact per-stratum test counts at floor(n*frac)") {
    val df = (1L to 100L).map(i => (i, if (i <= 37) "x" else "y"))
      .toDF("id", "s")
    val out = Sampling.stratifiedSplit(df, Seq("s"), "id",
      testFrac = 0.2, seed = 3)
    val counts = out.filter(col("split") === "test")
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("x" -> 7L, "y" -> 12L)) // floor(37*.2), floor(63*.2)
    assert(out.count() == 100)
  }

  test("C104 membership is seed-keyed and partitioning-independent") {
    val df = (1L to 200L).map(i => (i, (i % 3).toString)).toDF("id", "s")
    def ids(parts: Int, seed: Long) =
      Sampling.stratifiedSplit(df.repartition(parts), Seq("s"), "id", 0.25, seed)
        .filter(col("split") === "test").select("id")
        .collect().map(_.getLong(0)).toSet
    assert(ids(1, 7) == ids(13, 7))   // partitioning-independent
    assert(ids(1, 7) != ids(1, 8))    // a new seed redraws
  }

  test("C104 frac edges: 0 holds out nothing, 1 holds out everything") {
    val df = (1L to 50L).map(i => (i, "s")).toDF("id", "s")
    assert(Sampling.stratifiedSplit(df, Seq("s"), "id", 0.0, 1)
      .filter(col("split") === "test").count() == 0)
    assert(Sampling.stratifiedSplit(df, Seq("s"), "id", 1.0, 1)
      .filter(col("split") === "train").count() == 0)
  }

  // ---- C108 curriculum_order ------------------------------------------

  test("C108 stages are exact even-spread slices of the (difficulty, id) order") {
    // 10 docs, difficulties 10..1 -> 3 stages sized 4,3,3
    val df = (1L to 10L).map(i => (i, 11L - i)).toDF("id", "d")
    val out = Sampling.curriculumOrder(df, "id", col("d"), nStages = 3,
        seed = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byStage = out.groupBy(_._3).view.mapValues(_.map(_._2).toSet).toMap
    assert(out.groupBy(_._3).view.mapValues(_.size).toMap ==
      Map(1L -> 4, 2L -> 3, 3L -> 3))
    // easiest 4 difficulties (1,2,3,4) land in stage 1, hardest 3 in stage 3
    assert(byStage(1L) == Set(1L, 2L, 3L, 4L))
    assert(byStage(3L) == Set(8L, 9L, 10L))
    // stage_order is a 1..size permutation within each stage
    out.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.size).toSeq)
    }
  }

  test("C108 property: stage sizes are the even-spread slices ⌈s·n/k⌉−⌈(s−1)·n/k⌉") {
    // the integer form ((rank-1)·k) div n + 1 spreads remainder rows
    // EVENLY across stages (4,3,4,3,… at n=28,k=8 — NOT SQL NTILE's
    // front-loaded 4,4,4,4,3,3,3,3); the start-offset algebra must
    // match these slices exactly or stage_order corrupts whenever
    // n mod k >= 2 (the bug this test caught in its first run)
    def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
    val rnd = new scala.util.Random(29)
    (1 to 200).foreach { i =>
      val n = 1 + rnd.nextInt(40); val k = 1 + rnd.nextInt(8)
      val sizes = (1 to n).groupBy(r => ((r - 1).toLong * k) / n + 1)
        .view.mapValues(_.size).toMap
      (1L to k.toLong).foreach { s =>
        val want = (ceilDiv(s * n, k) - ceilDiv((s - 1) * n, k)).toInt
        assert(sizes.getOrElse(s, 0) == want, s"draw $i: n=$n k=$k stage $s")
      }
      assert(sizes.values.sum == n, s"draw $i: rows lost")
    }
  }

  test("C108 stage_order is a clean 1..size permutation when n mod k >= 2") {
    // n=28, k=8: even-spread sizes alternate 4,3,4,3,… — the case
    // where NTILE-style start offsets would shift every later stage's
    // order by up to (n mod k − 1)
    val df = (1L to 28L).map(i => (i, i)).toDF("id", "d")
    val out = Sampling.curriculumOrder(df, "id", col("d"), nStages = 8,
        seed = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    val byStage = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byStage.keySet == (1L to 8L).toSet)
    byStage.foreach { case (s, orders) =>
      assert(orders == (1L to orders.size).toSeq,
        s"stage $s orders $orders not a 1..n permutation")
    }
    assert(byStage.values.map(_.size).toSeq.sorted == Seq(3,3,3,3,4,4,4,4).map(_.toInt),
      "sizes must be the even-spread slices")
  }

  test("C104 property: exact ⌊n·frac⌋ test count for every stratum over random draws") {
    val rnd = new scala.util.Random(31)
    (1 to 10).foreach { i =>
      val nStrata = 1 + rnd.nextInt(5)
      val rows = (1L to (20 + rnd.nextInt(180)).toLong)
        .map(id => (id, (id % nStrata).toString))
      val frac = Seq(0.1, 0.25, 0.33, 0.5)(rnd.nextInt(4))
      val out = Sampling.stratifiedSplit(rows.toDF("id", "s"), Seq("s"),
        "id", frac, seed = i)
      val got = out.filter(col("split") === "test").groupBy("s").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(_._2).view
        .mapValues(g => math.floor(g.size * frac + 1e-9).toLong).toMap
      want.foreach { case (s, w) =>
        assert(got.getOrElse(s, 0L) == w, s"draw $i frac $frac stratum $s")
      }
    }
  }

  test("C108 within-stage order is the seeded hash race, partitioning-independent") {
    val df = (1L to 60L).map(i => (i, i % 7)).toDF("id", "d")
    def run(parts: Int) =
      Sampling.curriculumOrder(df.repartition(parts), "id", col("d"), 4, seed = 2)
        .orderBy("stage", "stage_order").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(run(1) == run(11))
  }
}
