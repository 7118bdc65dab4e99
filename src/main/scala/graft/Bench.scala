package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * TIERED SAMPLING (r15): rows with a stable trailing history take one
  * warm probe sample; the top-SPARK_GRAFT_TOPK_FULL rows by trailing
  * cost, rows with no history, rows named in SPARK_GRAFT_FULL_ROWS,
  * and any probe reading >1.25× its trailing median run the full
  * protocol below (a probe that disagrees with history escalates
  * in-window — the per-row drift auto-rerun). SPARK_GRAFT_TIER=0
  * restores full passes everywhere. The artifact's `tiers` object
  * records the split and every escalation.
  *
  * One untimed warmup pass over the full-tier rows runs first (JIT +
  * codegen compilation are one-time JVM costs, not per-query plan
  * costs — a 1000-executor run amortizes them to nothing; the warmup
  * must cover the heavy rows up front: an r14 fold-in experiment left
  * the window's first rows JIT-cold at 3× their warm cost; stable-tier
  * rows warm their own plan with a dropped sample), then
  * `SPARK_GRAFT_PASSES` (default 3) timed passes per full-tier query,
  * reported as the MEDIAN with
  * min/max spread — a single pass cannot tell a plan regression from
  * a GC pause, and round-3's "regressions" (time_window_agg
  * 0.30→0.88s) turned out to be exactly that. Passes run back-to-back
  * per query (not pass-major) so each query's samples share the same
  * JVM/GC context.
  * Set SPARK_GRAFT_WARMUP=0 to skip the warmup for cold numbers.
  *
  * WALL-CLOCK BUDGET (r13 verdict task 2: the driver's window killed
  * the r13 run at rc=124 with NO payload): SPARK_GRAFT_TIME_BUDGET
  * seconds (default 780, 0 = unlimited). The suite always finishes
  * inside it by degrading gracefully — warmup truncates at 30 %, rows
  * started past 60 % drop one pass, retry/resample loops stop growing
  * past 70 %, rows started past 80 % take one timed sample, and a
  * drift re-window only runs when a whole extra window fits. The
  * artifact's `budget` object records elapsed time, any degraded rows,
  * and whether a re-window was skipped, so a thin run is visibly thin
  * rather than silently absent.
  *
  * END-OF-WINDOW SUSPECT RETRY (r16): any row still reading >2.5× its
  * trailing history after the window completes is re-sampled once more
  * at the very end of the run — temporally decorrelated from the
  * contention burst that inflated it — and the extra samples join its
  * sample set. The artifact's `suspect_retries` object records every
  * retried row; rows that stay suspect carry a `retried` count inside
  * the `suspect` block.
  *
  * CONTENTION ROBUSTNESS (the r9 fix for r8's committed-artifact
  * problem): timing noise on a shared host is strictly ADDITIVE — a
  * neighbor process can slow a sample down, never speed it up — and
  * the PLAN is identical across samples, so under wide spread the low
  * samples are the honest least-contended measurement. When a query's
  * in-run max/min exceeds 2× after the initial passes, the bench takes
  * up to 2×`passes` extra samples, then reports the median of the
  * LOWEST `passes` samples. The spread record keeps min/max over ALL
  * samples plus the retained/total counts, so contention stays visible
  * in the artifact instead of polluting the headline number (r8's
  * committed sessionize read 4.43 s against 0.32–0.43 s in sibling
  * runs minutes apart — that artifact made every per-query
  * round-over-round delta noise).
  *
  * SPARK_GRAFT_ONLY=a,b,c restricts the run to named queries (fast
  * local iteration on one operator's cost).
  *
  * WHOLE-WINDOW DRIFT ENFORCEMENT (r13, after r12 shipped a
  * `"verdict":"drifted"` BENCH_FULL against its own rule): when the
  * suite-level drift verdict fires, the ENTIRE window re-runs (up to
  * SPARK_GRAFT_DRIFT_RETRIES extra windows, default 1) and the
  * least-drifted window is the one reported — additive noise means
  * the fastest window is the honest one. If the final window is STILL
  * drifted, it refuses to overwrite an existing "ok"-verdict
  * BENCH_FULL and lands in BENCH_FULL_DRIFTED.json instead, keeping
  * the clean committed record authoritative. The artifact also splits
  * the headline into `totals.batch` / `totals.streaming`: the 13
  * parity rows re-run micro-batch replay machinery per pass by
  * design, a fixed cost that otherwise buries the batch signal.
  */
object Bench {
  /** nearest ancestor of cwd carrying build.sbt — anchors the
    * BENCH_FULL / BENCH_HISTORY artifacts to the repo regardless of
    * the launch directory (an r8 ADVICE fix: a user.dir-relative path
    * silently scattered the append-only history). */
  private[graft] def repoRoot: String = {
    var d = java.nio.file.Paths.get(System.getProperty("user.dir")).toAbsolutePath
    while (d != null && !java.nio.file.Files.exists(d.resolve("build.sbt")))
      d = d.getParent
    if (d == null) System.getProperty("user.dir") else d.toString
  }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** the contention-robust estimate: median of the lowest `keep`
    * samples (see the object doc for why low samples are honest). */
  private[graft] def robustMedian(xs: Seq[Double], keep: Int): Double =
    median(xs.sorted.take(keep))

  /** Trailing per-query medians from the append-only history: the
    * newest `window` numeric entries per query across full runs at the
    * SAME sf dir (error entries and malformed lines skip silently —
    * the guard is advisory, never a reason to fail a bench). Feeds the
    * CROSS-WINDOW contamination guard: the in-run spread check catches
    * a noisy window (some samples slow), but a window where ALL of a
    * query's samples are slow together passes it — r10 committed
    * cdc_chunk_dedup at 6.07 s (min 4.14) against 1.26 s on identical
    * code hours earlier. History is the only same-code witness that
    * can tell that apart. */
  /** keys of a run line's `suspect` object — rows the run itself flagged
    * as cross-window contaminated. Excluded from trailing medians so a
    * few consecutive contaminated runs cannot ratchet the reference
    * upward until the guard goes blind to the very pattern it watches
    * (the self-poisoning-baseline advisory). The object nests one brace
    * level per entry, so this scans with a depth counter rather than a
    * regex-to-first-brace. */
  private[graft] def suspectKeys(line: String): Set[String] = {
    val sKey = "\"suspect\":{"
    val start = line.indexOf(sKey)
    if (start < 0) return Set.empty
    var i = start + sKey.length - 1 // at the opening brace
    var depth = 0
    val from = i
    while (i < line.length && { // find the matching close brace
      val c = line.charAt(i)
      if (c == '{') depth += 1 else if (c == '}') depth -= 1
      depth != 0
    }) i += 1
    if (i >= line.length) return Set.empty
    val body = line.substring(from, i + 1)
    """"([A-Za-z0-9_]+)":\{""".r.findAllMatchIn(body).map(_.group(1)).toSet
  }

  /** consecutive suspect runs needed (at a stable level) before a
    * persistent slowdown is ACCEPTED as the new baseline rather than
    * excluded as contamination — without this escape hatch a real
    * committed ≥2.5× change would be flagged "contaminated" forever
    * and the trailing reference could never converge to the new cost
    * (every future run would also pay the 5×-passes resample budget). */
  private val SuspectAcceptRuns = 3
  private val SuspectAcceptSpread = 1.3

  private[graft] def trailingMedians(historyLines: Seq[String], sfDir: String,
                                     window: Int = 5): Map[String, Double] = {
    // per query, (value, wasSuspectInItsOwnRun) — suspect values are
    // normally excluded (a contaminated run must not ratchet the
    // baseline), UNLESS the newest SuspectAcceptRuns entries are ALL
    // suspect at a tight mutual spread: slow-and-stable across runs is
    // a real committed change, not window noise, and the baseline
    // re-converges to it
    val perQuery = scala.collection.mutable.Map.empty[String, List[(Double, Boolean)]]
    val num = """"([A-Za-z0-9_]+)":([-+0-9.eE]+)[,}]""".r
    historyLines.foreach { line =>
      try {
        val tag = "\"sf\":\"" + sfDir + "\""
        val qKey = "\"queries\":{"
        val qStart = line.indexOf(qKey)
        // the queries object nests no braces (numbers / "error:…" strings)
        if (line.contains(tag) && qStart >= 0) {
          val tainted = suspectKeys(line)
          val body = line.substring(qStart + qKey.length,
            line.indexOf('}', qStart) + 1)
          num.findAllMatchIn(body).foreach { m =>
            val v = m.group(2).toDouble
            perQuery.updateWith(m.group(1))(l =>
              Some((v, tainted.contains(m.group(1))) :: l.getOrElse(Nil)))
          }
        }
      } catch { case _: Exception => () }
    }
    // lines iterate oldest→newest and prepend, so head = newest
    perQuery.view.mapValues { l =>
      val newest = l.take(SuspectAcceptRuns)
      val accepted = newest.size == SuspectAcceptRuns &&
        newest.forall(_._2) && {
          val vs = newest.map(_._1)
          vs.max / vs.min <= SuspectAcceptSpread
        }
      val usable = if (accepted) l else l.filterNot(_._2)
      if (usable.isEmpty) Double.NaN
      else median(usable.take(window).map(_._1))
    }.toMap.filterNot(_._2.isNaN)
  }

  /** WHOLE-SUITE drift verdict — the guard the per-row 2.5× check is
    * blind to: r11's window ran uniformly ~10–30 % slow on untouched
    * code and nothing flagged it, because no single row tripped 2.5×.
    * Compares the fresh run against trailing history over the SHARED
    * query set (suite composition changes across rounds): the
    * shared-total ratio is the headline (>15 % = drifted), and the
    * count of rows individually >1.25× their trailing median (among
    * rows ≥ 0.3 s, below which absolute jitter dominates) records how
    * broad the drift is. Advisory: the verdict is WRITTEN into
    * BENCH_FULL/BENCH_HISTORY so a contaminated-but-not-spiky window
    * is visible at commit time — re-run the window before treating
    * per-row deltas from a `drifted` run as real. Returns None below
    * 10 shared rows (a SPARK_GRAFT_ONLY probe can't judge a suite). */
  private[graft] def driftVerdict(fresh: Map[String, Double],
                                  trailing: Map[String, Double])
      : Option[(Double, Double, Double, Int)] = {
    val shared = fresh.keySet.intersect(trailing.keySet).toSeq
      .filter(k => trailing(k) > 0)
    if (shared.size < 10) None
    else {
      val f = shared.map(fresh).sum
      val t = shared.map(trailing).sum
      val over = shared.count(k => fresh(k) >= 0.3 && fresh(k) > trailing(k) * 1.25)
      Some((f, t, f / t, over))
    }
  }

  /** Should a fresh drifted window refuse to overwrite the committed
    * BENCH_FULL? Only when the artifact on disk is itself a clean
    * ("ok"-verdict) window: replacing a clean committed record with a
    * uniformly-slow one is exactly how r12 shipped per-row "deltas"
    * that were pure machine noise. A drifted-over-drifted (or
    * verdict-less pre-r11) artifact may be replaced — the fresh window
    * is no worse a witness, and refusing would pin a bad record
    * forever. The drifted window lands in BENCH_FULL_DRIFTED.json
    * either way, so nothing measured is lost. */
  private[graft] def refuseOverwrite(existing: Option[String], freshVerdict: String): Boolean =
    freshVerdict == "drifted" && existing.exists(_.contains("\"verdict\":\"ok\""))

  /** batch/streaming suite split: the 13 `stream_*_parity` rows replay
    * real micro-batch machinery per pass BY DESIGN (the honest cost of
    * a streaming correctness gate), which buries the batch engine's
    * signal in the headline total — report both. */
  private[graft] def isStreamingRow(name: String): Boolean = name.startsWith("stream_")

  /** Is a fresh median a cross-window contamination suspect? Only
    * multi-second rows qualify (the perf taxonomy's unit of concern —
    * a 0.1 s job-floor row tripping 2.5× on absolute jitter would make
    * the guard cry wolf) and only when the trailing history median
    * disagrees by >2.5×. */
  private[graft] def crossWindowSuspect(freshMedian: Double, trailing: Double): Boolean =
    freshMedian >= 1.0 && freshMedian > trailing * 2.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // WALL-CLOCK BUDGET (r13 verdict task 2: the driver's bench run hit
    // its window timeout — rc=124, no payload — and an artifact that
    // never prints is worse than one with thinner sampling). The suite
    // must ALWAYS finish near the budget: sampling degrades (fewer
    // passes, no retry loops, no drift re-window) as the deadline
    // approaches, and the artifact records what was degraded. 0 = off.
    // Default 780 s: the driver window that killed r13 also carries
    // sbt + Spark startup, and rows already started may overshoot the
    // line by their own cost — the default leaves that margin.
    val budget = sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET", "780").toDouble
    val tStart = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - tStart) / 1e9
    def budgetFrac: Double = if (budget <= 0) 0.0 else elapsed / budget
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = (SparkEntry.queries ++ SparkEntry.benchExtras)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // cross-window guard input: what this suite historically costs at
    // this sf dir (empty on a fresh repo or unreadable history)
    val trailing: Map[String, Double] = try {
      val p = java.nio.file.Paths.get(s"$repoRoot/BENCH_HISTORY.jsonl")
      if (java.nio.file.Files.exists(p))
        trailingMedians(
          scala.jdk.CollectionConverters.ListHasAsScala(
            java.nio.file.Files.readAllLines(p)).asScala.toSeq, sfDir)
      else Map.empty
    } catch { case _: Exception => Map.empty }
    // TIERED SAMPLING (r14 verdict tasks 1+3: the r14 window spent
    // 1390 s of wall — 1.8× its own budget — giving passes=3 plus
    // retry loops to 121 sub-second rows whose trailing medians have
    // been stable for rounds, while committing ZERO reruns for the
    // rows that actually moved). Rows run in one of two tiers:
    //  - FULL (warm + `passes` samples + retry loops): rows with no
    //    trailing history (new this round), the top
    //    SPARK_GRAFT_TOPK_FULL (default 20) by trailing cost, rows
    //    named in SPARK_GRAFT_FULL_ROWS (csv — rows changed this
    //    round), and every SPARK_GRAFT_ONLY probe.
    //  - STABLE (warm + ONE probe sample): everything else. A probe
    //    reading >1.25× its trailing median ESCALATES the row to the
    //    full tier on the spot — the per-row drift auto-rerun the r14
    //    verdict demanded, in place of an after-the-fact orphan file.
    // The drift gate still sees a fresh sample for EVERY row; the
    // wall saved comes only from rows whose fresh probe agrees with
    // their history. SPARK_GRAFT_TIER=0 restores passes-everywhere.
    val tierOff = sys.env.getOrElse("SPARK_GRAFT_TIER", "1") == "0"
    val fullForced = sys.env.get("SPARK_GRAFT_FULL_ROWS")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val topKFull = sys.env.getOrElse("SPARK_GRAFT_TOPK_FULL", "20").toInt
    val topCost: Set[String] =
      trailing.toSeq.sortBy(-_._2).take(topKFull).map(_._1).toSet
    def isFullTier(name: String): Boolean =
      tierOff || only.nonEmpty || trailing.get(name).isEmpty ||
        topCost(name) || fullForced(name)
    val escalated = scala.collection.mutable.LinkedHashSet.empty[String]
    // suite-wide warmup over the FULL-tier rows: one untimed execution
    // warms the JVM GLOBALLY (Spark's scan/shuffle/streaming machinery
    // JIT), not just per-plan codegen — an r14 fold-in experiment
    // showed the window's first rows reading 3× their warm cost
    // without it. The heavy top-K rows cover the global machinery;
    // stable-tier rows warm their own plan with a dropped per-row
    // sample right before their probe. Under budget pressure the
    // warmup truncates (cold rows self-correct via the per-row warm
    // fallback + resample loops when budget allows).
    var warmupTruncated = 0
    val warmed = scala.collection.mutable.Set.empty[String]
    if (warmup) {
      val rows = all.toSeq.filter { case (name, _) => isFullTier(name) }
      val it = rows.iterator
      while (it.hasNext && (budget <= 0 || elapsed < budget * 0.3)) {
        val (name, fn) = it.next()
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        graft.util.CacheRegistry.releaseAll()
        warmed += name
      }
      warmupTruncated = it.size
      if (warmupTruncated > 0)
        Console.err.println(s"[bench] warmup truncated at 30% of budget: " +
          s"$warmupTruncated rows fall back to a per-row warm sample")
      spark.sharedState.cacheManager.clearCache() // no data-cache carryover
    }
    // Right(pass times) on success, Left(exception class) on failure — a
    // broken query must surface as "error", never bench as a fast success.
    // Degradation ladder as the deadline nears: past 60 % of budget
    // rows take passes−1 samples, past 80 % ONE sample; past 70 % the
    // retry loops stop growing the sample set. A row the truncated
    // warmup missed takes one dropped warm sample first (cold codegen
    // would otherwise pollute its record) unless even that no longer
    // fits. `degraded` records which rows ran thin.
    val degraded = scala.collection.mutable.LinkedHashSet.empty[String]
    def measureWindow(): Map[String, Either[String, Seq[Double]]] = all.map { case (name, fn) =>
      val r = try {
        def sample(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          graft.util.CacheRegistry.releaseAll()
          sec
        }
        if (warmup && !warmed.contains(name) && budgetFrac < 0.8) {
          sample() // dropped: per-row fallback warm (stable tier + truncated)
          warmed += name
        }
        val fullTier = isFullTier(name)
        val rowPasses =
          if (budgetFrac > 0.8) { if (fullTier) degraded += name; 1 }
          else if (!fullTier) 1 // stable tier: one probe, escalation below
          else if (budgetFrac > 0.6) { degraded += name; math.max(1, passes - 1) }
          else passes
        val samples = scala.collection.mutable.ArrayBuffer.fill(rowPasses)(sample())
        // stable-tier escalation: a probe disagreeing with its trailing
        // median by >1.25× re-runs at full passes IMMEDIATELY (fresh-JVM
        // attribution is the round-close tool's job; same-window rerun
        // is the honest first responder) — the retry loops below then
        // apply to the escalated sample set like any full-tier row.
        // Past 80 % of budget the escalation is SUPPRESSED; a probe
        // that would have escalated is recorded as degraded (thin by
        // budget, not by agreement with history).
        if (!fullTier && trailing.get(name).exists(h => samples.head > h * 1.25)) {
          if (budgetFrac < 0.8) {
            escalated += name
            while (samples.size < passes) samples += sample()
          } else degraded += name
        }
        // contention retry: identical plan, additive noise ⇒ resample
        // until the spread settles or the extra budget (2×passes) runs out
        while (samples.max / samples.min > 2.0 && samples.size < passes * 3 &&
            budgetFrac < 0.7 && (fullTier || escalated.contains(name)))
          samples += sample()
        // cross-window contamination retry: a CONSISTENTLY slow window
        // (all samples slow together) passes the spread check — compare
        // against the trailing history median and keep resampling; if
        // the slowness persists through the extra budget it is reported
        // as measured, flagged loudly in `suspect`
        trailing.get(name).foreach { hist =>
          while (crossWindowSuspect(robustMedian(samples.toSeq, passes), hist) &&
              samples.size < passes * 5 && budgetFrac < 0.7)
            samples += sample()
        }
        Right(samples.toSeq): Either[String, Seq[Double]]
      } catch {
        case e: Throwable =>
          graft.util.CacheRegistry.releaseAll()
          Left(e.getClass.getSimpleName): Either[String, Seq[Double]]
      }
      name -> r
    }

    // whole-window drift retry (the r12 verdict's process gap: a
    // drifted window shipped as the committed artifact against the
    // round's own rule). A drifted verdict means the MACHINE was
    // uniformly slow, so the whole window re-runs — bounded by
    // SPARK_GRAFT_DRIFT_RETRIES (default 1; a real committed slowdown
    // re-measures the same way twice and is then reported drifted,
    // where the overwrite refusal below takes over)
    def windowRatio(results: Map[String, Either[String, Seq[Double]]]): Option[Double] = {
      val suspectNames = results.collect {
        case (k, Right(ts))
          if trailing.get(k).exists(h => crossWindowSuspect(robustMedian(ts, passes), h)) => k
      }.toSet
      val fresh = results.collect {
        case (k, Right(ts)) if !suspectNames.contains(k) => k -> robustMedian(ts, passes)
      }.toMap
      driftVerdict(fresh, trailing).map(_._3)
    }
    val maxWindows = 1 + sys.env.getOrElse("SPARK_GRAFT_DRIFT_RETRIES", "1").toInt.max(0)
    var windows = List(measureWindow())
    // a re-window only runs when it FITS the remaining budget (the first
    // window's wall-clock, warmup included, is the conservative estimate)
    val window1Time = elapsed
    def rewindowFits: Boolean =
      budget <= 0 || elapsed + window1Time <= budget * 0.95
    var rewindowSkipped = false
    while (windowRatio(windows.head).exists(_ > 1.15) && windows.size < maxWindows &&
        { rewindowSkipped = !rewindowFits; !rewindowSkipped }) {
      Console.err.println(f"[bench] window ${windows.size}%d drifted " +
        f"(ratio ${windowRatio(windows.head).get}%.3f > 1.15) - re-running the " +
        "whole window (noise is additive: the faster window is the honest one)")
      windows ::= measureWindow()
    }
    if (rewindowSkipped)
      Console.err.println(f"[bench] drift re-window SKIPPED: ${elapsed}%.0f s elapsed + " +
        f"~${window1Time}%.0f s window would overrun the ${budget}%.0f s budget - " +
        "finishing inside the window beats a dead rc=124 run")
    // keep the least-contended window: noise is strictly additive, so
    // minimum shared-total ratio = closest to the machine's true cost
    val picked = windows.minBy(w => windowRatio(w).getOrElse(0.0))
    val rerunCount = windows.size - 1
    // END-OF-WINDOW SUSPECT RETRY (r16, the r14/r15 verdicts' missing
    // half): a row whose median still reads >2.5× its trailing history
    // after in-window resampling is almost always a contention burst —
    // and by NOW the rest of the suite has run, so the burst has had
    // minutes to pass. Re-sample just those rows (same timed action,
    // same per-sample protocol; additions-only) and let the extra
    // samples join the row's set: noise is additive, so the robust
    // median can only move toward the machine's true cost. Rows that
    // stay suspect through the retry are reported as measured and
    // annotated with their retry count in the `suspect` block.
    val suspectRetried = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val results: Map[String, Either[String, Seq[Double]]] = picked.map {
      case (k, Right(ts))
          if trailing.get(k).exists(h =>
            crossWindowSuspect(robustMedian(ts, passes), h)) && budgetFrac < 0.9 =>
        def sample(): Double = {
          val t0 = System.nanoTime()
          all(k)(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          graft.util.CacheRegistry.releaseAll()
          sec
        }
        val extra = scala.collection.mutable.ArrayBuffer.empty[Double]
        try {
          while (extra.size < passes && budgetFrac < 0.95 &&
              crossWindowSuspect(robustMedian(ts ++ extra.toSeq, passes), trailing(k)))
            extra += sample()
        } catch { case _: Throwable => graft.util.CacheRegistry.releaseAll() }
        if (extra.nonEmpty) {
          suspectRetried(k) = extra.size
          Console.err.println(f"[bench] suspect retry: $k%s took ${extra.size}%d " +
            f"end-of-window sample(s); median ${robustMedian(ts, passes)}%.2f -> " +
            f"${robustMedian(ts ++ extra.toSeq, passes)}%.2f s " +
            f"(trailing ${trailing(k)}%.2f)")
        }
        k -> (Right(ts ++ extra.toSeq): Either[String, Seq[Double]])
      case kv => kv
    }
    val suspects = results.collect {
      case (k, Right(ts))
        if trailing.get(k).exists(h => crossWindowSuspect(robustMedian(ts, passes), h)) =>
        k -> (robustMedian(ts, passes), trailing(k))
    }
    suspects.foreach { case (k, (fresh, hist)) =>
      Console.err.println(f"[bench] SUSPECT WINDOW: $k%s median $fresh%.2f s is " +
        f">2.5x its trailing history median $hist%.2f s and persisted through " +
        "resampling - treat this row's record as contaminated until a quiet " +
        "window reproduces it")
    }
    val qs = results.map {
      case (k, Right(ts)) => "\"" + k + "\":" + robustMedian(ts, passes)
      case (k, Left(err)) => "\"" + k + "\":\"error:" + err + "\""
    }.mkString("{", ",", "}")
    val spread = results.collect { case (k, Right(ts)) =>
      "\"" + k + "\":{\"median\":" + robustMedian(ts, passes) + ",\"min\":" + ts.min +
        ",\"max\":" + ts.max + ",\"samples\":" + ts.size + "}"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val suspectJson = suspects.map { case (k, (fresh, hist)) =>
      "\"" + k + "\":{\"median\":" + fresh + ",\"trailing\":" + hist +
        suspectRetried.get(k).map(n => ",\"retried\":" + n).getOrElse("") + "}"
    }.mkString("{", ",", "}")
    // every end-of-window retry, including the ones that HEALED the row
    // out of the suspect block — so a clean suspect block still shows
    // what it cost to get there
    val suspectRetriesJson = suspectRetried.map { case (k, n) =>
      "\"" + k + "\":" + n
    }.mkString("{", ",", "}")
    val total = results.values.collect { case Right(ts) => robustMedian(ts, passes) }.sum
    // batch vs streaming split (r12 verdict task 6): the parity rows'
    // replay machinery is a fixed per-pass cost that buries the batch
    // signal — both suite totals are first-class in the artifact
    val streamingTotal = results.collect {
      case (k, Right(ts)) if isStreamingRow(k) => robustMedian(ts, passes)
    }.sum
    val totalsJson =
      s"""{"batch":${total - streamingTotal},"streaming":$streamingTotal}"""
    // suspect rows are judged by the PER-ROW guard; including them in
    // the suite total would let one contaminated heavy row flip the
    // whole-suite verdict to "drifted" when nothing is uniformly slow
    val suspectNames = suspects.map(_._1).toSet
    val freshMedians = results.collect {
      case (k, Right(ts)) if !suspectNames.contains(k) =>
        k -> robustMedian(ts, passes)
    }.toMap
    val (verdict, driftJson) = driftVerdict(freshMedians, trailing) match {
      case Some((f, t, ratio, over)) =>
        val verdict = if (ratio > 1.15) "drifted" else "ok"
        if (verdict == "drifted")
          Console.err.println(f"[bench] DRIFTED WINDOW: shared-suite total $f%.1f s is " +
            f"${(ratio - 1) * 100}%.0f%% over its trailing history $t%.1f s " +
            f"($over%d rows individually >1.25x) after $rerunCount%d re-run(s) - " +
            "this window is uniformly slow; per-row deltas are not real")
        (verdict,
          f"""{"fresh_shared":$f%.2f,"trailing_shared":$t%.2f,"ratio":$ratio%.3f,"rows_over_1p25":$over,"reruns":$rerunCount,"verdict":"$verdict"}""")
      case None => ("ok", s"""{"reruns":$rerunCount,"verdict":"insufficient-history"}""")
    }
    val budgetJson = {
      val deg = degraded.map("\"" + _ + "\"").mkString("[", ",", "]")
      f"""{"limit":${budget}%.0f,"elapsed":${elapsed}%.1f,"rewindow_skipped":$rewindowSkipped,"warmup_truncated":$warmupTruncated,"degraded":$deg}"""
    }
    val tiersJson = {
      val fullN = all.keys.count(isFullTier)
      val esc = escalated.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"full":$fullN,"stable":${all.size - fullN},"escalated":$esc}"""
    }
    val json = s"""{"metric":"total","value":$total,"unit":"sec","totals":$totalsJson,"queries":$qs,"spread":$spread,"passes":$passes,"errors":$errs,"suspect":$suspectJson,"suspect_retries":$suspectRetriesJson,"drift":$driftJson,"tiers":$tiersJson,"budget":$budgetJson,"sf":"$sfDir"}"""
    println(json)
    // the driver parses this ONE stdout line; make sure it is flushed
    // even if the JVM is torn down abruptly after main returns (the r14
    // artifact had rc 0 but no parseable line at the tail)
    System.out.flush()
    // a SPARK_GRAFT_ONLY run is a local probe: never let it overwrite
    // the committed full-suite artifact or pollute the history record
    val partial = only.nonEmpty
    // the driver's artifact pipeline has head-truncated long bench lines
    // (BENCH_r03/r04); keep the complete record in the repo as well
    val defaultOut =
      if (partial) s"$repoRoot/target/BENCH_PARTIAL.json" else s"$repoRoot/BENCH_FULL.json"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", {
      // overwrite refusal (r12 verdict task 2): a still-drifted window
      // must not replace a clean committed BENCH_FULL — it lands in the
      // side file, the clean record stays, and the round close carries
      // an "ok"-verdict artifact or a loudly-named cause
      val existing = try {
        val p = java.nio.file.Paths.get(defaultOut)
        if (!partial && java.nio.file.Files.exists(p))
          Some(java.nio.file.Files.readString(p))
        else None
      } catch { case _: Exception => None }
      if (refuseOverwrite(existing, verdict)) {
        Console.err.println(s"[bench] REFUSING to overwrite the ok-verdict $defaultOut " +
          "with a drifted window - writing BENCH_FULL_DRIFTED.json instead")
        s"$repoRoot/BENCH_FULL_DRIFTED.json"
      } else defaultOut
    })
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Exception =>
      Console.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    // append-only history so every run stays machine-comparable across
    // rounds even when the driver's per-round tail capture truncates
    if (!partial) try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$repoRoot/BENCH_HISTORY.jsonl"),
      json + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    catch { case e: Exception =>
      Console.err.println(s"[bench] could not append history: ${e.getMessage}") }
    // fixture janitor: drop run-scoped demo tables + tmp dirs so
    // repeated bench runs leave tmpdir/spark-warehouse flat
    graft.util.Fixtures.sweep(spark)
    spark.stop()
  }
}
