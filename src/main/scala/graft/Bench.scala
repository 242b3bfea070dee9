package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same pinned-UTC convention as Verify/SparkSpec: the stream
      // path's NTZ→instant cast depends on it
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // best-effort: a warmup failure must never cost the bench run
    // (but a fatal JVM error must still kill it — Harness policy)
    try Warmup.run(spark) catch { case NonFatal(_) => }
    // Table-cache pre-materialization, timed OUTSIDE the per-query
    // readings: Tables.t caches the shared base tables, and the
    // one-time cache materialization (~2.5 s for lineitem at sf0.1)
    // was being charged to whichever key alphabetically FIRST touched
    // each table — r15 recorded agg_approx_distinct at 2.91 s whose
    // key body is 0.16 s warm (BenchOne, VERDICT r15 #3). Suite-level
    // amortized cost belongs to the suite, not a random key; the time
    // is still reported (cache_warm_sec in the contract line) so the
    // run stays auditable end to end.
    val cacheWarmSec = {
      val t0 = System.nanoTime()
      Tables.names.foreach { n =>
        try Tables.t(spark, sfDir, n).count() catch { case NonFatal(_) => }
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Machine-speed calibration: a fixed synthetic Spark job (range →
    // project → shuffle agg) that touches the same machinery the
    // measured queries do (task scheduling, codegen'd eval, one
    // exchange) but none of the test data. The bench host was OBSERVED
    // (r10, r11) oscillating between fast and ~10x-slow phases on
    // identical binaries and an otherwise idle machine
    // (llm_dedup_clusters warm: 6.5 s at 23:02, 92.7 s at 23:28, 9.3 s
    // at 23:35 the same night; BENCH_r11's cal_start was 9.03 s vs a
    // healthy 0.5-1.5 s with cal_end back at 0.73 s). Endpoint
    // calibrations alone CANNOT bracket mid-run phase flips (r10:
    // healthy endpoints around a 10.8x-slow middle), so a cheap probe
    // now runs BEFORE EVERY MEASURED QUERY and each query is
    // normalized by its own probe.
    def calSpark(range: Long): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, range, 1L, 32)
        .selectExpr("id % 97 AS k", "id * 2654435761L AS v")
        .groupBy("k").sum("v").count()
      (System.nanoTime() - t0) / 1e9
    }
    // endpoint probes keep the r10/r11-comparable 100M reading;
    // per-query probes use 1/10 the range. MEASURED r12: the quick
    // probe is job-overhead-dominated (32 tasks + one exchange ≈
    // 0.30-0.66 s warm on a healthy phase where the 100M probe read
    // 0.39-0.56 s) — which is the right probe shape, because the
    // documented slow phase hits exactly that threaded scheduling /
    // shuffle overhead (~30% kernel time), not raw arithmetic. The
    // probes are OUTSIDE every query's measured time and outside
    // `value`.
    def calFull(): Double = calSpark(100000000L)
    def calQuick(): Double = calSpark(10000000L)
    // healthy-phase MEDIAN of the quick probe on the bench host,
    // measured r12 over the 124 in-suite probes of a healthy run
    // (min 0.302 / median ~0.39 / max 0.664). Normalization only ever
    // discounts slowness (min with 1): on a healthy phase
    // value_cal_norm ≈ value; in the observed ~10x-slow phase the
    // probe reads ~3-5 s and that query counts ~1/10 its raw reading.
    val calHealthyQuick = 0.40
    // Cumulative JVM GC milliseconds: a stall INSIDE a measured query
    // (GC pause, or a host phase shorter than the probe spacing) is
    // invisible to the probe brackets by construction — both probes
    // read healthy around a 10x reading (observed r12:
    // llm_dedup_exact_text 16.0 s in-suite vs 0.4 s isolated, brackets
    // 0.32-0.78 s). Attributing per-query GC time separates "the plan
    // is slow" from "the JVM stopped the world" in the artifact itself.
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    calFull(); calQuick() // compile/JIT both probe plans outside the readings
    case class R(name: String, sec: Double, cal: Double, gcSec: Double,
                 failed: Boolean)
    def timed(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): R = {
      val cal = calQuick()
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val failed =
        try { fn(spark, sfDir).count(); false }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          // fatal JVM error: every reading after this point would come
          // from a corrupted JVM — abort the run instead of reporting
          // one "failed key" and 100 plausible-looking numbers
          if (!NonFatal(e)) throw e
          true
        }
      val sec = if (failed) -1.0 else (System.nanoTime() - t0) / 1e9
      R(name, sec, cal, (gcMillis() - gc0) / 1e3, failed)
    }
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def mapJson(entries: Iterable[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // Last-round per-key readings (the slowest-keys map the driver
    // stored in the newest BENCH_r*.json, cwd = repo root under the
    // driver): a key reading ≥2× its own last-round time is a stall
    // suspect even when its absolute time is under the 3 s floor —
    // r15's absolute-ranked budget re-measured two big keys but
    // missed agg_grouping_sets at 2.4× its untouched-code r14 reading
    // (VERDICT r15 #4). The stored map keeps only the slowest ~40
    // keys; absent keys fall back to the absolute criterion. The
    // per-key GC twin is subtracted on BOTH sides of the ratio
    // (ADVICE r16; see BenchPolicy.ratioVsLast).
    val (lastRound, lastGc): (Map[String, Double], Map[String, Double]) = try {
      Option(new java.io.File(".").listFiles()).toSeq.flatten
        .filter(_.getName.matches("BENCH_r\\d+\\.json"))
        .sortBy(_.getName).lastOption.map { f =>
          val txt = new String(
            java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          (BenchPolicy.parseMap(txt, "queries"), BenchPolicy.parseMap(txt, "gc"))
        }.getOrElse((Map.empty[String, Double], Map.empty[String, Double]))
    } catch { case NonFatal(_) => (Map.empty[String, Double], Map.empty[String, Double]) }

    // ---- Pre-flight host-health gate (VERDICT r18 #1) ----
    // Two consecutive rounds shipped a host_degraded:true artifact
    // while the healthy evidence hid in SURVEY prose: the bench only
    // FLAGGED degradation after the fact. Now it refuses to start
    // measuring into a known-slow phase: probe first, and if the
    // probe is already ≥2× healthy, wait-and-reprobe (bounded) until
    // the phase flips back. Documented phase flips last minutes, not
    // hours (r10: slow at 23:28, healthy at 23:35), so a few bounded
    // waits buy a healthy start at the cost of idle wall-clock that
    // was never part of any measured number.
    val gateAttempts = sys.env.getOrElse("SPARK_GRAFT_BENCH_GATE_ATTEMPTS", "5").toInt
    val gateWaitSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_GATE_WAIT_SEC", "90").toInt
    var gateWaitedSec = 0.0
    def preflightGate(): Double = {
      var attempt = 0
      var probe = calQuick()
      while (!BenchPolicy.gateHealthy(probe, calHealthyQuick)
          && attempt < gateAttempts - 1) {
        attempt += 1
        System.err.println(f"[bench] pre-flight probe $probe%.3f s >= 2x healthy " +
          s"($calHealthyQuick) — waiting ${gateWaitSec}s (attempt $attempt/${gateAttempts - 1})")
        Thread.sleep(gateWaitSec * 1000L)
        gateWaitedSec += gateWaitSec
        probe = calQuick()
      }
      probe
    }

    case class Suite(results: Seq[R], calStart: Double, calQuickFinal: Double,
                     retried: Map[String, Double], calEnd: Double,
                     hostDegraded: Boolean) {
      def calMax: Double = (results.map(_.cal) :+ calQuickFinal).max
    }

    def runSuite(): Suite = {
      val calStart = calFull()
      // SORTED iteration: Map order is hash-bucket order, so first-touch
      // costs (table cache materialization, residual JIT) landed on a
      // different key each build — r7→r8 showed ±6 s single-query swings
      // on byte-identical code. Alphabetical order pins attribution so
      // per-query numbers are comparable round over round.
      // A crashed query is NOT a timing: BENCH_r13 recorded 15
      // time-to-exception readings as if the queries ran (the events
      // encoding regression), poisoning the round total. Per
      // BASELINE.md's contract a failure is reported as the -1 marker,
      // excluded from every total, and named in a "failed" list.
      // A fatal JVM error mid-suite (timed rethrows it) must not erase
      // the readings already taken: flush the partial per-query map
      // before propagating, mirroring Verify's finally-flush (Harness
      // policy) — an aborted run with 119 good readings is auditable,
      // an empty stdout is not.
      val resultsBuf = scala.collection.mutable.ArrayBuffer.empty[R]
      try SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        resultsBuf += timed(name, fn)
      } catch { case e: Throwable =>
        if (!NonFatal(e))
          println(s"""{"metric":"queries_partial","queries":${mapJson(resultsBuf.map(r => (r.name, r.sec)))},"sf":"$sfDir"}""")
        throw e
      }
      val results = resultsBuf.toSeq
      // The last query's closing probe bracket must be taken BEFORE the
      // retry pass: 20+ s of retry work in between would let a phase
      // flip the last query never saw leak into its normalization.
      val calQuickFinal = calQuick()
      // emit the two full per-query maps NOW, before the retry pass: a
      // fatal error during a retry (timed rethrows) must not take the
      // suite's readings down with it. On a rerun these lines are
      // emitted again — the driver parses the LAST occurrence in its
      // tail window, so later (chosen-run) lines supersede.
      val cals = results.map(r => (r.name, r.cal))
      println(s"""{"metric":"queries","queries":${mapJson(results.map(r => (r.name, r.sec)))},"sf":"$sfDir"}""")
      println(s"""{"metric":"query_cals","cal_healthy_quick_sec":$calHealthyQuick,"cal_quick_final_sec":${fmt(calQuickFinal)},"cals":${mapJson(cals)},"sf":"$sfDir"}""")
      // Degraded-host self-diagnosis (VERDICT r16 #4): BENCH_r16's
      // in-suite probes spanned 0.27-1.76 s against the 0.4 s healthy
      // constant, every key carried a 0.3-1.0 s uniform inflation, and
      // the ≥3 s retry floor exempted 14 of the 15 largest apparent
      // regressions — a polluted artifact masqueraded as a regression.
      // When any probe exceeds 2× healthy the run flags itself
      // (host_degraded in the contract line) and the retry thresholds
      // drop (ratio 2.0→1.5, absolute entry 0.8→0.4 s) so uniform
      // small inflation gets re-measured instead of exempted.
      val hostDegraded =
        BenchPolicy.hostDegraded(cals.map(_._2) :+ calQuickFinal, calHealthyQuick)
      // Stall-free retry pass: a query whose reading stays large even
      // after subtracting its own attributable GC (a mostly-GC reading
      // is already explained by the query_gc map) is re-run ONCE. The
      // retry is WARM (the dedup caches are materialized), so
      // min(first, retry) is a lower bound on cold suite time —
      // value_stallfree is the "no transient stall" reading, emitted
      // ALONGSIDE the raw total (never replacing it). The pass is
      // capped by RETRY-TIME BUDGET, not by count: r14's count-of-5
      // cap left its 6th outlier unexplained while the five bigger
      // readings consumed every slot (VERDICT r14 #1). Ranked by
      // regression ratio vs last round (BenchPolicy.retryOrder).
      val retryBudgetSec = 60.0
      def toReading(r: R) = BenchPolicy.Reading(r.name, r.sec, r.gcSec, r.failed)
      val retried = {
        val out = scala.collection.mutable.Map.empty[String, Double]
        var spent = 0.0
        BenchPolicy.retryOrder(results.map(toReading), lastRound, lastGc, hostDegraded)
          .foreach { candidate =>
            if (spent < retryBudgetSec) {
              val t0 = System.nanoTime()
              val rr = timed(candidate.name, SparkEntry.queries(candidate.name))
              spent += (System.nanoTime() - t0) / 1e9
              if (!rr.failed) out(candidate.name) = rr.sec
            }
          }
        out.toMap
      }
      val calEnd = calFull()
      Suite(results, calStart, calQuickFinal, retried, calEnd, hostDegraded)
    }

    preflightGate()
    val first = runSuite()
    // ---- Degraded-run auto-rerun (VERDICT r18 #1) ----
    // The pre-flight gate cannot see a phase flip that starts MID-run.
    // If the suite still self-diagnosed degraded, gate again (wait out
    // the slow phase) and re-measure the whole suite once, publishing
    // whichever run is healthier (BenchPolicy.pickFirst). The rerun is
    // WARM (caches + JIT hot), so a warm healthy rerun can under-read
    // a cold suite slightly — the runs/picked_run fields keep that
    // auditable, and a warm healthy number still beats a 2-10x
    // host-polluted one for the 2x gate this artifact feeds.
    val maxReruns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUNS", "1").toInt
    var chosen = first
    var runs = 1
    var pickedRun = 1
    while (chosen.hostDegraded && runs <= maxReruns) {
      System.err.println(s"[bench] run self-diagnosed host_degraded — gating then re-running (${runs}/$maxReruns)")
      preflightGate()
      val next = runSuite()
      runs += 1
      if (!BenchPolicy.pickFirst(chosen.hostDegraded, chosen.calMax,
          next.hostDegraded, next.calMax)) { chosen = next; pickedRun = runs }
    }
    val results = chosen.results
    val retried = chosen.retried
    // on a rerun the last-emitted per-query maps are the LAST run's;
    // if an earlier run was picked, re-emit the chosen run's maps so
    // the driver's last-occurrence parse matches the contract line
    if (runs > 1 && pickedRun < runs) {
      println(s"""{"metric":"queries","queries":${mapJson(results.map(r => (r.name, r.sec)))},"sf":"$sfDir"}""")
      println(s"""{"metric":"query_cals","cal_healthy_quick_sec":$calHealthyQuick,"cal_quick_final_sec":${fmt(chosen.calQuickFinal)},"cals":${mapJson(results.map(r => (r.name, r.cal)))},"sf":"$sfDir"}""")
    }
    val ok = results.filter(!_.failed)
    val failedNames = results.filter(_.failed).map(_.name)
    val total = ok.map(_.sec).sum
    // per-query host-normalized time: scale by the query's own probe
    // BRACKET vs the healthy constant, never upward. Each query is
    // bracketed by its pre-probe and the NEXT query's pre-probe (the
    // last by one extra probe) and normalized by the slower of the
    // two: a phase flip DURING a query (observed: a 0.40 s pre-probe
    // followed by a 58 s reading and a 1.2 s next probe) is caught by
    // the closing bracket, at zero extra probe cost. A query on a
    // healthy host counts as measured; a 10x-slow phase counts ~1/10.
    // Known one-sided error: a genuine engine regression in query i
    // followed by a phase flip BETWEEN i and probe i+1 gets discounted
    // too — the normalized total can under-read but the raw total and
    // per-query maps are always emitted alongside for exactly this
    // audit.
    def norm(raw: Double, cal: Double): Double =
      raw * math.min(1.0, calHealthyQuick / math.max(cal, 1e-9))
    val totalNorm = results.zipWithIndex.map { case (r, i) =>
      val calClose = if (i + 1 < results.length) results(i + 1).cal else chosen.calQuickFinal
      if (r.failed) 0.0 else norm(r.sec, math.max(r.cal, calClose))
    }.sum
    val totalStallfree = ok
      .map(r => math.min(r.sec, retried.getOrElse(r.name, r.sec))).sum
    val gcTotal = results.map(_.gcSec).sum
    // The driver keeps only the LAST ~2000 chars of stdout and parses
    // the final JSON line. The full per-query map and probe map were
    // already emitted per-suite (fatal-flush ordering); what remains
    // is the gc/retries line and the contract line LAST, whose
    // embedded queries map is capped to the slowest entries so the
    // whole line always fits inside the tail window untruncated.
    println(s"""{"metric":"query_gc","gc_total_sec":${fmt(gcTotal)},"gc":${mapJson(results.filter(_.gcSec >= 0.05).map(r => (r.name, r.gcSec)))},"retries":${mapJson(retried)},"sf":"$sfDir"}""")
    // failed queries keep their -1 marker in the map; the "_other"
    // remainder sums only real readings (a -1 must never shrink it)
    val bySlowest = results.map(r => (r.name, r.sec)).sortBy(-_._2)
    val failedJson = failedNames.take(20).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val budget = 1700 // chars for the final line, < tail window minus sbt epilogue
    var keep = bySlowest.length
    def finalLine(k: Int): String = {
      val kept = bySlowest.take(k)
      val rest = bySlowest.drop(k).map(_._2).filter(_ >= 0).sum
      val entries = if (k < bySlowest.length) kept :+ ("_other" -> rest) else kept
      s"""{"metric":"graft_bench","value":${fmt(total)},"value_cal_norm":${fmt(totalNorm)},"value_stallfree":${fmt(totalStallfree)},"host_degraded":${chosen.hostDegraded},"runs":$runs,"picked_run":$pickedRun,"gate_waited_sec":${fmt(gateWaitedSec)},"gc_total_sec":${fmt(gcTotal)},"cache_warm_sec":${fmt(cacheWarmSec)},"unit":"sec","n":${results.size},"n_failed":${failedNames.size},"failed":$failedJson,"cal_start_sec":${fmt(chosen.calStart)},"cal_end_sec":${fmt(chosen.calEnd)},"cal_quick_min_sec":${fmt(results.map(_.cal).min)},"cal_quick_max_sec":${fmt(chosen.calMax)},"cal_healthy_quick_sec":$calHealthyQuick,"queries":${mapJson(entries)},"sf":"$sfDir"}"""
    }
    while (keep > 1 && finalLine(keep).length > budget) keep -= 1
    println(finalLine(keep))
    spark.stop()
  }
}

/** The bench's stall-retry and host-health policy, extracted pure so
  * the degraded-host behavior is unit-testable (HarnessSpec forces an
  * inflated probe sequence and asserts the flag + the wider retry
  * coverage — VERDICT r16 #4's "forced-degraded unit").
  */
object BenchPolicy {
  /** One measured key, reduced to what retry selection needs. */
  case class Reading(name: String, sec: Double, gcSec: Double, failed: Boolean)

  /** Degraded = any in-run quick probe ≥ 2× the healthy constant.
    * Healthy runs measured min 0.302 / max 0.664 against 0.40 (r12's
    * 124-probe sweep) — comfortably under 2× — while every documented
    * polluted run (r10, r11, r16) had probes at 2.4-22× healthy, so
    * the single-probe trigger separates the two populations with
    * margin on every artifact observed to date. */
  def hostDegraded(cals: Seq[Double], healthy: Double): Boolean =
    cals.exists(_ >= 2.0 * healthy)

  /** Pre-flight gate: start measuring only when the probe is under
    * the SAME 2× threshold hostDegraded flags — a run allowed to
    * start is by definition not born degraded (VERDICT r18 #1). */
  def gateHealthy(probe: Double, healthy: Double): Boolean =
    probe < 2.0 * healthy

  /** Which of two runs to publish: a healthy run always beats a
    * degraded one; between two degraded runs the lower worst-probe
    * (least polluted) wins; between two healthy runs the FIRST (cold,
    * unbiased) wins. Returns true to keep the first run. */
  def pickFirst(firstDegraded: Boolean, firstCalMax: Double,
                secondDegraded: Boolean, secondCalMax: Double): Boolean =
    (firstDegraded, secondDegraded) match {
      case (false, _) => true
      case (true, false) => false
      case (true, true) => firstCalMax <= secondCalMax
    }

  /** Regression ratio with GC subtracted on BOTH sides: the persisted
    * last-round reading includes that round's GC, so correcting only
    * the numerator deflates the ratio exactly when the prior reading
    * was GC-inflated (ADVICE r16). Keys absent from the prior gc map
    * were under its 0.05 s emission floor — treated as 0. */
  def ratioVsLast(r: Reading, lastSec: Map[String, Double],
      lastGc: Map[String, Double]): Option[Double] =
    lastSec.get(r.name)
      .map(s => s - lastGc.getOrElse(r.name, 0.0)).filter(_ >= 0.05)
      .map(prior => (r.sec - r.gcSec) / prior)

  /** Retry when the GC-corrected reading is ≥3 s unexplained, or a
    * ≥2× regression vs last round on a ≥0.8 s key. On a degraded
    * host both regression gates widen (ratio ≥1.5 on ≥0.4 s keys):
    * uniform 0.3-1.0 s inflation sits exactly in the band the healthy
    * thresholds exempt, which is how BENCH_r16 retried only 1 of its
    * 15 largest apparent regressions. */
  def wantRetry(r: Reading, ratio: Option[Double], degraded: Boolean): Boolean =
    !r.failed && {
      val t = r.sec - r.gcSec
      val ratioFloor = if (degraded) 1.5 else 2.0
      val entryFloor = if (degraded) 0.4 else 0.8
      t >= 3.0 || (t >= entryFloor && ratio.exists(_ >= ratioFloor))
    }

  /** The retry queue: candidates ranked by regression ratio (pseudo-
    * ratio unexplained/3 for keys with no prior). The caller walks it
    * under the time budget. */
  def retryOrder(rs: Seq[Reading], lastSec: Map[String, Double],
      lastGc: Map[String, Double], degraded: Boolean): Seq[Reading] = {
    def ratio(r: Reading) = ratioVsLast(r, lastSec, lastGc)
    rs.filter(r => wantRetry(r, ratio(r), degraded))
      .sortBy(r => -ratio(r).getOrElse((r.sec - r.gcSec) / 3.0))
  }

  /** Extract a `"field":{k:v,...}` map from a BENCH_r*.json artifact.
    * Tolerates the tail's escaped quotes (`\"gc\":{...}` inside the
    * stored stdout) as well as the parsed final map's plain quotes;
    * the per-key gc map exists ONLY in escaped tail form. A partial
    * fragment at the tail window's truncation boundary has no intact
    * `"field":{` prefix, so it can never match. */
  def parseMap(txt: String, field: String): Map[String, Double] = {
    val m = java.util.regex.Pattern
      .compile("\\\\?\"" + field + "\\\\?\":\\s*\\{([^}]*)\\}").matcher(txt)
    if (!m.find()) Map.empty
    else {
      val kv = java.util.regex.Pattern
        .compile("\\\\?\"([A-Za-z0-9_]+)\\\\?\":\\s*(-?[0-9.]+)")
        .matcher(m.group(1))
      val out = scala.collection.mutable.Map.empty[String, Double]
      while (kv.find()) out(kv.group(1)) = kv.group(2).toDouble
      out.toMap
    }
  }
}
