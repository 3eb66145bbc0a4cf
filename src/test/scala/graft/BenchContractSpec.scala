package graft

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

/** The bench contract line is tail-parsed by the driver from a 2000-char
  * stdout window; rounds 1–5 lost their bench signal to overflow/decoration.
  * This pins, at the CURRENT query-registry size, that the compaction ladder
  * always lands under the window (VERDICT r7 item 8) and that the drop-zeros
  * rung self-describes its omissions (ADVICE r7). No SparkSession needed —
  * the builder is pure.
  */
class BenchContractSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keySet.toSeq.sorted

  test(s"contract line fits the 1980-char budget at the current registry " +
      s"size (${names.size} queries), realistic timing mix") {
    // the real board shape: a heavy tail of ~15 multi-second queries, the
    // rest sub-second — the drop-floor rung must fit while KEEPING every
    // heavy entry's 2-decimal figure (that is the driver's per-query signal)
    val heavy = names.take(15)
    val timings = ListMap(names.map(n =>
      n -> (if (heavy.contains(n)) 8.88 else 0.33)): _*)
    val line = Bench.buildContractLine(timings, totalCpu = 999.99, sfName = "sf0.1")
    assert(line.length <= 1980,
      s"contract line overflows the driver tail window (${line.length} chars) — " +
        "shrink the registry or rework the ladder before adding queries")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(""","sf":"sf0.1"}"""))
    heavy.foreach(n => assert(line.contains("\"" + n + "\":8.88"),
      s"heavy query $n lost its per-query figure:\n$line"))
  }

  test("pathological all-heavy board sheds entries rather than overflowing") {
    // every query ≥ the floor start: the floor must escalate past the
    // timings and land on a fitting (possibly empty-map) self-described line
    val timings = ListMap(names.map(_ -> 88.88): _*)
    val line = Bench.buildContractLine(timings, totalCpu = 999.99, sfName = "sf0.1")
    assert(line.length <= 1980, s"ladder failed to terminate under budget:\n$line")
    assert(line.contains(""""queries_omitted":"""))
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(total - timings.values.sum) < 0.01)
  }

  test("drop-zeros rung declares its omissions instead of silently shrinking the map") {
    // force the ladder exactly to the first drop rung: the full 190-entry
    // map can never render under budget, but the 40 above-floor entries fit
    // comfortably once the 150 sub-0.5 s entries drop
    val many = (1 to 190).map(i => f"synthetic_query_name_$i%03d")
    val small = many.take(150).toSet
    val timings = ListMap(many.map(n => n -> (if (small(n)) 0.12 else 3.21)): _*)
    val line = Bench.buildContractLine(timings, totalCpu = 10.0, sfName = "sfX")
    assert(line.contains(s""""queries_omitted":${small.size}"""),
      s"omission marker missing or wrong:\n$line")
    // VERDICT r8 item 7: the dropped entries' mass is itself declared, so a
    // consumer can bound the invisible seconds from this line alone
    val omittedSec =
      """"omitted_sec":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(omittedSec - small.size * 0.12) < 0.01,
      s"omitted_sec should equal the dropped entries' sum:\n$line")
    // the total still covers ALL queries, dropped ones included
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(total - timings.values.sum) < 0.01)
    // and no sub-floor entry survives in the rendered map
    assert(!line.contains("synthetic_query_name_001"))
    assert(line.contains("synthetic_query_name_151"))
  }

  test("full-map renderings carry no omission marker") {
    val line = Bench.buildContractLine(
      ListMap("a" -> 1.0, "b" -> 0.1), totalCpu = 1.0, sfName = "sfX")
    assert(!line.contains("queries_omitted"))
    assert(!line.contains("omitted_sec"))
    assert(line.contains(""""b":0.1"""))
  }

  test("synthetic contention: retry policy selects exactly the descheduled heavies") {
    // VERDICT r8 item 2 — the retry trigger must fire on the r8 signature
    // (run_sec ≫ cpu_sec) and ONLY there. Board: one genuinely expensive
    // query (cpu-bound: run ≈ cpu), two descheduled heavies, one descheduled
    // but sub-second query (can't move a 2× verdict — excluded), one with no
    // task metrics at all (run_sec 0 — no descheduling EVIDENCE, no retry:
    // the policy re-measures only on positive signature, never on absence).
    val timings = ListMap(
      "cpu_bound_heavy" -> 20.0,
      "descheduled_big" -> 70.0,
      "descheduled_mid" -> 9.0,
      "descheduled_tiny" -> 0.4,
      "no_metrics_heavy" -> 5.0)
    val cpu = Map(
      "cpu_bound_heavy" -> 600.0, // 32 cores on-CPU: honest plan cost
      "descheduled_big" -> 50.0,
      "descheduled_mid" -> 8.0,
      "descheduled_tiny" -> 0.1)
    val run = Map(
      "cpu_bound_heavy" -> 620.0, // ratio ≈ 1 — not a suspect
      "descheduled_big" -> 500.0, // ratio 10 — suspect
      "descheduled_mid" -> 40.0, // ratio 5 — suspect
      "descheduled_tiny" -> 2.0) // ratio 20 but sub-second — excluded
    val suspects = Bench.contentionSuspects(timings, cpu, run)
    assert(suspects === Seq("descheduled_big", "descheduled_mid"),
      "suspects must be the descheduled multi-second queries, largest first")
  }

  test("synthetic contention: a quiet board yields no suspects") {
    // quiet run/cpu sits at 1.0–1.25 (scheduling skew); the 1.3 threshold
    // (r13 recalibration) must not fire there
    val timings = ListMap("a" -> 10.0, "b" -> 2.0)
    val cpu = Map("a" -> 200.0, "b" -> 30.0)
    val run = Map("a" -> 250.0, "b" -> 36.0)
    assert(Bench.contentionSuspects(timings, cpu, run).isEmpty)
  }

  test("rows under RetryMinSec are never fork-retried even at huge desched " +
      "ratios (min-of-two already filtered them in-child; r16 floor 1.2 — " +
      "the lighter board makes 1–2 s contaminated rows verdict-moving)") {
    val timings = ListMap("tiny" -> 1.1)
    assert(Bench.contentionSuspects(timings,
      Map("tiny" -> 0.1), Map("tiny" -> 50.0)).isEmpty)
    // ...and just above the floor the same signature IS a suspect
    val justOver = ListMap("small" -> 1.3)
    assert(Bench.contentionSuspects(justOver,
      Map("small" -> 0.1), Map("small" -> 50.0)) === Seq("small"))
  }

  test("heavyGroups partitions heavyQueries exactly — no heavy query can " +
      "silently land in a light batch or be double-measured") {
    val grouped = SparkEntry.heavyGroups.flatten
    assert(grouped.distinct.size === grouped.size,
      s"duplicate entries across heavyGroups: ${grouped.diff(grouped.distinct)}")
    assert(grouped.toSet === SparkEntry.heavyQueries,
      "heavyGroups and heavyQueries diverge: " +
        s"missing=${SparkEntry.heavyQueries -- grouped} " +
        s"extra=${grouped.toSet -- SparkEntry.heavyQueries}")
    // every group member must be a real registry key
    assert(grouped.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  test("midweightBatchQueries ⊆ registry and disjoint from heavyQueries " +
      "(r16 two-tier batch confs: a name drifting out of the registry or " +
      "into the heavy set would silently change its measurement conf)") {
    val mid = SparkEntry.midweightBatchQueries
    assert(mid.subsetOf(SparkEntry.queries.keySet),
      s"unknown names: ${mid -- SparkEntry.queries.keySet}")
    assert((mid & SparkEntry.heavyQueries).isEmpty,
      s"heavy queries are conf'd by their family, not the batch tiers: " +
        s"${mid & SparkEntry.heavyQueries}")
  }

  test("retry cap bounds the added wall: at most RetryMaxQueries, largest first") {
    val timings = ListMap((1 to 20).map(i => f"q$i%02d" -> i.toDouble): _*)
    val cpu = timings.map { case (k, _) => k -> 1.0 }
    val run = timings.map { case (k, _) => k -> 100.0 } // all suspect
    val suspects = Bench.contentionSuspects(timings, cpu, run)
    assert(suspects.size === Bench.RetryMaxQueries)
    assert(suspects.head === "q20")
    assert(suspects === suspects.sortBy(n => -timings(n)))
  }

  test("gate-trip diagnosis classifies window contention vs plan regression " +
      "from per-sf cpu/job bands (r15, bands keyed by sf in r16)") {
    // identical work, inflated wall: the r12 failure shape — contended
    // window (r16 quiet bands, see gateBands: Σcpu ≤ 170 × 1.25,
    // jobs ≤ 335 × 1.05)
    val noisy = Bench.gateDiagnosisJson(total = 110.0, anchor = 50.91,
      totalCpu = 160.0, jobsTotal = 320L, sfName = "sf0.1")
      .getOrElse(fail("sf0.1 must have diagnosis bands"))
    assert(noisy.contains("\"verdict\":\"contended-window\""))
    assert(noisy.contains("\"gate_sec\":101.82"))
    // the work itself moved: double the cpu — a real regression suspect
    val regressed = Bench.gateDiagnosisJson(total = 110.0, anchor = 50.91,
      totalCpu = 460.0, jobsTotal = 320L, sfName = "sf0.1")
      .getOrElse(fail("sf0.1 must have diagnosis bands"))
    assert(regressed.contains("\"verdict\":\"regression-suspect\""))
    // plan shape moved: job-count blowup flags even at in-band cpu
    val replanned = Bench.gateDiagnosisJson(total = 110.0, anchor = 50.91,
      totalCpu = 160.0, jobsTotal = 1200L, sfName = "sf0.1")
      .getOrElse(fail("sf0.1 must have diagnosis bands"))
    assert(replanned.contains("\"verdict\":\"regression-suspect\""))
    // an sf with no calibrated bands gets NO diagnosis, not a wrong one
    // (ADVICE r15: the old global constants would have classified any
    // other scale factor against sf0.1's bands)
    assert(Bench.gateDiagnosisJson(total = 110.0, anchor = 50.91,
      totalCpu = 160.0, jobsTotal = 320L, sfName = "sf1.0").isEmpty)
    // the line is valid single-line JSON (the driver tail is line-oriented)
    assert(!noisy.contains("\n"))
  }

  test("forced trip: the contract line stays the LAST builder-controlled " +
      "line and the detail line stays FIRST, diagnosis between (VERDICT " +
      "r15 item 5 / ADVICE r15 line-order)") {
    val detail = """{"bench_detail":{}}"""
    val contract = """{"metric":"total","value":1.0}"""
    val tripped = Bench.artifactLines(detail,
      Bench.gateDiagnosisJson(110.0, 50.91, 160.0, 320L, "sf0.1"), contract)
    assert(tripped.head === detail)
    assert(tripped.last === contract,
      "a tripped gate must not displace the contract from the last " +
        "builder-controlled stdout line")
    assert(tripped.size === 3 &&
      tripped(1).contains("\"gate_diagnosis\""))
    // green boards carry no diagnosis line at all
    assert(Bench.artifactLines(detail, None, contract) ===
      Seq(detail, contract))
  }

  test("contract line carries the gate verdict when one is evaluated " +
      "(r17, VERDICT r16 item 2) and omits it otherwise") {
    val timings = ListMap("a" -> 1.0, "b" -> 0.1)
    val ok = Bench.buildContractLine(timings, 1.0, "sf0.1", Some("ok"))
    assert(ok.endsWith(""","sf":"sf0.1","gate":"ok"}"""))
    val trip = Bench.buildContractLine(timings, 1.0, "sf0.1",
      Some("tripped:contended-window"))
    assert(trip.endsWith(""","gate":"tripped:contended-window"}"""))
    // no gate evaluated (subset/noop boards) → no field, old shape exactly
    assert(Bench.buildContractLine(timings, 1.0, "sf0.1")
      .endsWith(""","sf":"sf0.1"}"""))
  }

  test("board-level retry fires exactly on a contended-window trip " +
      "(r17, VERDICT r16 item 1): in-band work over the gate retries; " +
      "moved work (regression-suspect) and green boards never do") {
    // in-band cpu/jobs, wall over 2x anchor → the co-tenant draw decides
    // the wall; re-measuring is the honest estimator
    assert(Bench.shouldRetryBoard(total = 110.0, anchor = 50.91,
      totalCpu = 160.0, jobsTotal = 320L, sfName = "sf0.1"))
    // the work itself moved → re-measuring cannot un-move it; ship the red
    assert(!Bench.shouldRetryBoard(110.0, 50.91, 460.0, 320L, "sf0.1"))
    assert(!Bench.shouldRetryBoard(110.0, 50.91, 160.0, 1200L, "sf0.1"))
    // under the gate → nothing to retry
    assert(!Bench.shouldRetryBoard(90.0, 50.91, 160.0, 320L, "sf0.1"))
    // no calibrated bands → no contended-window evidence → no retry
    assert(!Bench.shouldRetryBoard(110.0, 50.91, 160.0, 320L, "sf1.0"))
  }

  test("forced trip end-to-end: a tripped board exits 0 with the gate " +
      "verdict in a valid LAST-line contract, and the contended-window " +
      "board retry books the min of two timed passes " +
      "(r17, VERDICT r16 items 1+2)") {
    // fork a REAL Bench main over two trivial queries at sf0.001 with the
    // rehearsal knobs: an impossible anchor forces the trip, wide-open
    // bands force the contended-window classification, so the board-level
    // retry must fire (a second timed pass) and the artifact must carry
    // both totals while the process still exits 0 with the contract line
    // LAST on stdout — the exact surface the driver tail-parses.
    import java.nio.file.{Files, Paths}
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments
    val cmd = new java.util.ArrayList[String]()
    cmd.add(javaBin)
    jvmArgs.forEach(a => cmd.add(a))
    cmd.add("-cp"); cmd.add(sys.props("java.class.path"))
    cmd.add("graft.Bench")
    cmd.add("join_semi_customers"); cmd.add("regional_revenue")
    val outFile = Files.createTempFile(Paths.get("target"), "bench-trip-", ".out")
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    pb.environment().put("GRAFT_TEST_ANCHOR_SEC", "0.001")
    pb.environment().put("GRAFT_TEST_GATE_BANDS", "100000,1000000")
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    pb.redirectOutput(outFile.toFile)
    val p = pb.start()
    assert(p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
      { p.destroyForcibly(); "forced-trip bench run timed out" })
    val out = Files.readString(outFile)
    Files.deleteIfExists(outFile)
    assert(p.exitValue() === 0,
      s"a tripped gate must exit 0 since r17 (the driver applies its own " +
        s"2x check from the parsed total); output:\n$out")
    val lines = out.linesIterator.toSeq.filter(_.nonEmpty)
    val last = lines.last
    assert(last.startsWith("""{"metric":"total","value":"""),
      s"LAST stdout line must be the contract, got:\n$last")
    assert(last.contains(""""gate":"tripped:contended-window""""),
      s"contract must carry the gate verdict:\n$last")
    // the board retry ran: both timed-phase totals in the detail line, and
    // the booked contract total equals the smaller of the two
    val detail = lines.find(_.contains("\"bench_detail\"")).getOrElse(
      fail(s"no detail line in:\n$out"))
    def num(line: String, key: String): Double =
      (s""""$key":([0-9.]+)""").r.findFirstMatchIn(line)
        .getOrElse(fail(s"$key missing in:\n$line")).group(1).toDouble
    val ft = num(detail, "first_total")
    val rt = num(detail, "retry_total")
    val booked = num(last, "value")
    assert(math.abs(booked - math.min(ft, rt)) < 0.05,
      s"booked total $booked must be the min of first_total $ft / retry_total $rt")
    // the diagnosis line rides between detail and contract
    assert(lines.exists(_.contains("\"gate_diagnosis\"")),
      s"tripped board must ship its diagnosis:\n$out")
  }

  test("integration: child warmup is measured and reported separately; the " +
      "first query's timed wall is not JVM-cold (VERDICT r9 item 5)") {
    // one real child JVM over two cheap queries at the smallest SF: the
    // child must emit a session_sec marker plus per-query warm_sec, and the
    // FIRST query's timed run — previously the silent dump for codegen/JIT
    // cold cost — must land near its own task time
    // up to two forked attempts: the bound is about warm-up ATTRIBUTION, so
    // one clean attempt proves it; a co-tenant load wave during a single
    // fork must not fail the suite (r10: observed once in a full-suite run
    // whose host load never dropped below ~2.7)
    def attempt() = {
      val (res, sessionSec) = Bench.forkQueries(
        Seq("join_semi_customers", "regional_revenue"),
        extraEnv = Map("SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001"))
      assert(sessionSec > 0.0, "child must report its session spin-up wall")
      val first = res("join_semi_customers").toOption
        .getOrElse(fail(s"first query failed: ${res("join_semi_customers")}"))
      val second = res("regional_revenue").toOption
        .getOrElse(fail(s"second query failed: ${res("regional_revenue")}"))
      assert(first.warmSec > 0.0,
        "the child's first query keeps one warm-up (JIT absorb) and must report it")
      assert(second.warmSec == 0.0,
        "later queries skip the untimed warm-up since r13 — min-of-two books " +
          "the steady second run; a nonzero warm here means the r13 wall " +
          "saving silently regressed")
      first
    }
    // the double warm-up absorbs JIT debt: the timed wall must be within
    // 2x of summed task time or under an absolute scheduling floor (tiny-SF
    // jobs are driver-overhead-bound; 1.0 s — a full-suite run carries
    // in-JVM GC/JIT pressure from the preceding suites that neither task
    // counters nor loadavg surface, observed pushing a 0.08 s-of-tasks
    // query to 0.87 s wall); skip the bound when the host itself is
    // descheduling tasks — either visibly (task run >> cpu) or on the
    // DRIVER side, which task counters can't see (loadavg as the tiebreak).
    // A single clean attempt proves the bound (1-of-1). But once retries
    // happen, a MAJORITY of attempts must pass (ADVICE r10: "any single
    // passing attempt satisfies" made three rolls of the dice out of one
    // regression check), and every attempt's numbers are logged so a
    // flaky-but-passing run stays visible in the test output.
    def judge() = {
      val first = attempt()
      val quietTasks = first.runSec <= 2.0 * math.max(first.cpuSec, 1e-3)
      val boundOk = first.sec <= math.max(2.0 * first.runSec, 1.0)
      info(f"attempt: sec=${first.sec}%.3f run=${first.runSec}%.3f " +
        f"cpu=${first.cpuSec}%.3f quietTasks=$quietTasks boundOk=$boundOk")
      (first, quietTasks, boundOk)
    }
    def passed(v: (Bench.Meas, Boolean, Boolean)): Boolean =
      v match { case (_, quiet, ok) => ok || !quiet }
    var verdicts = Vector(judge())
    if (!passed(verdicts.head)) // first attempt failed → run the full panel
      verdicts = verdicts ++ Vector(judge(), judge())
    if (verdicts.count(passed) * 2 <= verdicts.size) {
      val load = scala.util.Try(
        scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble)
        .getOrElse(0.0)
      val (first, _, _) = verdicts.last
      if (load > 4.0)
        info(s"bound missed on both attempts but host 1-min load is $load; " +
          s"driver-side descheduling, bound skipped (sec ${first.sec}, run ${first.runSec})")
      else
        fail(s"first query's timed wall ${first.sec}s is far above its task time " +
          s"${first.runSec}s on a quiet host (load $load) — child warm-up is " +
          "leaking into the timed window")
    }
  }
}
