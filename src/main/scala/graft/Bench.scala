package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (BENCH_r{N}.json).
  */
object Bench {

  /** Full-materialization action: checksum EVERY output column so Catalyst
    * cannot prune away result-producing work (a bare `count()` lets the
    * optimizer drop final projections — e.g. WKT string synthesis — and
    * under-measure). `bit_xor` keeps the fold overflow-free under ANSI.
    */
  def materialize(df: DataFrame): Unit =
    df.agg(bit_xor(xxhash64(df.columns.map(col).toIndexedSeq: _*))).collect()

  /** Sums task metrics across the whole app; queries run sequentially,
    * so the before/after delta around one pass IS that query's I/O.
    * Shuffle bytes are the scale currency — a headline query whose
    * shuffle grows round-over-round has a plan problem even when its
    * wall-clock hides it in VM noise.
    */
  private final class IoListener extends org.apache.spark.scheduler.SparkListener {
    val input = new java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def snapshot: (Long, Long, Long) =
      (input.get, shuffleRead.get, shuffleWrite.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Parallelism floors for compute-dense-per-byte stages (r20 opt
      // round, measured): the curation/dedup kernels (tokenize + 64-hash
      // MinHash + gram builds) are orders of magnitude more CPU per byte
      // than a relational scan, and BOTH default floors collapsed them to
      // 1-2 tasks at sf0.1 — AQE coalesces post-shuffle partitions down
      // to minPartitionSize (default 1m > the whole shuffled corpus), and
      // FilePartition floors the input split at openCostInBytes (default
      // 4m > the whole parquet file). q147 2.2→1.5 s, q214 2.9→1.9 s,
      // q47 0.9→0.6 s; all 22 plan hashes bit-identical (runtime-only).
      // Scale posture: both floors are inert at cluster scale (any
      // partition over 64 KB / input split over ~4 MB behaves as before);
      // they matter exactly when a heavy kernel sits downstream of a
      // small-byte stage — tiny-SF benches and post-filter tails alike.
      // Env-overridable so the driver's lower-core runs stay comparable.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "131072"))
      // ObjectHashAggregate falls back to SORT-based aggregation past a
      // GROUP-COUNT threshold whose default (128) is pathologically
      // conservative for the flood ensemble aggregations: q60 groups
      // ~8k grid cells whose collect_list buffers total exactly the
      // partition's input bytes either way, but the fallback pays a
      // full per-partition sort + per-group buffer ser/deser (measured:
      // q60 1.84 → 1.00 s at sf0.1). Memory posture at scale: hash-mode
      // object buffers are bounded by the partition's own value bytes —
      // the same bytes the sort buffer would hold — so the group-count
      // cap is the wrong guard for value-accumulating buffers; 64k
      // groups keeps a sane cap for genuinely huge-cardinality keys.
      // SEMANTICS PRECONDITION (r20 advice): hash mode and the sort
      // fallback can feed an object-agg buffer its within-group rows in
      // DIFFERENT orders, and Verify (the oracle-checked session)
      // deliberately omits this floor — so every headline object-agg
      // buffer must be ORDER-INSENSITIVE (current set: collect_list is
      // array_sort'ed downstream in FloodOps, sketch buffers are
      // commutative). Re-checked r21 by a full Verify pass at sf0.01
      // with SPARK_GRAFT_CONF setting this same floor: value-equal.
      // The promotion-time rule lives at queries/Q.scala.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", "65536"))
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    // SPARK_GRAFT_CONF="k=v;k2=v2": extra SQL confs for measurement
    // experiments (A/B of a single runtime conf without recompiling).
    // Values containing ';' are unrepresentable (the separator). A
    // static/non-runtime conf throws from conf.set — log and continue;
    // this is a diagnostics hook and must never kill the bench run.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty =>
          try spark.conf.set(k.trim, v.trim)
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[bench] SPARK_GRAFT_CONF skipped $k: $e")
          }
        case _ => ()
      }
    })
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=q47_kmv_sketch,q60_flood_detailed → time just those
    // (iterating on one query without paying for the whole suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val targets = Registry.headlines
      .filter(q => only.forall(_.contains(q.name)))
    // Warm the OS page cache for the sf dir: a cold VM's first read of the
    // parquet inputs inflated BENCH_r05 by 52% vs a warm re-run. The whole
    // sf0.1 dir is ~17 MB — reading it through is effectively free.
    // best-effort only: a missing/unreadable sf dir must surface as
    // per-query err statuses in the JSON, not kill the run pre-output
    try {
      val buf = new Array[Byte](1 << 20)
      def slurp(f: java.io.File): Unit =
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten.foreach(slurp)
        else {
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      slurp(new java.io.File(sfDir))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] page-cache warm skipped: $e")
    }
    // TWO warm-up passes so JIT/codegen and file listing don't dominate:
    // one pass leaves C2 tiering mid-flight (the r10 driver sidecar still
    // showed pass-1 30-50% above pass-3 after a single warm-up, and the
    // published cold totals ran 40% over the converged number three
    // rounds running). Warm-up failures are tolerated (the timed passes
    // report them). The first pass captures each query's canonicalized
    // plan fingerprint: a timing drift next round is then decidable as
    // noise (same hash) vs plan change (different hash) without a judge
    // re-bench.
    val planHashes = targets.map { q =>
      val h =
        try {
          val df = q.run(spark, sfDir)
          val hash = graft.core.PlanHash.of(df)
          materialize(df)
          hash
        } catch { case scala.util.control.NonFatal(_) => "err" }
      q.name -> h
    }.toMap
    targets.foreach { q =>
      try materialize(q.run(spark, sfDir))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // Quiesce GC once between the warm-up and timed regions (r21): the
    // two warm-up passes execute every query twice and leave a young-gen
    // full of shuffle/codegen debris whose collection otherwise lands in
    // the FIRST timed query's passes (the prime non-cotenant explanation
    // for r20's q01 reading 3.8× its band in the driver's cold run while
    // plan-identical and 1.0 s at 8 cores). Outside every timed region;
    // per-query methodology (N passes, min) is unchanged.
    System.gc()
    Thread.sleep(200)
    // N timed passes per query (consecutive, min reported): one pass cannot
    // defend against co-tenant contention or a cold VM, and a corrupted
    // official record masquerades as a regression every round. The min is
    // the headline number; every pass is emitted for honesty.
    // a malformed SPARK_GRAFT_PASSES must not throw before the JSON line is
    // emitted — fall back to the default and warn on stderr
    val nPasses = sys.env.get("SPARK_GRAFT_PASSES")
      .flatMap { s =>
        val p = scala.util.Try(s.toInt).toOption.filter(_ >= 1)
        if (p.isEmpty)
          System.err.println(s"[bench] ignoring malformed SPARK_GRAFT_PASSES=$s; using 3")
        p
      }
      .getOrElse(3)
    val io = new IoListener
    spark.sparkContext.addSparkListener(io)
    // SPARK_GRAFT_STAGE_DEBUG=1: print every completed stage over ~50 ms
    // to stderr (guide §1 — decide WHERE a slow query spends its time
    // before touching it). Opt-in diagnostics; stdout contract unchanged.
    if (sys.env.contains("SPARK_GRAFT_STAGE_DEBUG"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val si = e.stageInfo
            val ms = (for {
              a <- si.completionTime; b <- si.submissionTime
            } yield a - b).getOrElse(-1L)
            if (ms >= 50)
              System.err.println(
                f"[stage] ${ms / 1000.0}%6.2fs tasks=${si.numTasks}%4d " +
                  s"${si.name.takeWhile(_ != '\n').take(110)}")
          }
        })
    // a failing query must surface as status=err and a nonzero exit,
    // never as a silently-near-zero timing
    val results = targets.map { q =>
      // label the timed jobs (guide §1.5) so stage-debug lines and any
      // UI inspection attribute work to the right query
      spark.sparkContext.setJobDescription(q.name)
      // I/O delta measured around the FIRST timed pass (metrics are
      // deterministic per pass; timings are not)
      val ioBefore = io.snapshot
      val passes = (1 to nPasses).map { _ =>
        val t0 = System.nanoTime()
        val status =
          try { materialize(q.run(spark, sfDir)); "ok" }
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[bench] ${q.name} FAILED: $e")
              "err"
          }
        ((System.nanoTime() - t0) / 1e9, status)
      }
      val ioAfter = io.snapshot
      // averaged over the passes: the listener is async, so a straggling
      // task's metrics may land in the next delta — averaging bounds the
      // error to noise while shuffle volumes differ by orders of magnitude
      val perPass = Seq(
        (ioAfter._1 - ioBefore._1) / nPasses,
        (ioAfter._2 - ioBefore._2) / nPasses,
        (ioAfter._3 - ioBefore._3) / nPasses)
      val status = if (passes.exists(_._2 == "err")) "err" else "ok"
      // the headline min counts only SUCCESSFUL passes — a fast-failing
      // pass must never report as a near-zero timing
      val okTimes = passes.collect { case (t, "ok") => t }
      val headline =
        if (okTimes.nonEmpty) okTimes.min else passes.map(_._1).max
      (q.name, headline, passes.map(_._1), status, perPass)
    }
    val qs = results
      .map { case (k, v, _, _, _) => "\"" + k + f"""\":$v%.4f""" }
      .mkString("{", ",", "}")
    val allPasses = results
      .map { case (k, _, ps, _, _) =>
        "\"" + k + "\":" + ps.map(p => f"$p%.4f").mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    val statuses = results
      .map { case (k, _, _, st, _) => "\"" + k + "\":\"" + st + "\"" }
      .mkString("{", ",", "}")
    val hashes = results
      .map { case (k, _, _, _, _) =>
        "\"" + k + "\":\"" + planHashes.getOrElse(k, "err") + "\""
      }
      .mkString("{", ",", "}")
    val ioStats = results
      .map { case (k, _, _, _, ip) =>
        val mb = ip.map(_ / 1048576.0)
        "\"" + k + "\":" +
          f"""{"input_mb":${mb(0)}%.3f,"shuffle_read_mb":${mb(1)}%.3f,"shuffle_write_mb":${mb(2)}%.3f}"""
      }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // subtotals so deep history stays one-glance comparable: the legacy
    // 15 (r7–r12 headline set, hashes stable since r7/r10) vs the LLM
    // flagships added in r13 — split by query number (every r13+
    // addition is >= q144), so the sets track the registry automatically
    // toIntOption: a future headline whose name is not q<digits> must
    // land in the "new" bucket, not kill the whole bench report
    def qNum(name: String): Int =
      name.drop(1).takeWhile(_.isDigit).toIntOption.getOrElse(Int.MaxValue)
    val legacySubtotal =
      results.filter(r => qNum(r._1) < 144).map(_._2).sum
    val new5Subtotal =
      results.filter(r => qNum(r._1) >= 144).map(_._2).sum
    val overall = if (results.exists(_._4 == "err")) "err" else "ok"
    // The driver tail-captures stdout: BENCH_r07.json came back parsed:null
    // because this line outgrew its window once passes/plan_hash/io joined
    // it. The stdout contract is therefore COMPACT (total + per-query min +
    // overall status only); the full diagnostics go to a sidecar file whose
    // path is announced on stderr.
    val detailPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_DETAIL", "/tmp/graft_bench_detail.json")
    val detail =
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","legacy15_sec":$legacySubtotal%.4f,"new5_sec":$new5Subtotal%.4f,"queries":$qs,"passes":$allPasses,"status":$statuses,"plan_hash":$hashes,"io":$ioStats,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      try w.println(detail) finally w.close()
      System.err.println(s"[bench] detail written to $detailPath")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] detail write failed ($detailPath): $e")
    }
    println(
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"status":"$overall","sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._4 == "err")) sys.exit(1)
  }
}
