package graft

/** Shared host-stall gating for every benchmark main (NOTES_r2: this box
  * shows intermittent multi-second-to-minute stalls in two modes — CPU
  * starvation of high-thread-count processes, and memory-bandwidth
  * throttling invisible to register-only arithmetic). A timed run counts
  * only when a raw-JVM arithmetic probe AND an arraycopy bandwidth probe,
  * at the run's own thread count, are clean both before and after it.
  *
  * Used by ScalingBench (min-of-2 probes, long cooldowns — the official
  * scaling evidence) and by Bench.main's query suite (single-run probes,
  * short cooldowns — 40+ queries must stay cheap while still refusing to
  * record host-stall garbage as per-query timings).
  */
object BenchGate {

  /** Raw-JVM arithmetic probe: `threads` x 300M splitmix-ish iterations
    * (equal work per thread), no allocation. Clean host ≈ 0.75-0.9s at 4
    * AND at 16 threads (within physical cores); stall episodes show
    * 1.2-10x that.
    */
  def probeSecs(threads: Int, minOf: Int = 2): Double = {
    def once(): Double = {
      val ts = (0 until threads).map { k =>
        new Thread(new Runnable {
          def run(): Unit = {
            var h = k.toLong; var i = 0L
            while (i < 300000000L) { h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29; i += 1 }
            if (h == 42L) println(h)
          }
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    (1 to minOf).map(_ => once()).min
  }

  /** Memory-bandwidth probe: `threads` x repeated 64 MB arraycopy. The
    * host's degraded mode can throttle MEMORY BANDWIDTH while register-only
    * arithmetic stays clean, and Spark stages are allocation-heavy — so
    * certification needs both probes.
    */
  def memProbeSecs(threads: Int, minOf: Int = 2): Double = {
    def once(): Double = {
      val ts = (0 until threads).map { _ =>
        new Thread(new Runnable {
          def run(): Unit = {
            val src = new Array[Long](8 * 1024 * 1024)
            val dst = new Array[Long](8 * 1024 * 1024)
            var it = 0
            while (it < 6) { System.arraycopy(src, 0, dst, 0, src.length); it += 1 }
            if (dst(1) == 42L) println("x")
          }
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    (1 to minOf).map(_ => once()).min
  }

  val CleanProbe: Double = sys.env.getOrElse("SPARK_GRAFT_PROBE_CLEAN", "0.95").toDouble
  // clean: ~0.16-0.28s at 4 threads, ~0.43s at 16 (socket-saturated)
  def cleanMem(threads: Int): Double =
    if (threads <= 4) sys.env.getOrElse("SPARK_GRAFT_MEMPROBE_CLEAN_N", "0.5").toDouble
    else sys.env.getOrElse("SPARK_GRAFT_MEMPROBE_CLEAN_4N", "0.8").toDouble

  /** Bandwidth moved by one memProbe run, in GB: threads × 64 MB × 2
    * (read+write) × 6 iterations. GB/s of a probe = this / memProbeSecs.
    */
  def memProbeGB(threads: Int): Double =
    threads.toDouble * 64.0 * 2 * 6 / 1024.0

  /** Run `work` in a certified-clean window: wait until the pre-probe is
    * clean, run, then discard the measurement (and retry) if the post-probe
    * shows the host stalled during it. Returns the measurement plus whether
    * it was certified (false only if attempts ran out).
    */
  def gated[T](label: String, threads: Int, maxAttempts: Int = 8,
      cooldownMs: Long = 20000L, probeMinOf: Int = 2, maxWaits: Int = 10)
      (work: => T): (T, Boolean) = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      def clean(): (Boolean, String) = {
        val cpu = probeSecs(threads, probeMinOf)
        val mem = memProbeSecs(threads, probeMinOf)
        (cpu <= CleanProbe && mem <= cleanMem(threads), f"cpu=$cpu%.2fs mem=$mem%.2fs")
      }
      var (preOk, preMsg) = clean()
      var waits = 0
      while (!preOk && waits < maxWaits) {
        Console.err.println(s"[gate] $label pre-probe $preMsg dirty; cooling down")
        Thread.sleep(cooldownMs); waits += 1
        val p = clean(); preOk = p._1; preMsg = p._2
      }
      val out = work
      val (postOk, postMsg) = clean()
      if (preOk && postOk) return (out, true)
      Console.err.println(s"[gate] $label post-probe $postMsg dirty; discarding run (attempt $attempt)")
    }
    Console.err.println(s"[gate] $label attempts exhausted; last run UNCERTIFIED")
    (work, false)
  }
}
