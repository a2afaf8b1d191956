package graft

import graft.extract.Extractor
import graft.fixtures.{FixtureConfig, FixtureGen}

/** Raw-JVM thread-scaling of the extraction OPERATOR alone — no Spark, no
  * in-task page generation. Workload A (ScalingBench) times
  * generate+extract in-task; generation is fixture harness, not engine, and
  * its allocation traffic shares the socket with extraction. Here pages are
  * pre-generated into RAM once, then N vs 4N threads extract disjoint
  * slices — the purest measurement of how the byte-identical HTML→text
  * operator itself scales with cores on this box.
  *
  * Probe-gated like every other benchmark (BenchGate); prints one JSON
  * line. Thread counts mirror ScalingBench (4 vs 16 = physical-core analog
  * of N vs 4N executors).
  */
object ExtractScale {

  private def extractAll(texts: Array[String], urls: Array[String],
      threads: Int): Double = {
    val n = texts.length
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val ts = (0 until threads).map { k =>
      new Thread(new Runnable {
        def run(): Unit = {
          var s = 0L
          var i = k
          while (i < n) { // strided: every thread sees the same size mix
            s += Extractor.extract(urls(i), "x", texts(i)).content.length
            i += threads
          }
          acc.addAndGet(s)
        }
      })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    val dt = (System.nanoTime() - t0) / 1e9
    if (acc.get() == 42L) println("x")
    dt
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_XSCALE_N", "200000").toInt
    val cfg = FixtureConfig(seed = 42L, hosts = 128, totalDetails = n,
      wordScale = 6, megaPerMille = 100)
    // pre-generate OUTSIDE every timed region (parallel, untimed)
    val texts = new Array[String](n)
    val urls = new Array[String](n)
    val gens = (0 until 16).map { k =>
      new Thread(new Runnable {
        def run(): Unit = {
          var i = k
          while (i < n) {
            val r = FixtureGen.row(cfg, i.toLong)
            texts(i) = new String(r.html, java.nio.charset.StandardCharsets.UTF_8)
            urls(i) = r.url
            i += 16
          }
        }
      })
    }
    gens.foreach(_.start()); gens.foreach(_.join())

    // warm both thread levels (JIT)
    extractAll(texts.take(20000), urls.take(20000), 4)
    extractAll(texts.take(20000), urls.take(20000), 16)

    def best(threads: Int, k: Int): (Double, Boolean) = {
      var cert = true
      val runs = (1 to k).map { i =>
        val (t, ok) = BenchGate.gated(s"xscale[$threads]#$i", threads,
          maxAttempts = 4, cooldownMs = 10000L)(extractAll(texts, urls, threads))
        cert &&= ok
        t
      }
      (runs.min, cert)
    }
    // interleaved best-of-3
    var certAll = true
    val pairs = (1 to 3).map { i =>
      val (tN, cN) = best(4, 1)
      val (t4N, c4N) = best(16, 1)
      certAll &&= cN && c4N
      Console.err.println(f"[xscale] #$i N=$tN%.2fs 4N=$t4N%.2fs")
      (tN, t4N)
    }
    val tN = pairs.map(_._1).min
    val t4N = pairs.map(_._2).min
    val eff = (tN / t4N) / 4.0

    // node ceiling: the same raw-arithmetic scaling ScalingBench calibrates
    // with — any software on this box is bounded by it (SMT + shared socket)
    def rawWork(threads: Int): Double = {
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
    rawWork(4); rawWork(16)
    // rawWork does FIXED work PER THREAD (work scales with thread count), so
    // N→4N throughput efficiency is t_N / t_4N directly — no /4
    val hwEff = (1 to 3).map(_ => rawWork(4)).min / (1 to 3).map(_ => rawWork(16)).min
    println(s"""{"metric":"extract_only_scaling_eff","value":$eff,"t_n":$tN,"t_4n":$t4N,"pages":$n,"pages_per_sec_4n":${n / t4N},"hw_ceiling_eff":$hwEff,"eff_hw_normalized":${eff / hwEff},"certified":$certAll}""")
  }
}
