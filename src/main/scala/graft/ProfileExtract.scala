package graft

import graft.extract.Extractor
import graft.fixtures.{FixtureConfig, FixtureGen}

/** Single-threaded micro-breakdown of the extract stage (generation vs
  * decode vs DOM parse vs extract walk) — finds where the per-URL
  * compute/allocation goes. Diagnostic tool, not part of the contract.
  */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROFILE_N", "30000").toInt
    val cfg = FixtureConfig(seed = 42L, hosts = 128, totalDetails = n,
      wordScale = 6, megaPerMille = 100)

    // pre-generate outside timing loops where a phase excludes generation
    def genRow(i: Long) = FixtureGen.row(cfg, i)

    def time(label: String)(work: => Long): Unit = {
      // warm
      var sink = work
      val t0 = System.nanoTime()
      sink += work
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[xprof] $label%-26s ${dt}%6.2fs  (${n / dt}%8.0f rows/s) sink=${sink % 7}")
    }

    time("generate-only") {
      var acc = 0L; var i = 0L
      while (i < n) { acc += genRow(i).html.length; i += 1 }; acc
    }
    val rows = (0L until math.min(n, 30000L).toLong).map(genRow).toArray
    val texts = rows.map(r => new String(r.html, java.nio.charset.StandardCharsets.UTF_8))

    time("decode-only") {
      var acc = 0L; var i = 0
      while (i < rows.length) {
        acc += new String(rows(i).html, java.nio.charset.StandardCharsets.UTF_8).length
        i += 1
      }; acc
    }
    time("dom-parse-only") {
      var acc = 0L; var i = 0
      while (i < texts.length) {
        acc += graft.html.HtmlDom.parse(texts(i)).map(_.tag.length).getOrElse(0); i += 1
      }; acc
    }
    time("container-parse-only") {
      var acc = 0L; var i = 0
      while (i < texts.length) {
        acc += (graft.html.HtmlDom.parseContainer(texts(i), "mvcContainer-1286") match {
          case graft.html.HtmlDom.FoundContainer(e) => e.tag.length
          case _ => 0
        }); i += 1
      }; acc
    }
    time("full-extract (pre-decoded)") {
      var acc = 0L; var i = 0
      while (i < texts.length) {
        acc += Extractor.extract(rows(i).url, "x", texts(i)).content.length; i += 1
      }; acc
    }
    time("full-extract (full parse)") {
      var acc = 0L; var i = 0
      while (i < texts.length) {
        acc += Extractor.extractViaFullParse(rows(i).url, "x", texts(i)).content.length; i += 1
      }; acc
    }

    // finer: parse once, then time the post-parse pieces
    val roots = texts.take(5000).flatMap(t => graft.html.HtmlDom.parse(t))
    val m = roots.length
    def timeM(label: String)(work: => Long): Unit = {
      var sink = work
      val t0 = System.nanoTime()
      sink += work
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[xprof] $label%-26s ${dt * texts.length / m}%6.2fs-equiv sink=${sink % 7}")
    }
    timeM("findById-only") {
      var acc = 0L; var i = 0
      while (i < m) { acc += roots(i).findById("mvcContainer-1286").map(_.tag.length).getOrElse(0); i += 1 }; acc
    }
    val containers = roots.flatMap(_.findById("mvcContainer-1286"))
    val mc = containers.length
    timeM("textContent(container)") {
      var acc = 0L; var i = 0
      while (i < mc) { acc += containers(i).textContentCleaned.length; i += 1 }; acc
    }
    timeM("normalize(content)") {
      val contents = containers.map(_.textContentCleaned)
      var acc = 0L; var i = 0
      while (i < mc) { acc += graft.text.PyText.normalizeField(contents(i)).length; i += 1 }; acc
    }
  }
}
