package graft

import graft.spark.PagesGen
import graft.pdf.PdfExtractor

/** Single-threaded, Spark-free extraction microbenchmark: per-kind
  * thread-CPU ns/doc over fixed fixture docs. Exists because the
  * whole-job BenchCpu gate's noise band (hypervisor steal plus
  * 32-thread scheduling) swamps kernel-level A/Bs — identical code
  * swung ±15% between adjacent windows. One thread + thread-CPU time
  * isolates the extraction kernel itself.
  *
  * Usage: runMain graft.MicroBench [reps]
  * Prints one JSON line: {"kind": nsPerDoc, ...} (min over reps).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 7
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    // fixed fixture set per kind: ids chosen to exercise the generator
    // variety without randomizing the workload between runs
    val kinds: Seq[(String, Array[Array[Byte]])] = Seq(
      "textPdf" -> Iterator.from(0).map(i => PagesGen.payload(i.toLong, 42L))
        .collect { case (b, "pdf") => b }.take(64).toArray,
      "html" -> Iterator.from(0).map(i => PagesGen.payload(i.toLong, 42L))
        .collect { case (b, "html") => b }.take(64).toArray,
      "fontPdf" -> Array.tabulate(48)(i => PagesGen.fontPdf(i.toLong)),
      "bigFontPdf" -> Array.tabulate(12)(i => PagesGen.bigFontPdf(i.toLong))
    )
    // same dispatch as ExtractJob.extractOne, minus the Row plumbing
    def run(d: Array[Byte]): Int =
      if (PdfExtractor.isPdf(d)) PdfExtractor.extract(d).text.length
      else graft.html.BoilerplateStripper.extractAll(d)._1.length
    // warmup: everything, several times (C2)
    var sink = 0
    (1 to 3).foreach { _ =>
      kinds.foreach { case (_, docs) => docs.foreach(d => sink += run(d)) }
    }
    val out = new StringBuilder("{")
    kinds.foreach { case (name, docs) =>
      var best = Long.MaxValue
      (1 to reps).foreach { _ =>
        val c0 = tmx.getCurrentThreadCpuTime
        var i = 0
        while (i < docs.length) { sink += run(docs(i)); i += 1 }
        val dt = tmx.getCurrentThreadCpuTime - c0
        if (dt < best) best = dt
      }
      if (out.length > 1) out.append(',')
      out.append('"').append(name).append("\":").append(best / docs.length)
    }
    out.append(",\"_sink\":").append(sink % 1000).append('}')
    println(out)
  }
}
