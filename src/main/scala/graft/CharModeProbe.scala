package graft

import graft.spark.PagesGen

/** Round-6 iteration diagnostic: per-doc wall of the char-mode kernel
  * over the extract_char_mode corpus (no Spark). Not part of the
  * measured surface. */
object CharModeProbe {
  def main(args: Array[String]): Unit = {
    // warmup
    (0L until 60L).foreach { id =>
      val (bytes, kind) = PagesGen.payload(id, 42L)
      if (kind == "pdf") graft.pdf.PdfExtractor.extractCharMarkdown(bytes)
    }
    val times = (0L until 60L).flatMap { id =>
      val (bytes, kind) = PagesGen.payload(id, 42L)
      if (kind != "pdf") None
      else {
        val t0 = System.nanoTime()
        val md = graft.pdf.PdfExtractor.extractCharMarkdown(bytes)
        val dt = (System.nanoTime() - t0) / 1e6
        Some((id, dt, bytes.length, md.length))
      }
    }
    times.sortBy(-_._2).take(10).foreach { case (id, dt, nb, nm) =>
      println(f"[charprobe] doc $id%2d  $dt%8.1f ms  pdf=$nb%7d B  md=$nm%7d ch")
    }
    println(f"[charprobe] total ${times.map(_._2).sum}%.1f ms over ${times.size} pdfs")
  }
}
