package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.ExtractJob
import graft.spark.PagesGen

/** Crawl-robustness fuzzing: random byte flips, truncations, and
  * splices over valid corpora must produce ok/error/skip STATUS rows —
  * never an exception escaping the job path (the reference's 100%
  * success-rate design; at crawl scale malformed inputs are the norm).
  */
class FuzzSpec extends AnyFunSuite {

  private val cfg = ExtractJob.Config(salt = false)

  private def runOne(url: String, bytes: Array[Byte]): String = {
    val d = ExtractJob.extractOne(url, bytes, 0, cfg)
    assert(Set("ok", "error", "skipped_oversize").contains(d.status))
    d.status
  }

  test("byte-flip fuzz: 300 mutations, zero escapes") {
    val rnd = new java.util.Random(1234)
    var oks = 0
    (0 until 300).foreach { i =>
      val (bytes, _) = PagesGen.payload((i % 40).toLong, 42L)
      val mutated = bytes.clone()
      val nFlips = 1 + rnd.nextInt(8)
      (0 until nFlips).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      if (runOne(s"https://fuzz/$i", mutated) == "ok") oks += 1
    }
    // most single-byte-flipped docs should still extract (robustness)
    assert(oks > 200, s"only $oks/300 mutated docs extracted ok")
  }

  test("truncation fuzz: every prefix length bucket survives") {
    val (bytes, _) = PagesGen.payload(1L, 42L)
    Seq(0, 1, 7, 64, bytes.length / 4, bytes.length / 2, bytes.length - 3)
      .foreach { n =>
        runOne(s"https://trunc/$n", java.util.Arrays.copyOf(bytes, n))
      }
  }

  test("splice fuzz: two halves of different docs") {
    val (a, _) = PagesGen.payload(2L, 42L)
    val (b, _) = PagesGen.payload(7L, 42L)
    val spliced = java.util.Arrays.copyOf(a, a.length / 2) ++
      java.util.Arrays.copyOfRange(b, b.length / 2, b.length)
    runOne("https://splice/0", spliced)
  }

  test("html fuzz: mutated html never escapes") {
    val rnd = new java.util.Random(77)
    (0 until 100).foreach { i =>
      val (bytes, _) = PagesGen.payload(500L + (i % 10), 42L) // html ids vary
      val mutated = bytes.clone()
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      runOne(s"https://htmlfuzz/$i", mutated)
    }
  }

  test("font-fixture fuzz: mutated CMap/Type0 machinery never escapes") {
    // the round-4 decode surfaces (embedded ToUnicode streams,
    // /Differences, Type0 2-byte, surrogate bfranges) get their own
    // mutation ladder: flips land anywhere incl. inside the
    // flate-compressed CMap streams
    val rnd = new java.util.Random(4242)
    var oks = 0
    (0 until 200).foreach { i =>
      val bytes = PagesGen.fontPdf((i % 12).toLong)
      val mutated = bytes.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      if (runOne(s"https://fontfuzz/$i", mutated) == "ok") oks += 1
    }
    assert(oks > 120, s"only $oks/200 mutated font docs extracted ok")
    // truncations through the CMap stream region
    val base = PagesGen.fontPdf(0L)
    Seq(base.length / 8, base.length / 3, base.length / 2, base.length - 5)
      .foreach(n => runOne(s"https://fonttrunc/$n", java.util.Arrays.copyOf(base, n)))
  }

  test("pathological inputs: all zeros, all 0xFF, random noise with %PDF header") {
    runOne("https://zero", new Array[Byte](10000))
    runOne("https://ff", Array.fill[Byte](10000)(0xff.toByte))
    val rnd = new java.util.Random(9)
    val noise = new Array[Byte](20000)
    rnd.nextBytes(noise)
    System.arraycopy("%PDF-1.4".getBytes, 0, noise, 0, 8)
    runOne("https://noise", noise)
  }
}
