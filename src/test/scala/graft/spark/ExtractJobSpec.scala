package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.html.BoilerplateStripper

class ExtractJobSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("extract-job-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("html stripper keeps article, drops nav/footer") {
    val html =
      """<html><body>
        |<nav><a href="/">Home</a> <a href="/x">X</a></nav>
        |<article><h2>Real Title</h2>
        |<p>This is the main content of the article and it is long enough to be kept by the density rules.</p>
        |</article>
        |<footer><a href="/terms">Terms</a> | © 2025</footer>
        |</body></html>""".stripMargin
    val out = BoilerplateStripper.strip(html)
    assert(out.contains("main content of the article"), s"got: $out")
    assert(out.contains("Real Title"))
    assert(!out.contains("Home"))
    assert(!out.contains("Terms"))
  }

  test("xref-killed payloads recover byte-identical text via reconstruction") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val pages = PagesGen.generate(spark, 40, seed = 42L, parallelism = 4).toDF()
      .filter(col("url").endsWith(".pdf"))
    val corrupted = pages.select(col("url"), col("html")).as[(String, Array[Byte])]
      .map { case (u, b) => (u, PagesGen.killXref(b)) }.toDF("url", "html")
    // sanity: corruption really removes the startxref anchor
    val sample = corrupted.as[(String, Array[Byte])].head()._2
    assert(!new String(sample, "ISO-8859-1").contains("startxref"))
    val intact = ExtractJob.extract(pages, ExtractJob.Config(salt = false))
      .select(col("url"), col("text").as("t1"))
    val rec = ExtractJob.extract(corrupted, ExtractJob.Config(salt = false))
      .select(col("url"), col("text").as("t2"), col("status"))
    val joined = intact.join(rec, "url").collect()
    assert(joined.length >= 20, s"expected mostly-PDF corpus, got ${joined.length}")
    joined.foreach { r =>
      assert(r.getAs[String]("status") == "ok", s"${r.getAs[String]("url")} not ok")
      assert(r.getAs[String]("t1") == r.getAs[String]("t2"),
        s"${r.getAs[String]("url")} text diverged after xref kill")
    }
  }

  test("extract over synthetic pages: 100% non-failing rows") {
    val pages = PagesGen.generate(spark, 60, seed = 42, parallelism = 4).toDF()
    val out = ExtractJob.extract(pages, ExtractJob.Config(salt = false)).cache()
    val n = out.count()
    assert(n == 60)
    val statuses = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.getOrElse("ok", 0L) == 60L, s"statuses: $statuses")
    // every ok row has text
    assert(out.filter("status = 'ok' and length(text) = 0").count() == 0)
    out.unpersist()
  }

  test("extraction is deterministic") {
    val pages = PagesGen.generate(spark, 30, seed = 7, parallelism = 2).toDF()
    val a = ExtractJob.extract(pages, ExtractJob.Config(salt = false))
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = ExtractJob.extract(pages, ExtractJob.Config(salt = false))
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.values.forall(_.nonEmpty))
  }

  test("salted routing spreads heavy rows and preserves results") {
    val pages = PagesGen.generate(spark, 50, seed = 42, parallelism = 2).toDF()
    val unsalted = ExtractJob.extract(pages, ExtractJob.Config(salt = false))
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val salted = ExtractJob.extract(pages,
        ExtractJob.Config(salt = true, heavyThresholdBytes = 10 * 1024))
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(salted == unsalted)
  }

  test("oversize rows are skipped not failed") {
    val s = spark
    import s.implicits._
    val big = PageRow("https://h.example/big.pdf",
      new java.sql.Timestamp(0), new Array[Byte](2 * 1024 * 1024), "", "en")
    val pages = s.createDataset(Seq(big)).toDF()
    val out = ExtractJob.extract(pages,
      ExtractJob.Config(salt = false, oversizeCapBytes = 1024 * 1024)).collect()
    assert(out.length == 1)
    assert(out(0).status == "skipped_oversize")
  }

  test("Config.password flows to the extractor: locked PDF ok with password, error row without") {
    val s = spark
    import s.implicits._
    import java.nio.charset.StandardCharsets.ISO_8859_1
    import graft.pdf.cos.PdfObj
    import graft.pdf.cos.PdfObj._
    import graft.pdf.crypto.StdSecurityHandler
    import graft.pdf.testgen.PdfBuilder
    // user-password-protected fixture (same construction as EncryptionSpec)
    val fileId = (0 until 16).map(i => (i * 17 + 3).toByte).toArray
    val idHex = fileId.map(b => f"${b & 0xff}%02X").mkString
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02X").mkString
    val edNoO = Dict(Map("Filter" -> Name("Standard"), "V" -> Int64(2), "R" -> Int64(3),
      "Length" -> Int64(128), "P" -> Int64(-3904L),
      "O" -> Str((0 until 32).map(i => (i * 7 + 1).toByte).toArray)))
    val oBytes = new StdSecurityHandler(edNoO, fileId).computeO(
      "own".getBytes(ISO_8859_1), "sesame".getBytes(ISO_8859_1))
    val ed = Dict(edNoO.entries ++ Map[String, PdfObj]("O" -> Str(oBytes)))
    val h = new StdSecurityHandler(ed, fileId, "sesame".getBytes(ISO_8859_1))
    val b = new PdfBuilder()
    val catId = b.reserveId(); val pagesId = b.reserveId()
    val f = b.addObject("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val contentId = b.reserveId()
    val content = "BT /F1 12 Tf 100 700 Td (job level secret) Tj ET".getBytes(ISO_8859_1)
    b.addStreamAt(contentId, "", h.encrypt(content, contentId, 0), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 $f 0 R >> >> /Contents $contentId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val uHex = hx(h.computeU().take(32).padTo(32, 0.toByte))
    val encId = b.addObject(s"<< /Filter /Standard /V 2 /R 3 /Length 128 " +
      s"/P -3904 /O <${hx(oBytes)}> /U <$uHex> >>")
    val pdf = b.build(catId, s"/Encrypt $encId 0 R /ID [<$idHex> <$idHex>] ")

    val pages = s.createDataset(Seq(PageRow("https://h.example/locked.pdf",
      new java.sql.Timestamp(0), pdf, "", "en"))).toDF()
    val ok = ExtractJob.extract(pages,
      ExtractJob.Config(salt = false, password = "sesame")).collect()
    assert(ok.length == 1 && ok(0).status == "ok" && ok(0).text == "job level secret", ok.mkString)
    val err = ExtractJob.extract(pages, ExtractJob.Config(salt = false)).collect()
    assert(err(0).status == "error" && err(0).error_msg.contains("password"), err.mkString)
  }

  test("checkpoint resume: second run processes nothing; kill-resume completes the set") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val outDir = s"$dir/extracted"
    val ckptDir = s"$dir/checkpoint"
    val pages = PagesGen.generate(spark, 40, seed = 11, parallelism = 2).toDF().cache()

    // simulate a partial (killed) first run: only 25 rows got through
    val partial = pages.limit(25)
    val r1 = ExtractJob.runWithCheckpoint(spark, partial, outDir, ckptDir, "run-1",
      ExtractJob.Config(salt = false))
    assert(r1.attempted == 25)

    // resumed run over the full input: only the remaining 15 processed
    val r2 = ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-2",
      ExtractJob.Config(salt = false))
    assert(r2.attempted == 15, s"expected 15 pending, got ${r2.attempted}")

    // third run: idempotent no-op
    val r3 = ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-3",
      ExtractJob.Config(salt = false))
    assert(r3.attempted == 0)

    // output complete + unique by url
    val written = spark.read.parquet(outDir)
    assert(written.select("url").distinct().count() == 40)
    assert(written.count() == 40)
    pages.unpersist()
  }

  test("commit protocol: kill between checkpoint and publish leaves no duplicates and no loss") {
    val dir = Files.createTempDirectory("graft-ckpt-crash").toString
    val outDir = s"$dir/extracted"
    val ckptDir = s"$dir/checkpoint"
    val pages = PagesGen.generate(spark, 30, seed = 12, parallelism = 2).toDF().cache()

    // run 1 dies AFTER the checkpoint append, BEFORE the publish rename
    // (the round-2 duplicate window, now on the other side of the
    // checkpoint write)
    intercept[RuntimeException] {
      ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-1",
        ExtractJob.Config(salt = false), 32,
        ExtractJob.FailPoints(afterCheckpoint = true))
    }
    // the interrupted attempt is checkpointed but unpublished: readers
    // see nothing yet, and nothing is duplicated
    assert(!new java.io.File(outDir).exists() ||
      spark.read.parquet(outDir).count() == 0)

    // the crashed committer's lock file is left behind (process death)
    assert(new java.io.File(s"$ckptDir.commitlock").exists())

    // run 2: the stale lock is broken (ttl 0 = restart-after-crash) and
    // heal() publishes the staged attempt instead of re-extracting
    val r2 = ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-2",
      ExtractJob.Config(salt = false, lockTtlMs = 0))
    assert(r2.attempted == 0, s"heal should have published, not re-extracted: $r2")
    val out = ExtractJob.readOutput(spark, outDir)
    assert(out.count() == 30, "no loss")
    assert(out.select("url").distinct().count() == 30, "no duplicates without reader-side dedup")
    pages.unpersist()
  }

  test("commit protocol: kill between stage and checkpoint re-extracts cleanly (no duplicates)") {
    val dir = Files.createTempDirectory("graft-ckpt-crash2").toString
    val outDir = s"$dir/extracted"
    val ckptDir = s"$dir/checkpoint"
    val pages = PagesGen.generate(spark, 20, seed = 13, parallelism = 2).toDF().cache()

    intercept[RuntimeException] {
      ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-1",
        ExtractJob.Config(salt = false), 32,
        ExtractJob.FailPoints(afterStage = true))
    }
    // staged output exists but was never checkpointed → invisible
    assert(new java.io.File(s"$outDir.staging").exists())
    assert(!new java.io.File(outDir).exists() ||
      spark.read.parquet(outDir).count() == 0)

    // run 2 GCs the orphan staging and re-extracts everything, once
    // (ttl 0 = restart-after-crash: the orphan is instantly past the
    // heal GC's TTL gate; at the default TTL a fresh unrecorded dir is
    // presumed to belong to a live concurrent committer and kept)
    val r2 = ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-2",
      ExtractJob.Config(salt = false, lockTtlMs = 0))
    assert(r2.attempted == 20, r2.toString)
    val out = ExtractJob.readOutput(spark, outDir)
    assert(out.count() == 20 && out.select("url").distinct().count() == 20)
    // orphan staging was GC'd
    val staging = new java.io.File(s"$outDir.staging")
    assert(!staging.exists() || staging.listFiles().isEmpty, staging.listFiles().mkString(","))
    pages.unpersist()
  }

  test("commit protocol: rename returning false fails the run; heal publishes") {
    val dir = Files.createTempDirectory("graft-ckpt-rnf").toString
    val outDir = s"$dir/extracted"
    val ckptDir = s"$dir/checkpoint"
    val pages = PagesGen.generate(spark, 20, seed = 14, parallelism = 2).toDF().cache()
    // transient FS refusal at publish: the run FAILS (surviving
    // process), checkpoint + staging remain, lock is released
    intercept[java.io.IOException] {
      ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-1",
        ExtractJob.Config(salt = false), 32,
        ExtractJob.FailPoints(renameFalse = true))
    }
    assert(!new java.io.File(s"$ckptDir.commitlock").exists(),
      "a surviving failure must release the commit lock")
    val r2 = ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-2",
      ExtractJob.Config(salt = false))
    assert(r2.attempted == 0, s"heal should publish, not re-extract: $r2")
    val out = ExtractJob.readOutput(spark, outDir)
    assert(out.count() == 20 && out.select("url").distinct().count() == 20)
    pages.unpersist()
  }

  test("heal replaces partial-rename debris from staging (no silent loss)") {
    val dir = Files.createTempDirectory("graft-ckpt-partial").toString
    val outDir = s"$dir/extracted"
    val ckptDir = s"$dir/checkpoint"
    val pages = PagesGen.generate(spark, 20, seed = 15, parallelism = 2).toDF().cache()
    intercept[RuntimeException] {
      ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-1",
        ExtractJob.Config(salt = false), 32,
        ExtractJob.FailPoints(afterCheckpoint = true))
    }
    // simulate a non-atomic copy-based rename dying midway: dst exists
    // with ONE bucket dir copied, src (staging) still complete
    val attempt = spark.read.parquet(ckptDir).select("attempt").head().getString(0)
    val src = new java.io.File(s"$outDir.staging/$attempt")
    val dst = new java.io.File(s"$outDir/run=$attempt")
    val firstBucket = src.listFiles().filter(_.getName.startsWith("bucket=")).head
    val dstBucket = new java.io.File(dst, firstBucket.getName)
    assert(dstBucket.mkdirs())
    firstBucket.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(dstBucket, f.getName).toPath)
    }
    // run 2: the old `!dst.exists` heal would have trusted the partial
    // dst as committed and GC'd nothing; the new heal replaces it
    val r2 = ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-2",
      ExtractJob.Config(salt = false, lockTtlMs = 0))
    assert(r2.attempted == 0, r2.toString)
    val out = ExtractJob.readOutput(spark, outDir)
    assert(out.count() == 20, "partial dst must be replaced, not trusted")
    assert(out.select("url").distinct().count() == 20)
    pages.unpersist()
  }

  test("heal GCs stray non-attempt files inside staging") {
    val dir = Files.createTempDirectory("graft-ckpt-stray").toString
    val outDir = s"$dir/extracted"
    val ckptDir = s"$dir/checkpoint"
    val pages = PagesGen.generate(spark, 10, seed = 16, parallelism = 2).toDF().cache()
    val staging = new java.io.File(s"$outDir.staging")
    assert(staging.mkdirs())
    java.nio.file.Files.writeString(new java.io.File(staging, "orphan.tmp").toPath, "junk")
    assert(new java.io.File(staging, "_temporary-junk").mkdirs())
    val r1 = ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-1",
      ExtractJob.Config(salt = false, lockTtlMs = 0))
    assert(r1.attempted == 10)
    val left = staging.listFiles()
    assert(left == null || left.isEmpty, s"strays survived: ${left.mkString(",")}")
    pages.unpersist()
  }

  test("commit-lock heartbeat refreshes the lock mtime (TTL clock restarts)") {
    val dir = Files.createTempDirectory("graft-lock-hb").toString
    val ckptDir = s"$dir/checkpoint"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ExtractJob.acquireCommitLock(fs, ckptDir, "att-1", ttlMs = 60000, maxWaitMs = 1000)
    val lock = new org.apache.hadoop.fs.Path(s"$ckptDir.commitlock")
    val old = System.currentTimeMillis() - 120000
    fs.setTimes(lock, old, old)
    assert(math.abs(fs.getFileStatus(lock).getModificationTime - old) < 5000)
    ExtractJob.heartbeatCommitLock(fs, ckptDir)
    val refreshed = fs.getFileStatus(lock).getModificationTime
    assert(System.currentTimeMillis() - refreshed < 10000,
      s"heartbeat must refresh mtime, got age ${System.currentTimeMillis() - refreshed}")
    ExtractJob.releaseCommitLock(fs, ckptDir)
    assert(!fs.exists(lock))
  }

  test("heal racing a LIVE committer never destroys published output (the r4-advice loss scenario)") {
    // Before heal ran under the commit lock, this interleaving lost
    // data: committer stages src → heal sees src (+ dst mid-rename on
    // copy-based stores) → heal deletes dst after the committer's
    // checkpoint append → urls owned but output gone, never
    // re-extracted. Under the lock the interleaving is serialized;
    // this drives a real committer thread against a heal loop and
    // asserts zero loss however the schedules land.
    val dir = Files.createTempDirectory("graft-heal-race").toString
    val outDir = s"$dir/extracted"
    val ckptDir = s"$dir/checkpoint"
    val pages = PagesGen.generate(spark, 30, seed = 21, parallelism = 2).toDF().cache()
    pages.count()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val committer = new Thread(() =>
      try ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir, "run-hr",
        ExtractJob.Config(salt = false))
      catch { case t: Throwable => errs.add(t) })
    val healDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val healer = new Thread(() =>
      try {
        // hammer heal() the whole time the committer works
        while (!healDone.get()) {
          ExtractJob.heal(spark, outDir, ckptDir, ExtractJob.Config())
          Thread.sleep(10)
        }
      } catch { case t: Throwable => errs.add(t) })
    committer.start(); healer.start()
    committer.join(120000)
    healDone.set(true)
    healer.join(120000)
    assert(errs.isEmpty, s"race must not fail either side: ${errs.toArray.mkString(";")}")
    val out = ExtractJob.readOutput(spark, outDir)
    assert(out.count() == 30, "no loss under committer/heal race")
    assert(out.select("url").distinct().count() == 30, "no duplicates")
    // a final heal is a no-op on the committed state
    ExtractJob.heal(spark, outDir, ckptDir, ExtractJob.Config())
    assert(ExtractJob.readOutput(spark, outDir).count() == 30)
    pages.unpersist()
  }

  test("heal waits on a live committer's lock instead of racing it (bounded, fails loudly)") {
    val dir = Files.createTempDirectory("graft-heal-lock").toString
    val outDir = s"$dir/extracted"
    val ckptDir = s"$dir/checkpoint"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a LIVE committer holds the lock (fresh mtime, long ttl)
    ExtractJob.acquireCommitLock(fs, ckptDir, "live-committer", ttlMs = 60000, maxWaitMs = 1000)
    // heal must NOT proceed to inspect/delete dst while the lock is
    // held — with a short bounded wait it errors instead of racing
    val e = intercept[java.io.IOException] {
      ExtractJob.heal(spark, outDir, ckptDir,
        ExtractJob.Config(lockTtlMs = 60000, lockWaitMs = 300))
    }
    assert(e.getMessage.contains("not acquired"), e.getMessage)
    ExtractJob.releaseCommitLock(fs, ckptDir)
    // lock free → heal proceeds (no-op here) and releases its own lock
    ExtractJob.heal(spark, outDir, ckptDir,
      ExtractJob.Config(lockTtlMs = 60000, lockWaitMs = 1000))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ckptDir.commitlock")))
  }

  test("heartbeat on a setTimes-refusing FS rewrites the lock in place (TTL still restarts)") {
    val dir = Files.createTempDirectory("graft-lock-hb2").toString
    val ckptDir = s"$dir/checkpoint"
    val raw = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val noSetTimes = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def setTimes(p: org.apache.hadoop.fs.Path, m: Long, a: Long): Unit =
        throw new java.io.IOException("setTimes unsupported")
    }
    ExtractJob.acquireCommitLock(noSetTimes, ckptDir, "att-hb", ttlMs = 60000, maxWaitMs = 1000)
    val lock = new org.apache.hadoop.fs.Path(s"$ckptDir.commitlock")
    val old = System.currentTimeMillis() - 120000
    raw.setTimes(lock, old, old)
    // fallback path: setTimes throws → rewrite-in-place refreshes mtime
    ExtractJob.heartbeatCommitLock(noSetTimes, ckptDir, "att-hb")
    val refreshed = raw.getFileStatus(lock).getModificationTime
    assert(System.currentTimeMillis() - refreshed < 10000,
      s"fallback heartbeat must refresh mtime, got age ${System.currentTimeMillis() - refreshed}")
    assert(ExtractJob.readLockOwner(raw, ckptDir).contains("att-hb"))
    // ownership guard: a lock someone else re-claimed is NOT clobbered
    raw.delete(lock, false)
    ExtractJob.acquireCommitLock(raw, ckptDir, "other-owner", ttlMs = 60000, maxWaitMs = 1000)
    raw.setTimes(lock, old, old)
    ExtractJob.heartbeatCommitLock(noSetTimes, ckptDir, "att-hb")
    assert(ExtractJob.readLockOwner(raw, ckptDir).contains("other-owner"),
      "foreign lock must never be clobbered by a stale heartbeat")
    assert(math.abs(raw.getFileStatus(lock).getModificationTime - old) < 5000,
      "foreign lock mtime must stay untouched")
    ExtractJob.releaseCommitLock(raw, ckptDir)
  }

  test("acquire: write failure after create releases the claim instead of spinning on own lock") {
    val dir = Files.createTempDirectory("graft-lock-wf").toString
    val ckptDir = s"$dir/checkpoint"
    val raw = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val failures = new java.util.concurrent.atomic.AtomicInteger(2)
    val flaky = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def create(p: org.apache.hadoop.fs.Path, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream = {
        val out = super.create(p, overwrite)
        if (failures.getAndDecrement() > 0)
          new org.apache.hadoop.fs.FSDataOutputStream(
            new java.io.OutputStream {
              override def write(b: Int): Unit = throw new java.io.IOException("disk full")
              override def write(b: Array[Byte], o: Int, l: Int): Unit =
                throw new java.io.IOException("disk full")
            }, null) { override def close(): Unit = out.close() }
        else out
      }
    }
    val t0 = System.currentTimeMillis()
    // first two writes fail AFTER the create claimed the slot; the fix
    // deletes the own claim and the third try wins — well inside the
    // wait bound (the old code spun on its own empty lock to deadline)
    ExtractJob.acquireCommitLock(flaky, ckptDir, "att-wf", ttlMs = 60000, maxWaitMs = 5000)
    assert(System.currentTimeMillis() - t0 < 4000, "should not spin to the deadline")
    assert(ExtractJob.readLockOwner(raw, ckptDir).contains("att-wf"))
    ExtractJob.releaseCommitLock(raw, ckptDir)
  }

  test("verifyCommitLock aborts when the lock was TTL-broken by another attempt") {
    val dir = Files.createTempDirectory("graft-lock-vf").toString
    val ckptDir = s"$dir/checkpoint"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ExtractJob.acquireCommitLock(fs, ckptDir, "att-a", ttlMs = 60000, maxWaitMs = 1000)
    ExtractJob.verifyCommitLock(fs, ckptDir, "att-a") // own lock: fine
    // simulate a waiter TTL-breaking and re-claiming the lock
    ExtractJob.releaseCommitLock(fs, ckptDir)
    ExtractJob.acquireCommitLock(fs, ckptDir, "att-b", ttlMs = 60000, maxWaitMs = 1000)
    val e = intercept[java.io.IOException](
      ExtractJob.verifyCommitLock(fs, ckptDir, "att-a"))
    assert(e.getMessage.contains("att-a") && e.getMessage.contains("att-b"), e.getMessage)
    ExtractJob.releaseCommitLock(fs, ckptDir)
    val e2 = intercept[java.io.IOException](
      ExtractJob.verifyCommitLock(fs, ckptDir, "att-a"))
    assert(e2.getMessage.contains("<missing>"), e2.getMessage)
  }

  test("concurrent attempts, same runId: committed ownership is exactly-once") {
    val dir = Files.createTempDirectory("graft-ckpt-race").toString
    val outDir = s"$dir/extracted"
    val ckptDir = s"$dir/checkpoint"
    val pages = PagesGen.generate(spark, 40, seed = 17, parallelism = 2).toDF().cache()
    pages.count()
    // two full runs over the SAME pending set, racing: both may extract
    // everything, but the commit lock + under-lock re-validation make
    // ownership exactly-once — the loser commits only the remainder
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[ExtractJob.RunReport]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() =>
        try reports.add(ExtractJob.runWithCheckpoint(spark, pages, outDir, ckptDir,
          "run-race", ExtractJob.Config(salt = false)))
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"race must not fail either run: ${errs.toArray.mkString(";")}")
    val rs = reports.toArray(Array.empty[ExtractJob.RunReport])
    assert(rs.length == 2)
    assert(rs.map(_.attempted).sum == 40,
      s"committed ownership must sum to the corpus exactly once: ${rs.mkString(";")}")
    val out = ExtractJob.readOutput(spark, outDir)
    assert(out.count() == 40, "no loss")
    assert(out.select("url").distinct().count() == 40, "no duplicates")
    // checkpoint ownership is single-attempt per url
    val multiOwned = spark.read.parquet(ckptDir).groupBy("url").count()
      .filter("count > 1").count()
    assert(multiOwned == 0, "each url checkpoint-owned by exactly one attempt")
    assert(!new java.io.File(s"$ckptDir.commitlock").exists())
    pages.unpersist()
  }

  test("fixture kinds through the JOB path decode identically to the kernel path") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // the same payload bytes the kernel-level pins decode, pushed
    // through ExtractJob.extract (pruning, sniff, dispatch, status)
    val pages = PagesGen.generateFixtures(spark, nPerKind = 6, parallelism = 2).toDF()
    val job = ExtractJob.extract(pages, ExtractJob.Config(salt = false))
      .select("url", "status", "text").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(job.size == 36)
    assert(job.values.forall(_._1 == "ok"), job.filter(_._2._1 != "ok").keys.mkString(","))
    // kernel-path equality per fixture kind (same generators, same ids)
    for (id <- 0L until 6L) {
      val fonts = graft.pdf.PdfExtractor.extract(PagesGen.fontPdf(id),
        graft.pdf.ConversionOptions()).text
      assert(job(s"https://fixtures.example/font$id.pdf")._2 == fonts,
        s"font$id: job path diverged from kernel path")
      val forms = graft.pdf.PdfExtractor.extract(PagesGen.formPdf(id),
        graft.pdf.ConversionOptions()).text
      assert(job(s"https://fixtures.example/form$id.pdf")._2 == forms)
      val outl = graft.pdf.PdfExtractor.extract(PagesGen.outlinePdf(id),
        graft.pdf.ConversionOptions()).text
      assert(job(s"https://fixtures.example/outline$id.pdf")._2 == outl)
      val links = graft.pdf.PdfExtractor.extract(PagesGen.linkPdf(id),
        graft.pdf.ConversionOptions()).text
      assert(job(s"https://fixtures.example/link$id.pdf")._2 == links)
      val imgs = graft.pdf.PdfExtractor.extract(PagesGen.imagePdf(id),
        graft.pdf.ConversionOptions()).text
      assert(job(s"https://fixtures.example/image$id.pdf")._2 == imgs)
      val (st, _, _) = graft.html.BoilerplateStripper.extractAll(PagesGen.structuredHtml(id))
      assert(job(s"https://fixtures.example/structured$id.html")._2 == st)
    }
  }

  test("malformed payloads become error rows with messages, never failures") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      PageRow("https://bad/nohdr", new java.sql.Timestamp(0), "%PDF-1.4 then nothing".getBytes, "", "en"),
      PageRow("https://bad/garbage", new java.sql.Timestamp(0),
        { val a = new Array[Byte](5000); new java.util.Random(3).nextBytes(a)
          System.arraycopy("%PDF-1.7".getBytes, 0, a, 0, 8); a }, "", "en"),
      PageRow("https://good/html", new java.sql.Timestamp(0),
        "<html><body><article><p>Long enough paragraph for the density classifier to keep happily.</p></article></body></html>".getBytes, "", "en"))
    val out = ExtractJob.extract(s.createDataset(rows).toDF(),
      ExtractJob.Config(salt = false)).collect().map(d => d.url -> d).toMap
    assert(out("https://good/html").status == "ok")
    // the two broken PDFs either recover to ok (reconstruction) or
    // report error with a message — both acceptable, crashing is not
    Seq("https://bad/nohdr", "https://bad/garbage").foreach { u =>
      val d = out(u)
      assert(d.status == "ok" || (d.status == "error" && d.error_msg.nonEmpty), s"$u -> $d")
    }
  }

  test("SparkEntry.entry: flagship query returns rows (driver smoke contract)") {
    val df = graft.SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("url") && df.columns.contains("status"))
  }

  test("column pruning reaches the scan (ReadSchema ⊆ {url, html})") {
    val dir = Files.createTempDirectory("graft-pages").toString
    PagesGen.writeBucketed(PagesGen.generate(spark, 20, seed = 3, parallelism = 2), dir, 4)
    val pages = spark.read.parquet(dir)
    val plan = ExtractJob.extract(pages, ExtractJob.Config(salt = false))
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.contains("url") && readSchema.contains("html"), plan)
    assert(!readSchema.contains("warc_ts") && !readSchema.contains("lang"),
      s"scan reads too much: $readSchema")
  }
}
