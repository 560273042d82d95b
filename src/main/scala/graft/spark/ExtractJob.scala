package graft.spark

import java.sql.Timestamp
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.html.BoilerplateStripper
import graft.pdf.PdfExtractor

/** The production job shape (SURVEY §3.3): pages table → per-row
  * extraction inside `mapPartitions` → Dataset[ExtractedDoc] + the
  * checkpoint/lineage table. Zero shuffles on the hot path unless skew
  * salting is enabled (then exactly one, to spread oversized binaries).
  */
object ExtractJob {

  final case class Config(
      /** rows larger than this are skipped (`skipped_oversize`). */
      oversizeCapBytes: Long = 64L * 1024 * 1024,
      /** rows larger than this shuffle to dedicated heavy partitions. */
      heavyThresholdBytes: Long = 1L * 1024 * 1024,
      /** enable the salt-based skew routing (north rule). */
      salt: Boolean = true,
      heavySaltBuckets: Int = 64,
      maxPages: Int = PdfExtractor.DefaultMaxPages,
      /** password tried for encrypted PDFs (empty always tried too). */
      password: String = "",
      /** commit-lock staleness: a lock older than this is a crashed
        * committer and gets broken (commit = checkpoint append +
        * rename; minutes, not hours, even on a slow object store). */
      lockTtlMs: Long = 10L * 60 * 1000,
      /** bound on waiting for a live committer before failing loudly. */
      lockWaitMs: Long = 15L * 60 * 1000)

  /** Core transform: (url, html) → ExtractedDoc. Only `url` and `html`
    * survive the scan — Catalyst prunes the rest (verify: ReadSchema in
    * .explain should list exactly these two columns).
    *
    * Skew design (SURVEY §4.2): the NORMAL tier extracts scan-local —
    * zero shuffle; shuffling every payload byte through a salt
    * repartition made shuffle-file IO the scaling ceiling (profiled:
    * FileOutputStream.writeBytes was the top stack at local[16]). Only
    * the HEAVY tail (> heavyThresholdBytes) pays a shuffle, salted so
    * no partition carries two giants. The heavy exchange uses an
    * EXPLICIT partition count: extraction cost is per-row CPU, and
    * AQE's size-based coalescing would squeeze it into a couple of
    * 64MB partitions, idling the cluster. */
  def extract(pages: DataFrame, cfg: Config = Config()): Dataset[ExtractedDoc] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val pruned = pages.select(col("url"), col("html"))
    def toDocs(df: DataFrame): Dataset[ExtractedDoc] =
      df.as[(String, Array[Byte])].mapPartitions { rows =>
        val pid = TaskContext.getPartitionId()
        rows.map { case (u, html) => extractOne(u, html, pid, cfg) }
      }
    if (!cfg.salt) toDocs(pruned)
    else {
      val heavyPred = length(col("html")) > cfg.heavyThresholdBytes
      val normal = toDocs(pruned.filter(!heavyPred))
      val nPart = math.max(spark.sparkContext.defaultParallelism * 2, 16)
      val heavy = toDocs(
        pruned.filter(heavyPred)
          .withColumn("__salt", pmod(xxhash64(col("url"), lit(1)), lit(cfg.heavySaltBuckets)))
          .repartition(nPart, col("__salt"))
          .drop("__salt"))
      normal.unionAll(heavy)
    }
  }

  /** Snapshot worklist for incremental crawls: classify every url
    * across two page snapshots (added / removed / changed / unchanged)
    * by 64-bit payload fingerprint — `Crawl.delta` over
    * (url, xxhash64(html)). Fingerprints are computed in the scan
    * stage, so only (url, 8-byte fp) pairs reach the full-outer join;
    * with both snapshots in the bucketed url-hash layout the sink
    * writes, the join is per-bucket and shuffle-free. */
  def incrementalWorklist(prevPages: DataFrame, curPages: DataFrame): DataFrame = {
    def fp(df: DataFrame) =
      df.select(col("url"), xxhash64(col("html")).as("fp"))
    graft.ops.Crawl.delta(fp(prevPages), fp(curPages))
  }

  /** Incremental extraction between crawl snapshots: extract ONLY the
    * urls whose payload is new or changed since `prevPages` —
    * unchanged documents (the overwhelming majority of a recurring
    * crawl) never re-enter the extraction kernel, and removed urls
    * fall out of the worklist entirely. The caller unions the result
    * with the previous snapshot's retained output (minus `removed`
    * urls from [[incrementalWorklist]]) to materialize the full
    * current corpus — that union is a metadata operation, not CPU.
    *
    * Same Config semantics as [[extract]]; the worklist join is
    * ids-only against the bucketed url layout. */
  def extractIncremental(prevPages: DataFrame, curPages: DataFrame,
                         cfg: Config = Config()): Dataset[ExtractedDoc] = {
    val work = incrementalWorklist(prevPages, curPages)
      .filter(col("status").isin("added", "changed"))
      .select("url")
    extract(curPages.join(work, Seq("url")), cfg)
  }

  /** Opt-in payload-level dedup-before-extract for high-duplication
    * crawl corpora: extraction runs ONCE per distinct payload and the
    * result fans back out to every url carrying those bytes.
    *
    * Shape: ONE explicit repartition on (xxhash64(payload), payload) —
    * exact, the raw BINARY column stays in the key so colliding
    * payloads can never merge; the leading hash makes the partitioner
    * and the in-partition sort resolve almost every comparison on one
    * long (crawl payloads share deep common prefixes — every PDF opens
    * with the same header bytes; keying on raw bytes alone made each
    * sort comparison scan to the first divergence, measured at 1.7x the
    * CPU of the whole plain extraction at dup=3). A sortWithinPartitions
    * on (hash, payload, url) then lands every copy of a payload
    * ADJACENT with min(url) first, and a single streaming mapPartitions
    * pass extracts each group's payload once and re-emits the row per
    * url. Payload bytes cross the wire once and are scanned once; no
    * window, no join, no second computation of the exchange. (An
    * earlier window+filter+join formulation computed the payload
    * exchange twice — mapping arm and reps arm — and benched SLOWER
    * than no dedup at all; mapPartitions is the (d)-tier last resort,
    * used here precisely because group-adjacent streaming extraction
    * is not expressible as one pass with relational operators.)
    *
    * Cost model (why opt-IN, default extract() stays shuffle-free):
    * the full corpus pays exactly one payload shuffle + sort; that buys
    * (1 - 1/dup_rate) of the extraction CPU. Worth it when duplicate-
    * heavy and extraction-bound (real crawls: 30-50% exact dups, PDFs
    * milliseconds each) — BENCH.md carries the measured A/B both ways.
    * The explicit repartition (2x parallelism) is deliberately NOT an
    * AQE-coalescible exchange: extraction is per-row CPU, not bytes.
    * Not composed into runWithCheckpoint by default: resume stays
    * per-url and is oblivious to how the rows were produced.
    *
    * Determinism: rep = min(url) per payload, so reruns pick identical
    * reps; output rows differ from plain extract() ONLY in duration_ms
    * and partition_id lineage (duplicates inherit the rep's), which is
    * pinned by the equality spec. */
  def extractDeduped(pages: DataFrame, cfg: Config = Config()): Dataset[ExtractedDoc] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val nPart = math.max(spark.sparkContext.defaultParallelism * 2, 16)
    pages.select(col("url"), col("html"))
      .withColumn("__h", coalesce(xxhash64(col("html")), lit(0L))) // null payload → one group
      // route on the 8-byte hash alone (colliding payloads still
      // co-locate; the partitioner needn't re-scan the payload bytes)
      .repartition(nPart, col("__h"))
      .sortWithinPartitions(col("__h"), col("html"), col("url"))
      .as[(String, Array[Byte], Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var prevH = 0L
        var prevBytes: Array[Byte] = null
        var prevDoc: ExtractedDoc = null
        it.map { case (u, bytes, h) =>
          val same = prevDoc != null && h == prevH &&
            java.util.Arrays.equals(bytes, prevBytes)
          if (same) prevDoc.copy(url = u) // duplicate: rep's row, this url
          else {
            val doc = extractOne(u, bytes, pid, cfg)
            prevH = h; prevBytes = bytes; prevDoc = doc
            doc
          }
        }
      }
  }

  /** Pure per-row dispatch: sniff %PDF- magic vs HTML (SURVEY §2.5). */
  def extractOne(u: String, html: Array[Byte], pid: Int, cfg: Config): ExtractedDoc = {
    val nBytes = if (html == null) 0L else html.length.toLong
    val t0 = System.nanoTime()
    def ms: Double = (System.nanoTime() - t0) / 1e6
    if (html == null || html.isEmpty)
      ExtractedDoc(u, "", "", "", "", 0, 0, ms, "error", "empty payload", nBytes, pid)
    else if (nBytes > cfg.oversizeCapBytes)
      ExtractedDoc(u, "", "", "", "", 0, 0, ms, "skipped_oversize", "", nBytes, pid)
    else if (PdfExtractor.isPdf(html)) {
      try {
        val r = PdfExtractor.extract(html,
          graft.pdf.ConversionOptions(maxPages = cfg.maxPages, password = cfg.password))
        ExtractedDoc(u, r.text, r.markdown, r.html, r.title, r.nPages, r.nSpans, ms, "ok", "", nBytes, pid)
      } catch {
        case e: Throwable =>
          ExtractedDoc(u, "", "", "", "", 0, 0, ms, "error",
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName).take(200), nBytes, pid)
      }
    } else {
      try {
        val (text, md, title) = BoilerplateStripper.extractAll(html)
        val nBlocks = countBlocks(text)
        ExtractedDoc(u, text, md, "", title, 1, nBlocks, ms, "ok", "", nBytes, pid)
      } catch {
        case e: Throwable =>
          ExtractedDoc(u, "", "", "", "", 0, 0, ms, "error",
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName).take(200), nBytes, pid)
      }
    }
  }

  /** Blank-line-separated block count, bit-compatible with the former
    * `text.split("\n\n").length` (which compiled a regex Pattern PER
    * DOCUMENT — a top JFR frame — and allocated every segment): count
    * non-overlapping separators left-to-right and drop trailing empty
    * segments exactly as Java's split does. */
  private[spark] def countBlocks(text: String): Int = {
    var count = 0           // segments seen (incl. empties)
    var lastNonEmpty = 0    // ordinal of last non-empty segment
    var start = 0
    var i = text.indexOf("\n\n")
    while (i >= 0) {
      count += 1
      if (i > start) lastNonEmpty = count
      start = i + 2
      i = text.indexOf("\n\n", start)
    }
    count += 1
    if (start < text.length) lastNonEmpty = count
    lastNonEmpty
  }

  // ------------------------------------------------------------------
  // Checkpointed, resumable run (north rule: per-partition lineage +
  // metrics; restart = left-anti join; RE-RUNS YIELD AN IDENTICAL
  // OUTPUT TABLE — no reader-side dedup needed).
  //
  // Commit protocol (Iceberg-emulation, three ordered steps):
  //   1. stage   — write this attempt's output parquet under a staging
  //                prefix OUTSIDE outDir (invisible to readers);
  //   2. record  — append (url, attempt, lineage) rows to the
  //                checkpoint table (atomic at job commit);
  //   3. publish — one filesystem rename staging/<attempt> →
  //                outDir/run=<attempt>.
  // Crash analysis: before 2 → staged files are orphans (GC'd on the
  // next run, urls re-extracted — no duplicates, staging was never
  // readable); between 2 and 3 → the next run's heal() completes the
  // rename instead of re-extracting (checkpoint names the attempt), so
  // neither duplicates nor loss; after 3 → done. Round 2 appended
  // output BEFORE the checkpoint, so a kill between the writes
  // re-extracted and re-appended those urls (duplicate window).
  // ------------------------------------------------------------------
  final case class RunReport(attempted: Long, ok: Long, error: Long, skipped: Long)

  private def stagingRoot(outDir: String): String = outDir + ".staging"

  /** Test-only crash injection points for the commit protocol.
    * `renameFalse` simulates `FileSystem.rename` returning false at
    * publish (transient FS refusal — distinct from a crash: the
    * process survives, the run FAILS, staging + checkpoint remain). */
  private[spark] final case class FailPoints(
      afterStage: Boolean = false, afterCheckpoint: Boolean = false,
      renameFalse: Boolean = false)
  private[spark] final class InjectedCrash(at: String)
    extends RuntimeException(s"injected crash $at")

  def runWithCheckpoint(spark: SparkSession, pages: DataFrame, outDir: String,
                        checkpointDir: String, runId: String,
                        cfg: Config = Config(), nBuckets: Int = 32): RunReport =
    runWithCheckpoint(spark, pages, outDir, checkpointDir, runId, cfg, nBuckets,
      FailPoints())

  private[spark] def runWithCheckpoint(spark: SparkSession, pages: DataFrame,
                                       outDir: String, checkpointDir: String,
                                       runId: String, cfg: Config, nBuckets: Int,
                                       fail: FailPoints): RunReport = {
    import spark.implicits._
    heal(spark, outDir, checkpointDir, cfg)
    val doneUrls: DataFrame =
      if (pathExists(spark, checkpointDir))
        spark.read.parquet(checkpointDir).select("url").distinct()
      else spark.emptyDataset[String].toDF("url")
    // resume: only not-yet-checkpointed urls (left-anti — the one
    // planned join; broadcast-able when the remainder is small)
    val pending = pages.join(doneUrls, Seq("url"), "left_anti")
    val attempt = runId + "-" + java.util.UUID.randomUUID().toString.take(8)
    val staged = s"${stagingRoot(outDir)}/$attempt"
    val extracted = extract(pending, cfg).persist()
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // 1. stage (bucketed layout, unreadable until published). Staging
      // runs OUTSIDE the commit lock — the expensive extraction work of
      // concurrent attempts overlaps; only the commit serializes.
      extracted
        .withColumn("bucket", pmod(xxhash64($"url"), lit(nBuckets)))
        .drop("n_bytes", "partition_id")
        .write.mode("overwrite").partitionBy("bucket").parquet(staged)
      if (fail.afterStage) throw new InjectedCrash("after stage")
      // ---- commit critical section (Iceberg's optimistic-commit
      // analog): an atomic-create lock file serializes checkpoint
      // append + publish, and the pending set is RE-VALIDATED under
      // the lock — a concurrent attempt that committed some of our
      // urls first wins them, we commit only the remainder. Without
      // this, two runs racing the same runId each appended overlapping
      // ownership rows and readOutput double-counted those urls.
      acquireCommitLock(fs, checkpointDir, attempt, cfg.lockTtlMs, cfg.lockWaitMs)
      var crashed = false
      // heartbeat daemon: the TTL is measured from the lock's mtime,
      // so a LIVE committer refreshes it every ttl/4 — without this, a
      // single commit step slower than lockTtlMs (a big checkpoint
      // append on a real cluster) would get its lock broken mid-commit
      // by a waiter and url ownership would double. The thread dies
      // with the process on a real crash (daemon) and is interrupted
      // on every in-process exit path, so a simulated crash leaves a
      // lock that goes stale exactly like a real one.
      val heartbeat = new Thread(() =>
        try {
          while (!Thread.currentThread().isInterrupted) {
            Thread.sleep(math.max(1000L, cfg.lockTtlMs / 4))
            heartbeatCommitLock(fs, checkpointDir, attempt)
          }
        } catch { case _: InterruptedException => () })
      heartbeat.setDaemon(true)
      heartbeat.start()
      try {
        // a concurrent healer may have GC'd our not-yet-recorded
        // staging while we waited for the lock (its GC is TTL-gated,
        // but a stage→lock gap longer than the TTL is possible under
        // contention); re-stage under the lock if so — `extracted` is
        // persisted, so this is a rewrite, not a re-extraction
        if (!fs.exists(new org.apache.hadoop.fs.Path(staged)))
          extracted
            .withColumn("bucket", pmod(xxhash64($"url"), lit(nBuckets)))
            .drop("n_bytes", "partition_id")
            .write.mode("overwrite").partitionBy("bucket").parquet(staged)
        val committed: Dataset[ExtractedDoc] =
          if (!pathExists(spark, checkpointDir)) extracted
          else {
            val done2 = spark.read.parquet(checkpointDir).select("url").distinct()
            val nConflicts = extracted.join(done2, Seq("url"), "left_semi").count()
            if (nConflicts == 0) extracted
            else {
              // losing side of the race: drop the stolen urls and
              // re-stage the remainder (only the loser pays a rewrite)
              val keep = extracted.join(done2, Seq("url"), "left_anti")
                .as[ExtractedDoc].persist()
              keep.count() // materialize before overwriting nothing-yet
              keep
                .withColumn("bucket", pmod(xxhash64($"url"), lit(nBuckets)))
                .drop("n_bytes", "partition_id")
                .write.mode("overwrite").partitionBy("bucket").parquet(staged)
              keep
            }
          }
        val statuses = committed.groupBy($"status").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        if (statuses.isEmpty) {
          // everything was stolen: nothing to commit, GC our staging
          fs.delete(new org.apache.hadoop.fs.Path(staged), true)
        } else {
          // 2. record lineage + the attempt that owns each url — but
          // first confirm the lock still carries OUR attempt id: if a
          // waiter TTL-broke it (heartbeat starved or setTimes-degraded
          // FS), appending now would double url ownership
          verifyCommitLock(fs, checkpointDir, attempt)
          val now = new Timestamp(System.currentTimeMillis())
          committed.select($"url", $"status", $"duration_ms", $"n_bytes", $"partition_id")
            .withColumn("run_id", lit(runId))
            .withColumn("attempt", lit(attempt))
            .withColumn("finished_at", lit(now))
            .select("run_id", "attempt", "partition_id", "url", "status",
              "duration_ms", "n_bytes", "finished_at")
            .write.mode("append").parquet(checkpointDir)
          if (fail.afterCheckpoint) { crashed = true; throw new InjectedCrash("after checkpoint") }
          // 3. publish (single rename)
          publish(spark, staged, outDir, attempt, failRename = fail.renameFalse)
        }
        RunReport(
          attempted = statuses.values.sum,
          ok = statuses.getOrElse("ok", 0L),
          error = statuses.getOrElse("error", 0L),
          skipped = statuses.getOrElse("skipped_oversize", 0L))
      } finally {
        heartbeat.interrupt()
        // a simulated CRASH means process death: the lock file stays
        // behind (exactly what the TTL-breaking path is for); every
        // other exit — success or a surviving failure — releases it
        if (!crashed) releaseCommitLock(fs, checkpointDir)
      }
    } finally extracted.unpersist()
  }

  private def commitLockPath(checkpointDir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(checkpointDir + ".commitlock")

  /** Atomic-create lock with TTL-based stale-lock breaking: a crashed
    * committer's lock (mtime older than ttlMs) is deleted and the slot
    * re-contended; a LIVE committer makes progress within the TTL or
    * is itself crashed by definition. Bounded wait, then fail loudly —
    * blocking a 1000-executor job silently is worse than erroring. */
  private[spark] def acquireCommitLock(fs: org.apache.hadoop.fs.FileSystem,
                                       checkpointDir: String, attempt: String,
                                       ttlMs: Long, maxWaitMs: Long): Unit = {
    val lock = commitLockPath(checkpointDir)
    val deadline = System.currentTimeMillis() + maxWaitMs
    var acquired = false
    // RawLocalFileSystem.create(overwrite=false) is CHECK-THEN-ACT, not
    // atomic: two racers can both pass the exists-check, and the second
    // create silently truncates the first owner's payload — both then
    // fail verifyCommitLock and abort (observed once under host load in
    // the two-thread race spec: A found B's id, B found <missing> after
    // A's release). On local filesystems claim the slot with POSIX
    // O_CREAT|O_EXCL (File.createNewFile) instead; HDFS and object
    // stores keep the genuinely-atomic fs.create(…, false).
    val localFile: java.io.File =
      if (fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
          fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem])
        new java.io.File(fs.makeQualified(lock).toUri.getPath)
      else null
    while (!acquired) {
      try {
        fs.mkdirs(lock.getParent)
        if (localFile != null) {
          if (!localFile.createNewFile()) // atomic O_EXCL claim
            throw new java.io.IOException(s"lock $lock exists")
          // the claim is ours; payload goes in via raw java.io (no
          // ChecksumFileSystem .crc sidecar — readers of a crc-less
          // file skip verification)
          try {
            val out = new java.io.FileOutputStream(localFile)
            try out.write(attempt.getBytes("UTF-8")) finally out.close()
          } catch {
            case e: java.io.IOException =>
              try fs.delete(lock, false)
              catch { case _: java.io.IOException => () }
              throw e
          }
        } else {
          val out = fs.create(lock, false) // atomic: fails if present
          // the create CLAIMED the slot; if the payload write/close then
          // fails, release our own claim before retrying — otherwise the
          // loop below would treat our fresh empty lock as a foreign one
          // and spin until the deadline while blocking every other run
          try { out.write(attempt.getBytes("UTF-8")); out.close() }
          catch {
            case e: java.io.IOException =>
              try fs.delete(lock, false)
              catch { case _: java.io.IOException => () }
              throw e
          }
        }
        acquired = true
      } catch {
        case _: java.io.IOException =>
          val stale = try {
            val st = fs.getFileStatus(lock)
            System.currentTimeMillis() - st.getModificationTime > ttlMs
          } catch { case _: java.io.FileNotFoundException => false } // freed: retry now
          if (stale) {
            // re-check right before deleting: a fresh lock may have
            // replaced the stale one since the check above (the
            // remaining check-to-delete window is microseconds; a
            // victim would also need a >ttl commit gap to be hurt,
            // which the committer-side heartbeat prevents)
            val stillStale = try {
              val st2 = fs.getFileStatus(lock)
              System.currentTimeMillis() - st2.getModificationTime > ttlMs
            } catch { case _: java.io.FileNotFoundException => false }
            if (stillStale) fs.delete(lock, false)
          }
          else if (System.currentTimeMillis() > deadline)
            throw new java.io.IOException(
              s"commit lock $lock not acquired within ${maxWaitMs} ms")
          else Thread.sleep(50)
      }
    }
  }

  private[spark] def releaseCommitLock(fs: org.apache.hadoop.fs.FileSystem,
                                       checkpointDir: String): Unit =
    fs.delete(commitLockPath(checkpointDir), false)

  /** Refresh the lock's TTL clock. Primary path: bump mtime via
    * setTimes. On filesystems that refuse setTimes, silently degrading
    * to the plain TTL would let a waiter break a LIVE committer's lock
    * (the exact double-commit this lock prevents), so the fallback
    * REWRITES the lock file in place — create(overwrite) resets mtime
    * everywhere — but only after confirming the file still carries OUR
    * attempt id, so a lock a waiter already broke and re-claimed is
    * never clobbered. */
  private[spark] def heartbeatCommitLock(fs: org.apache.hadoop.fs.FileSystem,
                                  checkpointDir: String,
                                  attempt: String = null): Unit = {
    val lock = commitLockPath(checkpointDir)
    val now = System.currentTimeMillis()
    try { fs.setTimes(lock, now, now) }
    catch {
      case _: Throwable =>
        try {
          if (attempt != null && readLockOwner(fs, checkpointDir).contains(attempt)) {
            val out = fs.create(lock, true)
            out.write(attempt.getBytes("UTF-8"))
            out.close()
          }
        } catch { case _: Throwable => () }
    }
  }

  /** Current lock-file payload (the owning attempt id), if readable. */
  private[spark] def readLockOwner(fs: org.apache.hadoop.fs.FileSystem,
                                   checkpointDir: String): Option[String] =
    try {
      val in = fs.open(commitLockPath(checkpointDir))
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](256)
        var n = in.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, "UTF-8"))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Last-line-of-defense ownership check before the irreversible
    * commit steps: if the lock no longer carries our attempt id (a
    * waiter TTL-broke it — heartbeat starvation, setTimes degradation),
    * abort THIS run rather than append overlapping ownership rows. */
  private[spark] def verifyCommitLock(fs: org.apache.hadoop.fs.FileSystem,
                                      checkpointDir: String,
                                      attempt: String): Unit = {
    val owner = readLockOwner(fs, checkpointDir)
    if (!owner.contains(attempt))
      throw new java.io.IOException(
        s"commit lock lost before checkpoint append: expected owner $attempt, " +
        s"found ${owner.getOrElse("<missing>")} — aborting commit to avoid double ownership")
  }

  /** Committed output: plain parquet read of outDir (run=attempt /
    * bucket=n partition dirs). Staging lives outside outDir, and each
    * url is checkpoint-owned by exactly one attempt, so this is
    * duplicate-free WITHOUT any reader-side dedup. */
  def readOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", outDir).parquet(outDir)

  private def publish(spark: SparkSession, staged: String, outDir: String,
                      attempt: String, failRename: Boolean = false): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(staged)
    val dst = new org.apache.hadoop.fs.Path(s"$outDir/run=$attempt")
    val fs = src.getFileSystem(conf)
    fs.mkdirs(dst.getParent)
    if (failRename || !fs.rename(src, dst))
      throw new java.io.IOException(s"publish rename failed: $src -> $dst")
  }

  /** Recovery pass, run before each attempt:
    *  - finish publishes the checkpoint recorded but a crash or a
    *    false-returning rename interrupted. Staging presence is the
    *    authority: a COMPLETED rename removes src, so src+dst both
    *    existing means dst is partial debris from a non-atomic
    *    copy-based rename — it is replaced wholesale from staging
    *    (the previous `!dst.exists` guard would have trusted the
    *    partial dst as committed: silent loss);
    *  - tolerate a concurrent healer winning the same publish (rename
    *    fails but dst now exists → done);
    *  - GC staged attempts the checkpoint never recorded — including
    *    stray non-attempt files dropped into staging (their urls are
    *    still pending, so they will be re-extracted; the stale files
    *    were never readable).
    *
    * Runs ENTIRELY under the commit lock: a lock-free heal racing a
    * live committer could observe src before its rename and dst after
    * it (or a mid-copy dst on object stores), then delete the freshly
    * published output while the checkpoint already owns those urls —
    * silent permanent loss — or steal the rename and fail the
    * committer's publish after a successful commit. Under the lock,
    * src+dst coexisting really does mean debris (commits are
    * serialized), and src existence is re-checked after acquisition.
    * The GC of UNRECORDED staging is additionally TTL-gated: a live
    * concurrent attempt stages outside the lock, so a fresh unrecorded
    * dir may belong to a committer still working — only dirs idle
    * longer than the lock TTL are orphans. */
  private[spark] def heal(spark: SparkSession, outDir: String,
                          checkpointDir: String,
                          cfg: Config = Config()): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(stagingRoot(outDir))
    val fs = root.getFileSystem(conf)
    val healId = "heal-" + java.util.UUID.randomUUID().toString.take(8)
    acquireCommitLock(fs, checkpointDir, healId, cfg.lockTtlMs, cfg.lockWaitMs)
    try {
      val recorded: Set[String] =
        if (pathExists(spark, checkpointDir))
          spark.read.parquet(checkpointDir).select("attempt").distinct()
            .collect().map(_.getString(0)).toSet
        else Set.empty
      for (att <- recorded) {
        val dst = new org.apache.hadoop.fs.Path(s"$outDir/run=$att")
        val src = new org.apache.hadoop.fs.Path(s"${stagingRoot(outDir)}/$att")
        if (fs.exists(src)) { // re-checked under the lock
          if (fs.exists(dst)) fs.delete(dst, true) // partial rename debris
          try publish(spark, src.toString, outDir, att)
          catch {
            case e: java.io.IOException =>
              if (!fs.exists(dst)) throw e // a concurrent healer won: fine
          }
        }
      }
      if (fs.exists(root)) {
        val now = System.currentTimeMillis()
        fs.listStatus(root).foreach { st =>
          if (!recorded.contains(st.getPath.getName) &&
              now - st.getModificationTime > cfg.lockTtlMs)
            fs.delete(st.getPath, true)
        }
      }
    } finally releaseCommitLock(fs, checkpointDir)
  }

  /** Per-partition metrics rollup (SURVEY §2.5 aggregations). */
  def partitionMetrics(extracted: Dataset[ExtractedDoc]): DataFrame = {
    extracted.groupBy(col("partition_id")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_pages")).as("n_pages"),
      sum(col("n_bytes")).as("n_bytes"),
      avg(col("duration_ms")).as("avg_ms"),
      max(col("duration_ms")).as("max_ms"),
      sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"))
  }

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
