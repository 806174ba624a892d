package graft.cdc

/** Multi-table atomic commit (A55) — the all-or-nothing publish of
  * ONE pipeline run across SEVERAL bucketed stores (facts + dims +
  * rollup targets), the cross-table guarantee the reference gets
  * implicitly from running its stored procedures inside one warehouse
  * job and that single-table lakehouse logs (Delta/Iceberg) famously
  * lack.
  *
  * Protocol — write-ahead intent with roll-FORWARD recovery:
  *
  *  1. STAGE: each table's publish runs with `swapNow = false` —
  *     data files and manifest are fully written, the optimistic
  *     commit claim (A52) is TAKEN AND HELD (so no competing writer
  *     can interleave a version), but the pointer is untouched:
  *     readers still see the old snapshot, and a crash here leaves
  *     only invisible `orphan_inflight` dirs (fsck-reported,
  *     reclaimable).
  *  2. INTENT: `commit` writes `<coordDir>/<id>.intent` listing every
  *     (table, version, batchId) — the durable decision record. Until
  *     this file exists, nothing is committed; after it exists, the
  *     transaction MUST eventually complete.
  *  3. SWAP: each table's pointer swaps (atomic per table, releasing
  *     its claim). A crash mid-way leaves some tables new and some
  *     old — visible only within the crash window, because…
  *  4. RECOVER: `recover` scans for intents without a `.done` marker
  *     and replays step 3. `completeStaged` is idempotent and
  *     regression-proof, so replaying is always safe. Run it before
  *     the next pipeline cycle (the reference's scheduler slot).
  *  5. DONE: `<id>.done` marks the transaction complete; `sweep`
  *     may then garbage-collect the pair.
  *
  * Guarantee: ATOMIC-EVENTUALLY — after `recover`, either every
  * staged table is committed (intent existed) or none is (it did
  * not). Cross-table SNAPSHOT ISOLATION during the swap window is
  * explicitly not claimed; a reader racing step 3 can see table A
  * at the new version and table B at the old one, exactly as with
  * any per-table-atomic log. The window is one pointer swap per
  * table — microseconds, not the publish duration.
  *
  * One in-flight transaction per table: staging holds the table's
  * commit claim, so a second transaction staging the same table
  * throws `ConcurrentWriteException` at stage time, before any work.
  */
object Txn {

  /** One table's staged-but-unswapped publish. */
  final case class Staged(targetDir: String, version: Long, batchId: Long = -1L)

  /** Declare intent and swap every staged table. Returns the
    * transaction id. Verifies every staged manifest is readable
    * BEFORE writing the intent — a torn stage must fail the whole
    * transaction, not half-commit it.
    */
  def commit(coordDir: String, staged: Seq[Staged]): String = {
    require(staged.nonEmpty, "empty transaction")
    require(staged.map(_.targetDir).distinct.size == staged.size,
      "one staged version per table")
    staged.foreach { st =>
      require(CdcPipeline.manifest(st.targetDir, st.version).nonEmpty,
        s"staged version v${st.version} at ${st.targetDir} has no readable manifest")
    }
    val id = newId(coordDir)
    StoreFs.writeString(s"$coordDir/$id.intent",
      staged.map(st => s"${st.targetDir}\t${st.version}\t${st.batchId}")
        .mkString("\n"))
    staged.foreach(st =>
      CdcPipeline.completeStaged(st.targetDir, st.version, st.batchId))
    StoreFs.writeString(s"$coordDir/$id.done", "")
    id
  }

  /** Throw away a staged transaction BEFORE commit: claims release,
    * invisible version dirs delete. Never call after `commit` wrote
    * the intent — a decided transaction rolls forward, not back.
    */
  def abort(staged: Seq[Staged]): Unit =
    staged.foreach(st => CdcPipeline.abortStaged(st.targetDir, st.version))

  /** Complete every decided-but-unfinished transaction (crash between
    * intent and done): replay the pointer swaps — idempotent and
    * regression-proof — and mark done. Returns the ids completed.
    */
  def recover(coordDir: String): Seq[String] = {
    val intents = StoreFs.listFilePaths(coordDir, ".intent")
      .map(p => p.substring(p.lastIndexOf('/') + 1).stripSuffix(".intent"))
    val unfinished = intents.filterNot(id => StoreFs.exists(s"$coordDir/$id.done"))
    unfinished.sorted.map { id =>
      StoreFs.readString(s"$coordDir/$id.intent").split("\n").filter(_.nonEmpty)
        .foreach { line =>
          val Array(dir, v, b) = line.split("\t")
          CdcPipeline.completeStaged(dir, v.toLong, b.toLong)
        }
      StoreFs.writeString(s"$coordDir/$id.done", "")
      id
    }
  }

  /** Cross-table CONSISTENT READ (A59 — the read-side complement of
    * the commit protocol): the versions pinned by the LATEST completed
    * transaction covering ALL the requested tables. `commit`'s swap
    * window means live pointers can transiently disagree across
    * tables (the "atomic-eventually" caveat); reading each table via
    * time travel at its intent-recorded version removes the race
    * entirely — the intent file IS the cross-table snapshot
    * descriptor, so readers who need table A and table B from the
    * same pipeline run read exactly that, however many single-table
    * or unrelated-transaction writes landed since.
    *
    * Returns None when no completed transaction covers every
    * requested table (a partial answer would silently mix runs — the
    * A42 refusal discipline). Monotonic: transaction ids sort by
    * creation time, so "latest" never goes backward. The pinned
    * versions stay readable through later delta publishes (carried
    * references); only a full rewrite + vacuum retires them, in which
    * case the time-travel read itself fails loudly.
    */
  def consistentVersions(coordDir: String,
      tables: Seq[String]): Option[Map[String, Long]] = {
    require(tables.nonEmpty, "no tables requested")
    val done = StoreFs.listFilePaths(coordDir, ".done")
      .map(p => p.substring(p.lastIndexOf('/') + 1).stripSuffix(".done"))
      .sorted.reverse
    done.iterator.map { id =>
      StoreFs.readString(s"$coordDir/$id.intent").split("\n")
        .filter(_.nonEmpty).map { line =>
          val Array(dir, v, _) = line.split("\t")
          dir -> v.toLong
        }.toMap
    }.find(m => tables.forall(m.contains))
      .map(m => m.view.filterKeys(tables.contains).toMap)
  }

  /** Time-traveled frames at [[consistentVersions]]' pins — one
    * DataFrame per requested table, all from the same transaction.
    */
  def readConsistent(spark: org.apache.spark.sql.SparkSession,
      coordDir: String, tables: Seq[String])
      : Option[Map[String, org.apache.spark.sql.DataFrame]] =
    consistentVersions(coordDir, tables).map(_.map { case (dir, v) =>
      dir -> CdcPipeline.readSnapshotAt(spark, dir, v).getOrElse(
        throw new IllegalStateException(
          s"transaction-pinned version v$v at $dir is no longer readable " +
            "(retired by a full rewrite + vacuum)"))
    })

  /** Drop completed intent/done pairs older than `keepMs`. */
  def sweep(coordDir: String, keepMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val now = System.currentTimeMillis()
    StoreFs.listFilePaths(coordDir, ".done")
      .filter(p => StoreFs.mtimeMs(p).exists(_ < now - keepMs))
      .map { p =>
        val id = p.substring(p.lastIndexOf('/') + 1).stripSuffix(".done")
        StoreFs.deleteFile(s"$coordDir/$id.intent")
        StoreFs.deleteFile(p)
        id
      }
  }

  /** Monotonic-ish unique id, claimed with atomic create (two
    * committers racing the same millisecond diverge on the suffix).
    */
  private def newId(coordDir: String): String = {
    var i = 0
    while (i < 1000) {
      val id = f"txn-${System.currentTimeMillis()}%013d-$i%03d"
      if (StoreFs.createExclusive(s"$coordDir/$id.claim", "")) {
        StoreFs.deleteFile(s"$coordDir/$id.claim")
        return id
      }
      i += 1
    }
    throw new IllegalStateException("could not allocate a transaction id")
  }
}
