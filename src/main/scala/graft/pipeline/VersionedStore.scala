package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table store GENERATIONS published by one atomic pointer flip —
  * the protocol that ELIMINATES (not merely detects) the two-commit
  * crash windows the per-table swap protocols document.
  *
  * The problem: several stores here are PAIRS of tables that only make
  * sense together — postings + doclens ([[Retrieval.writePostingsIndex]]:
  * "a crash between them leaves docs indexed without length norms"),
  * sigs + banded (the minhash store's signed-but-never-banded window,
  * [[StoreFsck.minhashStore]]), codebook + cells. Each table's own
  * commit is atomic (Spark publishes files at job commit; the
  * two-rename swap is atomic per rename), but nothing makes the PAIR
  * atomic, so every multi-table update carries a stated fsck-detectable
  * window. That is detection; this module is prevention.
  *
  * Protocol (exactly how table formats version metadata, reduced to its
  * filesystem core):
  *
  *   - a generation directory `gen-<id>/` holds EVERY table of the
  *     store, plus an empty `_COMPLETE` marker written LAST;
  *   - readers resolve through the `_CURRENT` pointer file, whose
  *     content is the generation id — one small read per store open;
  *   - publish = write all tables into a fresh `gen-<id>/`, drop the
  *     marker, then flip `_CURRENT` via write-tmp + RENAME with
  *     OVERWRITE ([[org.apache.hadoop.fs.FileContext]] — atomic on
  *     POSIX and HDFS, the single-file rename every commit-protocol
  *     ultimately bottoms out in). A crash ANYWHERE before the flip
  *     leaves `_CURRENT` on the old generation: readers never see a
  *     torn store, and the partial/unreferenced generation is an
  *     [[StoreFsck.versionedStore]] finding plus [[gc]] fodder — dead
  *     bytes, never wrong answers;
  *   - old generations stay readable until [[gc]] retires them, which
  *     gives snapshot pinning ([[readAsOf]]) for free — the
  *     reproducibility contract [[Retrieval.readPostingsIndexAsOf]]
  *     provides for batch-addressed appends, here for whole rebuilds.
  *
  * Scale shape: the pointer is metadata (one file, a handful of bytes);
  * generation writes are the same distributed table writes the
  * unversioned stores run; nothing store-sized ever moves to publish a
  * generation beyond the tables themselves. Object stores whose rename
  * is not atomic degrade to last-writer-wins on the POINTER — still
  * never a torn multi-table state, because every generation directory
  * is immutable once marked complete.
  *
  * Takedowns are an O(request) PER-GENERATION TOMBSTONE OVERLAY
  * ([[takedownDf]]): the id set appends under every retained complete
  * generation's own `gen-<id>/tombstones`, live reads
  * ([[readLive]]/[[readAsOfLive]] and every store-family reader) anti-join
  * it, and the next [[publish]] — built from live rows — starts with an
  * empty set, making the eventual physical rewrite ride a publish that was
  * happening anyway instead of forcing an immediate corpus-sized republish.
  * Generation TABLES stay immutable (the overlay is a side table, the same
  * shape as the flat stores' [[Tombstones]] discipline); pinned reads
  * filter too — legal erasure must not be resurrectable through time
  * travel — and [[gc]]'s `keep` still bounds how long any pre-takedown
  * bytes exist at all.
  *
  * Reference analogue: the bootstrap's two-phase snapshot/catchup
  * apply, where consumers switch to a new consistent state only at the
  * recorded SCN boundary, never mid-copy
  * (BootstrapCheckpointHandler.java:103-203); checkpoint persistence
  * likewise goes provider-abstracted metadata-first
  * (FileSystemCheckpointPersistenceProvider.java:1).
  */
object VersionedStore {

  private val Pointer = "_CURRENT"
  private val Marker = "_COMPLETE"

  /** The crashed-flip tmp prefix — shared with [[StoreFsck]] so the
    * audit and the gc can never drift apart on the naming. */
  private[graft] val PointerTmpPrefix = s"$Pointer.tmp."

  private def genDir(root: String, gen: Long) = s"$root/gen-$gen"

  /** MAINTENANCE operations (publish/gc/adopt) serialize under one
    * lock per store root — two concurrent publishers would otherwise
    * both claim the same generation id and interleave writes inside one
    * directory. READERS never take it: a complete generation is
    * immutable and the pointer flip is atomic, so reads are lock-free
    * by construction (the whole point of the protocol). The JVM-local
    * monitor wraps the file lock per ProcessLock's contract (same-JVM
    * contention on FileChannel.lock throws).
    *
    * Scope stated honestly: the FileLock serializes publishers that can
    * SEE the same lock file — all local/file: cases, and remote stores
    * maintained from one host (the lock falls back to a host-local
    * file keyed by the store URI). Publishers on DIFFERENT hosts
    * against one remote store need an external coordinator, exactly
    * the single-writer regime every maintenance pass here assumes
    * (SURVEY §2.9: coordination is the driver's job, not the store's). */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def maintenance[T](root: String)(body: => T): T = {
    // resolve the SCHEME through the Hadoop conf, not string parsing: a
    // scheme-less root under fs.defaultFS=hdfs://... is a REMOTE store,
    // and a java.nio lock file on local disk there would be exactly the
    // silent-local-probe hazard StoreFs exists to close
    val (fs, p) = StoreFs.fsPath(root)
    val qualified = fs.makeQualified(p).toUri
    val lockFile = qualified.getScheme match {
      case null | "file" => s"${qualified.getPath}/_MAINTENANCE.lock"
      case _ =>
        val h = java.lang.Integer.toHexString(qualified.toString.hashCode)
        s"${System.getProperty("java.io.tmpdir")}/graft-vstore-$h.lock"
    }
    // per-LOCKFILE monitor (ProcessLock's same-JVM contract), not a
    // global one: publishes to unrelated roots must not serialize
    val mon = monitors.computeIfAbsent(lockFile, _ => new Object)
    mon.synchronized {
      graft.sources.ProcessLock.exclusive(lockFile)(body)
    }
  }

  /** The generation `_CURRENT` points at — None before the first
    * publish. Loud failure on unreadable pointer CONTENT (a corrupt
    * pointer must not read as an empty store). */
  def currentGen(root: String): Option[Long] = {
    val (fs, p) = StoreFs.fsPath(s"$root/$Pointer")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val raw = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        Some(raw.toLong)
      } catch {
        // unparseable content and checksum-mismatched bytes are the same
        // operational fact: the pointer is corrupt (it must surface as
        // that, not as an empty store or a generic IO failure)
        case e @ (_: NumberFormatException |
                  _: org.apache.hadoop.fs.ChecksumException) =>
          throw new IllegalStateException(
            s"VersionedStore: corrupt pointer at $root/$Pointer", e)
      } finally in.close()
    }
  }

  /** Publish one new generation holding ALL of `tables`, and flip the
    * pointer to it. Returns the new generation id. The flip happens
    * only after every table and the completeness marker are down; any
    * crash before it leaves readers on the previous generation.
    *
    * LEGACY-FLAT MIGRATION: a publish over a root that still carries the
    * FLAT layout (pre-generation tables, and in particular a flat
    * `tombstones/` set) supersedes it — and a pending takedown recorded
    * under the old layout must not stop filtering just because the
    * store was rebuilt: the flat id set is CARRIED into the new
    * generation's overlay before the marker lands (a rebuilt table may
    * re-index the erased ids; live-rows rebuilds carry them redundantly,
    * which an anti-join cannot observe). After the flip the superseded
    * flat set and any flat dir shadowing a published table name are
    * DELETED — they are unreferenced bytes no reader can reach and no
    * gc would otherwise retire; a crash mid-cleanup leaves them for the
    * next publish's idempotent re-sweep (fsck: `superseded_flat_dirs`).
    *
    * Table names are slash-separable relative paths (a batch-addressed
    * bootstrap publishes `cells/batch=0`); the BASE segment must not
    * collide with the protocol's own artifacts. */
  def publish(root: String, tables: Map[String, DataFrame]): Long = {
    require(tables.nonEmpty, "VersionedStore.publish: no tables")
    tables.keys.foreach { n =>
      val base = n.split('/').head
      require(base.nonEmpty && !base.startsWith("gen-") &&
        base != "tombstones" && !base.startsWith(Pointer) &&
        base != Marker,
        s"VersionedStore.publish: table name '$n' collides with the" +
          " store protocol's own layout")
    }
    maintenance(root) {
    // number past every COMPLETE generation, not just the pointer: a
    // publish that crashed between its marker and its flip leaves an
    // unreferenced complete generation above the pointer, and the next
    // publish must walk around it (re-running it is the recovery), not
    // refuse forever
    val gen = math.max(currentGen(root).getOrElse(0L),
      listGens(root).collect { case (g, true) => g }
        .maxOption.getOrElse(0L)) + 1L
    val dir = genDir(root, gen)
    require(!StoreFs.exists(s"$dir/$Marker"),
      s"VersionedStore.publish: generation $gen already complete at $root" +
        " — concurrent publisher? (single-writer protocol, like every" +
        " maintenance pass here)")
    // a crashed publish may have left a PARTIAL dir under this id; wipe
    // it whole rather than per-table overwrite — otherwise a stale table
    // the new publish doesn't carry would ride inside the completed
    // generation and readAsOf would serve it as if published
    StoreFs.deleteRecursive(dir)
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name")
    }
    // legacy-flat migration half 1 (see scaladoc): pending takedowns
    // recorded under the superseded flat layout carry into this
    // generation's overlay BEFORE the marker — a complete generation
    // always already filters them (adopt() may flip to it later)
    val flatSet = s"$root/tombstones"
    if (StoreFs.hasFileWithSuffix(flatSet, ".parquet")) {
      val spark = tables.head._2.sparkSession
      Tombstones.writeSet(
        spark.read.parquet(flatSet).select("id").distinct(), dir)
    }
    touch(s"$dir/$Marker")
    flipPointer(root, gen)
    // half 2, after the flip: the flat layout is unreachable now (every
    // reader resolves through the pointer) — retire it rather than leave
    // unreferenced bytes no gc names. Idempotent: a crash mid-sweep
    // leaves dirs the next publish re-deletes and fsck reports meanwhile
    StoreFs.deleteRecursive(flatSet)
    tables.keys.map(_.split('/').head).toSet[String]
      .foreach(base => StoreFs.deleteRecursive(s"$root/$base"))
    gen
    }
  }

  /** Is `root` a versioned store? One pointer-existence probe — the
    * layout dispatch every migrated store family runs before choosing
    * between generation-resolved and flat-table paths. */
  def isVersioned(root: String): Boolean = StoreFs.exists(s"$root/$Pointer")

  /** The directory holding `root`'s LIVE tables: the current generation
    * when the store is versioned, `root` itself for a flat (unversioned
    * or stream-maintained) store — the single resolution point that lets
    * every store reader serve either layout. Loud on a dangling pointer
    * (a generation someone hand-deleted): serving a missing dir as an
    * empty store is the silent failure this module exists to prevent. */
  def tableRoot(root: String): String =
    currentGen(root) match {
      case None => root
      case Some(g) =>
        require(StoreFs.exists(s"${genDir(root, g)}/$Marker"),
          s"VersionedStore.tableRoot: pointer at $root names generation $g" +
            " which is absent or incomplete — repair with adopt() (fsck:" +
            " pointer_to_missing_generation)")
        genDir(root, g)
    }

  /** O(request) takedown for a versioned store: append `ids` (one
    * LONG-castable column, [[Tombstones.appendDf]]'s contract) to the
    * tombstone overlay of EVERY retained complete generation — current
    * AND pinned, because erasure must hold under [[readAsOfLive]] too
    * (time travel never resurrects deleted rows). Request-sized × a
    * handful of generations; stored tables are never read or rewritten.
    * Serialized with publish/gc under the maintenance lock so a
    * concurrent publish cannot slip a generation past the overlay
    * append. Physical purge is the next live-row publish (e.g. the
    * store families' compaction paths), whose fresh generation starts
    * with an empty overlay. */
  def takedownDf(ids: DataFrame, root: String): Unit = {
    val (v, n) = Tombstones.validated(ids)
    if (n > 0) takedownValidated(v, root)
  }

  /** The post-validation half of [[takedownDf]] — also the landing
    * point [[Tombstones.appendDf]] routes to when its store root turns
    * out to be versioned, so every flat-store takedown entry point
    * (tombstoneDocs/tombstoneVectors/tombstoneSignatures/the streaming
    * sink) is generation-aware without per-family changes. */
  private[pipeline] def takedownValidated(idsLong: DataFrame,
      root: String): Unit = maintenance(root) {
    val gens = listGens(root).collect { case (g, true) => g }
    require(gens.nonEmpty,
      s"VersionedStore.takedownDf: no complete generation at $root —" +
        " a takedown against an unpublished store would record nothing")
    // materialize the id set ONCE before the per-generation fan-out: a
    // nondeterministic ids source (a query over changing data, a sampled
    // frame) re-executed per generation could record DIFFERENT sets in
    // different generations' overlays, breaking the invariant the
    // fan-out exists for (erasure holds under pinned reads too).
    // Request-sized by the Tombstones contract, so the driver collect is
    // bounded — the same bound the read-side broadcast anti-join relies on
    val spark = idsLong.sparkSession
    import spark.implicits._
    val pinned = idsLong.as[Long].collect().toSeq.toDF("id")
    gens.foreach(g => Tombstones.writeSet(pinned, genDir(root, g)))
  }

  /** Read `table` at the CURRENT generation (loud when the store has
    * never published — an empty frame would silently serve nothing). */
  def read(spark: SparkSession, root: String, table: String): DataFrame =
    readAsOf(spark, root, table, currentGen(root).getOrElse(
      throw new IllegalStateException(
        s"VersionedStore.read: no published generation at $root")))

  /** [[read]] minus the current generation's tombstone overlay — the
    * serving view of a versioned store table whose rows are keyed by
    * `idCol`. No takedowns, no plan overhead; otherwise one broadcast
    * anti-join ([[Tombstones.filterLive]]). */
  def readLive(spark: SparkSession, root: String, table: String,
      idCol: String): DataFrame = {
    val t = tableRoot(root)
    require(t != root, s"VersionedStore.readLive: $root has no pointer")
    Tombstones.filterLive(spark.read.parquet(s"$t/$table"), t, idCol)
  }

  /** [[readAsOf]] minus generation `gen`'s tombstone overlay: pinned
    * reproducibility for the APPEND history only — takedowns recorded
    * after the pin still erase from it ([[takedownDf]] writes every
    * retained generation), the same non-resurrection rule as
    * [[Retrieval.readPostingsIndexAsOf]]. */
  def readAsOfLive(spark: SparkSession, root: String, table: String,
      gen: Long, idCol: String): DataFrame =
    Tombstones.filterLive(readAsOf(spark, root, table, gen),
      genDir(root, gen), idCol)

  /** Read `table` PINNED at generation `gen` — the whole-rebuild form
    * of snapshot reproducibility: a generation is immutable once
    * complete, so any consumer that records `gen` can replay the exact
    * store state it saw, regardless of later publishes (until [[gc]]
    * retires it, which is the caller's retention policy). */
  def readAsOf(spark: SparkSession, root: String, table: String,
      gen: Long): DataFrame = {
    require(StoreFs.exists(s"${genDir(root, gen)}/$Marker"),
      s"VersionedStore.readAsOf: generation $gen at $root is absent or" +
        " incomplete (crashed publish, or gc'd past the retention you" +
        " need)")
    spark.read.parquet(s"${genDir(root, gen)}/$table")
  }

  /** RECOVERY for the crashed-flip states [[StoreFsck.versionedStore]]
    * reports (an unreferenced complete generation, a missing pointer
    * with generations, a corrupt pointer): flip the pointer to the
    * NEWEST complete generation when the pointer does not already
    * reference it. Returns the adopted generation, or None when there
    * is nothing newer to adopt. Safe by the same argument as publish —
    * a complete generation is immutable and whole, so pointing at it
    * can never expose a torn store; a corrupt pointer is REPLACED
    * (newest-complete is the only recoverable definition of current).
    * Ordering vs [[gc]]: adopt FIRST — gc retires unreferenced complete
    * generations, including the crashed publish adopt would recover. */
  def adopt(root: String): Option[Long] = maintenance(root) {
    val complete = listGens(root).collect { case (g, true) => g }
    val cur =
      (try currentGen(root)
      catch { case _: IllegalStateException => None }) // corrupt: replace
        // a DANGLING pointer (its generation deleted or incomplete) is
        // as unrecoverable a reference as corrupt content — and it is
        // the one fsck state that breaks reads, so adopt must repair it
        .filter(complete.contains)
    complete.maxOption.filter(g => cur.forall(_ < g)).map { g =>
      flipPointer(root, g)
      g
    }
  }

  /** Retire generations: keep the current one plus the `keep` most
    * recent complete predecessors, delete everything else — including
    * INCOMPLETE generations older than current (crashed publishes:
    * dead bytes by protocol) and COMPLETE generations newer than
    * current (a crashed flip's unreferenced publish — [[adopt]]'s
    * recovery target). That last case is a deliberate ORDERING
    * contract, not an accident: gc treats anything the pointer does not
    * reference as retired, so an operator who wants a crashed publish
    * recovered must run [[adopt]] BEFORE gc — gc first permanently
    * discards it (re-running the publish is then the only recovery).
    * Returns the deleted generation ids. Incomplete generations NEWER
    * than current are left alone — they may be a publish in flight. */
  def gc(root: String, keep: Int = 1): Seq[Long] = {
    require(keep >= 0, s"VersionedStore.gc: keep $keep")
    maintenance(root) {
      // crashed-flip pointer tmps are dead bytes too: no flip this lock
      // can see is in flight while we hold it. (A cross-host publisher
      // is outside the lock's stated scope ENTIRELY — a deployment that
      // runs maintenance from several hosts against one remote store
      // needs the external coordinator the scaladoc requires; the
      // incomplete-generation sparing below is belt-and-braces for that
      // misuse, free because the next publish wipes-and-reuses the dir.)
      StoreFs.listNames(root).filter(_.startsWith(PointerTmpPrefix))
        .foreach(n => StoreFs.deleteRecursive(s"$root/$n"))
      currentGen(root) match {
        case None => Seq.empty
        case Some(cur) =>
          val gens = listGens(root)
          val keepSet = gens.filter(g => g._1 <= cur && g._2)
            .map(_._1).sorted.reverse.take(keep + 1).toSet
          val dead = gens.collect {
            case (g, _) if g <= cur && !keepSet.contains(g) => g
            case (g, complete) if g > cur && complete => g
            // g > cur && !complete: kept — a cross-host publisher this
            // lock cannot see may own it, and the next local publish
            // wipes-and-reuses the dir anyway
          }.filterNot(_ == cur).sorted
          dead.foreach(g => StoreFs.deleteRecursive(genDir(root, g)))
          dead
      }
    }
  }

  /** (gen id, complete?) for every generation directory under root. */
  private[graft] def listGens(root: String): Seq[(Long, Boolean)] =
    StoreFs.listDirNames(root).collect {
      case n if n.startsWith("gen-") && n.drop(4).forall(_.isDigit) =>
        val g = n.drop(4).toLong
        (g, StoreFs.exists(s"${genDir(root, g)}/$Marker"))
    }

  private def touch(path: String): Unit = {
    val (fs, p) = StoreFs.fsPath(path)
    val out = fs.create(p, true)
    out.close()
  }

  /** Atomic pointer flip — [[StoreFs.writeAtomic]]'s tmp + RENAME with
    * OVERWRITE, with the tmp name pinned to [[PointerTmpPrefix]] so a
    * crashed flip is the exact dead-bytes artifact fsck and gc name. */
  private def flipPointer(root: String, gen: Long): Unit =
    StoreFs.writeAtomic(s"$root/$Pointer", gen.toString.getBytes("UTF-8"),
      tmpSuffix = s".tmp.${ProcessHandle.current.pid}")
}
