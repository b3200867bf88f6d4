package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
  * is not atomic use the CREATE-EXCLUSIVE pointer protocol instead
  * (`graft.store.pointerProtocol`, auto-selected by scheme): each flip
  * writes an immutable `_POINTER.<gen>` marker conditionally, current
  * resolves as the max — racing flips write different markers and the
  * max wins deterministically, so no flip record is ever overwritten
  * and a torn multi-table state remains impossible on every store
  * class.
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
  private val Reserved = "_RESERVED"
  private val reserveNonce = new java.util.concurrent.atomic.AtomicLong()

  /** Pointer-marker prefix of the CREATE-EXCLUSIVE flip protocol:
    * `_POINTER.<gen>` files, one per flip, resolved as the max — shared
    * with [[StoreFsck]] like [[PointerTmpPrefix]]. */
  private[graft] val PointerMarkerPrefix = "_POINTER."

  /** The flip-protocol knob (a Spark conf, runtime-settable):
    * `rename` — one `_CURRENT` file updated by write-tmp + atomic
    * RENAME-OVERWRITE (POSIX, HDFS); `exclusive` — an immutable
    * `_POINTER.<gen>` marker per flip, written CREATE-EXCLUSIVE, the
    * max resolving as current (object stores, where rename is
    * copy+delete and an overwrite is last-writer-wins: two racing
    * flips under `exclusive` write two different markers and the max
    * wins deterministically — neither record is ever destroyed);
    * `auto` (default) — by scheme: file/hdfs/viewfs rename, everything
    * else exclusive. Resolution ([[currentGen]]) always honors BOTH
    * record forms, so a store migrates protocols by just flipping the
    * knob. */
  private val ProtocolConf = "graft.store.pointerProtocol"

  private def flipProtocol(root: String): String = {
    val mode = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.conf.get(ProtocolConf, "auto")).getOrElse("auto")
    mode match {
      case "rename" | "exclusive" => mode
      case "auto" =>
        val (fs, p) = StoreFs.fsPath(root)
        fs.makeQualified(p).toUri.getScheme match {
          case null | "file" | "hdfs" | "viewfs" => "rename"
          case _ => "exclusive"
        }
      case other => throw new IllegalArgumentException(
        s"$ProtocolConf must be auto|rename|exclusive, got '$other'")
    }
  }

  /** Generation ids recorded by `_POINTER.<gen>` flip markers. */
  private def markerGens(root: String): Seq[Long] =
    StoreFs.listNames(root).collect {
      case n if n.startsWith(PointerMarkerPrefix) &&
          n.length > PointerMarkerPrefix.length &&
          n.drop(PointerMarkerPrefix.length).forall(_.isDigit) =>
        n.drop(PointerMarkerPrefix.length).toLong
    }

  /** This host's name, as written into reservation tokens — gc's
    * pid-liveness check only applies to reservations OUR host made
    * (a pid is meaningless across hosts). */
  private[graft] lazy val hostId: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: java.net.UnknownHostException => "unknown-host" }

  /** (host, pid) of a generation's reservation token — Some while a
    * publish holds the dir (or crashed holding it), None for committed
    * generations and pre-protocol partials. A token whose format is
    * unrecognized reads as a FOREIGN reservation (retired only by the
    * lease, never the pid-liveness rule) rather than as none. */
  private[graft] def reservation(root: String, gen: Long)
      : Option[(String, Long)] =
    StoreFs.readBytesOpt(s"${genDir(root, gen)}/$Reserved").map { b =>
      new String(b, "UTF-8").trim.split(' ') match {
        case Array(host, pid, _) if pid.forall(_.isDigit) =>
          (host, pid.toLong)
        case _ => ("unparseable-token", -1L)
      }
    }

  /** Lease (ms) on FOREIGN-host reservations: gc retires a `_RESERVED`
    * dir another host wrote once the token file's mtime is older than
    * this — the cross-host analog of the same-host pid-liveness check
    * (without it, a publisher that crashes on another host leaves dead
    * bytes NO sweep ever names — unbounded on a multi-writer cluster).
    * The default is deliberately generous (7 days); the operational
    * rule is LEASE > THE LONGEST PLAUSIBLE TABLE WRITE, because a
    * publisher swept mid-write fails LOUDLY at commit (the reservation
    * token recheck) — a too-short lease wastes a rebuild, never tears
    * state. 0 disables (pre-r13 behavior: foreign reservations are
    * never retired). Runtime-settable Spark conf. */
  private val LeaseConf = "graft.store.reservationLeaseMs"
  private val DefaultLeaseMs: Long = 7L * 24 * 3600 * 1000

  private def reservationLeaseMs: Long =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.conf.get(LeaseConf, DefaultLeaseMs.toString).toLong)
      .getOrElse(DefaultLeaseMs)

  /** A provably-abandoned reservation — the crashed in-flight publishes
    * gc can retire: one THIS host made whose publisher pid is dead, or
    * a FOREIGN-host one (unparseable tokens included) whose token file
    * has outlived the [[reservationLeaseMs]] lease. A live same-host
    * publisher is never stale regardless of age (liveness is provable);
    * a fresh foreign reservation is spared (its liveness is unknowable,
    * so the lease is the contract). */
  private[graft] def staleReservation(root: String, gen: Long): Boolean =
    reservation(root, gen).exists { case (host, pid) =>
      if (host == hostId && pid >= 0) {
        val h = ProcessHandle.of(pid)
        !(h.isPresent && h.get.isAlive)
      } else {
        val lease = reservationLeaseMs
        lease > 0 &&
          StoreFs.modificationTime(s"${genDir(root, gen)}/$Reserved")
            .exists(m => System.currentTimeMillis() - m > lease)
      }
    }

  /** The crashed-flip tmp prefix — shared with [[StoreFsck]] so the
    * audit and the gc can never drift apart on the naming. */
  private[graft] val PointerTmpPrefix = s"$Pointer.tmp."

  private def genDir(root: String, gen: Long) = s"$root/gen-$gen"

  /** MAINTENANCE operations (publish's reserve/commit steps, takedown,
    * gc, adopt) serialize under one lock per store root — two
    * concurrent publishers would otherwise both claim the same
    * generation id, and a takedown could slip a generation past its
    * overlay append. The lock is held only for METADATA steps: a
    * publish's distributed table write happens OUTSIDE it (between
    * reserve and commit), so a takedown — the compliance sink's
    * foreachBatch included — never blocks behind a corpus-sized
    * rebuild; it records into the in-flight reservation's overlay
    * instead. READERS never take it: a complete generation is
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

  /** The current generation — the NEWEST flip record across both
    * pointer protocols: the `_CURRENT` file's content (rename protocol)
    * and the max `_POINTER.<gen>` marker (exclusive protocol). None
    * before the first publish. Loud failure on unreadable `_CURRENT`
    * CONTENT even when markers exist (a corrupt pointer is an
    * operational fact demanding [[adopt]], never silently out-voted).
    *
    * Cost: one root LISTING plus the pointer read — deliberately
    * unconditional (skipping the listing when `_CURRENT` exists would
    * silently time-travel a store whose knob flipped exclusive→rename
    * while markers above `_CURRENT` remained). Store opens are
    * per-query, never per-row, and a store root holds a handful of
    * entries; a metadata cache would trade that for staleness across
    * processes. */
  def currentGen(root: String): Option[Long] = {
    val (fs, p) = StoreFs.fsPath(s"$root/$Pointer")
    val renamed =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val raw = new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
          Some(raw.toLong)
        } catch {
          // unparseable content and checksum-mismatched bytes are the
          // same operational fact: the pointer is corrupt (it must
          // surface as that, not as an empty store or a generic IO
          // failure)
          case e @ (_: NumberFormatException |
                    _: org.apache.hadoop.fs.ChecksumException) =>
            throw new IllegalStateException(
              s"VersionedStore: corrupt pointer at $root/$Pointer", e)
        } finally in.close()
      }
    (renamed ++ markerGens(root)).maxOption
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
    * collide with the protocol's own artifacts — no underscore-prefixed
    * names (all protocol records start with `_`, and Spark readers
    * ignore `_`-prefixed paths anyway, so such a table could never be
    * read back).
    *
    * `partitionBy` maps a table name to partition columns for its
    * write — how a compaction rewrite preserves a batch-addressed
    * table's `batch=<id>` append history (the as-of pin) through the
    * fresh generation. */
  def publish(root: String, tables: Map[String, DataFrame],
      partitionBy: Map[String, Seq[String]] = Map.empty): Long = {
    require(tables.nonEmpty, "VersionedStore.publish: no tables")
    require(partitionBy.keySet.subsetOf(tables.keySet),
      s"VersionedStore.publish: partitionBy names unknown tables" +
        s" ${partitionBy.keySet -- tables.keySet}")
    tables.keys.foreach { n =>
      val base = n.split('/').head
      require(base.nonEmpty && !base.startsWith("gen-") &&
        base != "tombstones" && !base.startsWith("_"),
        s"VersionedStore.publish: table name '$n' collides with the" +
          " store protocol's own layout")
    }
    // RESERVE under a SHORT lock, write the tables OUTSIDE it, COMMIT
    // under a second short lock: the maintenance lock is never held for
    // the duration of a distributed table write, so a takedown
    // (including the compliance sink's foreachBatch) is no longer
    // blocked behind a corpus-sized rebuild on the same root — it
    // appends under the lock to every complete generation AND to this
    // reservation's overlay ([[takedownValidated]]), which is exactly
    // why the reservation must be visible before the first table byte
    val (gen, token) = reserve(root)
    val dir = genDir(root, gen)
    // Each table lands in its own subdir of the fresh generation dir —
    // the writes are independent, and most stores publish several tiny
    // driver-bounded tables (codebook, books, quant_stats) next to one
    // corpus-sized one. Writing them concurrently overlaps each write's
    // plan/commit latency with another's tasks (optimization guide §2.6);
    // the commit marker still only lands after EVERY write returned, so
    // generation atomicity is untouched. Overlap.settle additionally
    // terminates every sibling write before a failure propagates — the
    // reservation dir is only retried/wiped once nothing is still
    // writing into it.
    val writes = tables.toSeq.map { case (name, df) =>
      Overlap.run {
        val part = partitionBy.get(name).filter(_.nonEmpty)
        // DRIVER-LOCAL tables (codebook, books, quant_stats — plans
        // that collapse to a LocalRelation) skip the distributed
        // writer: launching a Spark job to write one driver-held row
        // costs a scheduler round-trip + task launch + commit
        // (~60–100 ms of scale-independent latency per table);
        // DriverParquet emits the byte-compatible file directly
        if (part.nonEmpty || !DriverParquet.writeIfLocal(df, s"$dir/$name")) {
          val w = df.write.mode("overwrite")
          part.fold(w)(cols => w.partitionBy(cols: _*))
            .parquet(s"$dir/$name")
        }
      }
    }
    Overlap.settle(writes: _*)
    commit(root, gen, token, tables.keys.map(_.split('/').head).toSet,
      tables.head._2.sparkSession)
  }

  /** Claim the next generation id under the maintenance lock and mark
    * the dir with a reservation token. Numbering past every COMPLETE
    * generation stays the recovery for crashed publishes (re-running
    * one reuses its partial dir, wiped whole here); dirs another
    * publisher has RESERVED — live, or crashed but not yet gc'd — are
    * skipped, never wiped: the reservation is what makes the
    * write-outside-the-lock protocol collision-free. */
  private[graft] def reserve(root: String): (Long, String) =
    maintenance(root) {
      var gen = math.max(currentGen(root).getOrElse(0L),
        listGens(root).collect { case (g, true) => g }
          .maxOption.getOrElse(0L)) + 1L
      while (reservation(root, gen).isDefined) gen += 1L
      val dir = genDir(root, gen)
      require(!StoreFs.exists(s"$dir/$Marker"),
        s"VersionedStore.publish: generation $gen already complete at" +
          s" $root — concurrent publisher? (single-writer protocol, like" +
          " every maintenance pass here)")
      // a crashed publish may have left a PARTIAL dir under this id;
      // wipe it whole rather than per-table overwrite — otherwise a
      // stale table the new publish doesn't carry would ride inside the
      // completed generation and readAsOf would serve it as if published
      StoreFs.deleteRecursive(dir)
      val token = s"$hostId ${ProcessHandle.current.pid}" +
        s" ${reserveNonce.incrementAndGet()}"
      StoreFs.writeAtomic(s"$dir/$Reserved", token.getBytes("UTF-8"))
      (gen, token)
    }

  /** The marker+flip half of [[publish]], under its own short lock. The
    * reservation token is re-checked first: if a stale-reservation gc
    * (or an operator) retired the dir while the tables were writing,
    * committing over it would publish torn state — fail loudly instead.
    * The flip is MONOTONE: concurrent publishers (outside the
    * single-writer contract, but serialized per-step here) commit in
    * write-finish order, and the pointer must never move BACKWARD to an
    * earlier reservation — a non-flipped commit stays readable via
    * [[readAsOf]] and is [[adopt]]/gc fodder like any unreferenced
    * complete generation. */
  private[graft] def commit(root: String, gen: Long, token: String,
      tableBases: Set[String], spark: SparkSession): Long =
    maintenance(root) {
      val dir = genDir(root, gen)
      val held = StoreFs.readBytesOpt(s"$dir/$Reserved")
        .map(new String(_, "UTF-8"))
      require(held.contains(token),
        s"VersionedStore.publish: reservation for generation $gen at" +
          s" $root was ${held.fold("retired mid-write (stale-reservation" +
            " gc against a live publisher?)")(t => s"overwritten by '$t'")}" +
          " — refusing to commit")
      // legacy-flat migration half 1 (see publish scaladoc): pending
      // takedowns recorded under the superseded flat layout carry into
      // this generation's overlay BEFORE the marker — commit-time, so a
      // takedown recorded flat WHILE a first publish was writing its
      // tables is carried too; a complete generation always already
      // filters them (adopt() may flip to it later). The carry FANS OUT
      // like takedownValidatedLocked: into every complete generation
      // and every OTHER in-flight reservation as well — with two
      // serialized-concurrent first publishes over a flat root, the
      // commit landing second sees no flat set (this commit deletes it
      // below), yet its complete generation is readAsOf-pinnable and
      // would otherwise serve the erased ids
      val flatSet = s"$root/tombstones"
      if (StoreFs.hasFileWithSuffix(flatSet, ".parquet")) {
        val flatIds = spark.read.parquet(flatSet).select("id").distinct()
        val all = listGens(root)
        val targets = (all.collect { case (g, true) => g } ++
          all.collect {
            case (g, false) if g != gen && reservation(root, g).isDefined =>
              g
          } :+ gen).distinct
        targets.foreach(g => Tombstones.writeSet(flatIds, genDir(root, g)))
      }
      touch(s"$dir/$Marker")
      // FINAL token recheck after the marker, before the flip: a
      // lease-expired gc on another host (which holds a different
      // maintenance lock — see the scope note) retires a reservation
      // token-FIRST, so a publisher swept mid-commit refuses here
      // instead of flipping the pointer at a dir the sweeper is
      // concurrently deleting. The marker just written comes back OUT
      // first — touch() may have resurrected the swept dir (fs.create
      // makes parents), and a table-less generation presenting as
      // COMPLETE would be exactly what adopt()/readAsOf must never
      // see. The residual window is the milliseconds between this
      // probe and the flip — versus a lease measured in days; full
      // cross-host publish mutual exclusion remains the external
      // coordinator's job (SURVEY §2.9)
      if (!StoreFs.readBytesOpt(s"$dir/$Reserved")
          .map(new String(_, "UTF-8")).contains(token)) {
        StoreFs.deleteRecursive(s"$dir/$Marker")
        throw new IllegalArgumentException(
          s"VersionedStore.publish: reservation for generation $gen at" +
            s" $root vanished between the marker and the flip — a" +
            " stale-reservation gc swept it mid-commit (lease shorter" +
            " than this table write?); refusing to flip")
      }
      StoreFs.deleteRecursive(s"$dir/$Reserved")
      if (currentGen(root).forall(_ < gen)) flipPointer(root, gen)
      // half 2, after the flip: the flat layout is unreachable now
      // (every reader resolves through the pointer) — retire it rather
      // than leave unreferenced bytes no gc names. Idempotent: a crash
      // mid-sweep leaves dirs the next publish re-deletes and fsck
      // reports meanwhile
      StoreFs.deleteRecursive(flatSet)
      tableBases.foreach(base => StoreFs.deleteRecursive(s"$root/$base"))
      gen
    }

  /** Is `root` a versioned store? One pointer probe per protocol form —
    * the layout dispatch every migrated store family runs before
    * choosing between generation-resolved and flat-table paths. */
  def isVersioned(root: String): Boolean =
    StoreFs.exists(s"$root/$Pointer") || markerGens(root).nonEmpty

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

  /** The directory holding generation `gen`'s tables — [[tableRoot]]'s
    * pinned counterpart, for readers that captured a pin and resolve
    * every table of one consistent generation from it (e.g.
    * [[graft.pipeline.Ann]]'s pinned servers, whose codebook/books and
    * coded rows must come from the SAME training). Loud on an absent or
    * incomplete generation, like [[readAsOf]]. */
  def generationRoot(root: String, gen: Long): String = {
    require(StoreFs.exists(s"${genDir(root, gen)}/$Marker"),
      s"VersionedStore.generationRoot: generation $gen at $root is absent" +
        " or incomplete (crashed publish, or gc'd past the retention you" +
        " need)")
    genDir(root, gen)
  }

  /** [[generationRoot]] for a PIN resolve — every `*FromStorePinned` /
    * `loadPinned` server's first step, so a pin that outlived retention
    * fails with a NAMED, actionable error (which pin, which store, what
    * the retention rule is, how to hold a generation) instead of the
    * raw path-not-found a gc'd generation would otherwise surface from
    * deep inside a parquet scan. The retention contract: an UNREGISTERED
    * pin is a client-held token with no server-side footprint — it lives
    * exactly as long as its generation survives gc/compaction
    * (`keepGenerations` later publishes); a training job that must
    * outlive that registers the pin ([[registerPin]]), which gc spares
    * until release or lease expiry. Reference analogue: an SCN that
    * fell off the relay's retention gets a NAMED too-old answer
    * (SCNNotFoundException) routing the client to bootstrap — never a
    * raw read error. */
  def pinnedGenerationRoot(root: String, gen: Long, maxBatch: Option[Long],
      who: String): String = {
    if (!StoreFs.exists(s"${genDir(root, gen)}/$Marker"))
      throw new IllegalStateException(
        s"$who: pin (gen=$gen${maxBatch.fold("")(b => s", batch=$b")})" +
          s" outlived retention at $root — gc/compaction retired the" +
          " pinned generation. Pins live as long as their generation:" +
          " keepGenerations later publishes for an unregistered pin;" +
          " registerPin holds the generation against gc until" +
          " releasePin or pin-lease expiry (graft.store.pinLeaseMs)")
    genDir(root, gen)
  }

  /** gc-visible pin registration — the reservation-lease idiom applied
    * to time-travel pins: a `_PIN.<token>` file under the pinned
    * generation's dir that [[gc]] (and therefore every store family's
    * compaction, which retires through gc) treats as "a reader still
    * needs this generation" and spares it. Lease-bounded
    * (`graft.store.pinLeaseMs`, default 7 days, mtime-based, 0 = pins
    * never expire) for exactly the reservation lease's reason: a
    * registrant that crashes without releasing must not pin the
    * generation's bytes forever on a multi-writer store. A too-short
    * lease never tears state — the pinned read after a sweep fails
    * LOUDLY with [[pinnedGenerationRoot]]'s named error. Registration
    * requires the generation to be complete and present (you can only
    * register a pin you could resolve), and serializes with gc under
    * the maintenance lock so a register can never interleave with the
    * sweep that would retire its target. Returns the token
    * [[releasePin]] takes. */
  def registerPin(root: String, gen: Long): String = maintenance(root) {
    require(StoreFs.exists(s"${genDir(root, gen)}/$Marker"),
      s"VersionedStore.registerPin: generation $gen at $root is absent" +
        " or incomplete — a pin can only register against a generation" +
        " it could resolve")
    val token = s"$hostId-${ProcessHandle.current.pid}-${System.nanoTime}"
    StoreFs.writeAtomic(s"${genDir(root, gen)}/$PinPrefix$token",
      Array.emptyByteArray)
    token
  }

  /** Release a [[registerPin]] registration (idempotent — releasing a
    * token whose generation gc already retired, or releasing twice, is
    * a no-op: the pin is gone either way, which is what release means). */
  def releasePin(root: String, gen: Long, token: String): Unit =
    StoreFs.deleteRecursive(s"${genDir(root, gen)}/$PinPrefix$token")

  /** RENEW a [[registerPin]] lease: re-stamp the `_PIN.<token>` file's
    * mtime so the lease clock restarts — the refresh a legitimate
    * registrant running PAST `graft.store.pinLeaseMs` calls on a
    * heartbeat (without it, the documented remedy for jobs that must
    * outlive keepGenerations expires out from under exactly the long
    * jobs it exists for, mitigated only by the loud post-sweep read
    * error). LOUD on a missing pin: a renew that silently no-ops when
    * the lease already expired and gc already swept would let the
    * registrant keep believing it is protected — the failure names
    * what happened and what to do (re-register while the generation
    * still exists). Serializes with gc under the maintenance lock like
    * registration, so a renew can never interleave with the sweep. */
  def renewPin(root: String, gen: Long, token: String): Unit =
    maintenance(root) {
      val p = s"${genDir(root, gen)}/$PinPrefix$token"
      require(StoreFs.exists(p),
        s"VersionedStore.renewPin: no pin '$token' on generation $gen at" +
          s" $root — the lease expired and gc swept it (or it was" +
          " released); re-register with registerPin while the generation" +
          " still exists, and renew BEFORE the lease runs out")
      StoreFs.setModificationTime(p, System.currentTimeMillis())
    }

  /** One [[registerPin]] registration as [[listPins]] reports it:
    * `expiresAtMs` is None under lease 0 (pins never expire); `live`
    * is gc's OWN sparing classification ([[pinStates]] — the listing
    * can never disagree with the sweep). */
  final case class PinInfo(gen: Long, token: String,
    registeredAtMs: Long, expiresAtMs: Option[Long], live: Boolean)

  /** Every pin registration on `root`, across all generations —
    * the observability surface for "which jobs hold generations on
    * this store, and until when?" (the operational question the
    * reference answers for checkpoints via /relayStats-style
    * introspection, SURVEY §2.10). Metadata-only: one generation
    * listing plus one name listing + mtime per generation; liveness
    * shares [[pinStates]] with gc and fsck so the three surfaces can
    * never drift apart. Sorted (gen, token) for deterministic output. */
  def listPins(root: String): Seq[PinInfo] = {
    val lease = pinLeaseMs
    listGens(root).map(_._1).sorted.flatMap { g =>
      pinStates(root, g).flatMap { case (name, live) =>
        // the mtime read runs outside the maintenance lock: a pin
        // released/swept between pinStates and here returns None — skip
        // it (the pin is gone either way) rather than fabricate an
        // epoch-1970 registration/expiry row
        StoreFs.modificationTime(s"${genDir(root, g)}/$name").map { at =>
          PinInfo(g, name.drop(PinPrefix.length), at,
            if (lease <= 0) None else Some(at + lease), live)
        }
      }.sortBy(_.token)
    }
  }

  private[graft] val PinPrefix = "_PIN."
  private val PinLeaseConf = "graft.store.pinLeaseMs"

  private def pinLeaseMs: Long =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.conf.get(PinLeaseConf, DefaultLeaseMs.toString).toLong)
      .getOrElse(DefaultLeaseMs)

  /** (pin file name, still within lease) for generation `gen` — shared
    * by [[gc]]'s sparing rule and [[StoreFsck.versionedStore]]'s
    * expired-pin finding so sweep and audit can never drift apart. */
  private[graft] def pinStates(root: String, gen: Long)
      : Seq[(String, Boolean)] = {
    val lease = pinLeaseMs
    StoreFs.listNames(genDir(root, gen))
      .filter(_.startsWith(PinPrefix))
      .map { n =>
        (n, lease <= 0 ||
          StoreFs.modificationTime(s"${genDir(root, gen)}/$n")
            .exists(m => System.currentTimeMillis() - m <= lease))
      }
  }

  /** Does generation `gen` carry at least one LIVE registered pin
    * (within the pin lease, or any pin at all under lease 0)? */
  private def livePin(root: String, gen: Long): Boolean =
    pinStates(root, gen).exists(_._2)

  /** The `batch=<id>` append-partition ids under one table dir — the
    * shared parse behind every store family's pin capture. STRICT
    * numeric: a malformed name (`batch=`, `batch=1-2`) is not an id —
    * [[StoreFsck.batchLayout]] reports those as `invalid_batch_subdirs`;
    * a pin simply does not count them (and must not crash on them: the
    * pin capture is often the first reader to meet the corruption). */
  private[graft] def batchIdsOf(tableDir: String): Seq[Long] =
    StoreFs.listDirNames(tableDir).collect {
      case n if n.startsWith("batch=") => n.drop(6)
    }.flatMap(v => scala.util.Try(v.toLong).toOption)

  /** ONE (generation, maxBatch) time-travel coordinate of a versioned
    * store — the shared capture behind [[Ann.pinIndex]] /
    * [[Retrieval.pinPostings]] / [[Dedup.pinSignatureStore]] (each
    * wraps it in its typed pin). Metadata-only: one pointer resolution
    * plus one directory listing of the batch-carrying `table`, never a
    * table scan. `maxBatch` is None on a store without the
    * batch-addressed layout (generation is then the whole coordinate). */
  private[graft] def pinCoordinate(storeDir: String, table: String,
      who: String): (Long, Option[Long]) = {
    val gen = currentGen(storeDir).getOrElse(
      throw new IllegalStateException(s"$who: $storeDir has no published" +
        " generation — only versioned stores carry a pinnable coordinate"))
    (gen, batchIdsOf(s"${generationRoot(storeDir, gen)}/$table").maxOption)
  }

  /** The live rows of `table` under an already-resolved generation dir,
    * optionally pinned at a max append batch — the ONE read every
    * family's pinned server shares: batches past the pin
    * partition-prune out of the plan, the generation's own tombstone
    * overlay still applies (erasure holds under time travel), and the
    * layout `batch` column never reaches a consumer. */
  private[graft] def liveRowsAt(spark: SparkSession, genRoot: String,
      table: String, maxBatch: Option[Long], idCol: String): DataFrame = {
    val raw = spark.read.parquet(s"$genRoot/$table")
    val pinned = maxBatch match {
      case None => raw
      case Some(mb) =>
        require(raw.columns.contains("batch"),
          s"VersionedStore: $genRoot/$table carries no batch-addressed" +
            s" layout but the pin names append batch $mb — pin and store" +
            " disagree (a compaction that dropped the layout would be" +
            " exactly this, and it never does)")
        raw.where(col("batch") <= mb)
    }
    Tombstones.filterLive(pinned.drop("batch"), genRoot, idCol)
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
  /** [[Tombstones.appendValidated]]'s serialization point: the FLAT
    * takedown route must also hold the maintenance lock, or a takedown
    * recorded while a migration publish is committing can be destroyed
    * by the superseded-flat sweep (recorded → swept → silently serving
    * erased rows) or land after it in a flat set no versioned reader
    * consults. The lock is NOT reentrant (ProcessLock throws on same-JVM
    * re-acquisition), so the layout dispatch runs inside ONE hold and
    * calls the unlocked bodies. */
  private[pipeline] def withMaintenanceLock[T](root: String)(body: => T): T =
    maintenance(root)(body)

  private[pipeline] def takedownValidated(idsLong: DataFrame,
      root: String): Unit = maintenance(root) {
    takedownValidatedLocked(idsLong, root)
  }

  /** The lock-free body of [[takedownValidated]] — callable only while
    * the caller holds [[withMaintenanceLock]] for `root`. */
  private[pipeline] def takedownValidatedLocked(idsLong: DataFrame,
      root: String): Unit = {
    val all = listGens(root)
    val complete = all.collect { case (g, true) => g }
    require(complete.nonEmpty,
      s"VersionedStore.takedownDf: no complete generation at $root —" +
        " a takedown against an unpublished store would record nothing")
    // an IN-FLIGHT publish (a reservation whose tables are writing
    // outside the lock) gets the overlay too: its tables were built
    // from rows read before this takedown, so without the append here
    // the new generation would serve the erased ids the moment it
    // flipped. Appending into a CRASHED reservation is dead bytes gc
    // retires with the dir
    val gens = complete ++ all.collect {
      case (g, false) if reservation(root, g).isDefined => g
    }
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
    val (cur, corrupt) =
      (try (currentGen(root), false)
      catch { case _: IllegalStateException => (None, true) }) // replace
    // a DANGLING pointer (its generation deleted or incomplete) is
    // as unrecoverable a reference as corrupt content — and it is
    // the one fsck state that breaks reads, so adopt must repair it
    val usable = cur.filter(complete.contains)
    complete.maxOption.filter(g => usable.forall(_ < g)).map { g =>
      // corrupt or DANGLING records must be REMOVED, not out-voted:
      // resolution takes the max over both record forms, so a stale
      // `_CURRENT` content or `_POINTER.<gen>` marker above the adopted
      // generation would keep winning (or keep throwing, if corrupt).
      // Recovery-time non-atomicity is acceptable here — a crash
      // mid-repair leaves a missing-pointer state adopt itself recovers,
      // never a torn read
      if (corrupt || cur.exists(_ > g)) {
        StoreFs.deleteRecursive(s"$root/$Pointer")
        markerGens(root).filter(_ > g).foreach(m =>
          StoreFs.deleteRecursive(s"$root/$PointerMarkerPrefix$m"))
      }
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
      // superseded pointer MARKERS (exclusive protocol): every
      // `_POINTER.<g>` below the resolved current is a dead flip record
      // — the max is the pointer; one small file per retired flip
      currentGen(root).foreach { cur =>
        markerGens(root).filter(_ < cur).foreach(g =>
          StoreFs.deleteRecursive(s"$root/$PointerMarkerPrefix$g"))
      }
      currentGen(root) match {
        case None => Seq.empty
        case Some(cur) =>
          val gens = listGens(root)
          val keepSet = gens.filter(g => g._1 <= cur && g._2)
            .map(_._1).sorted.reverse.take(keep + 1).toSet
          // a LIVE (or foreign-host) reservation is spared at ANY
          // position: a slower publisher's generation id can fall below
          // cur once a later reservation commits first, and retiring it
          // mid-write would fail that publisher's commit for no reason
          // (the token re-check keeps even that failure loud, never torn)
          def liveReservation(g: Long): Boolean =
            reservation(root, g).isDefined && !staleReservation(root, g)
          // a REGISTERED pin ([[registerPin]]) holds its generation at
          // any position below cur: a training job mid-epoch on a
          // pinned read outlives any keepGenerations policy until it
          // releases (or its lease expires — the crashed-registrant
          // backstop, same contract as the reservation lease)
          val dead = gens.collect {
            case (g, _) if g <= cur && !keepSet.contains(g) &&
              !liveReservation(g) && !livePin(root, g) => g
            // the livePin sparing applies ABOVE cur too: registerPin
            // accepts any complete generation (an unreferenced crashed
            // publish is resolvable via pinnedGenerationRoot and may be
            // adopt()'s recovery target), so sweeping a live-pinned one
            // here would break the "registerPin holds the generation
            // against gc" contract on exactly the generations an
            // operator is mid-recovery on
            case (g, complete) if g > cur && complete &&
              !livePin(root, g) => g
            // g > cur && !complete, reservation from THIS host whose
            // publisher pid is dead: a crashed in-flight publish —
            // provably abandoned, and numbering skips reserved dirs so
            // (unlike pre-protocol partials) no publish ever reuses it
            case (g, false) if g > cur && staleReservation(root, g) => g
            // g > cur && !complete otherwise: kept — a cross-host or
            // still-live publisher may own it (pre-protocol partials:
            // the next local publish wipes-and-reuses the dir anyway)
          }.filterNot(_ == cur).sorted
          // the reservation TOKEN deletes FIRST, then the rest of the
          // dir: a lease-expired FOREIGN publisher that is actually
          // still writing (lease misconfigured below the longest table
          // write) holds a DIFFERENT maintenance lock than this gc, so
          // deletion can interleave with its commit — token-first means
          // its commit's recheck fails LOUDLY before the pointer ever
          // names a half-deleted dir, instead of passing against a
          // token the sweep had not reached yet
          dead.foreach { g =>
            StoreFs.deleteRecursive(s"${genDir(root, g)}/$Reserved")
            StoreFs.deleteRecursive(genDir(root, g))
          }
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

  /** Atomic pointer flip, by the root's protocol ([[ProtocolConf]]):
    * rename — [[StoreFs.writeAtomic]]'s tmp + RENAME with OVERWRITE,
    * tmp name pinned to [[PointerTmpPrefix]] so a crashed flip is the
    * exact dead-bytes artifact fsck and gc name; exclusive — one
    * immutable `_POINTER.<gen>` marker written CREATE-EXCLUSIVE (an
    * existing marker for the SAME generation states the same fact, so
    * the collision is an idempotent success — publish generation ids
    * are reservation-unique, adopt may legitimately re-flip). */
  private def flipPointer(root: String, gen: Long): Unit =
    flipProtocol(root) match {
      case "rename" =>
        StoreFs.writeAtomic(s"$root/$Pointer",
          gen.toString.getBytes("UTF-8"),
          tmpSuffix = s".tmp.${ProcessHandle.current.pid}")
      case _ =>
        StoreFs.createExclusive(s"$root/$PointerMarkerPrefix$gen")
        ()
    }
}
