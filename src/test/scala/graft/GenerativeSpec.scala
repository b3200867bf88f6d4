package graft

import graft.model.Checkpoint
import graft.operators._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative invariants over random event vectors — the engine-side
  * mirror of the reference's seeded-random tests
  * (DbusEventGenerator.generateEvents + invariant checks, SURVEY §5;
  * FIXTURES.md §7). Each property checks the distributed operator against
  * an in-memory model implementation, over `Trials` seeded samples
  * (plain ScalaCheck Gen — the scalatest bridge isn't in the offline
  * dependency cache).
  */
class GenerativeSpec extends SparkSpec {
  import spark.implicits._
  import GenerativeSpec.Ev

  private val Trials = 12

  private def samples[A](gen: Gen[A]): Seq[A] =
    (0 until Trials).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  /** Random event vector: windows of 1-8 events, duplicate keys within
    * windows (exercises A1), ~15% deletes, 2 partitions, 3 sources. */
  private val genEvents: Gen[List[Ev]] = for {
    nWindows <- Gen.choose(1, 12)
    windows <- Gen.listOfN(nWindows, Gen.choose(1, 8))
  } yield {
    var seq = 0L
    windows.zipWithIndex.flatMap { case (size, w) =>
      val scn = w * 100L
      (0 until size).map { _ =>
        val s = seq; seq += 1
        Ev(scn, s, (s % 3).toInt + 1, (s % 2).toInt, s % 5,
          if (s % 7 == 3) "DELETE" else "UPSERT", (s % 100) / 10.0)
      }
    }
  }

  private def df(evs: List[Ev]): DataFrame =
    evs.toDF().select(
      col("scn"), col("seq"), col("sourceId").as("source_id"),
      col("partitionId").as("partition_id"), col("keyLong").as("key_long"),
      col("opcode"), col("value"))

  private def appliedModel(evs: List[Ev]): Set[(Long, Long)] =
    evs.groupBy(_.keyLong).view
      .mapValues(_.maxBy(e => (e.scn, e.seq))).toMap
      .filter(_._2.opcode != "DELETE")
      .map { case (k, e) => (k, e.seq) }.toSet

  test("applyLog equals the in-memory latest-per-key materialization") {
    samples(genEvents).filter(_.nonEmpty).foreach { evs =>
      val got = Bootstrap.applyLog(df(evs))
        .select("key_long", "seq").as[(Long, Long)].collect().toSet
      assert(got == appliedModel(evs), s"n=${evs.size}")
    }
  }

  test("checkpoint split matches the model for random positions") {
    val gen = for {
      evs <- genEvents; wScn <- Gen.choose(0L, 1200L); wOff <- Gen.choose(0L, 8L)
    } yield (evs, wScn, wOff)
    samples(gen).filter(_._1.nonEmpty).foreach { case (evs, wScn, wOff) =>
      val after = Relay.streamEvents(df(evs), Checkpoint.online(wScn, wOff))
        .select("seq").as[Long].collect().toSet
      val expected = evs.filter(e =>
        e.scn > wScn || (e.scn == wScn && (e.seq - e.scn) >= wOff))
        .map(_.seq).toSet
      assert(after == expected, s"cp=($wScn,$wOff)")
    }
  }

  test("filters agree with their in-memory predicate models") {
    val genFilter: Gen[(DbusFilter, Ev => Boolean)] = Gen.oneOf(
      Gen.choose(0L, 5L).flatMap(lo => Gen.choose(lo + 1, 6L).map(hi =>
        (KeyRangeFilter(lo, hi): DbusFilter,
          (e: Ev) => e.keyLong >= lo && e.keyLong < hi))),
      for {
        n <- Gen.choose(2L, 5L); lo <- Gen.choose(0L, n - 1)
        hi <- Gen.choose(lo + 1, n)
      } yield (KeyModFilter(n, lo, hi): DbusFilter,
        (e: Ev) => { val b = math.abs(e.keyLong) % n; b >= lo && b < hi }),
      Gen.someOf(1, 2, 3).map(srcs =>
        (SourceFilter(srcs.toSet): DbusFilter,
          (e: Ev) => srcs.toSet.contains(e.sourceId))))
    val gen = for { evs <- genEvents; f <- genFilter } yield (evs, f)
    samples(gen).filter(_._1.nonEmpty).foreach { case (evs, (f, model)) =>
      val got = df(evs).where(f.toColumn).select("seq").as[Long].collect().toSet
      assert(got == evs.filter(model).map(_.seq).toSet, s"filter=$f")
    }
  }

  test("merge-then-apply equals apply directly (merge preserves state)") {
    samples(genEvents).filter(_.nonEmpty).foreach { evs =>
      val merged = Relay.mergeTransaction(df(evs))
        .select(col("scn"), col("seq"), col("source_id"),
          col("key_long"), col("opcode"), col("value"))
      val viaMerge = Bootstrap.applyLog(merged)
        .select("key_long", "seq").as[(Long, Long)].collect().toSet
      assert(viaMerge == appliedModel(evs))
    }
  }

  test("bootstrap stitch equals direct apply for any band split") {
    val gen = for { evs <- genEvents; s <- Gen.choose(0L, 1200L) } yield (evs, s)
    samples(gen).filter(_._1.nonEmpty).foreach { case (evs, startScn) =>
      val target = evs.map(_.scn).max
      val stitched = Bootstrap.snapshotPlusCatchup(df(evs), startScn, target)
        .select("key_long", "seq").as[(Long, Long)].collect().toSet
      assert(stitched == appliedModel(evs), s"start=$startScn")
    }
  }

  // ---- binary segment format (the graft-relay storage) ----

  import graft.sources.relay.RelayBinaryLog
  import graft.sources.relay.RelayBinaryLog.Rec

  private val genRec: Gen[Rec] = for {
    scn <- Gen.choose(0L, 1L << 40)
    seq <- Gen.choose(0L, Long.MaxValue / 2)
    ts <- Gen.choose(0L, Long.MaxValue / 2)
    src <- Gen.choose(-1, 100)
    part <- Gen.choose(0, 64)
    op <- Gen.oneOf(RelayBinaryLog.OpUpsert, RelayBinaryLog.OpDelete)
    key <- Gen.choose(Long.MinValue, Long.MaxValue)
    value <- Gen.choose(-1e12, 1e12)
    props <- Gen.option(Gen.asciiPrintableStr.map(_.take(200)))
  } yield Rec(scn, seq, ts, src, part, op, key, value,
    props.orNull) // empty string and null are distinct and both roundtrip

  test("binary record roundtrip for arbitrary field values") {
    samples(Gen.listOfN(50, genRec)).foreach { recs =>
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      recs.foreach(RelayBinaryLog.writeRecord(out, _))
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val back = Iterator.continually(RelayBinaryLog.readRecord(in))
        .takeWhile(_ != null).toList
      assert(back == recs)
    }
  }

  test("snapshotDiff apply-round-trip for random before/after states") {
    val genTables: Gen[(List[(Long, String, Long)], List[(Long, String, Long)])] =
      for {
        keysB <- Gen.listOfN(30, Gen.choose(0L, 20L))
        keysA <- Gen.listOfN(30, Gen.choose(0L, 20L))
        vA <- Gen.listOfN(30, Gen.choose(0L, 3L))
      } yield (
        keysB.distinct.map(k => (k, s"s$k", k * 10)),
        keysA.distinct.zip(vA).map { case (k, v) =>
          (k, if (v == 0) null else s"s$k", k * 10 + v) }
      )
    samples(genTables).foreach { case (b, a) =>
      val before = b.toDF("k", "s", "v")
      val after = a.toDF("k", "s", "v")
      val diff = operators.Bootstrap.snapshotDiff(before, after, Seq("k"))
      // model: apply the diff to `before` and compare with `after`
      val applied = before
        .join(diff.select(col("k")), Seq("k"), "left_anti")
        .unionByName(diff.where(col("opcode") === "UPSERT").drop("opcode"))
      assert(applied.except(after).isEmpty && after.except(applied).isEmpty)
      // minimality: no diff row for keys whose images are identical
      val identical = before.intersect(after)
      assert(diff.join(identical, Seq("k"), "left_semi")
        .join(identical.select(col("k"), col("s"), col("v")),
          Seq("k", "s", "v"), "left_semi").isEmpty)
    }
  }

  test("minstd sampling invariants: range, determinism, stratum rates") {
    val ids = spark.range(20000).toDF("id")
    // hash lands in [0, M) and buckets in [0, 10000)
    val bad = ids.select(pipeline.Sampling.hashBp(col("id"), 9L).as("b"))
      .where(col("b") < 0 || col("b") >= 10000).count()
    assert(bad === 0L)
    samples(Gen.choose(0, 10000)).foreach { rate =>
      val n = pipeline.Sampling.hashSample(ids, "id", rate, salt = 11L).count()
      val expect = 20000L * rate / 10000
      assert(math.abs(n - expect) <= 300,
        s"rate=$rate bp sampled $n of 20000 (expected ~$expect)")
    }
  }

  // ---- in-memory models of the curation/selection ops ----

  private def md5Bucket(s: String, buckets: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % buckets
  }
  private def minstd(key: Long, salt: Long): Long =
    ((key + salt) % 2147483647L) * 48271L % 2147483647L

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(4, 30)
    lens <- Gen.listOfN(n, Gen.choose(0, 12))
  } yield lens.zipWithIndex.map { case (len, i) =>
    // tiny vocabulary forces real window/bigram collisions across docs
    (i.toLong, (0 until len).map(j => s"w${(i * 7 + j * 3) % 11}")
      .mkString(" "))
  }

  test("mixToBudget equals the in-memory prefix-fill model") {
    samples(genDocs).foreach { docs =>
      val domains = docs.map { case (id, t) => (id, if (id % 3 == 0) "a" else "b", t) }
      val df = domains.toDF("doc_id", "lang", "text")
      val budgets = Map("a" -> 9L, "b" -> 14L)
      val got = pipeline.Sampling.mixToBudget(df, "doc_id", "lang", "text",
          budgets, defaultBudget = 0L, salt = 5L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
          r.getBoolean(4)))).toMap
      // model: per domain, docs in (minstd, id) order, cumulative tokens
      domains.groupBy(_._2).foreach { case (dom, rows) =>
        var cum = 0L
        rows.sortBy { case (id, _, _) => (minstd(id, 5L), id) }
          .foreach { case (id, _, text) =>
            val nTok = text.split("\\s+", -1).length.toLong
            val (gn, gcum, gsel) = got(id)
            assert(gn === nTok, s"tokens of $id")
            assert(gcum === cum, s"cum_before of $id in $dom")
            assert(gsel === (cum < budgets(dom)), s"selected of $id")
            cum += nTok
          }
      }
    }
  }

  test("quantileThreshold equals the in-memory rank model, ties included") {
    samples(genDocs).foreach { docs =>
      // coarse scores force ties: score = len % 4
      val scored = docs.map { case (id, t) =>
        (id, if (id % 2 == 0) "x" else "y",
          (t.split("\\s+", -1).length % 4).toDouble)
      }
      val df = scored.toDF("doc_id", "lang", "score")
      val qBp = 5000
      val got = pipeline.Weighting.quantileThreshold(df, "score", "lang", qBp)
        .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
      scored.groupBy(_._2).foreach { case (_, rows) =>
        val n = rows.size.toLong
        rows.foreach { case (id, _, s) =>
          val cntBelow = rows.count(_._3 < s).toLong
          assert(got(id) === (cntBelow * 10000L >= qBp * n),
            s"doc $id score $s cntBelow $cntBelow n $n")
        }
      }
    }
  }

  test("substringDupStats equals the in-memory window model") {
    val L = 3
    samples(genDocs).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = pipeline.Dedup.substringDupStats(df, windowTokens = L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val windows = docs.flatMap { case (id, t) =>
        val toks = t.split("\\s+", -1)
        (0 to toks.length - L).map(i =>
          (id, toks.slice(i, i + L).mkString(" ")))
      }
      val counts = windows.groupBy(_._2).view.mapValues(_.size).toMap
      docs.foreach { case (id, t) =>
        val toks = t.split("\\s+", -1)
        val mine = windows.filter(_._1 == id)
        val dups = mine.count(w => counts(w._2) > 1).toLong
        assert(got(id) === ((toks.length.toLong, mine.size.toLong, dups)),
          s"doc $id: got ${got(id)}")
      }
    }
  }

  test("importanceWeights equals the in-memory bucket model") {
    samples(genDocs).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val target = docs.filter(_._1 % 4 == 0)
      val tdf = target.toDF("doc_id", "text")
      val B = 64
      def grams(t: String): Seq[String] = {
        val toks = t.split("\\s+", -1)
        (0 until toks.length - 1).map(i => s"${toks(i)} ${toks(i + 1)}")
      }
      val rawCnt = docs.flatMap(d => grams(d._2)).groupBy(g => md5Bucket(g, B))
        .view.mapValues(_.size.toLong).toMap
      val tgtCnt = target.flatMap(d => grams(d._2)).groupBy(g => md5Bucket(g, B))
        .view.mapValues(_.size.toLong).toMap
      val (nr, nt) = (rawCnt.values.sum, tgtCnt.values.sum)
      val got = pipeline.Weighting.importanceWeights(df, tdf, buckets = B)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4)))).toMap
      docs.foreach { case (id, t) =>
        val gs = grams(t)
        val st = gs.map(g => tgtCnt.getOrElse(md5Bucket(g, B), 0L)).sum
        val sr = gs.map(g => rawCnt.getOrElse(md5Bucket(g, B), 0L)).sum
        assert(got(id) === ((gs.size.toLong, st, sr, st * nr > sr * nt)),
          s"doc $id: got ${got(id)} want (${gs.size}, $st, $sr)")
      }
    }
  }

  test("tokenDrift equals the in-memory chi-square model bit-for-bit") {
    val B = 32
    samples(genDocs).foreach { docs =>
      val ref = docs.filter(_._1 % 2 == 0)
      val bat = docs.filter(_._1 % 2 == 1)
      val got = pipeline.Monitor.tokenDrift(
          ref.toDF("doc_id", "text"), bat.toDF("doc_id", "text"), buckets = B)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      def counts(rows: Seq[(Long, String)]): Map[Long, Long] =
        rows.flatMap(_._2.split("\\s+", -1)).groupBy(md5Bucket(_, B))
          .view.mapValues(_.size.toLong).toMap
      val (rc, bc) = (counts(ref), counts(bat))
      val (tr, tb) = (rc.values.sum, bc.values.sum)
      (rc.keySet ++ bc.keySet).foreach { b =>
        val (cr, cb) = (rc.getOrElse(b, 0L), bc.getOrElse(b, 0L))
        // identical double op chains -> identical floored micro-units
        val expE6 =
          if (tr == 0L) 0L else math.floor((cr * tb).toDouble * 1e6 / tr).toLong
        val expRaw = if (tr == 0L) 0.0 else cr.toDouble * tb / tr
        val diff = cb.toDouble - expRaw
        val chiE6 = math.floor(diff * diff / math.max(expRaw, 1.0) * 1e6).toLong
        assert(got(b) === ((cr, cb, expE6, chiE6)), s"bucket $b: ${got(b)}")
      }
    }
  }

  test("semanticDedup (k=1) equals the all-pairs greedy model") {
    val genVecs: Gen[List[(Long, Seq[Float])]] = for {
      n <- Gen.choose(3, 16)
      raw <- Gen.listOfN(n * 2, Gen.choose(-4, 4))
    } yield raw.grouped(2).zipWithIndex.map { case (xy, i) =>
      // coarse lattice vectors force exact duplicates and near-pairs
      (i.toLong, Seq(xy.head.toFloat, xy(1).toFloat, 1.0f))
    }.toList
    samples(genVecs).foreach { vecs =>
      val got = pipeline.Semantic.semanticDedup(vecs.toDF("id", "vec"),
          k = 1, iters = 1, cosineThreshold = 0.999)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(b.map(x => x.toDouble * x).sum))
      }
      vecs.foreach { case (id, v) =>
        val dropped = vecs.exists { case (oid, ov) =>
          oid < id && cos(ov, v) >= 0.999
        }
        assert(got(id) === !dropped, s"id $id (dropped=$dropped)")
      }
    }
  }

  test("phrase/proximity search equal the in-memory scan model") {
    // random corpora over a tiny alphabet (dense accidental matches,
    // overlaps, duplicate tokens) vs the obvious O(n·w) scan model
    val vocabG = Vector("a", "b", "c", "d")
    val genCorpus: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(6, 14)
      docs <- Gen.listOfN(n, Gen.choose(4, 18).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocabG)).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    samples(genCorpus).take(4).foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val idx = pipeline.Retrieval.positionalPostings(df)
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toVector }
      // phrase: every 2- and 3-gram pattern over the alphabet
      for (phrase <- Seq(Seq("a", "b"), Seq("b", "b"), Seq("c", "a", "d"))) {
        val model = toks.flatMap { case (id, tk) =>
          val starts = (0 to tk.length - phrase.length)
            .filter(s => phrase.indices.forall(j => tk(s + j) == phrase(j)))
          if (starts.isEmpty) None
          else Some(id -> ((starts.length.toLong, starts.min.toLong)))
        }.toMap
        val got = pipeline.Retrieval.phraseSearch(idx, phrase)
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got === model, s"phrase $phrase")
      }
      // proximity: both terms in some w-window, any order
      for (w <- Seq(2, 4); terms = Seq("a", "d")) {
        val model = toks.flatMap { case (id, tk) =>
          val starts = tk.indices.filter { s =>
            val win = tk.slice(s, s + w)
            terms.forall(win.contains)
          }
          if (starts.isEmpty) None
          else Some(id -> ((starts.length.toLong, starts.min.toLong)))
        }.toMap
        val got = pipeline.Retrieval.proximitySearch(idx, terms, w)
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got === model, s"proximity w=$w")
      }
    }
  }

  test("postings store: append ≡ rebuild; batch/BM25 serving ≡ scan models") {
    // random corpora over a tiny alphabet; the store is built in THREE
    // increments (random content, fixed id split) and every serving
    // surface must be indistinguishable from the direct derivation
    val vocabG = Vector("a", "b", "c", "d")
    val genCorpus: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(6, 14)
      docs <- Gen.listOfN(n, Gen.choose(4, 18).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocabG)).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    samples(genCorpus).take(3).foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("genpidx").toString
      pipeline.Retrieval.writePostingsIndex(
        df.where(col("doc_id") % 3 === 0), dir)
      pipeline.Retrieval.appendToPostingsIndex(
        df.where(col("doc_id") % 3 === 1), dir)
      pipeline.Retrieval.appendToPostingsIndex(
        df.where(col("doc_id") % 3 === 2), dir)
      val stored = pipeline.Retrieval.readPostingsIndex(spark, dir)
      assert(stored.as[(String, Long, Long)].collect().toSet ==
        pipeline.Retrieval.positionalPostings(df)
          .as[(String, Long, Long)].collect().toSet,
        "incremental store diverged from a full rebuild")
      // batch suite over the store ≡ per-phrase direct search
      val suite = Seq(Seq("a", "b"), Seq("b", "b", "a"), Seq("c"))
      val got = pipeline.Retrieval.phraseSearchAll(stored, suite)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = suite.zipWithIndex.flatMap { case (p, pid) =>
        pipeline.Retrieval.phraseSearch(
            pipeline.Retrieval.positionalPostings(df), p)
          .as[(Long, Long, Long)].collect()
          .map { case (d, n, f) => (pid.toLong, d, n, f) }
      }.toSet
      assert(got == want, "batch suite diverged from per-phrase search")
      // index-served BM25 ≡ the corpus-scan path, full ranking
      val fromIndex = pipeline.Retrieval.bm25TopKFromIndex(stored,
        pipeline.Retrieval.readDocLengths(spark, dir),
        Seq("a", "d"), k = corpus.size)
        .as[(Long, Long, Long, Long)].collect().toSet
      val fromScan = pipeline.Retrieval.bm25TopK(df, Seq("a", "d"),
        k = corpus.size)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(fromIndex == fromScan, "index BM25 diverged from scan BM25")
    }
  }

  test("planted simhash/embedding contracts hold on a re-seeded corpus") {
    // Corpus-INDEPENDENT re-statement of the two contract oracles
    // COVERAGE.md flags as corpus-dependent (q_dedup_simhash's measured
    // hamming bound; the "no natural ≥0.99 cosine pair" assumption
    // behind q_dedup_embedding / q_semdedup / q_decontaminate_semantic).
    // Every assertion below touches ONLY planted structure — exact
    // twins, identical by construction — so it holds on ANY corpus:
    // regenerating the driver fixtures can invalidate the measured
    // properties but never these.
    val genSeed: Gen[Long] = Gen.choose(0L, Long.MaxValue)
    samples(genSeed).take(3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // fresh random corpus: new vocab, new lengths, new token draws
      val vocab = Vector.tabulate(80)(i => s"w${i}x${rnd.nextInt(1000)}")
      val base = (0L until 50L).map { id =>
        val n = 20 + rnd.nextInt(60)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val planted = base.filter(_._1 % 5 == 0)
      val corpus =
        (base ++ planted.map { case (id, t) => (id + 1000L, t) })
          .toDF("doc_id", "text")
      // simhash: an exact copy has the IDENTICAL 64-bit signature, so
      // the planted pair agrees on every chunk key (blocking recall 1)
      // and verifies at hamming 0 — regardless of what natural pairs
      // the random corpus also produces
      val sim = pipeline.Dedup.simhashPairs(corpus, maxHamming = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          r.getAs[Number]("hamming").intValue).toMap
      planted.foreach { case (id, _) =>
        assert(sim.get((id, id + 1000L)).contains(0),
          s"seed $seed: planted simhash twin $id missing or hamming != 0")
      }
      // embeddings: random Gaussian vectors + exact planted twins. The
      // higher-id twin ALWAYS drops under semanticDedup (its lower twin
      // sits in the same cell at cosine 1.0); no claim about which
      // OTHER rows drop — that is the corpus-dependent part
      val vecs = (0L until 40L).map { id =>
        (id, Seq.fill(16)(rnd.nextGaussian().toFloat))
      }
      val evecs = vecs.filter(_._1 % 4 == 0)
      val emb = (vecs ++ evecs.map { case (id, v) => (id + 1000L, v) })
        .toDF("id", "vec")
      val kept = pipeline.Semantic
        .semanticDedup(emb, k = 2, iters = 2, cosineThreshold = 0.99)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      evecs.foreach { case (id, _) =>
        assert(!kept(id + 1000L),
          s"seed $seed: planted embedding twin ${id + 1000L} survived")
      }
      // decontamination: a train row with an eval twin ALWAYS drops —
      // on the broadcast path by the nested-loop test, on the LSH path
      // because identical vectors collide in every hyperplane table
      val evalSet = evecs.map { case (id, v) => (id + 5000L, v) }
        .toDF("id", "vec")
      val survB = pipeline.Semantic
        .semanticDecontaminate(emb, evalSet, cosineThreshold = 0.99)
        .select("id").as[Long].collect().toSet
      val survL = pipeline.Semantic
        .semanticDecontaminateLsh(emb, evalSet, cosineThreshold = 0.99)
        .select("id").as[Long].collect().toSet
      evecs.foreach { case (id, _) =>
        assert(!survB.contains(id) && !survB.contains(id + 1000L),
          s"seed $seed: broadcast decontaminate kept planted $id")
        assert(!survL.contains(id) && !survL.contains(id + 1000L),
          s"seed $seed: LSH decontaminate kept planted $id")
      }
      // the exact-cosine confirm makes the LSH prefilter precision-1,
      // so survL ⊇ survB always; and planted-identical recall is 1 on
      // both paths, so on any corpus the two differ only by natural
      // ≥0.99 near-pairs the bands happened to miss
      assert(survB.subsetOf(survL),
        s"seed $seed: LSH path dropped a row the exact path kept")
    }
  }

  test("BPE: encode→decode is the identity and counts match a naive model") {
    import graft.functions.Bpe
    // random NUL-free texts over a small alphabet (dense merge collisions)
    // + random merge tables over the same symbols
    val genText: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf('a', 'b', 'c', 'd'),
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('\n', '\t', 'ζ', '!'))).map(_.mkString)
    val genSym: Gen[String] = Gen.choose(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString))
    val genModel: Gen[Bpe.Model] = Gen.listOfN(6,
      Gen.zip(genSym, Gen.oneOf(Gen.const(Bpe.EndOfWord), genSym)))
      .map(ms => Bpe.Model(ms.distinct))
    // naive model: token count = symbols after replaying merges by rank
    // via repeated full rescans (quadratic but obviously correct)
    def naiveCount(m: Bpe.Model, text: String): Long = {
      def word(w: String): Long = {
        var syms = w.map(_.toString).toList :+ Bpe.EndOfWord
        var go = true
        while (go) {
          val ranked = m.merges.zipWithIndex.filter { case ((a, b), _) =>
            syms.zip(syms.tail).contains((a, b)) }
          if (ranked.isEmpty) go = false
          else {
            val (a, b) = ranked.minBy(_._2)._1
            val out = scala.collection.mutable.ListBuffer.empty[String]
            var rest = syms
            while (rest.nonEmpty) rest match {
              case x :: y :: t if x == a && y == b => out += x + y; rest = t
              case x :: t => out += x; rest = t
              case Nil => ()
            }
            syms = out.toList
          }
        }
        syms.length.toLong
      }
      "\\s+|\\S+".r.findAllIn(text).map(seg =>
        if (Character.isWhitespace(seg.charAt(0))) 1L else word(seg)).sum
    }
    samples(Gen.zip(genModel, Gen.listOfN(6, genText))).foreach {
      case (model, texts) => texts.foreach { t =>
        assert(model.decode(model.encode(t)) == t, s"roundtrip '$t'")
        assert(model.tokenCount(t) == naiveCount(model, t),
          s"count mismatch on '$t' with ${model.merges}")
      }
    }
  }

  test("hand-rolled WAV render: JDK-codec agreement + parse roundtrip " +
      "+ gain-invariant fingerprint for random audio") {
    import graft.pipeline.Multimodal
    val genAudio = for {
      rate <- Gen.choose(4000, 48000)
      n <- Gen.choose(40, 400)
      pcm <- Gen.listOfN(2 * n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (rate, pcm.toArray)
    samples(Gen.listOfN(4, genAudio)).foreach(_.foreach { case (rate, pcm) =>
      val wav = Multimodal.writeWavPcm(rate, pcm)
      // the JDK codec must read our hand-rolled header exactly (guards
      // the 44-byte layout against drift from AudioSystem's view)
      val (jRate, jFrames, jCh) = Multimodal.realAudioMeta(wav)
      assert((jRate, jFrames, jCh) === ((rate, pcm.length / 2, 1)))
      // our own parser must invert the render byte-exactly
      val (pRate, pData) = Multimodal.wavPcm(wav)
      assert(pRate === rate && java.util.Arrays.equals(pData, pcm))
      // a genuine amplitude change moves the energy-envelope
      // fingerprint at most `radius` bits (near-tie windows only)
      val h = java.lang.Long.bitCount(
        Multimodal.audioFingerprint(wav) ^
          Multimodal.audioFingerprint(Multimodal.gainHalvedWav(wav)))
      assert(h <= 3, s"gain change moved fingerprint $h bits")
    })
  }

  test("generic Avro codec roundtrips arbitrary flat schemas value-exactly") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val menu = Seq("boolean", "int", "long", "float", "double", "string", "bytes")
    val genSchema: Gen[List[(String, String, Boolean)]] = for {
      n <- Gen.choose(3, 8)
      ts <- Gen.listOfN(n, Gen.oneOf(menu))
      nl <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield ts.zip(nl).zipWithIndex.map { case ((t, nu), i) => (s"f$i", t, nu) }
    samples(genSchema).foreach { fields =>
      val fieldJson = fields.map { case (name, t, nullable) =>
        val tpe = if (nullable) s"""["null", "$t"]""" else s""""$t""""
        s"""{"name": "$name", "type": $tpe}"""
      }.mkString(",")
      val schemaJson =
        s"""{"type": "record", "name": "R", "fields": [$fieldJson]}"""
      val st = functions.GenericAvroCodec.structTypeFor(schemaJson)
      def value(t: String, i: Int): Any = t match {
        case "boolean" => i % 2 == 0
        case "int" => i * 7 - 3
        case "long" => i * 1000L - 5L
        case "float" => i * 0.5f - 1.0f
        case "double" => i * 0.25 - 2.0
        case "string" => s"s$i"
        case "bytes" => Array[Byte](i.toByte, (i + 1).toByte)
      }
      val rows = (0 until 5).map { i =>
        Row.fromSeq(fields.zipWithIndex.map { case ((_, t, nullable), j) =>
          if (nullable && (i + j) % 3 == 0) null else value(t, i)
        })
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), st)
      val enc = functions.GenericAvroCodec.encode(schemaJson)
      val dec = functions.GenericAvroCodec.decode(schemaJson)
      val out = df
        .select(dec(enc(org.apache.spark.sql.functions.struct(
          st.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)))
          .as("r"))
        .select("r.*").collect()
      out.zip(rows).foreach { case (got, want) =>
        fields.zipWithIndex.foreach { case ((name, t, _), j) =>
          (got.get(j), want.get(j)) match {
            case (null, null) => ()
            case (a: Array[Byte], b: Array[Byte]) =>
              assert(a.sameElements(b), s"$name bytes differ")
            case (a, b) => assert(a == b, s"$name: $a != $b (type $t)")
          }
        }
      }
    }
  }

  /** Random multi-line corpus over a tiny line pool (forces lines above
    * and below any doc-share threshold) plus blanks and a per-doc unique
    * line. */
  private val genLineDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(4, 24)
    picks <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(0, 5)))
  } yield picks.zipWithIndex.map { case (ls, i) =>
    val lines = ls.map {
      case 0 => "common banner"
      case 1 => "promo footer"
      case 2 => "" // blank: structure, never boilerplate
      case k => s"body $k of doc $i"
    } :+ s"unique $i"
    (i.toLong, lines.mkString("\n"))
  }

  test("stripFrequentLines equals the in-memory share-threshold model") {
    val shareBp = 4000
    samples(genLineDocs).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = pipeline.Lines.stripFrequentLines(df, shareBp)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      val n = docs.size.toLong
      val byLine = docs.flatMap { case (id, t) =>
        t.split("\n", -1).filter(_.trim.nonEmpty).distinct.map(l => (l, id))
      }.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val freq = byLine.filter { case (_, nd) => nd * 10000L >= shareBp * n }.keySet
      docs.foreach { case (id, t) =>
        val all = t.split("\n", -1)
        val kept = all.filterNot(freq.contains)
        assert(got(id) === ((kept.mkString("\n"), kept.length.toLong,
          (all.length - kept.length).toLong)), s"doc $id")
      }
    }
  }

  test("collapseRepeatedLines equals the in-memory uniq model") {
    samples(genLineDocs).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = pipeline.Lines.collapseRepeatedLines(df)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      docs.foreach { case (id, t) =>
        val all = t.split("\n", -1)
        val kept = all.zipWithIndex
          .filter { case (l, i) => i == 0 || l != all(i - 1) }.map(_._1)
        assert(got(id) === ((kept.mkString("\n"),
          (all.length - kept.length).toLong)), s"doc $id")
      }
    }
  }

  test("keepOneByPriority equals the in-memory union-find model") {
    // random graphs over 12 vertices; priority = id % 4
    val genGraph: Gen[List[(Long, Long)]] = for {
      nEdges <- Gen.choose(0, 10)
      edges <- Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
    } yield edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    samples(genGraph).foreach { edges =>
      val docs = (0L until 12L).map(i => (i, i % 4)).toDF("doc_id", "prio")
      val pairs = (if (edges.isEmpty) List((100L, 101L)) else edges)
        .toDF("id_a", "id_b")
      val got = pipeline.Dedup.keepOneByPriority(docs, pairs, "prio")
        .select("doc_id").as[Long].collect().toSet
      // model: union-find, then keep min (prio, id) per component
      val parent = collection.mutable.Map((0L until 12L).map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val keep = (0L until 12L).groupBy(find)
        .values.map(_.minBy(i => (i % 4, i))).toSet
      assert(got === keep, s"edges $edges")
    }
  }

  test("scoreNll equals the in-memory smoothed-bigram model") {
    samples(genDocs).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val trainDocs = docs.filter(_._1 % 2 == 0)
      val model = pipeline.LangModel.train(df.where(col("doc_id") % 2 === 0))
      val got = pipeline.LangModel.scoreNll(model, df)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      def toks(t: String) = t.split("\\s+", -1).toSeq
      val trainToks = trainDocs.flatMap(d => toks(d._2))
      val v = trainToks.distinct.size.toLong
      val cu = trainToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = trainDocs.flatMap(d => toks(d._2).sliding(2).filter(_.size == 2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      docs.foreach { case (id, t) =>
        val grams = toks(t).sliding(2).filter(_.size == 2).toSeq
        val nll = grams.map { g =>
          val ratio = (cu.getOrElse(g.head, 0L) + v).toDouble /
            (cb.getOrElse(g, 0L) + 1L).toDouble
          math.floor(math.log(ratio) / math.log(2.0) * 10000.0 + 1e-6).toLong
        }.sum
        assert(got(id) === ((grams.size.toLong, nll)), s"doc $id")
      }
    }
  }

  test("postings equals the in-memory capped-index model") {
    val cap = 3
    samples(genDocs).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = pipeline.Retrieval.postings(df, maxPostings = cap)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getSeq[Long](2), r.getSeq[Long](3)))).toMap
      val byTok = docs.flatMap { case (id, t) =>
        t.split("\\s+", -1).map(tok => (tok, id))
      }.groupBy(_._1)
      assert(got.keySet === byTok.keySet)
      byTok.foreach { case (tok, occ) =>
        val tfByDoc = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val ids = tfByDoc.keys.toSeq.sorted.take(cap)
        assert(got(tok) === ((tfByDoc.size.toLong, ids,
          ids.map(tfByDoc))), s"token $tok")
      }
    }
  }

  test("export manifest equals the in-memory shard model") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val M = 2147483647L
    samples(genDocs).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("genexp").toString
      val got = pipeline.Export.writeShards(df, s"$root/d", numShards = 3,
          salt = 7L)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val byShard = docs.groupBy { case (id, _) =>
        ((id + 7L) % M) * 48271L % M % 3L }
      assert(got.keySet === byShard.keySet)
      byShard.foreach { case (sh, rows) =>
        val toks = rows.map(_._2.split("\\s+", -1).length.toLong).sum
        assert(got(sh) === ((rows.size.toLong, toks,
          rows.map(_._1).min, rows.map(_._1).max)), s"shard $sh")
      }
    }
  }

  test("bm25 equals the in-memory Okapi model") {
    val terms = Seq("w0", "w3", "w7")
    samples(genDocs).foreach { docs =>
      // skip corpora whose every doc is empty-ish (avgdl 0 divides)
      val df = docs.toDF("doc_id", "text")
      val got = pipeline.Retrieval.bm25(df, terms)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      def toks(t: String) = t.split("\\s+", -1).toSeq
      val n = docs.size.toDouble
      val sumdl = docs.map(d => toks(d._2).size).sum.toDouble
      val avgdl = sumdl / n
      val dfT = terms.map(w =>
        w -> docs.count(d => toks(d._2).contains(w)).toDouble).toMap
      docs.foreach { case (id, t) =>
        val tk = toks(t)
        val dl = tk.size.toDouble
        val score = terms.map { w =>
          val tf = tk.count(_ == w).toDouble
          val idf = math.log((n - dfT(w) + 0.5) / (dfT(w) + 0.5) + 1.0)
          val s = idf * ((tf * (1.2 + 1.0)) /
            (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))
          math.floor(s * 10000.0 + 1e-6).toLong
        }.sum
        assert(got(id) === ((tk.size.toLong, score)), s"doc $id")
      }
    }
  }

  test("any single flipped body byte is caught by the record CRC") {
    samples(genRec).foreach { rec =>
      val bos = new java.io.ByteArrayOutputStream()
      RelayBinaryLog.writeRecord(new java.io.DataOutputStream(bos), rec)
      val bytes = bos.toByteArray
      // flip one byte inside the body (skip 8-byte magic+len prefix and
      // the trailing 4-byte crc so the corruption hits CRC-covered bytes)
      val idx = 8 + ((rec.seq % math.max(1, bytes.length - 12)).toInt.abs)
      bytes(idx) = (bytes(idx) ^ 0x40).toByte
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      intercept[IllegalArgumentException](RelayBinaryLog.readRecord(in))
    }
  }

  test("NB classification equals the in-memory integer model exactly") {
    import graft.pipeline.Classifier
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val genCorpus: Gen[(List[(Long, String, String)], List[(Long, String)])] =
      for {
        nTrain <- Gen.choose(6, 20)
        train <- Gen.listOfN(nTrain, for {
          label <- Gen.oneOf("x", "y", "z")
          n <- Gen.choose(1, 12)
          toks <- Gen.listOfN(n, Gen.oneOf(vocab))
        } yield (label, toks.mkString(" ")))
        nTest <- Gen.choose(3, 10)
        test <- Gen.listOfN(nTest, for {
          n <- Gen.choose(1, 10)
          toks <- Gen.listOfN(n, Gen.oneOf(vocab :+ "zz-unseen"))
        } yield toks.mkString(" "))
      } yield (
        train.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) },
        test.zipWithIndex.map { case (t, i) => (i.toLong, t) })

    samples(genCorpus).foreach { case (train, test) =>
      val model = Classifier.train(train.toDF("doc_id", "label", "text"))
      val got = Classifier.classify(model, test.toDF("doc_id", "text"))
        .as[(Long, String, Long)].collect()
        .map { case (id, l, s) => id -> ((l, s)) }.toMap

      // in-memory model: identical integer arithmetic (same JVM log2,
      // same floor nudge, same lexicographic tie-break)
      def toks(s: String): Seq[String] = s.split("\\s+").toSeq
      val labels = train.map(_._2).distinct.sorted
      val counts = train.groupBy(_._2).map { case (l, ds) =>
        l -> ds.flatMap(d => toks(d._3)).groupBy(identity)
          .map { case (t, xs) => t -> xs.size.toLong }
      }
      val nToks = counts.map { case (l, m) => l -> m.values.sum }
      val nDocs = train.groupBy(_._2).map { case (l, ds) => l -> ds.size.toLong }
      val v = train.flatMap(d => toks(d._3)).distinct.size.toLong
      val nAll = train.size.toLong
      def e4(r: Double): Long =
        math.floor(math.log(r) / math.log(2.0) * 10000.0 + 1e-6).toLong
      test.foreach { case (id, text) =>
        val scores = labels.map { l =>
          val prior = e4(nAll.toDouble / nDocs(l).toDouble)
          val tokSum = toks(text).map { t =>
            e4((nToks(l) + v).toDouble /
              (counts(l).getOrElse(t, 0L) + 1L).toDouble)
          }.sum
          (prior + tokSum, l)
        }
        val want = scores.min // (score, label) lexicographic
        assert(got(id) === ((want._2, want._1)),
          s"doc $id: got ${got(id)}, want $want")
      }
    }
  }

  test("unlearn ≡ retrain for random corpora and random forget subsets") {
    // the exact-unlearning claim, corpus-independently: for ANY training
    // set and ANY forget subset (including empty, a whole class, and a
    // token's last occurrences), count subtraction lands on the
    // retrained tables row-for-row
    import graft.pipeline.{Classifier, LangModel}
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    val genSeed: Gen[Long] = Gen.choose(0L, Long.MaxValue)
    samples(genSeed).take(4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = Vector.tabulate(25)(i => s"t$i")
      val labels = Vector("en", "fr", "de")
      val corpus = (0L until 30L).map { id =>
        val n = 1 + rnd.nextInt(12)
        (id, labels(rnd.nextInt(labels.size)),
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val train = corpus.toDF("doc_id", "label", "text")
      val forgetIds = corpus.map(_._1).filter(_ => rnd.nextInt(3) == 0).toSet
      val forget = train.where(col("doc_id").isin(forgetIds.toSeq: _*))
      val keep = train.where(!col("doc_id").isin(forgetIds.toSeq: _*))

      val nbU = Classifier.unlearn(Classifier.train(train), forget)
      val nbR = Classifier.train(keep)
      assert(same(nbU.counts, nbR.counts) && same(nbU.classes, nbR.classes)
        && same(nbU.stats, nbR.stats), s"NB unlearn≠retrain at seed $seed")

      val lmU = LangModel.unlearn(
        LangModel.train(train.select("doc_id", "text")),
        forget.select("doc_id", "text"))
      val lmR = LangModel.train(keep.select("doc_id", "text"))
      assert(same(lmU.uni, lmR.uni) && same(lmU.bi, lmR.bi)
        && same(lmU.vocab, lmR.vocab), s"LM unlearn≠retrain at seed $seed")
    }
  }

  test("CDC-maintained postings store ≡ rebuild over net live docs") {
    // for ANY batch split and ANY delete subset of already-indexed
    // docs, the stream-maintained store's live rows equal an index
    // built from scratch on the surviving docs
    import graft.pipeline.Retrieval
    val genSeed: Gen[Long] = Gen.choose(0L, Long.MaxValue)
    samples(genSeed).take(4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = Vector.tabulate(15)(i => s"w$i")
      val corpus = (0L until 24L).map { id =>
        (id, Seq.fill(1 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val all = corpus.toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("gencdc").toString +
        "/index"
      val nBatches = 2 + rnd.nextInt(2)
      (0 until nBatches).foreach(b =>
        Retrieval.appendToPostingsIndexBatch(
          all.where(col("doc_id") % nBatches === b), dir, b))
      val dels = corpus.map(_._1).filter(_ => rnd.nextInt(4) == 0)
      if (dels.nonEmpty) Retrieval.tombstoneDocs(spark, dir, dels)
      val live = all.where(!col("doc_id").isin(dels: _*))
      val got = Retrieval.readPostingsIndex(spark, dir)
        .select("token", "doc_id", "pos")
      val want = Retrieval.positionalPostings(live)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"postings≠rebuild at seed $seed")
      val gotDl = Retrieval.readDocLengths(spark, dir).select("doc_id", "dl")
      val wantDl = Retrieval.docLengths(live)
      assert(gotDl.exceptAll(wantDl).isEmpty &&
        wantDl.exceptAll(gotDl).isEmpty, s"doclens≠rebuild at seed $seed")
    }
  }

  test("quantileSelectByValue ≡ the rank-window gate on random corpora") {
    // the curation pipeline's aggregate-folded gate must select the
    // EXACT same rows as the per-stratum rank window for any score
    // distribution (ties, constant strata, singleton strata included)
    import graft.pipeline.Weighting
    val genSeed: Gen[Long] = Gen.choose(0L, Long.MaxValue)
    samples(genSeed).take(5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val strata = Vector.tabulate(1 + rnd.nextInt(4))(i => s"s$i")
      val rows = (0L until (20L + rnd.nextInt(80))).map { id =>
        // coarse scores force heavy ties; one stratum is constant-valued
        val st = strata(rnd.nextInt(strata.size))
        val score =
          if (st == "s0") 7L else rnd.nextInt(12).toLong
        (id, st, score)
      } :+ ((999L, "lone", 3L)) // singleton stratum
      val df0 = rows.toDF("doc_id", "stratum", "score")
      val qBp = 1 + rnd.nextInt(9998)
      val byValue = Weighting.quantileSelectByValue(df0, "score", "stratum",
          qBp).where($"selected").select("doc_id")
        .as[Long].collect().toSet
      val byRank = Weighting.quantileThresholdKeeping(df0, "score",
          "stratum", qBp).where($"selected").select("doc_id")
        .as[Long].collect().toSet
      assert(byValue == byRank,
        s"value-gate≠rank-gate at seed $seed qBp $qBp: " +
          s"only-value=${byValue -- byRank} only-rank=${byRank -- byValue}")
    }
  }

  test("quantile-sketch store gate: bucket-cutoff semantics + rank bound, random splits") {
    // for ANY batch split of ANY score distribution: the merged store's
    // gate equals the single-shot histogram's derivation, and its
    // over-admission vs the exact rank gate stays within the stated
    // rank_bound per stratum
    import graft.pipeline.{QuantileStore, Weighting}
    val genSeed: Gen[Long] = Gen.choose(0L, Long.MaxValue)
    samples(genSeed).take(4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val width = 1L + rnd.nextInt(20)
      val qBp = 500 + rnd.nextInt(9000)
      val rows = (0L until (30L + rnd.nextInt(120))).map { id =>
        (id, s"s${rnd.nextInt(3)}", rnd.nextInt(200).toLong)
      }
      val df0 = rows.toDF("id", "stratum", "score")
      val dir = java.nio.file.Files.createTempDirectory("genqs").toString +
        "/sketch"
      val nBatches = 1 + rnd.nextInt(4)
      (0 until nBatches).foreach(b => QuantileStore.appendBatch(
        df0.where($"id" % nBatches === b), dir, b.toLong,
        "score", "stratum", width))
      val gated = QuantileStore.gateFromStore(df0, dir, "score", "stratum",
        qBp, width)
      // gate ≡ score >= (stratum's cutoff), cutoff from the cutoffs view
      val cuts = QuantileStore.cutoffs(spark, dir, qBp, width)
        .select("stratum", "cutoff", "rank_bound")
        .as[(String, Long, Long)].collect()
        .map { case (s, c, b) => s -> (c, b) }.toMap
      val gotSel = gated.where($"selected").groupBy("stratum").count()
        .as[(String, Long)].collect().toMap
      val modelSel = rows.groupBy(_._2).map { case (st, rs) =>
        st -> rs.count(_._3 >= cuts(st)._1).toLong
      }
      assert(gotSel == modelSel.filter(_._2 > 0L),
        s"gate≠cutoff-model at seed $seed")
      val exactSel = Weighting.quantileThresholdKeeping(
          df0.select($"id".as("doc_id"), $"stratum", $"score"),
          "score", "stratum", qBp)
        .where($"selected").groupBy("stratum").count()
        .as[(String, Long)].collect().toMap
      cuts.keys.foreach { st =>
        val (g, e, b) = (modelSel.getOrElse(st, 0L),
          exactSel.getOrElse(st, 0L), cuts(st)._2)
        assert(g >= e && g - e <= b,
          s"rank bound broken at seed $seed stratum $st: store=$g exact=$e bound=$b")
      }
    }
  }

  test("boxStabDepth equals the brute-force grid maximum on random boxes") {
    // the clustering-depth sweep vs exhaustive point counting: box
    // endpoints are integers, so the continuous max is attained on the
    // integer grid the brute force walks
    import graft.pipeline.Layout
    val rnd = new scala.util.Random(777L)
    (0 until 200).foreach { i =>
      val n = 1 + rnd.nextInt(10)
      val boxes = Seq.fill(n) {
        val a0 = rnd.nextInt(20).toLong; val a1 = a0 + rnd.nextInt(8)
        val b0 = rnd.nextInt(20).toLong; val b1 = b0 + rnd.nextInt(8)
        ((a0, a1), (b0, b1))
      }
      val brute = (0L to 30L).flatMap(a => (0L to 30L).map(b =>
        boxes.count { case ((a0, a1), (b0, b1)) =>
          a0 <= a && a <= a1 && b0 <= b && b <= b1 })).max
      assert(Layout.boxStabDepth(boxes) == brute,
        s"sweep≠brute at case $i: $boxes")
    }
    // the N-dim recursion, 3-D face, vs exhaustive grid counting
    (0 until 80).foreach { i =>
      val n = 1 + rnd.nextInt(8)
      val boxes = Seq.fill(n)(Seq.fill(3) {
        val x0 = rnd.nextInt(10).toLong; (x0, x0 + rnd.nextInt(5))
      })
      val brute = (0L to 15L).flatMap(a => (0L to 15L).flatMap(b =>
        (0L to 15L).map(c => boxes.count(bx =>
          bx(0)._1 <= a && a <= bx(0)._2 &&
          bx(1)._1 <= b && b <= bx(1)._2 &&
          bx(2)._1 <= c && c <= bx(2)._2)))).max
      assert(Layout.boxStabDepthN(boxes) == brute,
        s"3-D sweep≠brute at case $i: $boxes")
    }
  }

  test("N-ary Morton keys equal the bit-loop reference on random inputs") {
    import graft.functions.ZorderKeyN
    val rnd = new scala.util.Random(4242L)
    def ref(vals: Seq[Long], bits: Int): Long = {
      val n = vals.size
      var k = 0L
      for (d <- 0 until n; i <- 0 until bits)
        k |= ((vals(d) >> i) & 1L) << (i * n + d)
      k
    }
    (0 until 2000).foreach { _ =>
      val (a, b, c) = (rnd.nextLong() & 0x1fffffL, rnd.nextLong() & 0x1fffffL,
        rnd.nextLong() & 0x1fffffL)
      assert(ZorderKeyN.key3(a, b, c) == ref(Seq(a, b, c), 21))
      val (p, q, r, s) = (rnd.nextLong() & 0x7fffL, rnd.nextLong() & 0x7fffL,
        rnd.nextLong() & 0x7fffL, rnd.nextLong() & 0x7fffL)
      assert(ZorderKeyN.key4(p, q, r, s) == ref(Seq(p, q, r, s), 15))
    }
    // monotone-in-each-dim at fixed others (the pruning property):
    // raising one coordinate never lowers the key
    (0 until 500).foreach { _ =>
      val (a, b, c) = (rnd.nextLong() & 0xffffL, rnd.nextLong() & 0xffffL,
        rnd.nextLong() & 0xffffL)
      assert(ZorderKeyN.key3(a + 1, b, c) > ZorderKeyN.key3(a, b, c))
      assert(ZorderKeyN.key3(a, b + 1, c) > ZorderKeyN.key3(a, b, c))
      assert(ZorderKeyN.key3(a, b, c + 1) > ZorderKeyN.key3(a, b, c))
    }
  }
}

object GenerativeSpec {
  case class Ev(scn: Long, seq: Long, sourceId: Int, partitionId: Int,
      keyLong: Long, opcode: String, value: Double)
}
