package graft

import org.apache.spark.sql.functions._

import graft.functions.WebFunctions
import graft.pipeline.{Graph, Sampling}

/** Web-curation primitives (HTML → text, URL canonicalization,
  * per-domain caps) and the fixed-point host-graph PageRank. */
class WebGraphSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String, f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Any =
    Seq(html).toDF("h").select(f(col("h"))).head().get(0)

  test("htmlToText strips script/style/comments/tags and decodes entities") {
    val html = "<html><head><title>T</title><style>p { x: 1 }</style>" +
      "<script>if (a < 3) { b(); }</script></head>" +
      "<body><!-- note --><p>Hello &amp; goodbye</p><p>x &lt; y</p></body></html>"
    assert(one(html, WebFunctions.htmlToText) === "T Hello & goodbye x < y")
  }

  test("double-escaped entities decode exactly one level") {
    // &amp;lt; is the TEXT "&lt;" — decoding must not collapse it to "<"
    assert(one("<p>&amp;lt;tag&amp;gt;</p>", WebFunctions.htmlToText)
      === "&lt;tag&gt;")
  }

  test("script bodies with bare < do not corrupt the tag strip") {
    val html = "<script>for (i = 0; i < n; i++) emit('<td>');</script><b>keep</b>"
    assert(one(html, WebFunctions.htmlToText) === "keep")
  }

  test("commented-out script opener does not swallow the page body") {
    // comments strip FIRST: the <script> inside the comment must not
    // pair with the later real </script> and delete the content between
    val html = "<!-- <script> --><p>real content</p><script>x()</script>"
    assert(one(html, WebFunctions.htmlToText) === "real content")
  }

  test("title and link stats") {
    val html = "<title>My &quot;Page&quot;</title>" +
      "<a href='/a'>Home</a><p>body text here</p><a>About</a>"
    assert(one(html, WebFunctions.htmlTitle) === "My \"Page\"")
    assert(one(html, WebFunctions.linkCount) === 2)
    assert(one(html, WebFunctions.anchorTextChars) === 9) // Home+About
  }

  test("web functions: null propagates, empty input is empty output") {
    val row = Seq((null.asInstanceOf[String], "")).toDF("nul", "emp")
      .select(
        WebFunctions.htmlToText(col("nul")).as("t_null"),
        WebFunctions.htmlToText(col("emp")).as("t_emp"),
        WebFunctions.htmlTitle(col("emp")).as("ti_emp"),
        WebFunctions.linkCount(col("emp")).as("lc_emp"),
        WebFunctions.canonicalizeUrl(col("nul")).as("u_null"),
        WebFunctions.canonicalizeUrl(col("emp")).as("u_emp"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(4)) // null in → null out
    assert(row.getString(1) === "" && row.getString(2) === "")
    assert(row.getInt(3) === 0)
    assert(row.getString(5) === "") // schemeless: pass-through unchanged
  }

  test("canonicalizeUrl: case, www, default ports, fragment, tracking") {
    val cases = Seq(
      "HTTP://WWW.Example.COM:80/Path/X?utm_source=a&id=5#frag"
        -> "http://example.com/Path/X?id=5",
      "https://Example.com:443/" -> "https://example.com/",
      "https://example.com:8443/x" -> "https://example.com:8443/x",
      "http://example.com" -> "http://example.com/",
      "http://example.com/p?utm_a=1&utm_b=2" -> "http://example.com/p",
      "http://example.com/p?utm_a=1&q=2&ref=tw" -> "http://example.com/p?q=2",
      "not a url" -> "not a url", // no scheme: pass through unchanged
      "ftp://Host.com/File" -> "ftp://host.com/File") // non-http: no port strip
    val got = cases.map(_._1).toDF("u")
      .select(WebFunctions.canonicalizeUrl(col("u"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g === w) }
  }

  test("canonicalizeUrl: tracking-param names in the PATH are untouched") {
    // the documented contract: the path is case- AND byte-sensitive —
    // only the query (from the FIRST '?') sees tracking-param removal.
    // '&ref=' / '&gclid=' as literal path bytes must survive, including
    // when a real query follows them.
    val cases = Seq(
      "http://h/p&ref=x?q=1" -> "http://h/p&ref=x?q=1",
      "http://h/p&gclid=abc?utm_x=1&q=2" -> "http://h/p&gclid=abc?q=2",
      "http://h/p&utm_source=s" -> "http://h/p&utm_source=s",
      // and inside the query they still strip, wherever they sit
      "http://h/p?a=1&ref=x&b=2" -> "http://h/p?a=1&b=2",
      "http://h/p?ref=x" -> "http://h/p",
      // path ending in '&'/'?'-less junk is not "separator tidy-up" bait
      "http://h/p&" -> "http://h/p&",
      // query that strips to nothing: whole rest collapses cleanly
      "http://h/?ref=x" -> "http://h/")
    val got = cases.map(_._1).toDF("u")
      .select(WebFunctions.canonicalizeUrl(col("u"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g === w) }
  }

  test("capPerGroup keeps exactly top-k per group, deterministic ties") {
    val df = (0L until 100L).map(i => (i, s"d${i % 4}", i % 10)).toDF(
      "id", "dom", "score")
    val kept = Sampling.capPerGroup(df, "dom", 3,
      col("score").desc, col("id").asc)
    assert(kept.groupBy("dom").count().select(max("count")).head().getLong(0) === 3L)
    // group d0: ids 0,4,..,96; score = id%10 — top scores 8 (ids 8,28,48,..)
    // order: score desc, id asc → ids 8, 28, 48
    val d0 = kept.where($"dom" === "d0").select("id").as[Long].collect().sorted
    assert(d0.toSeq === Seq(8L, 28L, 48L))
  }

  test("distributed pageRank loop matches the in-memory integer reference exactly") {
    // pseudo-random digraph: 40 nodes, ~120 edges (dups + self-loops in);
    // maxDriverEdges = 0 forces the distributed loop — fixed-point
    // arithmetic makes the match BIT-exact, not tolerance-based
    val edges = (0 until 150).map { i =>
      ((i * 7919L + 13) % 40, (i * 104729L + 5) % 40)
    }
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 5,
        maxDriverEdges = 0)
      .as[(Long, Long)].collect().toMap
    val want = Graph.pageRankReference(edges, iters = 5)
    assert(got === want)
  }

  test("driver fast path and distributed loop are bit-identical") {
    val edges = (0 until 90).map { i =>
      ((i * 31L + 1) % 23, (i * 17L + 4) % 23)
    }.toDF("src", "dst")
    val driver = Graph.pageRank(edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    val dist = Graph.pageRank(edges, iters = 4, maxDriverEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(driver === dist)
  }

  test("node with no in-edges settles at the base rank") {
    // 9 -> 0 -> 1 -> 2 ... : node 9 has no in-edges
    val edges = Seq((9L, 0L), (0L, 1L), (1L, 2L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 3).as[(Long, Long)]
      .collect().toMap
    assert(ranks(9L) === 150000L) // (100-85) * 1e6 / 100
  }

  test("symmetric ring gives equal ranks; mass is conserved up to truncation") {
    val n = 8
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val ranks = Graph.pageRank(ring.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect()
    assert(ranks.map(_._2).distinct.length === 1)
    // ring: outdeg 1, no truncation loss → exact unit preserved
    assert(ranks.head._2 === 1000000L)
  }

  test("iters = 0 returns uniform unit ranks") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 0).as[(Long, Long)].collect()
    assert(ranks.length === 3 && ranks.forall(_._2 == 1000000L))
  }

  // ---- winnowing fingerprints (MOSS) ----

  import graft.pipeline.Dedup

  test("winnowing guarantee: shared substring >= w+k-1 shares a fingerprint") {
    // two docs sharing ONLY the middle chunk (junk flanks use letters
    // absent from the chunk); chunk length 24 >= w+k-1 = 15
    val chunk = "the quick brown fox jumps"
    val docs = Seq(
      (1L, s"zzqzzqzzqzzq $chunk xjxjxjxjxjxj"),
      (2L, s"wvwvwvwvwvwv $chunk ykykykykykyk"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, k = 8, w = 8)
    val shared = fps.where($"doc_id" === 1L).select("fp")
      .intersect(fps.where($"doc_id" === 2L).select("fp"))
    assert(shared.count() >= 1)
  }

  test("winnowing density: ~2/(w+1) of positions selected, window-min sound") {
    val text = (1 to 40).map(i => s"w${i}x${i * 7 % 13}").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val k = 8; val w = 8
    val n = text.length - (k - 1) - (w - 1) // complete windows
    val fpCount = Dedup.winnowFingerprints(docs, k, w).count()
    // selection density for random hashes is 2/(w+1) ≈ 0.22; allow wide
    // deterministic slack (every window must pick SOMETHING, and a
    // selected position can serve at most w windows)
    assert(fpCount >= n / w, s"$fpCount of $n too sparse")
    assert(fpCount <= n, s"$fpCount of $n too dense")
  }

  test("winnowOverlapPairs: partial copy found, disjoint docs not") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val b = "uno dos tres cuatro cinco seis siete ocho nueve diez once " * 3
    val docs = Seq(
      (1L, a),
      (2L, b),
      // 3 = partial copy of 1 with junk flanks
      (3L, "qzqzqzqzqzqzqz " + a + " jxjxjxjxjxjxjx"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, k = 8, w = 8,
        minShared = 5, maxDf = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 3L)))
  }

  test("kgram_hashes: rolling update equals from-scratch at every position") {
    import graft.functions.KGramHash64
    val s = "the quick brown fox jumps over the lazy dog 0123456789"
    val k = 8
    val rolled = KGramHash64.compute(s, k)
    assert(rolled.length === s.length - k + 1)
    // from-scratch per position: hash the isolated k-substring (the
    // rolling recurrence must be algebraically identical)
    (0 until rolled.length).foreach { i =>
      val scratch = KGramHash64.compute(s.substring(i, i + k), k)
      assert(scratch.length === 1 && scratch(0) === rolled(i),
        s"rolling diverged from scratch at pos $i")
    }
    // shorter than k: empty
    assert(KGramHash64.compute("abc", 8).isEmpty)
  }

  test("kgram_hashes: codegen and interpreted agree") {
    import graft.functions.{GraftFunctions, KGramHash64}
    val df = Seq("alpha beta gamma delta", "xy").toDF("t")
      .select(col("t"), GraftFunctions.kgram_hashes(col("t"), 5).as("h"))
    val got = df.collect().map(r =>
      (r.getString(0), r.getSeq[Long](1).toArray))
    got.foreach { case (t, hs) =>
      assert(hs.toSeq === KGramHash64.compute(t, 5).toSeq)
    }
  }

  test("fused winnow kernel == windowed derivation on a mixed corpus") {
    // pseudo-random texts of varied lengths incl. tie-prone repetition
    val docs = (1L to 30L).map { i =>
      val words = (0 until (10 + (i % 17)).toInt)
        .map(j => s"t${(i * 31 + j * 7) % 23}")
      // every third doc gets heavy repetition → equal-hash tie coverage
      val text = if (i % 3 == 0) (words ++ words ++ words).mkString(" ")
        else words.mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val fused = Dedup.winnowFingerprints(docs, k = 6, w = 5)
      .select("doc_id", "pos", "fp")
    val windowed = Dedup.winnowFingerprintsWindowed(docs, k = 6, w = 5)
      .select("doc_id", "pos", "fp")
    assert(fused.exceptAll(windowed).isEmpty &&
      windowed.exceptAll(fused).isEmpty)
  }

  test("kernel expressions are reachable from SQL with literal params") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT size(kgram_hashes('abcdefghij', 8)) AS n_grams," +
        " size(winnow_select('the quick brown fox jumps over it', 6, 5))" +
        " AS n_fps," +
        " size(cdc_chunks('alpha beta gamma delta epsilon', 4, 4))" +
        " AS n_chunks").head()
    assert(r.getInt(0) === 3) // 10 - 8 + 1
    assert(r.getInt(1) >= 1 && r.getInt(2) >= 1)
    // a foldable expression is fine (it IS a compile-time constant)...
    assert(spark.sql("SELECT size(kgram_hashes('abcdefghij', length('xxxxxxxx')))")
      .head().getInt(0) === 3)
    // ...but a genuinely non-constant param must fail loudly
    val err = intercept[Exception] {
      spark.sql("SELECT kgram_hashes(t, n) FROM VALUES ('abc', 2) AS v(t, n)")
        .head()
    }
    assert(err.getMessage.contains("literal integer"),
      s"unexpected message: ${err.getMessage}")
  }

  test("cdcChunks: chunks tile the document exactly, in order") {
    val text = (1 to 60).map(i => s"tok${i * 31 % 97}").mkString(" ")
    val chunks = Dedup.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        k = 8, divisor = 16)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start", "chunk_len").as[(Long, Long, Long)]
      .collect()
    assert(chunks.head._2 === 1L)
    chunks.sliding(2).foreach {
      case Array((i1, s1, l1), (i2, s2, _)) =>
        assert(i2 === i1 + 1 && s2 === s1 + l1, "chunks must tile")
      case _ => ()
    }
    val (_, lastStart, lastLen) = chunks.last
    assert(lastStart + lastLen - 1 === text.length.toLong)
  }

  test("cdcChunks tiles supplementary-plane text without splitting surrogates") {
    // emoji are 2 UTF-16 units; offsets are unit-based end-to-end and a
    // boundary never opens on a low surrogate
    val emoji = new String(Character.toChars(0x1F600))
    val text = (1 to 50).map(i => s"w$i$emoji").mkString(" ")
    val chunks = Dedup.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        k = 8, divisor = 8)
      .orderBy("chunk_idx")
      .select("start", "chunk_len").as[(Long, Long)].collect()
    assert(chunks.head._1 === 1L)
    chunks.sliding(2).foreach {
      case Array((s1, l1), (s2, _)) => assert(s2 === s1 + l1)
      case _ => ()
    }
    assert(chunks.last._1 + chunks.last._2 - 1 === text.length.toLong)
    // no chunk starts mid-code-point
    chunks.foreach { case (s, _) =>
      assert(!Character.isLowSurrogate(text.charAt((s - 1).toInt)))
    }
  }

  test("cdcChunks append locality: appending changes only the last chunk") {
    val base = (1 to 80).map(i => s"w${i * 13 % 41}").mkString(" ")
    val docs = Seq((1L, base), (2L, base + " appended junk tail xyz"))
      .toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, k = 8, divisor = 16)
    val md5s1 = chunks.where($"doc_id" === 1L).orderBy("chunk_idx")
      .select("chunk_md5").as[String].collect()
    val md5s2 = chunks.where($"doc_id" === 2L).orderBy("chunk_idx")
      .select("chunk_md5").as[String].collect().toSet
    assert(md5s1.length >= 2, "fixture must produce multiple chunks")
    // every chunk of the original except its last survives verbatim
    md5s1.dropRight(1).foreach(m => assert(md5s2.contains(m)))
  }

  test("cdcChunks insert locality: an edit re-aligns chunks after it") {
    val words = (1 to 120).map(i => s"q${i * 7 % 53}")
    val orig = words.mkString(" ")
    // insert in the middle: chunks strictly before and strictly after
    // the edit should re-align (share md5s) despite the offset shift —
    // the property fixed-size blocking lacks
    val edited = (words.take(60) ++ Seq("INSERTED", "WORDS") ++
      words.drop(60)).mkString(" ")
    val chunks = Dedup.cdcChunks(
      Seq((1L, orig), (2L, edited)).toDF("doc_id", "text"),
      k = 8, divisor = 16)
    val a = chunks.where($"doc_id" === 1L).select("chunk_md5")
      .as[String].collect().toSet
    val b = chunks.where($"doc_id" === 2L).select("chunk_md5")
      .as[String].collect().toSet
    val shared = a.intersect(b).size
    assert(shared >= a.size / 2,
      s"only $shared of ${a.size} chunks re-aligned after an insert")
  }

  test("winnowAlignment recovers the exact copy offset by unique-fp voting") {
    // a NON-repeating base: the uniqueness filter needs fingerprints
    // that occur once per document, which a repeated phrase destroys
    val base = (1 to 40).map(i => s"w${i * 37 % 101}x$i").mkString(" ")
    val prefix = "qz" * 11 + " " // 23 chars -> expected delta 23
    val docs = Seq((1L, base), (2L, prefix + base + " jx" * 7))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, k = 8, w = 8)
    val got = Dedup.winnowAlignment(fps,
        Seq((1L, 2L)).toDF("id_a", "id_b"))
      .select("best_delta").as[Long].head()
    assert(got === 23L)
  }

  test("winnowOverlapPairs df cap drops boilerplate-only overlap") {
    // the shared LICENSE line appears in every doc → its fingerprints
    // have df = 6 > maxDf = 4 and must not produce pairs
    val licence = "licensed under the apache license version two point zero "
    val docs = (1L to 6L).map(i =>
      (i, licence + s"body${i}a body${i}b body${i}c body${i}d " * 4))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, k = 8, w = 8,
      minShared = 2, maxDf = 4)
    assert(pairs.isEmpty)
  }
}
