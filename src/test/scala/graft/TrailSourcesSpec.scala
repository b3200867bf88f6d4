package graft

import java.nio.file.{Files, Paths}

import graft.sources.{BinlogFeed, ChangeFeed, GoldenGateTrail}

import org.apache.spark.sql.functions._

/** S5 GoldenGate trail parse + S3 binlog assembly (SURVEY §2.1). */
class TrailSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val trailXml =
    """<root>
      |<transaction timestamp="2024-01-01:00.00.01">
      | <dbupdate table="click" type="insert">
      |  <columns><column name="key">7</column><column name="val">a</column></columns>
      |  <tokens><token name="TK-SCN">100</token></tokens>
      | </dbupdate>
      | <dbupdate table="click" type="update">
      |  <columns><column name="key">8</column><column name="val">b</column></columns>
      |  <tokens><token name="TK-SCN">100</token></tokens>
      | </dbupdate>
      |</transaction>
      |<transaction timestamp="2024-01-01:00.00.02">
      | <dbupdate table="error" type="delete">
      |  <columns><column name="key">7</column></columns>
      |  <tokens><token name="TK-SCN">110</token></tokens>
      | </dbupdate>
      |</transaction>
      |</root>""".stripMargin

  test("trail xml parses via the pull parser") {
    val ups = GoldenGateTrail.parseTrailXml(trailXml)
    assert(ups.size == 3)
    assert(ups(0).scn == 100 && ups(0).table == "click" &&
      ups(0).opType == "insert" && ups(0).columns("key") == "7")
    assert(ups(1).columns("val") == "b")
    assert(ups(2).scn == 110 && ups(2).opType == "delete")
    assert(ups.map(_.seq) == Seq(0L, 1L, 2L))
  }

  test("trail dir reads distributed and prunes by sinceScn") {
    val dir = Files.createTempDirectory("trail").toString
    Files.writeString(Paths.get(dir, "trail-000.xml"), trailXml)
    Files.writeString(Paths.get(dir, "trail-001.xml"),
      trailXml.replace("100", "200").replace("110", "210"))
    val all = GoldenGateTrail.read(spark, dir)
    assert(all.count() == 6)
    val pruned = GoldenGateTrail.read(spark, dir, sinceScn = 110)
    assert(pruned.select("scn").as[Long].collect().toSet == Set(200L, 210L))
  }

  test("trail → envelope carries opcode/key/source mapping") {
    val dir = Files.createTempDirectory("trail2").toString
    Files.writeString(Paths.get(dir, "t.xml"), trailXml)
    val env = GoldenGateTrail.toEnvelope(
      GoldenGateTrail.read(spark, dir), ChangeFeed.registry)
    val rows = env.select("scn", "source_id", "opcode", "key_long")
      .as[(Long, Int, String, Long)].collect().toSet
    assert(rows == Set((100L, 1, "UPSERT", 7L), (100L, 1, "UPSERT", 8L),
      (110L, 5, "DELETE", 7L)))
  }

  test("a >100 MB trail file parses with constant memory (streaming StAX)") {
    val dir = Files.createTempDirectory("trail-big").toString
    val f = Paths.get(dir, "trail-big.xml")
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f.toFile), 1 << 20)
    w.write("<root>")
    // ~110 MB of transactions; padded column keeps updates realistic-sized
    val pad = "x" * 400
    var bytes = 0L
    var scn = 0L
    var n = 0L
    while (bytes < 110L * 1024 * 1024) {
      val txn = new StringBuilder(s"""<transaction timestamp="$scn">""")
      var i = 0
      while (i < 20) {
        txn.append(s"""<dbupdate table="click" type="insert"><columns>""")
          .append(s"""<column name="key">${n % 1000}</column>""")
          .append(s"""<column name="pad">$pad</column>""")
          .append("</columns><tokens>")
          .append(s"""<token name="TK-SCN">$scn</token>""")
          .append("</tokens></dbupdate>")
        i += 1; n += 1
      }
      txn.append("</transaction>")
      w.write(txn.toString)
      bytes += txn.length
      scn += 10
    }
    w.write("</root>")
    w.close()
    assert(f.toFile.length() > 100L * 1024 * 1024)

    // wholetext would need the whole file as one 110MB string per task;
    // the streaming parse pulls updates incrementally off the open stream
    val parsed = GoldenGateTrail.read(spark, dir)
    val (cnt, maxScn) = parsed.agg(count(lit(1)), max($"scn"))
      .as[(Long, Long)].head()
    assert(cnt == n)
    assert(maxScn == scn - 10)
    // sinceScn seek over the same big file prunes to the tail
    val tail = GoldenGateTrail.read(spark, dir, sinceScn = scn - 30)
    assert(tail.count() == 40) // last two windows x 20 updates
    f.toFile.delete()
    ()
  }

  test("binlog records assemble into envelope with composite SCN windows") {
    val dir = Files.createTempDirectory("binlog").toString
    val lines = Seq(
      """{"file_no":3,"offset":100,"txn_offset":100,"table":"click","op":"INSERT","key":1,"row":"r1"}""",
      """{"file_no":3,"offset":110,"txn_offset":100,"table":"click","op":"UPDATE","key":1,"row":"r2"}""",
      """{"file_no":3,"offset":120,"txn_offset":100,"table":"view","op":"DELETE","key":2,"row":null}""",
      """{"file_no":3,"offset":130,"txn_offset":100,"table":null,"op":"COMMIT","key":null,"row":null}""",
      """{"file_no":4,"offset":10,"txn_offset":10,"table":"click","op":"INSERT","key":3,"row":"r3"}""",
      """{"file_no":4,"offset":20,"txn_offset":10,"table":null,"op":"COMMIT","key":null,"row":null}""")
    Files.writeString(Paths.get(dir, "binlog.jsonl"), lines.mkString("\n"))

    val env = BinlogFeed.toEnvelope(
      BinlogFeed.parseJsonLines(spark, s"$dir/binlog.jsonl"), ChangeFeed.registry)
    assert(env.count() == 4) // commits excluded
    // txn 1: scn = (3<<32)|130 (the COMMIT offset) for all its rows
    val scn1 = (3L << 32) | 130L
    assert(env.where($"scn" === scn1).count() == 3)
    val scn2 = (4L << 32) | 20L
    assert(env.where($"scn" === scn2).select("key_long").as[Long].head() == 3L)
    // commit-offset SCN dominates every row position in its window
    assert(env.where($"scn" < $"seq").count() == 0)
    // seq strictly increasing with binlog position across files
    val seqs = env.orderBy("seq").select("seq").as[Long].collect()
    assert(seqs.sameElements(seqs.sorted) && seqs.distinct.length == 4)

    // S6: within-txn merge collapses the double-update of key 1
    val merged = BinlogFeed.mergedEnvelope(
      BinlogFeed.parseJsonLines(spark, s"$dir/binlog.jsonl"), ChangeFeed.registry)
    val k1 = merged.where($"key_long" === 1).select("merged_updates").as[Long].head()
    assert(k1 == 2L)
  }

  test("binlog streaming assembly equals the batch form (txn-aligned files)") {
    val dir = Files.createTempDirectory("binlog-stream").toString
    val out = Files.createTempDirectory("binlog-out").toString
    val cp = Files.createTempDirectory("binlog-cp").toString
    // two dump files, each holding whole transactions (rotation on txn
    // boundaries) — micro-batch = file = whole windows
    Files.writeString(Paths.get(dir, "b-000.jsonl"), Seq(
      """{"file_no":1,"offset":10,"txn_offset":10,"table":"click","op":"INSERT","key":1,"row":"r1"}""",
      """{"file_no":1,"offset":12,"txn_offset":10,"table":"view","op":"UPDATE","key":2,"row":"r2"}""",
      """{"file_no":1,"offset":14,"txn_offset":10,"table":null,"op":"COMMIT","key":null,"row":null}""")
      .mkString("\n"))
    Files.writeString(Paths.get(dir, "b-001.jsonl"), Seq(
      """{"file_no":2,"offset":20,"txn_offset":20,"table":"error","op":"DELETE","key":3,"row":null}""",
      """{"file_no":2,"offset":22,"txn_offset":20,"table":null,"op":"COMMIT","key":null,"row":null}""")
      .mkString("\n"))

    BinlogFeed.startAssembled(spark, dir, ChangeFeed.registry, out, cp)
      .awaitTermination()
    val streamed = spark.read.parquet(out)
      .select("scn", "seq", "source_id", "opcode", "key_long")
      .as[(Long, Long, Int, String, Long)].collect().toSet
    val batch = BinlogFeed.toEnvelope(
        BinlogFeed.parseJsonLines(spark, s"$dir/*.jsonl"), ChangeFeed.registry)
      .select("scn", "seq", "source_id", "opcode", "key_long")
      .as[(Long, Long, Int, String, Long)].collect().toSet
    assert(streamed == batch && streamed.size == 3)
  }
}
