package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.sources.{ChangeFeed, GgTrailSourceV2, GoldenGateTrail, WireFixtures}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** S5 streaming: the graft-ggtrail micro-batch source tailing a trail dir
  * under concurrent appends (to the live file AND via rotation), exactly
  *-once delivery across checkpointed restarts, truncation tolerance for a
  * half-written trailing element, and the TrailFilePositionSetter-style
  * SCN seek (GoldenGateEventProducer.java:849-870). */
class GgTrailStreamSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def upd(scn: Long, key: Long, value: Double): String =
    s"""<dbupdate table="click" type="insert"><columns>""" +
      s"""<column name="key">$key</column>""" +
      s"""<column name="value">$value</column></columns>""" +
      s"""<tokens><token name="TK-SCN">$scn</token></tokens></dbupdate>"""

  private def write(path: String, content: String): Unit =
    Files.write(Paths.get(path), content.getBytes(StandardCharsets.UTF_8))

  private def append(path: String, content: String): Unit =
    Files.write(Paths.get(path), content.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)

  /** Drain the stream once (AvailableNow) into `outDir`, resuming from
    * `cpDir`'s committed offsets. */
  private def drain(trailDir: String, outDir: String, cpDir: String,
      sinceScn: Long = Long.MinValue): Unit = {
    val q = GoldenGateTrail.stream(spark, trailDir, sinceScn)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("close-tag scan counts complete updates incrementally") {
    val dir = tmp("ggcount")
    val f = new File(dir, "t1.xml")
    // two complete updates + a half-written third
    write(f.getPath, "<root><transaction timestamp=\"1\">" +
      upd(10, 1, 0.5) + upd(10, 2, 0.5) + "<dbupdate table=\"cl")
    assert(GgTrailSourceV2.countCloseTags(f, 0) == 2)
    val lenBefore = f.length()
    // complete the third, add a fourth; incremental scan from the carry
    // band must find exactly the two new close tags
    append(f.getPath, "ick\" type=\"insert\"><columns></columns><tokens>" +
      "<token name=\"TK-SCN\">20</token></tokens></dbupdate>" + upd(20, 3, 0.5))
    val carry = math.max(0L,
      lenBefore - (GgTrailSourceV2.CloseTag.length - 1))
    assert(GgTrailSourceV2.countCloseTags(f, carry, endAfter = lenBefore) == 2)
    assert(GgTrailSourceV2.countCloseTags(f, 0) == 4)
  }

  test("incremental counting is split-invariant: any append boundary sums to the full count") {
    // the incremental scan (carry band + endAfter threshold) must count
    // every close tag exactly once no matter where the producer's append
    // boundary lands — including boundaries INSIDE a close tag
    val dir = tmp("ggsplit")
    val content = "<root><transaction timestamp=\"1\">" +
      (1 to 7).map(i => upd(i * 10L, i.toLong, 0.5)).mkString + "<dbupdate half"
    val full = new File(dir, "full.xml")
    write(full.getPath, content)
    val total = GgTrailSourceV2.countCloseTags(full, 0)
    assert(total == 7)
    val tagLen = GgTrailSourceV2.CloseTag.length
    (1 until content.length by 13).foreach { split =>
      val f = new File(dir, s"part$split.xml")
      write(f.getPath, content.substring(0, split))
      val firstLen = f.length()
      val first = GgTrailSourceV2.countCloseTags(f, 0)
      append(f.getPath, content.substring(split))
      val carry = math.max(0L, firstLen - (tagLen - 1))
      val second = GgTrailSourceV2.countCloseTags(f, carry, endAfter = firstLen)
      assert(first + second == total,
        s"split at $split: $first + $second != $total")
    }
  }

  test("tail follows appends to the live file and rotated files, exactly once") {
    val trailDir = tmp("ggtail")
    val outDir = s"${tmp("ggout")}/out"
    val cpDir = tmp("ggcp")
    val live = new File(trailDir, "trail-000.xml")

    // live tail: unclosed document (the producer is mid-append), last
    // element half-written — must deliver only the two complete updates
    write(live.getPath, "<root><transaction timestamp=\"1\">" +
      upd(10, 1, 0.1) + upd(10, 2, 0.2) + "<dbupdate table=\"cl")
    drain(trailDir, outDir, cpDir)
    val got1 = spark.read.parquet(outDir)
    assert(got1.count() == 2)
    assert(got1.agg(max("scn")).head().getLong(0) == 10L)

    // producer completes the half element, appends another, then rotates:
    // closes the live file and starts a new trail file
    append(live.getPath, "ick\" type=\"insert\"><columns>" +
      "<column name=\"key\">7</column></columns><tokens>" +
      "<token name=\"TK-SCN\">20</token></tokens></dbupdate>" +
      upd(20, 8, 0.3) + "</transaction></root>")
    val rotated = new File(trailDir, "trail-001.xml")
    write(rotated.getPath, "<root><transaction timestamp=\"2\">" +
      upd(30, 9, 0.4))

    drain(trailDir, outDir, cpDir)
    val got2 = spark.read.parquet(outDir)
    // 2 (run 1) + 2 appended + 1 rotated = 5, no duplicates
    assert(got2.count() == 5)
    assert(got2.select("scn", "seq").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet ==
      Set((10L, 0L), (10L, 1L), (20L, 2L), (20L, 3L), (30L, 0L)))

    // nothing new → a third drain delivers nothing
    drain(trailDir, outDir, cpDir)
    assert(spark.read.parquet(outDir).count() == 5)
  }

  test("sinceScn seek skips whole files below and leading runs within") {
    val trailDir = tmp("ggseek")
    val outDir = s"${tmp("ggseekout")}/out"
    val cpDir = tmp("ggseekcp")
    // file 0 wholly below the seek point; file 1 straddles it
    write(s"$trailDir/trail-000.xml", "<root><transaction timestamp=\"1\">" +
      upd(10, 1, 0.1) + upd(10, 2, 0.2) + "</transaction></root>")
    write(s"$trailDir/trail-001.xml", "<root><transaction timestamp=\"2\">" +
      upd(20, 3, 0.3) + upd(30, 4, 0.4) + upd(40, 5, 0.5) +
      "</transaction></root>")

    val pos = GgTrailSourceV2.seek(trailDir, 20L)
    assert(pos(s"$trailDir/trail-000.xml".replace("//", "/")) == 2L ||
      pos.values.toSeq.sorted == Seq(1L, 2L))

    drain(trailDir, outDir, cpDir, sinceScn = 20L)
    val got = spark.read.parquet(outDir)
    assert(got.select("scn").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(30L, 40L))
  }

  test("streamed fixture trail matches the batch parse exactly") {
    val trailDir = WireFixtures.goldenGateTrailDir(spark, sf())
    val outDir = s"${tmp("ggfix")}/out"
    val cpDir = tmp("ggfixcp")
    drain(trailDir, outDir, cpDir)
    val streamed = GoldenGateTrail.toEnvelope(
      spark.read.parquet(outDir), ChangeFeed.registry)
    val batch = GoldenGateTrail.toEnvelope(
      GoldenGateTrail.read(spark, trailDir), ChangeFeed.registry)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
