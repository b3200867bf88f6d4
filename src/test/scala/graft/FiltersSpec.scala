package graft

import graft.operators._

import org.apache.spark.sql.DataFrame

/** Mirrors TestDbusKeyCompositeFilter / TestSourceDbusFilter /
  * TestFilterToSQL (SURVEY.md §5): allow() semantics, JSON config parse,
  * SQL conversion. */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events: DataFrame = Seq(
    // (source_id, partition_id, key_long, opcode)
    (1, 0, 0L, "UPSERT"), (1, 1, 5L, "UPSERT"), (1, 2, 10L, "DELETE"),
    (2, 0, 99L, "UPSERT"), (2, 3, 150L, "UPSERT"),
    (3, 1, 75L, "UPSERT"), (3, 2, 120L, "UPSERT"),
    (9, 0, 7L, null)) // control row (opcode null)
    .toDF("source_id", "partition_id", "key_long", "opcode")

  private def keys(f: DbusFilter): Set[Long] =
    events.where(f.toColumn).select("key_long").as[Long].collect().toSet

  test("allow-all and conjunction") {
    assert(keys(AllowAllFilter) == Set(0L, 5L, 10L, 99L, 150L, 7L, 75L, 120L))
    assert(keys(ConjunctionFilter(Seq(SourceFilter(Set(1)),
      KeyRangeFilter(1, 100)))) == Set(5L, 10L))
  }

  test("source filter: srcId membership") {
    assert(keys(SourceFilter(Set(2, 3))) == Set(99L, 150L, 75L, 120L))
  }

  test("physical partition filter with nested filter") {
    assert(keys(PhysicalPartitionFilter(Some(1: Short), None)) == Set(5L, 75L))
    assert(keys(PhysicalPartitionFilter(Some(1: Short),
      Some(SourceFilter(Set(3))))) == Set(75L))
    assert(keys(PhysicalPartitionFilter(None, None)).size == 8)
  }

  test("logical source+partition filter passes control rows") {
    val f = LogicalSourceAndPartitionFilter(
      Map(1 -> None, 2 -> Some(Set(0: Short))))
    // source 1 all partitions, source 2 only partition 0, control always
    assert(keys(f) == Set(0L, 5L, 10L, 99L, 7L))
  }

  test("key range is half-open [min, max)") {
    assert(keys(KeyRangeFilter(5, 120)) == Set(5L, 10L, 99L, 75L, 7L))
  }

  test("key mod buckets [min, max) of numBuckets") {
    // abs(key) % 4 in [0, 2): keys 0,5,120 (0,1,0) — 10%4=2 no, 99%4=3 no,
    // 150%4=2 no, 75%4=3 no, 7%4=3 no
    assert(keys(KeyModFilter(4, 0, 2)) == Set(0L, 5L, 120L))
    assertThrows[IllegalArgumentException](KeyModFilter(4, 3, 5))
    assertThrows[IllegalArgumentException](KeyModFilter(-1, 0, 1))
  }

  test("composite filter applies each source its own filter, others pass") {
    val f = CompositeKeyFilter(Map(
      1 -> DbusKeyFilter("RANGE", Seq(KeyRangeFilter(0, 6))),
      2 -> DbusKeyFilter("MOD", Seq(KeyModFilter(2, 0, 1)))))
    // src1: keys in [0,6) → 0,5; src2: key%2==0 → 150; others untouched
    assert(keys(f) == Set(0L, 5L, 150L, 75L, 120L, 7L))
  }

  test("JSON config parse mirrors reference grammar") {
    val f = Filters.parseCompositeConfig(
      """{"40":{"partitionType":"RANGE","filters":[
        |{"keyRange":{"start":100,"end":200}},{"keyRange":{"start":300,"end":500}}]},
        |"41":{"partitionType":"MOD","filters":[{"numBuckets":4,"bktRange":{"start":0,"end":2}}]},
        |"42":{"partitionType":"NONE"}}""".stripMargin)
    assert(f.bySource(40) == DbusKeyFilter("RANGE",
      Seq(KeyRangeFilter(100, 200), KeyRangeFilter(300, 500))))
    assert(f.bySource(41) == DbusKeyFilter("MOD", Seq(KeyModFilter(4, 0, 2))))
    assert(f.bySource(42).filters.isEmpty)
  }

  test("filter-to-SQL fidelity (FilterToSQL.java shapes)") {
    assert(KeyRangeFilter(100, 200).toSql() ==
      Some("(srckey >= 100 AND srckey < 200)"))
    assert(KeyModFilter(4, 1, 3).toSql("k") ==
      Some("(abs(k) % 4 >= 1 AND abs(k) % 4 < 3)"))
    val or = DbusKeyFilter("RANGE",
      Seq(KeyRangeFilter(0, 10), KeyRangeFilter(20, 30))).toSql()
    assert(or == Some("((srckey >= 0 AND srckey < 10) OR (srckey >= 20 AND srckey < 30))"))
    assert(DbusKeyFilter("NONE", Nil).toSql() == Some(""))
  }

  test("generated SQL predicate agrees with the column predicate") {
    val f = DbusKeyFilter("MOD", Seq(KeyModFilter(4, 0, 2)))
    val viaSql = events.where(f.toSql("key_long").get).select("key_long")
      .as[Long].collect().toSet
    assert(viaSql == keys(f))
  }

  test("mod/range partition factories cover the key space exactly once") {
    val mods = (0L until 4L).map(b => Filters.modPartition(4, b))
    val covered = mods.map(keys).reduce(_ ++ _)
    assert(covered == keys(AllowAllFilter))
    assert(mods.map(keys).map(_.size).sum == 8) // disjoint
  }

  test("key range over mixed keys excludes unparseable string keys") {
    // key_long carries the source coercion (parse-as-long else hashCode);
    // the reference's KeyRangeFilter has NO hashCode fallback
    // (KeyRangeFilter.java:50-57 throws on NumberFormatException), so a
    // range must never match an event via its hash coercion
    val mixed = Seq(
      // (key_long, key_string): LONG key, parseable strings, junk string
      (150L, null.asInstanceOf[String]), // LONG key in range
      (150L, "150"),                     // STRING key, parses, in range
      (999L, "999"),                     // parses, out of range
      (150L, "u42x"),                    // junk — 150 is its fake coercion
      (150L, "+150"),                    // '+' prefix — Long.parseLong OK
      (150L, "9223372036854775808"))     // overflows Long.parseLong
      .toDF("key_long", "key_string")
    val inRange = KeyRangeFilter(100L, 600L)
      .toColumnFor(mixed.columns.toSeq)
    val got = mixed.where(inRange)
      .select("key_long", "key_string").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((150L, null), (150L, "150"), (150L, "+150")))
    // schema-unaware form (numeric envelope) unchanged
    assert(keys(KeyRangeFilter(5, 120)) ==
      keys(ConjunctionFilter(Seq(KeyRangeFilter(5, 120)))))
  }

  test("java string hash parity for string-key bucketing") {
    assert(Filters.javaStringHash("databus") == "databus".hashCode)
    val df = Seq("123", "-7", "+9", "abc").toDF("k")
    val buckets = df.select(Filters.stringKeyBucket(df("k"), 4).as("b"))
      .as[Long].collect().toSeq
    assert(buckets(0) == 123 % 4 && buckets(1) == 7 % 4)
    assert(buckets(2) == 9 % 4) // '+' prefix parses as long, not hashed
    assert(buckets(3) == math.abs("abc".hashCode.toLong) % 4)
  }
}
