package graft

import java.sql.Timestamp

import graft.functions.GenericAvroCodec
import graft.model.VersionedSchemaSet

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-walking payload codec: type menu, nullability, nesting, and
  * rejections mirror OracleAvroGenericEventFactory.java:519-702. */
class GenericAvroCodecSpec extends SparkSpec {
  import spark.implicits._

  private val nested = VersionedSchemaSet.orderWithItemsV1.schemaJson

  test("derived StructType walks unions, simple types, and array-of-record") {
    val st = GenericAvroCodec.structTypeFor(nested)
    assert(st.fieldNames.toSeq == Seq("o_orderkey", "o_urgent", "o_bucket",
      "o_rate", "o_totalprice", "o_blob", "o_clob", "o_date_ms", "items"))
    assert(st("o_urgent").dataType == BooleanType && st("o_urgent").nullable)
    assert(st("o_blob").dataType == BinaryType)
    assert(st("o_rate").dataType == FloatType)
    assert(st("o_bucket").dataType == IntegerType)
    val items = st("items").dataType.asInstanceOf[ArrayType]
    assert(!st("items").nullable) // bare array, not a union
    val elem = items.elementType.asInstanceOf[StructType]
    assert(elem.fieldNames.toSeq ==
      Seq("l_linenumber", "l_quantity", "l_returnflag"))
  }

  test("nested roundtrip preserves every simple type, nulls, and the array") {
    val df = Seq(
      (1L, true, 7, 1.5f, 2.25, "blobA", Option("P1"), 86400000L,
        Seq((1, 10.0, "R"), (2, 20.0, "A"))),
      (2L, false, 9, -0.5f, -3.5, "blobB", None: Option[String], 0L,
        Seq.empty[(Int, Double, String)]))
      .toDF("k", "u", "b", "r", "t", "blob", "clob", "ms", "its")
      .select(struct(
        col("k").as("o_orderkey"), col("u").as("o_urgent"),
        col("b").as("o_bucket"), col("r").as("o_rate"),
        col("t").as("o_totalprice"), col("blob").cast("binary").as("o_blob"),
        col("clob").as("o_clob"), col("ms").as("o_date_ms"),
        transform(col("its"), x => struct(
          x.getField("_1").as("l_linenumber"),
          x.getField("_2").as("l_quantity"),
          x.getField("_3").as("l_returnflag"))).as("items")).as("rec"))
    val enc = GenericAvroCodec.encode(nested)
    val dec = GenericAvroCodec.decode(nested)
    val out = df.select(dec(enc(col("rec"))).as("r"))
      .select(col("r.o_orderkey"), col("r.o_urgent"), col("r.o_bucket"),
        col("r.o_rate"), col("r.o_totalprice"),
        col("r.o_blob").cast("string").as("blob_text"), col("r.o_clob"),
        col("r.o_date_ms"), col("r.items"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getLong(0) == 1L && out(0).getBoolean(1) && out(0).getInt(2) == 7)
    assert(out(0).getFloat(3) == 1.5f && out(0).getDouble(4) == 2.25)
    assert(out(0).getString(5) == "blobA" && out(0).getString(6) == "P1")
    assert(out(0).getLong(7) == 86400000L)
    val items = out(0).getSeq[Row](8)
    assert(items.map(r => (r.getInt(0), r.getDouble(1), r.getString(2))) ==
      Seq((1, 10.0, "R"), (2, 20.0, "A")))
    assert(out(1).isNullAt(6)) // null through the nullable union
    assert(out(1).getSeq[Row](8).isEmpty)
  }

  test("LONG fields accept Timestamp as epoch millis (DATE/TIMESTAMP arm)") {
    val flat = """{"type":"record","name":"T","fields":[
      {"name":"id","type":["long","null"]},
      {"name":"ts","type":["long","null"]}]}"""
    val ts = Timestamp.valueOf("2024-03-01 12:00:00")
    val df = Seq((5L, ts)).toDF("id", "ts")
      .select(struct(col("id"), col("ts")).as("rec"))
    val enc = GenericAvroCodec.encode(flat)
    val dec = GenericAvroCodec.decode(flat)
    val r = df.select(dec(enc(col("rec"))).as("r"))
      .select(col("r.id"), col("r.ts")).head()
    assert(r.getLong(0) == 5L && r.getLong(1) == ts.getTime)
  }

  test("schema evolution: v1-written bytes decode through a v2 reader with default") {
    val v1 = """{"type":"record","name":"E","fields":[
      {"name":"a","type":["long","null"]}]}"""
    val v2 = """{"type":"record","name":"E","fields":[
      {"name":"a","type":["long","null"]},
      {"name":"extra","type":["string","null"],"default":"x"}]}"""
    val df = Seq(Tuple1(9L)).toDF("a").select(struct(col("a")).as("rec"))
    val enc = GenericAvroCodec.encode(v1)
    val dec = GenericAvroCodec.decodeEvolved(v1, v2)
    val r = df.select(dec(enc(col("rec"))).as("r"))
      .select(col("r.a"), col("r.extra")).head()
    assert(r.getLong(0) == 9L && r.getString(1) == "x")
  }

  test("null in a non-nullable field is an error, not a silent null") {
    val strict = """{"type":"record","name":"S","fields":[
      {"name":"a","type":"long"}]}"""
    val df = Seq(Tuple1(Option.empty[Long])).toDF("a")
      .select(struct(col("a")).as("rec"))
    val enc = GenericAvroCodec.encode(strict)
    val ex = intercept[Exception] {
      df.select(enc(col("rec")).as("b")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("MAP / ENUM / FIXED / non-nullable unions are rejected like the factory") {
    def bad(fieldType: String): String =
      s"""{"type":"record","name":"B","fields":[{"name":"f","type":$fieldType}]}"""
    val cases = Seq(
      bad("""{"type":"map","values":"long"}"""),
      bad("""{"type":"enum","name":"X","symbols":["A","B"]}"""),
      bad("""{"type":"fixed","name":"F","size":4}"""),
      bad("""["long","string"]"""),
      bad("""{"type":"array","items":"long"}""")) // array of non-record
    cases.foreach { json =>
      intercept[IllegalArgumentException] {
        GenericAvroCodec.structTypeFor(json)
      }
    }
  }
}
