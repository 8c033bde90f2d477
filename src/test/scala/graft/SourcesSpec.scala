package graft

import java.nio.file.{Files, Paths}
import graft.sources.{Sources, TableCache}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val csvDir = {
    val dir = "target/test_csv"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "tag", "x")
    Sources.writeCsv(df, dir)
    dir
  }

  test("S9/S1 csv sink + full scan roundtrip with inferred schema") {
    val back = Sources.csv(spark, csvDir)
    assert(back.count() == 3)
    assert(back.schema("id").dataType.typeName == "integer")
    assert(back.schema("x").dataType.typeName == "double")
  }

  test("S2/S3 csv preview + header-only scan") {
    assert(Sources.csvPreview(spark, csvDir, 2).count() == 2)
    assert(Sources.csvColumns(spark, csvDir) == Seq("id", "tag", "x"))
  }

  test("S5/S6 parquet preview + footer-only schema") {
    val p = Tables.path(sf, "orders")
    assert(Sources.parquetPreview(spark, p, 5).count() == 5)
    assert(Sources.parquetSchema(spark, p).fieldNames.contains("o_orderkey"))
  }

  test("S10 zlib+base64 table serialization roundtrip") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val payload = Sources.serializeTable(df)
    assert(!payload.contains("\n"))
    val back = Sources.deserializeTable(spark, payload)
    assert(back.orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
      .toSeq == Seq((1, "x"), (2, "y")))
  }

  test("S11 LRU cache: move-to-end on access, evict-oldest on overflow") {
    val cache = new TableCache(maxSize = 2)
    cache.put("a", Seq(1).toDF("x"))
    cache.put("b", Seq(2).toDF("x"))
    assert(cache.get("a").nonEmpty) // a becomes most-recent
    cache.put("c", Seq(3).toDF("x")) // evicts b
    assert(cache.ids.toSet == Set("a", "c") && cache.get("b").isEmpty)
  }

  test("S12 html preview renders header and rows") {
    val html = Sources.toHtml(Seq((1, "a")).toDF("k", "v"))
    assert(html.contains("<th>k</th>") && html.contains("<td>a</td>"))
  }
}
