package graft

import org.apache.spark.sql.functions._
import graft.sinks.DocStoreSink

/** Round-trip contract for the document-store sink: upsert-by-id with
  * `$addToSet`-style nested-array merge (the reference's Mongo load,
  * Airbnb_Listings_ETL.py:154-188 / Airbnb_Review_ETL.py:58-106). */
class DocStoreSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, name: String, reviews: Seq[(Long, String)]) =
    (id, name, reviews)

  private def toDocs(rows: Seq[(Long, String, Seq[(Long, String)])]) =
    rows.toDF("id", "name", "reviews")
      .withColumn("reviews", transform($"reviews",
        r => struct(r.getField("_1").as("rid"), r.getField("_2").as("body"))))

  private def readDocs(dir: String) =
    spark.read.parquet(dir)
      .select($"id", $"name",
        transform($"reviews", r => struct(r.getField("rid"), r.getField("body"))).as("reviews"))
      .as[(Long, String, Seq[(Long, String)])].collect().toMap2

  implicit private class MapOps(rows: Array[(Long, String, Seq[(Long, String)])]) {
    def toMap2: Map[Long, (String, Seq[(Long, String)])] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("loading the same batch twice is idempotent: one doc per id, arrays deduped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_doc").toString + "/docs"
    val batch = toDocs(Seq(
      doc(1L, "a", Seq((10L, "r10"), (11L, "r11"))),
      doc(2L, "b", Seq((20L, "r20")))))
    DocStoreSink.upsertDocsInto(spark, dir, batch, "id", "reviews", Nil)
    DocStoreSink.upsertDocsInto(spark, dir, batch, "id", "reviews", Nil)
    val got = readDocs(dir)
    assert(got.keySet === Set(1L, 2L), "one doc per id after a double load")
    assert(got(1L) === (("a", Seq((10L, "r10"), (11L, "r11")))))
    assert(got(2L) === (("b", Seq((20L, "r20")))))
  }

  test("second load merges nested arrays set-wise and lets update scalars win") {
    val dir = java.nio.file.Files.createTempDirectory("graft_doc").toString + "/docs"
    DocStoreSink.upsertDocsInto(spark, dir, toDocs(Seq(
      doc(1L, "a", Seq((11L, "r11"), (10L, "r10"))),
      doc(2L, "b", Seq((20L, "r20"))))), "id", "reviews", Nil)
    // doc 1: new name, one duplicate review + one new review; doc 3: new
    DocStoreSink.upsertDocsInto(spark, dir, toDocs(Seq(
      doc(1L, "a2", Seq((10L, "r10"), (12L, "r12"))),
      doc(3L, "c", Seq((30L, "r30"))))), "id", "reviews", Nil)
    val got = readDocs(dir)
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L)._1 === "a2", "update scalar wins")
    assert(got(1L)._2 === Seq((10L, "r10"), (11L, "r11"), (12L, "r12")),
      "$addToSet analog: union, dedup, canonical sort order")
    assert(got(2L) === (("b", Seq((20L, "r20")))), "untouched doc survives")
    assert(got(3L) === (("c", Seq((30L, "r30")))), "new doc inserted")
  }

  test("mergeDocs handles key-only-in-one-side and null arrays") {
    val base = Seq((1L, "a", Seq((10L, "x"))), (2L, "b", null.asInstanceOf[Seq[(Long, String)]]))
      .toDF("id", "name", "reviews")
    val upd = Seq((2L, "b2", Seq((20L, "y"))), (3L, "c", Seq((30L, "z"))))
      .toDF("id", "name", "reviews")
    val got = DocStoreSink.mergeDocs(base, upd, "id", "reviews")
      .as[(Long, String, Seq[(Long, String)])].collect().toMap2
    assert(got(1L) === (("a", Seq((10L, "x")))))
    assert(got(2L) === (("b2", Seq((20L, "y")))), "null base array contributes nothing")
    assert(got(3L) === (("c", Seq((30L, "z")))))
  }

  test("streaming foreachBatch load accumulates reviews set-wise and replays idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docstream").toString + "/docs"
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)](spark)
    val sink = graft.sinks.DocStoreSink.appendRecordsInto(
      dir, "id", Seq("rid", "body"), "reviews", Nil) _
    val qy = ms.toDS().toDF("id", "rid", "body")
      .writeStream.foreachBatch(sink).start()
    ms.addData((1L, 10L, "r10"), (1L, 11L, "r11"), (2L, 20L, "r20"))
    qy.processAllAvailable()
    ms.addData((1L, 11L, "r11"), (1L, 12L, "r12"), (3L, 30L, "r30")) // one replayed record
    qy.processAllAvailable(); qy.stop()
    val got = spark.read.parquet(dir)
      .select($"id", transform($"reviews", r => struct(r.getField("rid"), r.getField("body"))).as("reviews"))
      .as[(Long, Seq[(Long, String)])].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === Seq((10L, "r10"), (11L, "r11"), (12L, "r12")),
      "replayed record must not duplicate; new records accumulate in canonical order")
    assert(got(2L) === Seq((20L, "r20")) && got(3L) === Seq((30L, "r30")))
    // at-least-once replay of a whole batch is a no-op (set semantics)
    sink(Seq((1L, 12L, "r12"), (3L, 30L, "r30")).toDF("id", "rid", "body"), 99L)
    val again = spark.read.parquet(dir)
      .select($"id", transform($"reviews", r => struct(r.getField("rid"), r.getField("body"))).as("reviews"))
      .as[(Long, Seq[(Long, String)])].collect().toMap
    assert(again === got)
  }

  test("streaming load with partition columns carries them through the nesting") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docpart").toString + "/docs"
    val sink = graft.sinks.DocStoreSink.appendRecordsInto(
      dir, "id", Seq("rid", "body"), "reviews", Seq("lang")) _
    sink(Seq((1L, "en", 10L, "r10"), (2L, "de", 20L, "r20"))
      .toDF("id", "lang", "rid", "body"), 0L)
    sink(Seq((1L, "en", 11L, "r11"), (3L, "fr", 30L, "r30"))
      .toDF("id", "lang", "rid", "body"), 1L)
    val back = spark.read.parquet(dir)
    assert(back.columns.toSet === Set("id", "lang", "reviews"))
    val got = back.select($"id", $"lang", size($"reviews").as("n"))
      .as[(Long, String, Int)].collect().toSet
    assert(got === Set((1L, "en", 2), (2L, "de", 1), (3L, "fr", 1)))
    // the write is actually partitioned: lang=... directories exist
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")), s"expected lang= partition dirs, got $dirs")
  }

  test("mergeDocs rejects mismatched schemas") {
    val base = Seq((1L, "a")).toDF("id", "name")
    val upd = Seq((1L, 2L)).toDF("id", "other")
    intercept[IllegalArgumentException] {
      DocStoreSink.mergeDocs(base, upd, "id", "name")
    }
  }

  test("mergeDocs raises on duplicate keys within one side instead of merging silently") {
    val clean = toDocs(Seq(doc(1L, "a", Seq((10L, "x")))))
    val dup = toDocs(Seq(
      doc(2L, "b", Seq((20L, "y"))),
      doc(2L, "b-conflict", Seq((21L, "z")))))
    // dup keys in the UPDATES side
    val e1 = intercept[Exception] {
      DocStoreSink.mergeDocs(clean, dup, "id", "reviews").collect()
    }
    assert(e1.getMessage.contains(">1 row for key"), s"got: ${e1.getMessage}")
    // dup keys in the BASE side
    val e2 = intercept[Exception] {
      DocStoreSink.mergeDocs(dup, clean, "id", "reviews").collect()
    }
    assert(e2.getMessage.contains(">1 row for key"))
    // healthy input still merges (the guard costs no correctness)
    val ok = DocStoreSink.mergeDocs(clean, toDocs(Seq(doc(2L, "b", Seq((20L, "y"))))),
      "id", "reviews")
    assert(ok.count() === 2)
  }

  test("allowEvolution widens a new update column with nulls for old docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docevo").toString + "/docs"
    DocStoreSink.upsertDocsInto(spark, dir, toDocs(Seq(
      doc(1L, "a", Seq((10L, "r10"))),
      doc(2L, "b", Seq((20L, "r20"))))), "id", "reviews", Nil)
    // the next batch carries a NEW scalar column the table never had
    val evolved = toDocs(Seq(doc(2L, "b2", Seq((21L, "r21")))))
      .withColumn("host_since", lit("2024"))
    DocStoreSink.upsertDocsInto(spark, dir, evolved, "id", "reviews", Nil,
      allowEvolution = true)
    val got = spark.read.parquet(dir)
      .select($"id", $"name", $"host_since", size($"reviews").as("n"))
      .as[(Long, String, Option[String], Int)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "a", None, 1),          // untouched doc reads the new column as null
      (2L, "b2", Some("2024"), 2)), // updated doc carries it; arrays still merge
      s"got: $got")
    // strict mode still rejects the same drift
    intercept[Exception] {
      DocStoreSink.upsertDocsInto(spark, dir,
        evolved.withColumn("another", lit(1)), "id", "reviews", Nil)
    }
  }

  test("allowEvolution widens an update batch MISSING the array column") {
    val base = toDocs(Seq(doc(1L, "a", Seq((10L, "r10")))))
    val upd = Seq((1L, "a2")).toDF("id", "name") // scalar-only update
    val got = DocStoreSink.mergeDocs(base, upd, "id", "reviews", allowEvolution = true)
      .select($"id", $"name", size($"reviews").as("n"))
      .as[(Long, String, Int)].collect().toSeq
    assert(got === Seq((1L, "a2", 1)),
      "scalar update wins; the base array survives a batch that never had one")
  }

  test("parquet upsert with allowEvolution appends the new column, nulls for old rows") {
    import graft.sinks.ParquetSink
    val dir = java.nio.file.Files.createTempDirectory("graft_pqevo").toString + "/t"
    ParquetSink.upsertInto(spark, dir,
      Seq((1L, "en", 1.0), (2L, "fr", 2.0)).toDF("id", "lang", "v"), "id", Seq("lang"))
    // strict mode refuses the widened batch outright
    intercept[Exception] {
      ParquetSink.upsertInto(spark, dir,
        Seq((2L, "fr", 2.5, "src://x")).toDF("id", "lang", "v", "src"), "id", Seq("lang"))
    }
    ParquetSink.upsertInto(spark, dir,
      Seq((2L, "fr", 2.5, "src://x")).toDF("id", "lang", "v", "src"), "id", Seq("lang"),
      allowEvolution = true)
    val got = spark.read.parquet(dir)
      .select($"id", $"lang", $"v", $"src")
      .as[(Long, String, Double, Option[String])].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "en", 1.0, None), (2L, "fr", 2.5, Some("src://x"))))
  }

  test("initial doc load with duplicate keys raises instead of writing dup docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docdup").toString + "/docs"
    val dup = toDocs(Seq(
      doc(1L, "a", Seq((10L, "x"))),
      doc(1L, "a2", Seq((11L, "y")))))
    intercept[Exception] {
      DocStoreSink.upsertDocsInto(spark, dir, dup, "id", "reviews", Nil)
    }
    assert(!new java.io.File(dir).exists(), "failed first load must leave no table behind")
  }
}
