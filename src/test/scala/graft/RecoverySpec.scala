package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, Similarity}
import graft.sinks.ParquetSink

/** Executes the failure/guard paths that round 3 shipped untested: the
  * ParquetSink crash-recovery state machine (every crash window staged on
  * disk), the Components non-convergence contract (observable by the
  * caller, not just a WARN line), and the ivfSearch single-query guard. */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  // ---- Components convergence contract ----

  private def chain(n: Int) =
    (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")

  // smallGraphLimit = 0 forces the DISTRIBUTED pointer-jumping loop —
  // these tests exercise the fixpoint itself, which the measured-small
  // union-find fast path would otherwise bypass
  test("components run reports non-convergence on a chain longer than maxIter allows") {
    val r = Components.run(chain(40), "id_a", "id_b", maxIter = 2, smallGraphLimit = 0)
    assert(!r.converged)
    assert(r.rounds === 2)
    // partial labels: at least one node still points above the true root 0
    assert(r.labels.filter($"comp" =!= 0L).count() > 0)
  }

  test("keepRepresentatives throws on non-convergence instead of under-deduping") {
    val docs = (0L to 40L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Components.keepRepresentatives(docs, "doc_id", chain(40), "id_a", "id_b",
        maxIter = 2, smallGraphLimit = 0)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("pointer jumping converges a 1000-node chain in O(log n) rounds") {
    val r = Components.run(chain(1000), "id_a", "id_b", maxIter = 20, smallGraphLimit = 0)
    assert(r.converged, s"not converged in ${r.rounds} rounds")
    assert(r.rounds <= 15, s"expected O(log 1000) ~ 10 rounds, got ${r.rounds}")
    assert(r.labels.filter($"comp" =!= 0L).isEmpty, "all nodes must reach root 0")
  }

  test("default maxIter converges a 60k-node chain (needs >20 rounds)") {
    // regression: sf0.1 gradient images chain into a ~60k-diameter hamming
    // component; the old default maxIter=20 failed it (observed 21-24
    // rounds needed), which killed mm_image_dedup in the round-9 bench
    val r = Components.run(chain(60000), "id_a", "id_b", smallGraphLimit = 0)
    assert(r.converged, s"not converged in ${r.rounds} rounds")
    assert(r.rounds > 15 && r.rounds <= 30, s"expected ~log2(60k)+eps rounds, got ${r.rounds}")
    assert(r.labels.filter($"comp" =!= 0L).isEmpty, "all nodes must reach root 0")
  }

  test("fast-path labels broadcast into consumer joins (no corpus shuffle)") {
    // the RDD-backed labels frame carries no size statistic; the fast
    // path must restore broadcastability explicitly or every consumer
    // label-join falls back to sort-merge and shuffles the corpus
    // (measured 2.4 s -> 6 s on dedup_keep_representatives at sf0.1)
    val labels = Components.run(chain(100), "id_a", "id_b").labels
    val corpus = spark.range(5000).select($"id", ($"id" % 100).as("x"))
    val plan = corpus.join(labels, Seq("id"), "left")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"fast-path labels must broadcast into consumer joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "corpus must not shuffle for the label join")
  }

  test("driver union-find fast path labels exactly match the distributed fixpoint") {
    // adversarial mix: a chain (deep), a star (wide), self-loops,
    // duplicate + reversed edges, and ids far from dense 0..n
    val edges = ((0 until 50).map(i => (i * 7L, i * 7L + 7L)) ++
      Seq((1000L, 2000L), (3000L, 2000L), (2000L, 4000L)) ++
      Seq((9999L, 9999L), (2000L, 1000L), (1000L, 2000L)) ++
      Seq((500000L, 500001L))).toDF("id_a", "id_b")
    val fast = Components.run(edges, "id_a", "id_b")
    assert(fast.converged && fast.rounds === 0, "small graph must take the fast path")
    val dist = Components.run(edges, "id_a", "id_b", smallGraphLimit = 0)
    assert(dist.converged && dist.rounds > 0)
    val f = fast.labels.as[(Long, Long)].collect().toSet
    val g = dist.labels.as[(Long, Long)].collect().toSet
    assert(f === g, "fast-path labels must be identical to the fixpoint's")
  }

  test("null pair endpoints raise the same error in both regimes") {
    def msg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(msg).getOrElse("")
    val bad = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("id_a", "id_b")
    // before the fused guard the fast path threw an opaque decode NPE
    // while the distributed loop silently propagated the null
    val eFast = intercept[Exception] {
      Components.run(bad, "id_a", "id_b").labels.collect()
    }
    assert(msg(eFast).contains("null id_a in the pair frame"))
    val eDist = intercept[Exception] {
      Components.run(bad, "id_a", "id_b", smallGraphLimit = 0).labels.collect()
    }
    assert(msg(eDist).contains("null id_a in the pair frame"))
  }

  test("keepRepresentativesFromLabels equals the one-call form on a converged graph") {
    val docs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val labels = Components.run(pairs, "id_a", "id_b").labels
    val viaLabels = Components.keepRepresentativesFromLabels(docs, "doc_id", labels)
      .select("doc_id").as[Long].collect().toSet
    val oneCall = Components.keepRepresentatives(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").as[Long].collect().toSet
    assert(viaLabels === oneCall)
    assert(viaLabels === Set(0L, 3L, 4L, 5L, 7L, 8L, 9L))
  }

  test("unpersistCheckpoint releases blocks even through projected views") {
    val ck = spark.range(0, 1000).toDF("id").withColumn("v", $"id" * 2).localCheckpoint()
    val before = spark.sparkContext.getPersistentRDDs.size
    // the iterative-loop shape that leaked in round 4: a drop/filter view
    // over the checkpoint, not the bare checkpointed frame
    val view = ck.drop("v").filter($"id" > 10)
    org.apache.spark.sql.GraftShim.unpersistCheckpoint(view)
    assert(spark.sparkContext.getPersistentRDDs.size === before - 1,
      "a projected view must still release its underlying checkpoint RDD")
  }

  test("unpersistCheckpoint refuses a plan with more checkpoint leaves than claimed") {
    val ckA = spark.range(0, 100).toDF("id").localCheckpoint()
    val ckB = spark.range(50, 150).toDF("id").localCheckpoint()
    val joined = ckA.join(ckB, "id")
    val before = spark.sparkContext.getPersistentRDDs.size
    // default claim is ONE leaf: a derived frame secretly holding a second
    // live checkpoint must throw, not release a stranger's blocks
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.GraftShim.unpersistCheckpoint(joined)
    }
    assert(e.getMessage.contains("2 checkpoint leaves"))
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "a refused release must not have unpersisted anything")
    // an honest claim releases both
    org.apache.spark.sql.GraftShim.unpersistCheckpoint(joined, expectedLeaves = 2)
    assert(spark.sparkContext.getPersistentRDDs.size === before - 2)
  }

  // ---- ivfSearch single-query guard ----

  test("ivfSearch rejects a multi-row and an empty query frame") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0)), (4L, Seq(0.1, 0.9))
    ).toDF("vec_id", "vec")
    val centroids = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("centroid_id", "vec")
    val multi = corpus.limit(2)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfSearch(corpus, "vec", "vec_id", centroids, "centroid_id", multi, k = 2)
    }
    assert(e.getMessage.contains("exactly one query row"))
    intercept[IllegalArgumentException] {
      Similarity.ivfSearch(corpus, "vec", "vec_id", centroids, "centroid_id",
        corpus.limit(0), k = 2)
    }
    // and the guard passes a genuine one-row query through
    val ok = Similarity.ivfSearch(corpus, "vec", "vec_id", centroids, "centroid_id",
      corpus.filter($"vec_id" === 1L), k = 2)
    assert(ok.count() === 2)
  }

  // ---- native-expression input contracts ----

  test("dot product is NULL on mismatched dimensionality, not a truncated partial sum") {
    import graft.expressions.VectorExpressions.dot
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 1.0))).toDF("a", "b")
    assert(df.select(dot($"a", $"b")).head().isNullAt(0),
      "a corrupt short vector must surface as NULL like zip_with, not rank normally")
    assert(df.select(dot($"a", $"a")).as[Double].head() === 14.0)
  }

  test("SQL-registered native expressions reject wrong-typed input at analysis time") {
    graft.GraftFunctions.register(spark)
    // array<int> through graft_dot used to reinterpret int bits as doubles
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
    // correctly-typed input still works
    val ok = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").as[Double].head()
    assert(ok === 11.0)
  }

  test("piiCount counts one insertion for an email embedded in a URL") {
    import graft.functions.TextFunctions.{piiCount, redactPii}
    val df = Seq("see https://bob@example.com/x end").toDF("t")
    val (n, red) = df.select(piiCount($"t"), redactPii($"t")).as[(Int, String)].head()
    assert(red === "see <URL> end")
    assert(n === 1, "the URL swallows the email: one tag, one count")
  }

  // ---- ParquetSink crash-window recovery ----

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_crash").toString + "/t"

  private def writeTable(path: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("id", "lang", "v").write.partitionBy("lang").parquet(path)

  private def readIds(path: String): Set[(Long, String)] =
    spark.read.parquet(path).select("id", "v").as[(Long, String)].collect().toSet

  private val base = Seq((1L, "en", "x"), (2L, "de", "y"))
  private val mergedByCrashedRun = Seq((1L, "en", "x"), (2L, "de", "Y2"), (3L, "fr", "z"))
  private val upd = Seq((4L, "en", "w"))

  test("crash window: dst renamed to .old, complete .tmp present -> tmp is promoted") {
    val dir = freshDir()
    // the crashed run died between mv(dst, old) and mv(tmp, dst)
    writeTable(dir + ".old", base)
    writeTable(dir + ".tmp", mergedByCrashedRun)
    ParquetSink.upsertInto(spark, dir, upd.toDF("id", "lang", "v"), "id", Seq("lang"))
    assert(readIds(dir) === Set((1L, "x"), (2L, "Y2"), (3L, "z"), (4L, "w")),
      "the crashed run's committed merge must survive, plus the new updates")
  }

  test("crash window: only .old remains -> base table is restored") {
    val dir = freshDir()
    writeTable(dir + ".old", base)
    ParquetSink.upsertInto(spark, dir, upd.toDF("id", "lang", "v"), "id", Seq("lang"))
    assert(readIds(dir) === Set((1L, "x"), (2L, "y"), (4L, "w")),
      "the base table must be restored from .old, not silently lost")
  }

  test("crash window: dst and stale .old both present -> dst wins, .old is discarded") {
    val dir = freshDir()
    // the crashed run died between mv(tmp, dst) and delete(old)
    writeTable(dir, mergedByCrashedRun)
    writeTable(dir + ".old", base)
    ParquetSink.upsertInto(spark, dir, upd.toDF("id", "lang", "v"), "id", Seq("lang"))
    assert(readIds(dir) === Set((1L, "x"), (2L, "Y2"), (3L, "z"), (4L, "w")))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".tmp")))
  }

  test("crash window: orphan .tmp with neither dst nor .old -> treated as fresh create") {
    val dir = freshDir()
    // a half-written initial create is untrustworthy — it must be discarded
    writeTable(dir + ".tmp", mergedByCrashedRun)
    ParquetSink.upsertInto(spark, dir, upd.toDF("id", "lang", "v"), "id", Seq("lang"))
    assert(readIds(dir) === Set((4L, "w")))
  }

  test("crash window: dst intact with leftover complete .tmp -> tmp is discarded") {
    val dir = freshDir()
    // died after writing tmp but BEFORE mv(dst, old): dst is still the truth
    writeTable(dir, base)
    writeTable(dir + ".tmp", mergedByCrashedRun)
    ParquetSink.upsertInto(spark, dir, upd.toDF("id", "lang", "v"), "id", Seq("lang"))
    assert(readIds(dir) === Set((1L, "x"), (2L, "y"), (4L, "w")),
      "an uncommitted tmp must not override the live table")
  }
}
