package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sinks.AnnStore

/** The centroid-partitioned ANN store's two claims:
  *  1. search over the store is value-identical to search over the raw
  *     corpus (parquet round-trips doubles exactly);
  *  2. the probe plan PRUNES — it reads only the probed clusters'
  *     partitions, not the whole store (the ~K/nProbe I/O reduction that
  *     makes IVF pay at 100 TB).
  */
class AnnStoreSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sf/embeddings.parquet")
  private def cents = corpus.filter($"vec_id" < 8).withColumnRenamed("vec_id", "cid")

  private val storeDirs = scala.collection.mutable.ListBuffer[java.io.File]()

  override def afterAll(): Unit = {
    // each store is a full embeddings copy — don't leave them in /tmp
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    storeDirs.foreach(rm)
  }

  private def buildStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_annspec").toFile
    storeDirs += dir
    val path = dir.toString + "/store"
    AnnStore.write(
      Similarity.ivfAssign(corpus, "embedding", "vec_id", cents, "cid", keepVec = true),
      path)
    path
  }

  private def storeScan(df: org.apache.spark.sql.DataFrame, path: String) =
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("graft_annspec")) => f
    }

  test("store search matches raw-corpus ivfSearch exactly") {
    val path = buildStore()
    val query = corpus.filter($"vec_id" === 1)
    val fromStore = Similarity.ivfSearchAssigned(AnnStore.read(spark, path), "vec_id",
      cents, "cid", "embedding", query, k = 10, nProbe = 2)
      .as[(Long, Double)].collect().toSeq
    val fromRaw = Similarity.ivfSearch(corpus, "embedding", "vec_id",
      cents, "cid", query, k = 10, nProbe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(fromStore === fromRaw)
  }

  test("static centroid filter prunes to that cluster's partition only") {
    val path = buildStore()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // AQE off: the executed plan is the scan itself, so its numFiles
      // metric is the one the action populated
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val totalFiles = AnnStore.read(spark, path).inputFiles.length
      val one = AnnStore.read(spark, path).filter($"centroid_id" === 3)
      // collect(), not count(): count() builds its OWN QueryExecution, so
      // the metrics inspected below would belong to a plan that never ran
      one.collect()
      val scans = storeScan(one, path)
      assert(scans.nonEmpty, "expected a parquet scan of the store")
      assert(scans.head.partitionFilters.nonEmpty,
        "centroid_id filter should plan as a partition filter")
      val read = scans.head.metrics("numFiles").value
      // exactly the files under the one probed directory
      val dirFiles = new java.io.File(path, "centroid_id=3")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(read === dirFiles, s"filter should prune to one directory")
      assert(read < totalFiles, s"filter should prune: read $read of $totalFiles files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("probe search prunes the store scan to the nProbe probed clusters") {
    val path = buildStore()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // AQE off so the executed plan (and its scan metrics) are inspectable
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val res = Similarity.ivfSearchAssigned(AnnStore.read(spark, path), "vec_id",
        cents, "cid", "embedding", corpus.filter($"vec_id" === 1), k = 10, nProbe = 2)
      res.collect() // execute THIS dataset's plan (see note above)
      val scans = storeScan(res, path)
      assert(scans.nonEmpty, "expected a parquet scan of the store")
      val scan = scans.head
      assert(scan.partitionFilters.exists(_.toString.contains("centroid_id")),
        s"probe route should plan as a partition filter, scan:\n$scan")
      val totalFiles = AnnStore.read(spark, path).inputFiles.length
      val read = scan.metrics("numFiles").value
      // exactly the files under the 2 probed clusters' directories: every
      // directory holds ≥1 file, so reading ≤ (files of the 2 largest
      // dirs) while still returning the right answer proves the route
      val perDir = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("centroid_id="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
        .sorted.reverse
      assert(read <= perDir.take(2).sum,
        s"probe scan should read only 2 clusters' files: read $read of $totalFiles")
      assert(read < totalFiles,
        s"probe scan should read only probed clusters: read $read of $totalFiles files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
