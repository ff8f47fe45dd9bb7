package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** Round-trips the JDBC wrapper through embedded Derby (in-memory DB, jar
  * ships with Spark) — the same call shape a Postgres extract/load uses. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  test("jdbc write + partitioned read round-trips and parallelizes") {
    val df = spark.range(0, 100).select($"id", ($"id" % 7).as("v"))
    Jdbc.write(df, url, "t_round", SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "t_round",
      Some(Jdbc.Partitioning("id", 0, 100, 4)))
    assert(back.rdd.getNumPartitions === 4, "range partitioning must fan out the read")
    assert(back.as[(Long, Long)].collect().toSet ===
      df.as[(Long, Long)].collect().toSet)
  }

  test("jdbc read pushes filters into the source query") {
    val back = Jdbc.read(spark, url, "t_round")
      .filter($"id" < 10).select($"id")
    assert(back.count() === 10)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
      s"filter must reach the JDBC scan, got:\n$plan")
  }
}
