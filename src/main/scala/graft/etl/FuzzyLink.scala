package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance RECORD LINKAGE — the fuzzy-key matching a cleaning
  * stage needs when "the same entity, typo'd" must link without an exact
  * key: customer/supplier name reconciliation, near-identical product
  * titles, OCR'd identifiers. The reference's ETL dedups on exact keys
  * only (`Listings_ETL.py:47-49`); this is the operator its users reach
  * for next, and the token-set family (`Dedup.ngramJaccard` etc.)
  * deliberately does NOT cover it: Jaccard over shingles is blind to the
  * single-character substitutions edit distance is FOR.
  *
  * All-pairs `levenshtein` is O(n²) string comparisons — dead at any
  * scale. The public SymSpell observation makes the candidate set sound
  * and tiny: if ed(a, b) ≤ 1 then deleting one character (or none) from
  * each yields a COMMON string, so blocking on the DELETION NEIGHBORHOOD
  * — the string itself plus its |s| single-deletion variants — finds
  * every qualifying pair exactly (substitution at i: both sides delete i;
  * insertion: the longer side deletes the inserted char and meets the
  * shorter side's identity variant). Candidates are Σ|bucket|² over
  * variant buckets — proportional to how many names actually collide,
  * never n²; the one shuffle is the variant-keyed exchange, ~|s|+1 rows
  * per distinct name. The exact `levenshtein` verify then prunes the
  * false candidates the blocking admits (two names sharing a variant can
  * be at distance 2: delete a different position from each side).
  *
  * Generalizing to ed ≤ d uses the ≤d-deletion neighborhood — same
  * join, bigger blocks (≈ C(|s|, d) variants per name, and blocks
  * admit everything within 2d deletions, so the verify prunes harder).
  * Implemented for d ∈ {1, 2} — the typo distances name pipelines
  * actually run — and raises on anything else rather than silently
  * under-recalling.
  */
object FuzzyLink {

  /** The ≤`maxDist`-deletion neighborhood of `n` as a distinct array:
    * i = 1..|n| deletes position i; i = |n|+1 is the identity variant
    * (prefix is the whole string, suffix empty) — required so an
    * insertion pair meets the shorter side. d = 2 applies the same
    * level to every level-1 variant (identity included, so 0-, 1- and
    * 2-deletion strings all appear). */
  private def variantArray(n: org.apache.spark.sql.Column, maxDist: Int) = {
    def dels(s: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), length(s) + 1),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    if (maxDist == 1) dels(n)
    else array_distinct(flatten(transform(dels(n), v => dels(v))))
  }

  /** The blocking stage alone: distinct candidate pairs (name_a <
    * name_b) sharing at least one deletion-neighborhood variant — a
    * superset of the ed ≤ maxDist pairs (two names can share a variant
    * at anything up to distance 2·maxDist). Exposed so the scale curve
    * prices candidate volume, the quantity that must stay ~linear for
    * the plan to survive 100 TB. */
  private[graft] def candidatePairs(df: DataFrame, nameCol: String,
                                    maxDist: Int = 1): DataFrame = {
    val names = df.select(col(nameCol).cast("string").as("n"))
      .filter(col("n").isNotNull).distinct()
    val variants = names.select(col("n"),
      explode(variantArray(col("n"), maxDist)).as("variant"))
    variants.select(col("n").as("name_a"), col("variant"))
      .join(variants.select(col("n").as("name_b"), col("variant").as("variant_b")),
        col("variant") === col("variant_b"))
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b").distinct()
  }

  /** Distinct name pairs (name_a < name_b) within edit distance
    * `maxDist`, found via deletion-neighborhood blocking + exact verify.
    * Output: (name_a, name_b, dist). */
  def editNeighbors(df: DataFrame, nameCol: String, maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"editNeighbors implements the 1- and 2-deletion neighborhoods " +
        s"(sound for maxDist ≤ 2); got $maxDist — extend the " +
        "neighborhood before raising the bound, don't silently under-recall")
    candidatePairs(df, nameCol, maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }
}
