package graft.functions

import org.apache.spark.sql.Column

/** Byte-pair-encoding tokenization: the REAL subword token counts a
  * training pipeline budgets in, replacing the regex "BPE-ish" proxy
  * (`TextFunctions.bpeishCount`) wherever the number has to mean what a
  * training run sees (Sennrich et al., ACL'16 — the classic
  * frequency-merge trainer; encoding is the standard greedy
  * lowest-rank-first application).
  *
  * Production shape at 100 TB: the tokenizer is a STATIC ARTIFACT — it is
  * trained ONCE on a bounded sample (word frequencies, the only state the
  * trainer needs, collected top-N — routing-metadata-sized, like a probe
  * route), then shipped with the pipeline and applied as a per-row fold
  * with no shuffle and no driver participation. [[DefaultMerges]] is that
  * artifact for the synthetic corpus, frozen in source; BpeSpec proves
  * [[train]] reproduces it from the corpus exactly, so the artifact's
  * provenance is spec-checked rather than trusted.
  *
  * Reference scope: the reference has no tokenizer at all (its text work
  * is `str.strip`/`str.replace`, Airbnb_Listings_ETL.py:53-70); this is
  * the beyond-reference training-data path.
  */
object Bpe {

  /** The frozen default merge table: 40 merges trained by [[train]] on
    * the sf0.001 `documents` corpus (top-10000 words by frequency, the
    * bounded-sample rule) — regenerate with `graft.tools.TrainBpe`.
    * 40 keeps the table genuinely SUBWORD on this corpus (most words
    * stay multi-token); training to saturation would collapse the tiny
    * synthetic vocabulary to one token per word. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
    ("s", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("co", "lu"), ("colu", "m"),
    ("colum", "n"), ("d", "ow"), ("in", "dow"), ("w", "indow"),
    ("d", "er"), ("or", "der"), ("or", "t"), ("s", "ort"),
    ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
    ("l", "ine"), ("e", "y"), ("k", "ey"), ("j", "o"),
    ("jo", "in"), ("g", "e"), ("mer", "ge"), ("er", "y"))

  /** The PRODUCTION-SIZED frozen artifact: 1024 merges trained by the
    * `wide` recipe (documents.text words ∪ customer `c_name` ∪ part
    * `p_name` words, top-10000 by frequency, sf0.01) — regenerate with
    * `graft.tools.TrainBpe <sf0.01> 10000 1024 wide --emit-file`. The
    * id-bearing name columns give the tiny synthetic corpus the
    * long-tail vocabulary (digit runs, `#` compounds) a real crawl has:
    * common words train to single tokens (as a real tokenizer's do)
    * while unseen id-like words split into genuine subwords. Lives in
    * the generated [[BpeLargeMerges]]; provenance spec-checked like
    * [[DefaultMerges]]. */
  def LargeMerges: Seq[(String, String)] = BpeLargeMerges.merges

  /** Total BPE token count of a text column under `merges` — a native
    * codegen'd expression (one static call per row; the table rides the
    * plan as a reference object). Words are single-space split (the
    * `tokens()` rule), each encoded by repeated (lowest-rank, leftmost)
    * merging. NULL text stays NULL. */
  def bpeTokenCount(c: Column,
                    merges: Seq[(String, String)] = DefaultMerges): Column =
    graft.expressions.BpeExpressions.bpeTokenCount(c, merges)

  /** Classic BPE trainer over a word-frequency table: `numMerges` rounds
    * of (count adjacent token pairs weighted by word frequency; merge the
    * most frequent pair everywhere), with a DETERMINISTIC tiebreak
    * (count desc, then pair lexicographic) so the same sample always
    * yields the same artifact. Driver-side by design — the input is a
    * bounded word-frequency sample, not a corpus (see the object doc);
    * stops early if the vocabulary saturates. */
  def train(wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var vocab: Map[Vector[String], Long] = wordFreqs.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, f) => (codepoints(w), f) }
      .toSeq.groupMapReduce(_._1)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var saturated = false
    while (out.size < numMerges && !saturated) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (toks, f) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) saturated = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        vocab = vocab.map { case (toks, f) => (mergeAll(toks, best), f) }
      }
    }
    out.toSeq
  }

  private def codepoints(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      b += w.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /** Merge every (left-to-right, non-overlapping) occurrence of `pair` —
    * the trainer's apply rule; equivalent per-merge to the encoder's
    * one-at-a-time rule. */
  private def mergeAll(toks: Vector[String], pair: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == pair._1 && toks(i + 1) == pair._2) {
        b += toks(i) + toks(i + 1); i += 2
      } else { b += toks(i); i += 1 }
    }
    b.result()
  }
}
