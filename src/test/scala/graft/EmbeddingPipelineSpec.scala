package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, RandomProjection}

/** Contract of the composed embedding-prep chain (the query key
  * hash-checks values; this proves the INVARIANTS a consumer relies on):
  * survivors are a subset holding one representative per near-dup
  * cluster, no verified near-dup pair survives intact, and the whole
  * composition is partitioning-independent. */
class EmbeddingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  private def corpus = {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = e.select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val variant = e.select(($"vec_id" + 1048576L).as("vec_id"),
      transform($"embedding", (x, i) =>
        when(i === pmod($"vec_id", lit(64)).cast("int"), x.cast("double") * 0.5)
          .otherwise(x.cast("double"))).as("v"))
    base.unionByName(variant)
  }

  private def survivorsOf(c: org.apache.spark.sql.DataFrame): Set[Long] = {
    val pairs = RandomProjection.rpLshPairs(c, "v", "vec_id", dims, 0.9)
      .select("id_a", "id_b")
    val drops = Components.run(pairs, "id_a", "id_b")
      .labels.filter($"id" =!= $"comp").select($"id".as("vec_id"))
    c.join(drops, Seq("vec_id"), "left_anti")
      .select("vec_id").as[Long].collect().toSet
  }

  test("one representative per cluster: the min id survives, the rest drop") {
    val c = corpus
    val surv = survivorsOf(c)
    val pairs = RandomProjection.rpLshPairs(c, "v", "vec_id", dims, 0.9)
      .select("id_a", "id_b")
    val labels = Components.run(pairs, "id_a", "id_b")
      .labels.as[(Long, Long)].collect()
    val byComp = labels.groupBy(_._2)
    byComp.foreach { case (compId, members) =>
      val ids = members.map(_._1).toSet
      assert(surv.contains(compId), s"cluster $compId: its min id must survive")
      assert((ids - compId).forall(!surv.contains(_)),
        s"cluster $compId: non-minimum members must drop")
    }
    // every id never seen in a pair survives untouched
    val paired = labels.map(_._1).toSet
    val all = c.select("vec_id").as[Long].collect().toSet
    assert((all -- paired).subsetOf(surv), "unclustered ids must all survive")
  }

  test("no verified near-dup pair survives intact") {
    val c = corpus
    val surv = survivorsOf(c)
    val pairs = RandomProjection.rpLshPairs(c, "v", "vec_id", dims, 0.9)
      .as[(Long, Long, Double)].collect()
    val intact = pairs.filter { case (a, b, _) => surv(a) && surv(b) }
    assert(intact.isEmpty,
      s"near-dup pairs with both sides surviving: ${intact.take(3).mkString(",")}")
  }

  test("the composition is partitioning-independent") {
    val c = corpus
    assert(survivorsOf(c.repartition(1)) === survivorsOf(c.repartition(7)))
  }
}
