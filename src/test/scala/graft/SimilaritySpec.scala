package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

class SimilaritySpec extends SparkSpec {

  private def pairs(name: String) =
    SimilarityQueries.queries(name)(spark, sf0001).select("query_id", "neighbor_id")

  test("brute-force top-k: 5 ranked neighbors per query, ranks 1..5") {
    val out = SimilarityQueries.queries("sim_topk_bruteforce")(spark, sf0001)
    val perQuery = out.groupBy("query_id").agg(
      count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(perQuery.length == 10)
    assert(perQuery.forall(r => r.getLong(1) == 5L && r.getInt(2) == 1 && r.getInt(3) == 5))
  }

  test("IVF ANN recall vs brute force ≥ 0.8 at nprobe=4/16") {
    val bf = pairs("sim_topk_bruteforce")
    val ivf = pairs("sim_ann_ivf")
    val recall = bf.intersect(ivf).count() / 50.0
    assert(recall >= 0.8, s"IVF recall $recall")
  }

  test("hyperplane LSH: deterministic planes, candidates share buckets") {
    val p1 = SimilarityQueries.hyperplanes(8, 64)
    val p2 = SimilarityQueries.hyperplanes(8, 64)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
    assert(p1.flatten.forall(x => x >= -1.0 && x < 1.0))
    // the ANN query itself must at least run and respect the rank contract
    val out = SimilarityQueries.queries("sim_ann_lsh")(spark, sf0001)
    assert(out.filter(col("rank") > 5 || col("rank") < 1).isEmpty)
  }

  test("cosine of a vector with itself is 1") {
    val vs = SimilarityQueries.vectors(spark, sf0001).limit(5)
    val self = vs.select(
      round(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _)
        / (col("nrm") * col("nrm")), 9).as("c"))
    assert(self.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-6))
  }
}
