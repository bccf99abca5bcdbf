package graft.plans

import graft.SparkSpec
import graft.operators.Dedup
import graft.Tables

class AllPairsCosineSpec extends SparkSpec {

  test("native all-pairs plan is active in extension sessions") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(AllPairsCosine.enabled(emb))
    val plan = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AllPairsCosine"), plan) // exec nodeName strips "Exec"
  }

  test("native path and composed path return identical pairs and values") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val native = AllPairsCosine.pairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // composed form, built directly (bypassing the enabled() dispatch)
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => VF}
    val base = emb.select(col("vec_id"), col("embedding"),
      sqrt(VF.dot(col("embedding"), col("embedding"))).as("nrm"))
    val a = base.toDF("id_a", "v_a", "n_a")
    val b = base.toDF("id_b", "v_b", "n_b")
    val composed = a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", round(
        when(col("n_a") === 0.0 || col("n_b") === 0.0, lit(null).cast("double"))
          .otherwise(VF.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))), 6))
      .filter(col("cos") >= 0.4)
      .select("id_a", "id_b", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(native == composed && native.nonEmpty)
  }
}
