package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The runtime half of the skew story: Relational.saltedJoin is the explicit,
  * always-on mitigation (SaltBlockDecontamSpec); this pins that AQE's
  * OptimizeSkewedJoin actually fires in this engine's session config when a
  * sort-merge join sees a hot key — the two paths a 100 TB deployment
  * chooses between. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join at runtime") {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so a test-sized hot partition counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, v) =>
      val old = spark.conf.getOption(k); spark.conf.set(k, v); k -> old
    }
    try {
      // one viral key owns ~95% of the left side; the right side is uniform
      val left = spark.range(200000)
        .select(when(col("id") < 190000, lit(7L)).otherwise(col("id") % 97).as("k"),
          concat(lit("payload_"), col("id")).as("p"))
      val right = spark.range(97).select(col("id").as("k"), col("id").as("v"))
      val joined = left.join(right, "k")
      // materialize THIS dataset's own queryExecution (count() would plan a
      // separate aggregate query and leave this plan unfinalized)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$finalPlan")
    } finally saved.foreach { case (k, old) =>
      old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
