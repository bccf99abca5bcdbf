package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd+ args: run only the named queries (local iteration aid;
    // the driver always passes exactly two)
    val (Array(sfDir, outDir), only) = args.splitAt(2)
    // a typo'd name must fail loudly, not silently select nothing
    require(only.forall(SparkEntry.queries.contains),
      s"unknown queries: ${only.filterNot(SparkEntry.queries.contains).mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(cpus)
    new java.io.File(outDir).mkdirs()
    // Surface testdata schema drift as ONE loud banner naming the observed
    // schemas, then still run every query best-effort (ones the drift doesn't
    // touch keep their green rows) — never zero the round on a warning.
    val drift = Tables.schemaDrift(spark, sfDir)
    if (drift.nonEmpty) {
      System.err.println("=" * 72)
      System.err.println("[verify] TESTDATA SCHEMA DRIFT DETECTED:")
      drift.foreach(d => System.err.println(s"[verify]   $d"))
      System.err.println("=" * 72)
    }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // same hygiene as Bench: several operators pin bounded intermediates
      // with clearCache as the documented reclaim contract — 143 queries in
      // one JVM would otherwise accumulate pins until memory pressure
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
