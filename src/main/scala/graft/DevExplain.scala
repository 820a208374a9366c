package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` of named queries to files —
  * the plan evidence the optimization rounds commit under plans/.
  * Usage: DevExplain <sfDir> <outDir> <suffix> [queryName ...]
  * Writes <outDir>/<query>_<suffix>.txt per query.
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- args.drop(3)) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
      graft.ops.Caches.drain()
    }
    spark.stop()
  }
}
