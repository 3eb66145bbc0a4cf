package graft

import java.nio.file.{Files, Paths}

/** r15 rehearsal for the r16 ANN-oracle admission (VERDICT r14 item 8,
  * deferred by the 114-query registry freeze): dumps
  * [[graft.operators.VectorOps.annIvfqTopk]] and its DuckDB twin in the
  * checker's exact layout, so tools/check.py grades the candidate like a
  * registered query WITHOUT touching the frozen registry. When the freeze
  * lifts, admission is two SparkEntry map entries and this main is its
  * receipt. Usage:
  *   sbt "runMain graft.AnnOracleRehearsal <sfDir> <outDir>"
  *   python3 tools/check.py <sfDir> <outDir>
  */
object AnnOracleRehearsal {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Verify.session(defaultCpus = "8")
    new java.io.File(outDir).mkdirs()
    graft.operators.VectorOps.annIvfqTopk(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/ann_ivfq_topk")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"{${Verify.jsonQuote("ann_ivfq_topk")}: " +
        s"${Verify.jsonQuote(graft.operators.VectorOps.annIvfqTopkSql)}}")
    spark.stop()
  }
}
