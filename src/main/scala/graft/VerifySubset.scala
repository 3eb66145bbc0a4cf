package graft

/** Dev tool: [[Verify]] for a SUBSET of declared queries — iterate on one
  * operator without paying the full 70+-query dump. Usage:
  *   sbt "runMain graft.VerifySubset <sfDir> <outDir> <name> [name...]"
  * Shares Verify's session/write/escape machinery, so its output layout is
  * the checker's by construction.
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    // a mistyped (or shell-swallowed) name list would otherwise select
    // NOTHING and exit 0 — the same silent-bogus-success class Bench.main
    // guards against
    require(names.nonEmpty,
      "usage: VerifySubset <sfDir> <outDir> <query> [query...] — at least one query name")
    val unknown = names.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) sys.error(
      s"unknown quer${if (unknown.size == 1) "y" else "ies"}: ${unknown.toSeq.sorted.mkString(", ")} — " +
        "valid names are the keys of SparkEntry.queries")
    val spark = Verify.session(defaultCpus = "8")
    Verify.writeQueryDumps(spark, sfDir, outDir, names, writeKeys = false)
    spark.stop()
  }
}
