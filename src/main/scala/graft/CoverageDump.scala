package graft

/** Mechanical source for COVERAGE.md's registry counts
  * (`tools/update_coverage.py` rewrites the generated block from this
  * output — the hand-written counts drifted across rounds 5/6).
  *
  * Writes (to args(0), default /tmp/graft_coverage_dump.txt — a FILE, not
  * stdout, which sbt's forked-run logger would swallow under -error) one
  * header line `queries=N oracles=M` then one line per registered query:
  * `oracle <name>` or `rows-only <name>`. Needs no SparkSession: only the
  * registry maps are touched, never the query fns.
  */
object CoverageDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_coverage_dump.txt")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val oracles = SparkEntry.oracleSql
    val lines = s"queries=${names.size} oracles=${oracles.size}" +:
      names.map(n => s"${if (oracles.contains(n)) "oracle" else "rows-only"} $n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out), lines.mkString("", "\n", "\n"))
  }
}
