package graft

/** Golden plan-shape regression gate: every query's physical-operator
  * multiset (join strategies, scan pushdowns, read schemas included)
  * must match the committed `PLAN_SHAPES.txt`. The shuffle-budget test
  * bounds exchange COUNTS; this pins the full shape, so a
  * broadcast→SMJ flip or a filter that stops pushing into a scan fails
  * HERE with the query named — even at constant shuffle count.
  *
  * Intentional changes: `sbt "runMain graft.PlanGolden"` regenerates
  * the artifact; commit it with a message naming the re-blessed
  * queries.
  */
class PlanShapeSpec extends SparkTestBase {

  test("every query's physical plan shape matches the committed golden artifact") {
    val goldenFile = java.nio.file.Paths.get(PlanGolden.GoldenPath)
    assert(java.nio.file.Files.exists(goldenFile),
      s"missing ${PlanGolden.GoldenPath} — run `sbt \"runMain graft.PlanGolden\"` and commit it")
    val golden = java.nio.file.Files.readAllLines(goldenFile).toArray
      .map(_.toString).filter(_.nonEmpty)
      .map { line =>
        val Array(n, s) = line.split("\t", 2); n -> s
      }.toMap
    val current = PlanGolden.computeAll(spark, PlanGolden.DataDir).toMap

    val missing = current.keySet.diff(golden.keySet).toSeq.sorted
    val stale = golden.keySet.diff(current.keySet).toSeq.sorted
    val changed = current.keySet.intersect(golden.keySet).toSeq.sorted
      .filter(n => current(n) != golden(n))

    def diffLine(n: String): String = {
      val g = golden(n).split(";").groupBy(identity).view.mapValues(_.length)
      val c = current(n).split(";").groupBy(identity).view.mapValues(_.length)
      val gained = c.toSeq.collect { case (op, k) if k > g.getOrElse(op, 0) =>
        s"+${k - g.getOrElse(op, 0)}×$op" }
      val lost = g.toSeq.collect { case (op, k) if k > c.getOrElse(op, 0) =>
        s"-${k - c.getOrElse(op, 0)}×$op" }
      s"$n: ${(gained ++ lost).sorted.mkString(" ")}"
    }

    val problems =
      missing.map(n => s"$n: NEW query — no golden shape") ++
        stale.map(n => s"$n: golden shape for a query that no longer exists") ++
        changed.map(diffLine)
    assert(problems.isEmpty,
      "plan shapes diverge from PLAN_SHAPES.txt (intentional? rerun " +
        "`sbt \"runMain graft.PlanGolden\"` and commit, naming the query):\n" +
        problems.mkString("\n"))
  }
}
