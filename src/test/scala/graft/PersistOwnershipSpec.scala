package graft

import org.scalatest.funsuite.AnyFunSuite

/** The persist-ownership rule, grep-able and enforced: every
  * `.persist(` in main sources must have a release path — an
  * `unpersist` within 100 lines (the try/finally convention of
  * Stats.sourceDrift, or a caller-owned handle like
  * JsonlIngest.Split.unpersist defined alongside). A persist whose
  * release lives elsewhere (or nowhere) accumulates cached frames in a
  * long-lived session until LRU pressure evicts real work — the class
  * of leak round-5 review found in Bloom/JsonlIngest/nbScore/lmScore. */
class PersistOwnershipSpec extends AnyFunSuite {

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = Option(dir.listFiles()).getOrElse(Array.empty).partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")).toSeq ++ dirs.flatMap(scalaFiles)
  }

  test("every persist in main has an unpersist within 100 lines") {
    val root = new java.io.File("src/main/scala/graft")
    assert(root.isDirectory, s"source root missing: ${root.getAbsolutePath}")
    val violations = scalaFiles(root).flatMap { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
      lines.zipWithIndex.collect {
        case (l, i) if l.contains(".persist(") &&
            !lines.slice(math.max(0, i - 100), math.min(lines.size, i + 101))
              .exists(_.contains("unpersist")) =>
          s"${f.getPath}:${i + 1}"
      }
    }
    assert(violations.isEmpty,
      s"persist without a nearby release path:\n  ${violations.mkString("\n  ")}")
  }
}
