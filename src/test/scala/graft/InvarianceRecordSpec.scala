package graft

/** Pins "InvarianceCheck ran at |queries|" (r14 verdict #5): the r14
  * closing record ran the partition-invariance gate at the 350 surface
  * and a post-close addendum then shipped 352 with invariance asserted
  * "by construction" — the one closing gate that silently skipped the
  * final surface. `graft.InvarianceCheck` now writes
  * INVARIANCE_local.json carrying the exact surface it ran at (count +
  * sorted-name digest); this spec fails the build whenever the current
  * query surface differs, so ANY addition/rename/removal forces a
  * re-run before the round can close green.
  *
  * Regenerate with: sbt "runMain graft.InvarianceCheck"
  */
class InvarianceRecordSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def record: String = {
    val p = java.nio.file.Paths.get("INVARIANCE_local.json")
    assume(java.nio.file.Files.exists(p), "no INVARIANCE_local.json in CWD")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("the invariance record matches the CURRENT query surface exactly") {
    val s = record
    val surface = raw""""surface"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt).getOrElse(fail("record carries no surface"))
    val digest = raw""""names_md5"\s*:\s*"([0-9a-f]+)"""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse(fail("record carries no names_md5"))
    val names = SparkEntry.queries.keySet.toSeq.sorted
    val nowDigest = java.security.MessageDigest.getInstance("MD5")
      .digest(names.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(surface == names.size && digest == nowDigest,
      s"InvarianceCheck last ran at surface $surface but the current " +
        s"surface is ${names.size} (or the name set changed): re-run " +
        "`sbt \"runMain graft.InvarianceCheck\"` at the final surface")
  }

  test("the recorded run found zero partition-dependent queries") {
    val bad = raw""""partition_dependent"\s*:\s*(\d+)""".r
      .findFirstMatchIn(record)
      .map(_.group(1).toInt).getOrElse(fail("record carries no verdict"))
    assert(bad == 0, s"$bad partition-dependent queries on record")
  }
}
