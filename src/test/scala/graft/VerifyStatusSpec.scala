package graft

import java.nio.file.{Files, Paths}

/** Pins the r13-verdict #3 contract: correctness-gate failures must be
  * self-diagnosing. `graft.Verify` writes a per-query status manifest
  * (verify_status.json) next to its parquet dumps — distinguishable
  * engine-break (err non-null) from harness-break (manifest present and
  * green while the downstream artifact is empty) — and
  * `tools/check_oracle.py --json` regenerates the driver-format
  * CORRECTNESS artifact from the same dumps in one command.
  */
class VerifyStatusSpec extends SparkSpec {

  private def tmpDir(tag: String): String = {
    val p = Files.createTempDirectory(s"verify_status_$tag")
    p.toFile.deleteOnExit(); p.toString
  }

  test("verify_status.json records rows for a green query") {
    val out = tmpDir("ok")
    Verify.run(spark, "/root/testdata/sf0.001", out, Some(Set("q01_scan_project")))
    val s = Files.readString(Paths.get(s"$out/verify_status.json"))
    assert(s.contains("\"q01_scan_project\""))
    assert(s.contains("\"err\": null"))
    assert("\"rows\": (\\d+)".r.findFirstMatchIn(s).exists(_.group(1).toLong > 0))
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")))
  }

  test("verify_status.json records the error for a broken source dir (engine-break is visible)") {
    val out = tmpDir("bad")
    Verify.run(spark, "/nonexistent_sf_dir", out, Some(Set("q01_scan_project")))
    val s = Files.readString(Paths.get(s"$out/verify_status.json"))
    assert(s.contains("\"rows\": null"), s"expected null rows in: $s")
    assert(!s.contains("\"err\": null"), s"expected a non-null err in: $s")
  }

  test("check_oracle.py --json regenerates the driver-format artifact") {
    val out = tmpDir("json")
    Verify.run(spark, "/root/testdata/sf0.001", out, Some(Set("q01_scan_project")))
    import scala.sys.process._
    val rc = Process(Seq("python3", "tools/check_oracle.py",
      "/root/testdata/sf0.001", out, "--json", "q01_scan_project"),
      new java.io.File("/root/repo")).!(ProcessLogger(_ => (), _ => ()))
    assert(rc == 0, "check_oracle.py should exit 0 on a green query")
    // a NAME-FILTERED run with bare --json defaults to the .partial.json
    // path (r14 advisor: a partial run must not clobber the canonical
    // full artifact at the default name)
    val j = Files.readString(Paths.get(s"$out/correctness.partial.json"))
    for (k <- Seq("rows_match", "schema_match", "hash_match", "spark_rows",
        "oracle_rows", "err"))
      assert(j.contains(s"\"$k\""), s"driver-format key $k missing in $j")
    assert(j.contains("\"hash_match\": true"))
  }
}
