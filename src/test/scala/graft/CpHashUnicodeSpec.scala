package graft

import graft.functions.PortableHashKernels
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine unicode pin for the portable codepoint hash (the base
  * of every portable-family oracle: q244/q183 fragments, the MinHash
  * gram fold, the classifier token fold).
  *
  * The DuckDB side of the contract is
  * `list_reduce(list_prepend(0, list_transform(string_split(s, ''),
  * c -> unicode(c))), (a, b) -> (a * 131 + b) % 1000000007)`; the
  * Spark side is [[PortableHashKernels.cpHash]], which iterates JVM
  * CODEPOINTS (surrogate pairs consumed whole). These agree only if
  * DuckDB's `string_split(s, '')` also splits per codepoint — i.e.
  * combining marks come out as separate elements (NOT fused into
  * grapheme clusters) and supplementary-plane characters come out as
  * one element whose `unicode()` is the full scalar value.
  *
  * The expected constants below were produced by running exactly that
  * DuckDB expression (duckdb 1.x, 2026-08) over these strings:
  * supplementary-plane U+1D11E, emoji pairs, precomposed vs combining
  * accents, and stacked combining marks. If DuckDB ever changed to
  * grapheme-cluster splitting, 'café' (combining form) would fold
  * [99,97,102,101,769] into [99,97,102,<233-or-first-cp>] and these
  * literals would catch it BEFORE a data-dependent oracle hash
  * mismatch does. (In-repo differential specs only compare the two
  * SPARK forms — this is the only oracle-SEMANTICS pin.)
  */
class CpHashUnicodeSpec extends SparkSpec {

  private def h(s: String): Long =
    PortableHashKernels.cpHash(UTF8String.fromString(s))

  // (string, DuckDB-confirmed fold value)
  private val pins: Seq[(String, Long)] = Seq(
    ("abc", 1677554L),
    ("café", 224239221L), // precomposed U+00E9
    ("café", 375321225L), // combining acute U+0301 — MUST differ
    ("𝄞 music", 786318007L), // U+1D11E, supplementary plane
    ("😀😁", 16963585L), // two emoji
    ("á̂b", 231362604L)) // stacked combining marks

  test("cpHash matches the DuckDB split/unicode fold on non-BMP and combining-mark strings") {
    pins.foreach { case (s, expected) =>
      assert(h(s) == expected,
        s"cpHash(${s.map(c => f"\\u$c%04x").mkString}) = ${h(s)}, DuckDB folds $expected")
    }
  }

  test("precomposed and combining forms hash differently (codepoint, not grapheme, semantics)") {
    assert(h("café") != h("café"))
  }

  test("supplementary-plane codepoint is consumed whole, not as two surrogate halves") {
    // if cpHash iterated chars instead of codepoints, U+1D11E would fold
    // as 0xD834 then 0xDD1E and disagree with unicode()'s 119070
    val direct = (0L * 131L + 119070L) % 1000000007L
    assert(h("𝄞") == direct)
  }
}
