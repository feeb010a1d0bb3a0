package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-headroom guard for the substring-dedup plants (ADVICE r9): the
  * %151 long plant must be REPORTED (its anchors must survive the df cap)
  * and the %97 short plant must die at the SPAN THRESHOLD, which requires
  * its anchors to survive the df cap too — so BOTH plants' carrier counts
  * must sit under maxDocFreq at every scale factor the driver ships. A
  * carrier count crossing the cap does not fail the oracle gate (both
  * engines agree either way); it silently vacates what the query claims
  * to test. This spec turns that silent vacation into a red build: if a
  * new, larger SF ships, the assertion names the modulus/cap pair to
  * re-derive.
  *
  * The decontamination canary (%89 non-eval leak carriers vs its cap of
  * 200) is asserted under the same rule.
  */
class SubstringPlantHeadroomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Caps as registered in SparkEntry — mirrored here as literals on
    * purpose: a cap change in the query must consciously update the
    * headroom claim too (both sit next to their oracle mirrors).
    */
  private val DedupCap = 80L
  private val DecontaminateCap = 200L

  private def shippedSfDirs: Seq[String] = {
    val root = new java.io.File("/root/testdata")
    if (!root.isDirectory) Seq.empty
    else root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).toSeq.sorted
  }

  test("both substring plants' carrier counts stay under the df cap at every shipped SF") {
    val dirs = shippedSfDirs
    assume(dirs.nonEmpty, "no testdata dirs on this machine")
    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val longCarriers = docs.filter(col("doc_id") % 151 === 0).count()
      val shortCarriers = docs.filter(col("doc_id") % 97 === 0).count()
      val leakCarriers = docs
        .filter(col("doc_id") % 89 === 0 && col("doc_id") % 97 =!= 0).count()
      val evalCarriers = docs.filter(col("doc_id") % 97 === 0).count()
      info(s"$dir: long=$longCarriers short=$shortCarriers (cap $DedupCap), " +
        s"leak=$leakCarriers eval=$evalCarriers (cap $DecontaminateCap)")
      assert(longCarriers >= 2, s"$dir: long plant needs >= 2 carriers to pair at all")
      assert(shortCarriers >= 2, s"$dir: short plant needs >= 2 carriers to reach the threshold path")
      assert(longCarriers <= DedupCap,
        s"$dir: %151 long-plant carriers ($longCarriers) over maxDocFreq=$DedupCap — " +
          "the flagship span silently becomes a stop-gram; re-derive the modulus or cap")
      assert(shortCarriers <= DedupCap,
        s"$dir: %97 short-plant carriers ($shortCarriers) over maxDocFreq=$DedupCap — " +
          "the threshold path silently dies at the cap instead (vacuous gate)")
      // the decontamination canary rides EVERY eval doc plus the leaking
      // train docs; its anchor df is leak+eval carriers together
      assert(leakCarriers + evalCarriers <= DecontaminateCap,
        s"$dir: canary carriers (${leakCarriers + evalCarriers}) over the " +
          s"decontamination cap $DecontaminateCap — contamination would self-stop-gram")
    }
  }
}
