package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-pair recall of a dd6w (wide-SimHash) pair dump — the number a
  * 100 TB dedup design review asks for (round-15 verdict item): of the
  * planted near-dup twins (every doc with id % 17 == 0 gets a
  * `text + " zz qq vv"` twin at id + stride — the corpus construction
  * IndependentVerify.checkDd6Wide and the dd6w_auto dump share), what
  * fraction does the hamming ≤ 5 fingerprint match recover? Recall on
  * this fixture is MARGIN-bound, not blocking-bound: the pigeonhole is
  * exact for hamming ≤ 5 (6 chunks, ≤ 5 differing bits ⇒ some chunk
  * identical), so misses are planted twins whose 3-rare-word vote margin
  * did not survive the fingerprint — the same statistic DedupSpec gates
  * at sf0.001 against the narrow family (~2/3 there).
  *
  * Usage: runMain graft.DedupRecallProbe <sfDir> <dumpDir>
  *   e.g.  graft.DedupRecallProbe target/sfdv1000 target/sd1000/dd6w_auto
  */
object DedupRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val dump = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val st = math.max(100000L, math.pow(10.0,
      maxId.toString.length.toDouble).toLong)
    val planted = docs.filter(col("doc_id") % 17 === 0).count()
    val pairs = spark.read.parquet(dump)
    val hits = pairs.filter(col("b_id") - col("a_id") === st &&
      col("a_id") % 17 === 0).count()
    val total = pairs.count()
    println(f"docs max_id=$maxId stride=$st planted=$planted%,d " +
      f"dump_pairs=$total%,d planted_hits=$hits%,d " +
      f"recall=${hits.toDouble / planted}%.4f")
    spark.stop()
  }
}
