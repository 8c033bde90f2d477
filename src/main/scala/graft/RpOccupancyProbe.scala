package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** RP-LSH bucket-occupancy probe: prints bucket count, max occupancy, and
  * total candidate pairs (Σ C(occ,2)) for the AUTO operating point over a
  * fixture's embeddings, uncentered and centered.
  *
  * Born of the round-15 ×1000×384 finding: uniform-occupancy math priced
  * the 17-plane dump at minutes, but the UNCENTERED keys collapsed to
  * 128,687 occupied buckets with a 72,258-vector hot bucket — 1.15e11
  * candidate pairs (the corpus mean dominated every plane dot, so whole
  * sign-flip copies shared constant key bits). CANDIDATES, not output,
  * is the quantity a 100 TB blocking design must hold linear, and this
  * probe measures it directly before a run is priced.
  *
  * Usage: runMain graft.RpOccupancyProbe [sfDir] [bands]
  */
object RpOccupancyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sfdv1000d384")
    val bands = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    val n = e.count()
    val dim = e.select(size(col("v"))).head.getInt(0)
    val planes = operators.OperatingPoint.rpPlanesPerBand(n, dim)
    println(s"n=$n dim=$dim bands=$bands derived planes=$planes")
    // the v-family sign planes (VectorOps.rpSign: mixed seeds since r15)
    val signs = Array.tabulate(bands * planes, dim) { (j, k0) =>
      val x = operators.VectorOps.mix64((j.toLong << 32) | (k0 + 1).toLong)
      if (((x >>> 33) & 1L) == 0L) 1.0 else -1.0
    }
    def report(label: String, offsets: Array[Double]): Unit = {
      functions.RpBandKeys.register(spark, signs, planes,
        s"occ_keys_$label", offsets)
      val st = e.select(posexplode(expr(s"occ_keys_$label(v)"))
          .as(Seq("b", "key")))
        .groupBy("b", "key").count()
        .agg(count("*").as("buckets"), max("count").as("maxocc"),
          sum(col("count") * (col("count") - 1) / 2).as("cands")).head
      println(f"$label%-10s buckets=${st.getLong(0)}%,d " +
        f"maxocc=${st.getLong(1)}%,d candidatePairs=${st.getDouble(2)}%,.0f")
    }
    report("uncentered", null)
    report("centered",
      operators.VectorOps.planeOffsets(signs,
        operators.VectorOps.keyCenterOf(e, dim)))
    // dissect the hottest uncentered bucket: who collides — whole copies
    // (key bits constant per copy) or same bases across copies (structure
    // in the base corpus)?
    val bk = e.select(col("vec_id"),
      posexplode(expr("occ_keys_uncentered(v)")).as(Seq("b", "key")))
    val hot = bk.groupBy("b", "key").count()
      .orderBy(desc("count")).limit(3).collect()
    hot.foreach(r => println(
      s"hot bucket band=${r.getInt(0)} key=${r.getInt(1)} occ=${r.getLong(2)}"))
    val hb = hot(0)
    val mem = bk.filter(col("b") === hb.getInt(0) && col("key") === hb.getInt(1))
      .select(col("vec_id"), (col("vec_id") / 1000000L).cast("long").as("cp"),
        (col("vec_id") % 1000000L).as("base")).localCheckpoint()
    println("hot bucket: distinct copies=" + mem.select("cp").distinct().count() +
      " distinct bases=" + mem.select("base").distinct().count())
    mem.groupBy("cp").count().orderBy(desc("count")).limit(5).collect()
      .foreach(r => println(s"  copy ${r.getLong(0)}: ${r.getLong(1)} members"))
    spark.stop()
  }
}
