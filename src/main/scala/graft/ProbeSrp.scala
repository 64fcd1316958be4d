package graft

import org.apache.spark.sql.SparkSession
import graft.ext.Similarity

/** Scratch probe main (not part of the engine): time SRP near-dup at a
  * given bit width — `runMain graft.ProbeSrp <dir> <bands> <bits>` —
  * to measure the bits-vs-candidate-volume law on staged replicas.
  */
object ProbeSrp {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val (bands, bits) = (args(1).toInt, args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // warm
    Similarity.srpNearDupPairs(emb, "vec_id", "embedding", bands, bits).count()
    val t0 = System.nanoTime()
    val n = Similarity.srpNearDupPairs(emb, "vec_id", "embedding", bands, bits).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"srp","dir":"$dir","bands":$bands,"bits":$bits,"pairs":$n,"sec":$sec%.3f}""")
    spark.stop()
  }
}
