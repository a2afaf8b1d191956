package graft
import org.apache.spark.sql.SparkSession
object Micro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0=System.nanoTime(); val n=f
      println(f"MICRO $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    // warmup
    time("warmup_count")(SparkEntry.queries("f1_error_filter")(spark, dir).count())
    time("text_lang_id")(SparkEntry.queries("text_lang_id")(spark, dir).count())
    time("a3_dup_stats")(SparkEntry.queries("a3_dup_stats")(spark, dir).count())
    time("dedup_ngram_jaccard")(SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).count())
    time("dedup_minhash_lsh")(SparkEntry.queries("dedup_minhash_lsh")(spark, dir).count())
    time("dedup_simhash")(SparkEntry.queries("dedup_simhash")(spark, dir).count())
    time("ann_lsh_pairs")(SparkEntry.queries("ann_lsh_pairs")(spark, dir).count())
    spark.stop()
  }
}
