package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SparkSession factory + table registry over the driver testdata layout.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting, small-shuffle
  * coalescing), shuffle partitions sized for local[32] here but overridable —
  * on a real cluster set `spark.sql.shuffle.partitions` ~ 2-3x total cores.
  */
object Engine {

  def session(appName: String = "graft",
              master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Coalesce shuffles to advisory size rather than max parallelism:
      // avoids fleets of ~ms tasks on small exchanges (measured 3x on the
      // bench suite) and is the right policy on a real cluster too.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // set once at build time: events.parquet is TIMESTAMP(NANOS); setting this
      // per-access would mutate shared session conf from query threads
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Typed accessors for the driver-generated testdata tables (TESTDATA.md). */
  final class Tables(spark: SparkSession, dir: String) {
    def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
    /** events.ts normalized to TimestampType regardless of how the driver
      * generated the parquet column — the physical type has changed across
      * testdata generations: TIMESTAMP(NANOS) (unreadable by the vectorized
      * reader; the legacy conf surfaces it as a nanos long we integer-divide
      * to micros — double division would lose precision above 2^53 ns) and
      * TIMESTAMP(MICROS) without UTC adjustment (reads as TIMESTAMP_NTZ; the
      * cast re-interprets the wall-clock in the session's UTC zone, the same
      * instant the nanos path produced). Queries downstream always see
      * TimestampType with identical epoch micros. */
    def events: DataFrame = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = table("events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // A long ts is epoch nanos (the observed TIMESTAMP(NANOS) case) or
          // could be plain epoch micros in a future generation. Classify by
          // VALUE, not assumption: 4e15 is ~2096 as micros but Feb 1970 as
          // nanos, so any instant between those dates classifies correctly
          // in either unit — a silent 1000x skew is impossible in the
          // window real event data can occupy.
          import org.apache.spark.sql.functions._
          raw.withColumn("ts", timestamp_micros(
            when(col("ts") > lit(4000000000000000L), expr("ts DIV 1000"))
              .otherwise(col("ts"))))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => raw // already TimestampType
      }
    }
    def region: DataFrame     = table("region")
    def nation: DataFrame     = table("nation")
    def customer: DataFrame   = table("customer")
    def supplier: DataFrame   = table("supplier")
    def part: DataFrame       = table("part")
    def orders: DataFrame     = table("orders")
    def lineitem: DataFrame   = table("lineitem")
    def documents: DataFrame  = table("documents")
    def embeddings: DataFrame = table("embeddings")
  }

  def tables(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
