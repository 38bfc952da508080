package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic input generators — the reference's RandomWriter /
  * RandomTextWriter examples (hadoop-mapreduce-examples
  * EX/RandomWriter.java:59, EX/RandomTextWriter.java:61: one generator map
  * per split, emitting random (bytes, bytes) or (text, text) pairs).
  *
  * Spark-first: `spark.range` fans out one generator task per partition; all
  * randomness is a pure hash of the row id (splitmix-style mixing), so the
  * data is DETERMINISTIC for a given (rows, seed) regardless of partitioning
  * or retries — the property the gensort-parity TeraGen also maintains, and
  * what makes generated inputs usable in oracle-checked tests. */
object Generators extends Serializable {

  private def mix(x0: Long): Long = {
    var x = x0 * 0x9e3779b97f4a7c15L
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** RandomTextWriter: `rows` lines of `minWords..maxWords` words drawn from
    * a `vocabSize` synthetic vocabulary, as (key, value) text — key is a
    * single word, value the sentence (the reference's shape). */
  def randomText(spark: SparkSession, rows: Long, numPartitions: Int,
                 minWords: Int = 5, maxWords: Int = 10,
                 vocabSize: Int = 1000, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    require(minWords >= 1 && maxWords >= minWords)
    spark.range(0, rows, 1, numPartitions)
      .map { id =>
        val base = mix(id ^ seed)
        val n = minWords + (java.lang.Long.remainderUnsigned(base, (maxWords - minWords + 1).toLong)).toInt
        def word(i: Int): String =
          f"w${java.lang.Long.remainderUnsigned(mix(base + i + 1), vocabSize.toLong)}%04d"
        (word(0), (0 until n).map(word).mkString(" "))
      }
      .toDF("key", "value")
  }

  /** RandomWriter: (key, value) byte blobs of the given sizes, content a pure
    * function of the row id. */
  def randomBytes(spark: SparkSession, rows: Long, numPartitions: Int,
                  keyLen: Int = 10, valLen: Int = 100, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    def blob(id: Long, len: Int, salt: Long): Array[Byte] = {
      val out = new Array[Byte](len)
      var i = 0
      while (i < len) {
        val h = mix(id ^ seed ^ (salt << 32) ^ (i / 8))
        out(i) = ((h >>> ((i % 8) * 8)) & 0xff).toByte
        i += 1
      }
      out
    }
    spark.range(0, rows, 1, numPartitions)
      .map(id => (blob(id, keyLen, 1L), blob(id, valLen, 2L)))
      .toDF("key", "value")
  }
}
