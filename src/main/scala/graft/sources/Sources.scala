package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources beyond plain parquet — the reference's input-format family
  * re-expressed over Spark's datasources.
  *
  * Mappings (SURVEY §2.1):
  *  - TextInputFormat            → `spark.read.text` (value = line)
  *  - KeyValueTextInputFormat    → text + first-separator split (.../lib/input/KeyValueLineRecordReader.java:39)
  *  - FixedLengthInputFormat     → `binaryRecords` (.../lib/input/FixedLengthInputFormat.java:47)
  *  - NLineInputFormat           → text + repartition (parallelism control)
  *  - MultipleInputs             → per-path read + transform + unionByName (.../lib/input/MultipleInputs.java:40)
  *  - SequenceFileInputFormat    → `sc.sequenceFile` (Writables natively readable)
  *  - DBInputFormat              → `spark.read.jdbc` with stride partitioning
  * Split sizing / small-file packing / compressed-splittable handling are
  * Spark built-ins (`maxPartitionBytes`, `openCostInBytes`, codec registry).
  */
object Sources {

  /** Lines of text: one `value` string column. */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** KeyValueTextInputFormat: split each line at the FIRST separator into
    * (key, value); a line with no separator becomes (line, ""). */
  def keyValueText(spark: SparkSession, path: String, separator: String = "\t"): DataFrame = {
    val sepLit = java.util.regex.Pattern.quote(separator)
    spark.read.text(path).select(
      split(col("value"), sepLit, 2).as("kv"))
      .select(
        element_at(col("kv"), 1).as("key"),
        // get() tolerates the missing-separator case (1-element array) under ANSI
        coalesce(get(col("kv"), lit(1)), lit("")).as("value"))
  }

  /** FixedLengthInputFormat: headerless binary records of constant width →
    * one `record: binary` column. */
  def fixedLength(spark: SparkSession, path: String, recordLength: Int): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryRecords(path, recordLength).toDF("record")
  }

  /** NLineInputFormat's real purpose was parallelism control: expose it as
    * text with an explicit target partition count. */
  def textWithParallelism(spark: SparkSession, path: String, numPartitions: Int): DataFrame =
    spark.read.text(path).repartition(numPartitions)

  /** MultipleInputs/DelegatingInputFormat: heterogeneous per-path loaders
    * unioned by column name (missing columns null-filled). */
  def multipleInputs(branches: Seq[DataFrame]): DataFrame = {
    require(branches.nonEmpty)
    branches.reduceLeft(_.unionByName(_, allowMissingColumns = true))
  }

  /** SequenceFile of (Text, Text) — Spark reads Writables natively. */
  def sequenceFileText(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.io.Text
    spark.sparkContext.sequenceFile(path, classOf[Text], classOf[Text])
      .map { case (k, v) => (k.toString, v.toString) }.toDF("key", "value")
  }

  /** SequenceFile of (BytesWritable, BytesWritable) — the AsBinary variant
    * (.../lib/input/SequenceFileAsBinaryInputFormat.java): raw payload bytes,
    * no text decode. BytesWritable's backing array is reused per record and
    * may be oversized — copyBytes() materializes the valid slice. */
  def sequenceFileBinary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.io.BytesWritable
    spark.sparkContext.sequenceFile(path, classOf[BytesWritable], classOf[BytesWritable])
      .map { case (k, v) => (k.copyBytes(), v.copyBytes()) }.toDF("key", "value")
  }

  /** StreamXmlRecordReader (hadoop-streaming .../streaming/StreamXmlRecordReader.java):
    * records delimited by begin/end tag patterns. Spark-first: read with the
    * END tag as the record separator (the text datasource handles split
    * boundaries), then slice each chunk from its begin tag — no
    * wholeTextFiles, so a single huge XML file still reads in parallel. */
  def xmlRecords(spark: SparkSession, path: String,
                 beginTag: String, endTag: String): DataFrame = {
    val beginQ = java.util.regex.Pattern.quote(beginTag)
    spark.read.option("lineSep", endTag).text(path)
      .filter(col("value").contains(beginTag))
      .select(concat(
        regexp_extract(col("value"), "(?s)(" + beginQ + ".*)$", 1),
        lit(endTag)).as("record"))
  }

  /** AutoInputFormat (hadoop-streaming .../streaming/AutoInputFormat.java:40-45):
    * deduce each file's format from its magic bytes — sequence files start
    * with "SEQ" — and read text and sequence files from one directory as a
    * single (key, value) frame. Text rows carry key = "" (the reference's
    * LongWritable offset key is an artifact of LineRecordReader, not data).
    *
    * The sniff reads 3 bytes per FILE at the driver (the reference sniffs per
    * split, on every task); file listing + header reads are metadata-scale,
    * the data itself is still read fully distributed. */
  def auto(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq else Seq(fs.getFileStatus(p)))
      .filter { s =>
        val n = s.getPath.getName
        // Hadoop's hidden-file convention: skip both "_" (committer markers)
        // and "." (checksum sidecars like .part-0.crc)
        s.isFile && s.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath)
    val (seq, text) = files.partition { f =>
      val in = fs.open(f)
      try {
        val magic = new Array[Byte](3)
        in.readFully(0L, magic) // a short read must not misclassify (len > 0 checked)
        magic(0) == 'S' && magic(1) == 'E' && magic(2) == 'Q'
      } catch { case _: java.io.EOFException => false
      } finally in.close()
    }
    val parts =
      seq.map(f => sequenceFileText(spark, f.toString)) ++
      text.map(f => spark.read.text(f.toString)
        .select(lit("").as("key"), col("value")))
    require(parts.nonEmpty, s"auto: no readable files under $path")
    parts.reduceLeft(_.unionByName(_))
  }

  /** DBInputFormat/DataDrivenDBInputFormat: JDBC scan with value-range
    * stride partitioning (≙ IntegerSplitter). */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int, props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound, numPartitions, props)

  /** DataDrivenDBInputFormat's non-integer splitters (Text/Date/Boolean…):
    * each split is an arbitrary WHERE predicate, one partition per predicate
    * (.../lib/db/DataDrivenDBInputFormat.java getSplits — splits are
    * "lower <= col AND col < upper" clauses the per-type splitters emit).
    * The caller-supplied predicates MUST partition the table (disjoint,
    * covering), exactly the splitters' contract. */
  def jdbcPredicates(spark: SparkSession, url: String, table: String,
                     predicates: Seq[String],
                     props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, predicates.toArray, props)
}
