package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.9 extension — the reference has
  * no stream engine; this is the designated extension, not parity work).
  *
  * All transforms are source-agnostic: they accept either a batch DataFrame
  * or a `readStream` DataFrame with the same schema, so every operator is
  * testable in batch and deployable as a stream.
  */
object Streams {

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Tumbling-window per-type aggregate with a watermark (late data beyond
    * `lateness` is dropped; state is bounded — the 100 TB-stream essential). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding-window variant. */
  def slidingCounts(events: DataFrame, window_ : String, slide: String,
                    lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup on `keyCols` — the continuous-ingest counterpart
    * of `Dedup.exactDedup` for an always-on corpus pipeline. State is bounded
    * by the watermark: a key is remembered only `lateness` past its event
    * time (`dropDuplicatesWithinWatermark`), so 100 TB/day ingest does not
    * accumulate unbounded dedup state. Works on batch frames too (plain
    * dropDuplicates semantics). */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String = "ts",
                  lateness: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, lateness).dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Stream-stream inner equi-join with an event-time interval bound:
    * right.ts ∈ [left.ts - before, left.ts + after]. Both sides carry
    * watermarks, so each side's join state is purged once the other side's
    * watermark passes the interval — the bounded-state form of a
    * stream-stream join (unbounded joins never GC their buffers). */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   before: String, after: String,
                   lateness: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val range = r(rightTs).between(
      l(leftTs) - expr(s"INTERVAL $before"),
      l(leftTs) + expr(s"INTERVAL $after"))
    // inner equi-join: keep one copy of the key columns (the left's)
    keys.foldLeft(l.join(r, keyCond && range, "inner"))((df, k) => df.drop(r(k)))
  }

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when no event arrives within `gapMillis`. Works on a stream (event-time
    * timeout) and, for testing, on a batch Dataset (single pass per group).
    */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    implicit val se: Encoder[Session] = Encoders.product[Session]
    implicit val le: Encoder[Long] = Encoders.scalaLong
    implicit val ee: Encoder[Event] = Encoders.product[Event]
    implicit val be: Encoder[List[Event]] = Encoders.kryo[List[Event]]

    def close(userId: Long, buf: Seq[Event]): Session =
      Session(userId, buf.head.ts, buf.last.ts, buf.size.toLong, buf.map(_.value).sum)

    /** Split a time-sorted buffer at gaps > gapMillis. */
    def segments(sorted: List[Event]): List[List[Event]] =
      sorted.foldLeft(List.empty[List[Event]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          if (e.ts.getTime - cur.head.ts.getTime > gapMillis) List(e) :: cur :: done
          else (e :: cur) :: done // segments and their events accumulate reversed
      }.map(_.reverse).reverse

    if (events.isStreaming) {
      // EventTimeTimeout requires a watermark to drive timeout firing.
      events.withWatermark("ts", "10 seconds").groupByKey(_.user_id)
        .flatMapGroupsWithState[List[Event], Session](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (userId: Long, it: Iterator[Event], state: GroupState[List[Event]]) =>
            if (state.hasTimedOut) {
              // the buffer may hold SEVERAL gap-separated sessions (events
              // that arrived before the watermark advanced past their gaps) —
              // closing it as one session would merge them
              val out = state.getOption.filter(_.nonEmpty)
                .map(buf => segments(buf.sortBy(_.ts.getTime)).map(close(userId, _)))
                .getOrElse(Nil).iterator
              state.remove()
              out
            } else {
              val buf = (state.getOption.getOrElse(Nil) ++ it).sortBy(_.ts.getTime)
              // emit every segment already safely closed: no event still
              // admissible under the watermark (ts >= wm) can extend a
              // segment whose end + gap precedes the watermark
              val wm = state.getCurrentWatermarkMs()
              val (closed, open) = segments(buf).partition(seg =>
                seg.last.ts.getTime + gapMillis < wm)
              val rest = open.flatten
              if (rest.isEmpty) state.remove()
              else {
                state.update(rest)
                state.setTimeoutTimestamp(rest.map(_.ts.getTime).max + gapMillis)
              }
              closed.map(close(userId, _)).iterator
            }
        }
    } else {
      // batch path: same session semantics in one pass per user
      events.groupByKey(_.user_id).flatMapGroups { (userId: Long, it: Iterator[Event]) =>
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        val sessions = scala.collection.mutable.ArrayBuffer.empty[Seq[Event]]
        var cur = scala.collection.mutable.ArrayBuffer.empty[Event]
        sorted.foreach { e =>
          if (cur.nonEmpty && e.ts.getTime - cur.last.ts.getTime > gapMillis) {
            sessions += cur.toSeq
            cur = scala.collection.mutable.ArrayBuffer.empty[Event]
          }
          cur += e
        }
        if (cur.nonEmpty) sessions += cur.toSeq
        sessions.map(close(userId, _)).iterator
      }
    }
  }
}
