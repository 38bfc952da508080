package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch twin of the streaming
  * sessionizer (streaming/Streams.scala): consecutive events of one user
  * belong to the same session while the gap to the previous event is at most
  * `gapSec` seconds; a larger gap starts a new session.
  *
  * The reference has no session operator (its events would go through a
  * hand-written secondary-sort reducer — §2.6 SecondarySort is the idiom);
  * here it is two window passes over ONE shuffle: `lag` marks session starts,
  * a running sum numbers them, and both windows plus any downstream
  * per-session `groupBy(user, session_idx)` reuse the same hash partitioning
  * on the user key (Catalyst plans a single Exchange).
  *
  * Shape at scale: the only shuffle is on `userCols`; sorting is within
  * partitions (spillable). The heaviest single user must fit a task's
  * external sorter — true for real user-event corpora; a corpus dominated by
  * one key would need a time-bucketed pre-split instead.
  */
object Sessions {

  /** Append 1-based `session_idx` (per user) to `df`. `tieBreak` columns
    * make the within-user order — and therefore session numbering when
    * several events share a timestamp near a gap boundary — deterministic.
    * Gap comparison is on whole seconds (timestamp cast to long, i.e.
    * floor-to-second): an exactly-`gapSec` gap stays in the session. */
  def sessionize(df: DataFrame, userCols: Seq[String], tsCol: String,
                 gapSec: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    require(userCols.nonEmpty && gapSec > 0)
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(userCols.map(col): _*).orderBy(order: _*)
    val sec = col(tsCol).cast("long")
    val prev = lag(sec, 1).over(w)
    val isNew = when(prev.isNull || sec - prev > gapSec, 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Trailing-window point-in-time features: for every event, the same
    * user's event count and value sum (exact, in integer cents) over the
    * trailing `windowMicros` — the no-lookahead feature shape of a
    * training-data pipeline (the frame ends AT the current row, so a model
    * trained on these never sees the future). Frames are anchored on epoch
    * MICROS so any engine resolves identical boundaries at the table's
    * sub-second timestamp precision; both frame ends are inclusive.
    *
    * One shuffle on the user key; the range frame is a per-partition
    * two-pointer scan (no per-row rescan). */
  def trailingFeatures(events: DataFrame, idCol: String, userCol: String,
                       tsCol: String, valueCol: String,
                       windowMicros: Long = 3600000000L): DataFrame = {
    require(windowMicros >= 0)
    val w = Window.partitionBy(userCol).orderBy(col("__tus"))
      .rangeBetween(-windowMicros, 0)
    events
      .withColumn("__tus", unix_micros(col(tsCol)))
      .withColumn("__cents", floor(col(valueCol) * 100).cast("long"))
      .select(col(idCol),
        count(lit(1)).over(w).as("trail_cnt"),
        sum(col("__cents")).over(w).as("trail_cents"))
  }
}
