package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.cdc.Cdc

/** Streaming CDC latest-state via typed per-key state
  * (`flatMapGroupsWithState`) — the incremental form of
  * [[graft.cdc.Cdc.latestState]] (SURVEY.md §1.4, §7.4): one upserted
  * row per key per micro-batch instead of a full-log re-aggregation.
  *
  * State model: per key, the highest-lsn event seen so far. Deletes keep
  * the key's state (as a tombstone, `deleted=true`) rather than clearing
  * it, so a late-arriving lower-lsn insert replayed after the delete
  * (at-least-once, docker-compose.yaml:35-37) cannot resurrect the row —
  * the lsn guard makes the operator idempotent under replay.
  *
  * Scale notes: state is one small case class per live key, hash-
  * partitioned by key across executors (RocksDB state store at real
  * volume); each micro-batch shuffles only its own events. Emission is
  * OutputMode.Update — downstream sinks receive upserts keyed by
  * orderid, the same contract an ADX/Delta MERGE sink consumes.
  */
object StatefulLatestState {

  /** One decoded change event, flattened for typed state handling. */
  case class ChangeEvent(orderid: Int, op: String, lsn: Long,
                         custid: Option[Int], amount: Option[Int],
                         city: Option[String])

  /** Per-key materialized state (tombstoned, never resurrected). */
  case class KeyState(orderid: Int, lsn: Long, deleted: Boolean,
                      custid: Int, amount: Int, city: String)

  /** Decode envelopes to typed events (streaming or batch frame). */
  def events(envelopes: DataFrame): Dataset[ChangeEvent] = {
    import envelopes.sparkSession.implicits._
    Cdc.decode(envelopes).select(
      coalesce(col("payload.after.orderid"), col("payload.before.orderid")).as("orderid"),
      col("payload.op").as("op"),
      col("payload.source.lsn").as("lsn"),
      col("payload.after.custid").as("custid"),
      col("payload.after.amount").as("amount"),
      col("payload.after.city").as("city")).as[ChangeEvent]
  }

  /** The stateful stream: emits each key's new state whenever one of its
    * events arrives. Pair with `.writeStream.outputMode("update")`. */
  def latestState(envelopes: DataFrame): Dataset[KeyState] = {
    import envelopes.sparkSession.implicits._
    events(envelopes)
      .groupByKey(_.orderid)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout())(update)
  }

  private def update(key: Int, evs: Iterator[ChangeEvent],
                     state: GroupState[KeyState]): Iterator[KeyState] = {
    var cur = state.getOption.orNull
    evs.foreach { e =>
      if (cur == null || e.lsn > cur.lsn) {
        cur =
          if (e.op == "d")
            KeyState(key, e.lsn, deleted = true,
              if (cur == null) 0 else cur.custid,
              if (cur == null) 0 else cur.amount,
              if (cur == null) "" else cur.city)
          else
            KeyState(key, e.lsn, deleted = false,
              e.custid.getOrElse(0), e.amount.getOrElse(0), e.city.getOrElse(""))
      }
    }
    if (cur == null) Iterator.empty
    else { state.update(cur); Iterator.single(cur) }
  }
}
