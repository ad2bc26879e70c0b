package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Structured Streaming equivalents of the reference's incremental
  * pipeline (services/extraction/adapters/pending_news_queue.py: a
  * polling queue consumer; servico_coleta_noticias.py: dedup-on-ingest).
  *
  * State is always bounded: watermarks cap the dedup buffer, and the
  * sessionizer uses processing-time timeouts, so nothing grows with
  * total stream length — the property that matters when the stream is
  * 100 TB/day.
  */
object Streaming {

  /** Ingest dedup: drop events already seen (by key) within the
    * watermark horizon — the streaming form of the unique
    * (portal_name, url) index (article_indexes.py:13).
    * dropDuplicatesWithinWatermark dedups on the KEY alone (two
    * fetches of the same URL at different times are still one
    * article) while the watermark bounds the state store. */
  def dedupIngest(events: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Tumbling-window counts per key with watermarking (the streaming
    * form of EventQueries.tumblingAgg). */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "1 hour",
                     watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(sessionStartUs: Long, lastUs: Long, nEvents: Long, valueCents: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long, value_cents: Long, closed: Boolean)

  val GapMicros: Long = 30L * 60 * 1000000

  case class PackDoc(doc_id: Long, source: String, n_tokens: Long)
  case class PackState(cumTokens: Long)
  case class PackOut(doc_id: Long, source: String, n_tokens: Long,
                     cum_tokens: Long, seq_id: Long, offset_in_seq: Long,
                     straddles: Boolean)

  /** Streaming form of `Curation.sequencePack`: each source shard
    * carries ONE running token offset as state, so an endless document
    * stream packs into fixed context windows incrementally — the
    * micro-batch form of the pretraining writer. Docs are laid out in
    * doc_id order within a batch; across batches the stream is
    * expected in id order per shard (the batch operator's ORDER BY
    * doc_id contract). State is one counter per shard: bounded. */
  def packStream(docs: Dataset[PackDoc], ctxLen: Int): Dataset[PackOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[PackDoc], state: GroupState[PackState]) =>
          var cum = state.getOption.map(_.cumTokens).getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val off = cum % ctxLen
            val o = PackOut(d.doc_id, source, d.n_tokens, cum,
              cum / ctxLen, off, off + d.n_tokens > ctxLen)
            cum += d.n_tokens
            o
          }
          state.update(PackState(cum))
          out.iterator
      }
  }

  /** Stateful gap sessionizer via flatMapGroupsWithState: emits a
    * closed session whenever the gap is exceeded (or the group times
    * out), keeps exactly one small state record per active user.
    *
    * Production deployments pass ProcessingTimeTimeout so idle users'
    * sessions eventually close; NoTimeout (default) closes sessions
    * purely by gap, which keeps test harnesses (processAllAvailable)
    * from spinning on timeout-triggered empty micro-batches. */
  def sessionize(events: Dataset[SessionEvent],
                 timeoutConf: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val useTimeout = timeoutConf == GroupStateTimeout.ProcessingTimeTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(st =>
              SessionOut(userId, st.sessionStartUs, st.lastUs, st.nEvents, st.valueCents, closed = true))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val closedSessions = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000
              val cents = math.round(e.value * 100)
              cur match {
                case Some(st) if us - st.lastUs <= GapMicros =>
                  cur = Some(st.copy(lastUs = us, nEvents = st.nEvents + 1,
                    valueCents = st.valueCents + cents))
                case Some(st) =>
                  closedSessions += SessionOut(userId, st.sessionStartUs, st.lastUs,
                    st.nEvents, st.valueCents, closed = true)
                  cur = Some(SessionState(us, us, 1L, cents))
                case None =>
                  cur = Some(SessionState(us, us, 1L, cents))
              }
            }
            cur.foreach(state.update)
            if (useTimeout) state.setTimeoutDuration("30 minutes")
            closedSessions.result().iterator
          }
      }
  }

  // ---- streaming ExtractionResultStore (q114's state, incremental) ----

  case class StoreEvent(url: String, seq: Long, ner: String, gaz: String,
                        person: String, start_off: Long, end_off: Long)
  case class StoreOcc(person: String, start_off: Long, end_off: Long, seq: Long)
  case class StoreState(ner: String, gaz: String, occs: Seq[StoreOcc])
  case class StoreSnapshot(url: String, ner_version: String,
                           gazetteer_version: String, n_occurrences: Long,
                           people_csv: String, last_seq: Long)

  /** The ExtractionResultStore's mutation semantics
    * (extraction_result_store.py:57-66, 150-166) as ONE state record
    * per url in a mapGroupsWithState stream — the incremental form of
    * the batch replay (PayloadQueries.storeReplay). An append whose
    * (ner, gaz) pair differs from the record's clears the accumulated
    * occurrences; a duplicate (person, start, end) drops the earlier
    * occurrence and re-appends at the END. Each micro-batch emits the
    * url's current snapshot (update-mode semantics). State is one
    * bounded record per url — the occurrence list is per-article, not
    * per-stream. Events are applied in seq order within a batch;
    * across batches the queue's delivery order stands in for seq
    * order, exactly as the reference's worker applies them. */
  def resultStore(events: Dataset[StoreEvent]): Dataset[StoreSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.url)
      .mapGroupsWithState[StoreState, StoreSnapshot](GroupStateTimeout.NoTimeout()) {
        (url: String, rows: Iterator[StoreEvent], state: GroupState[StoreState]) =>
          var st = state.getOption.getOrElse(StoreState(null, null, Nil))
          rows.toSeq.sortBy(_.seq).foreach { e =>
            if (st.ner != e.ner || st.gaz != e.gaz)
              st = StoreState(e.ner, e.gaz, Nil)
            val filtered = st.occs.filterNot(o =>
              o.person == e.person && o.start_off == e.start_off &&
                o.end_off == e.end_off)
            st = st.copy(occs = filtered :+ StoreOcc(e.person, e.start_off, e.end_off, e.seq))
          }
          state.update(st)
          StoreSnapshot(url, st.ner, st.gaz, st.occs.length.toLong,
            st.occs.map(_.person).mkString(","),
            st.occs.map(_.seq).maxOption.getOrElse(0L))
      }
  }

  // ---- streaming news-repo mutation state (mark_processed/mark_error) ----

  // ---- streaming temporal chain dedup (q202's state, incremental) ----

  case class ChainEvent(user_id: Long, event_type: String, props: String,
                        ts_us: Long, event_id: Long)
  case class ChainState(chainSeq: Long, survivorId: Long, firstUs: Long,
                        lastUs: Long, nEvents: Long)
  case class ChainOut(user_id: Long, event_type: String, props: String,
                      chain_seq: Long, survivor_event_id: Long, n_events: Long,
                      n_dups: Long, span_s: Long, closed: Boolean)

  /** Streaming form of q202's trailing-window temporal dedup: one
    * bounded (chainSeq, survivor, first/last ts, count) record per
    * content key, advanced by each micro-batch. A gap past
    * `EventOpsQueries.ChainGapMicros` closes the running chain
    * (emitted with closed=true) and opens the next; the open chain is
    * re-emitted as a closed=false snapshot each batch it grows, so
    * "latest row per (key, chain_seq)" under an update-mode sink is
    * EXACTLY the batch q202 output on the union — spec-pinned across
    * arbitrary batch splits. Events are expected in time order per
    * key across batches (the shared ingest contract of resultStore /
    * rateLimit); within a batch rows sort by (ts_us, event_id), and a
    * late cross-batch event joins the running chain without moving
    * lastUs backward (the rateLimit clamp discipline — violations
    * stay observable in n_events rather than corrupting the gap
    * test). */
  def temporalDedup(events: Dataset[ChainEvent]): Dataset[ChainOut] = {
    import events.sparkSession.implicits._
    val gap = graft.queries.EventOpsQueries.ChainGapMicros
    events.groupByKey(e => (e.user_id, e.event_type, e.props))
      .flatMapGroupsWithState[ChainState, ChainOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, String, String), rows: Iterator[ChainEvent],
         state: GroupState[ChainState]) =>
          val (uid, etype, props) = key
          def emit(st: ChainState, closed: Boolean) = ChainOut(
            uid, etype, props, st.chainSeq, st.survivorId, st.nEvents,
            st.nEvents - 1L, (st.lastUs - st.firstUs) / 1000000L, closed)
          val out = Seq.newBuilder[ChainOut]
          var cur = state.getOption
          rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            cur match {
              case Some(st) if e.ts_us - st.lastUs <= gap =>
                cur = Some(st.copy(lastUs = math.max(st.lastUs, e.ts_us),
                  nEvents = st.nEvents + 1))
              case Some(st) =>
                out += emit(st, closed = true)
                cur = Some(ChainState(st.chainSeq + 1, e.event_id, e.ts_us,
                  e.ts_us, 1L))
              case None =>
                cur = Some(ChainState(1L, e.event_id, e.ts_us, e.ts_us, 1L))
            }
          }
          cur.foreach { st => state.update(st); out += emit(st, closed = false) }
          out.result().iterator
      }
  }

  case class RepoEvent(url: String, seq: Long, kind: String,
      message: String, ner: String, gaz: String)
  case class RepoState(exists: Boolean, upserted: Boolean,
      nerDone: Boolean, hasNerDone: Boolean,
      nerV: String, gazV: String, lastError: String,
      errCount: Long, errFirst: String, errLast: String, lastSeq: Long)
  case class RepoSnapshot(url: String, upserted: Boolean,
      ner_done: Option[Boolean], ner_version: Option[String],
      gazetteer_version: Option[String], last_error: Option[String],
      err_count: Long, err_first: Option[String], err_last: Option[String],
      last_seq: Long)

  /** The news repository's mutation semantics
    * (infrastructure/extraction.py:77-113) as ONE bounded state record
    * per url in a mapGroupsWithState stream — the incremental form of
    * the batch replay (q124 / ErrorReplayQueries):
    *
    *  - "collect": the collector writes the document (creation);
    *  - "processed" (`mark_processed`, NO upsert): a silent no-op
    *    until the document exists; afterwards sets ner_done/versions
    *    and clears the errors ARRAY — but NOT last_error;
    *  - "error" (`mark_error`, upsert=True): creates the document on
    *    miss, sets ner_done=false + last_error, pushes an error entry.
    *
    * State stays bounded by keeping the error array's count and
    * first/last message (the fields q124 emits) instead of the full
    * list — the reference's Mongo array is unbounded by design; a
    * bounded-state stream keeps the aggregate view. Events apply in
    * seq order within a batch; each batch emits the url's current
    * snapshot (update-mode semantics). */
  def newsRepoState(events: Dataset[RepoEvent]): Dataset[RepoSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.url)
      .mapGroupsWithState[RepoState, RepoSnapshot](GroupStateTimeout.NoTimeout()) {
        (url: String, rows: Iterator[RepoEvent], state: GroupState[RepoState]) =>
          var st = state.getOption.getOrElse(
            RepoState(exists = false, upserted = false, nerDone = false,
              hasNerDone = false, null, null, null, 0L, null, null, 0L))
          rows.toSeq.sortBy(_.seq).foreach { e =>
            e.kind match {
              case "collect" =>
                if (!st.exists) st = st.copy(exists = true)
              case "error" =>
                if (!st.exists) st = st.copy(exists = true, upserted = true)
                st = st.copy(nerDone = false, hasNerDone = true,
                  lastError = e.message, errCount = st.errCount + 1L,
                  errFirst = if (st.errCount == 0L) e.message else st.errFirst,
                  errLast = e.message)
              case "processed" =>
                if (st.exists) // no upsert: missing document -> no-op
                  st = st.copy(nerDone = true, hasNerDone = true,
                    nerV = e.ner, gazV = e.gaz,
                    errCount = 0L, errFirst = null, errLast = null)
              case other =>
                throw new IllegalArgumentException(s"unknown repo event kind: $other")
            }
            if (st.exists) st = st.copy(lastSeq = math.max(st.lastSeq, e.seq))
          }
          state.update(st)
          RepoSnapshot(url, st.upserted,
            if (st.hasNerDone) Some(st.nerDone) else None,
            Option(st.nerV), Option(st.gazV), Option(st.lastError),
            st.errCount, Option(st.errFirst), Option(st.errLast), st.lastSeq)
      }
  }

  // ---- streaming leaky-bucket rate limiter (q210's stateful form) ----

  case class BucketEvent(user_id: Long, ts_us: Long, event_id: Long)
  case class BucketState(lastUs: Long, level: Long)
  case class BucketOut(user_id: Long, event_id: Long, ts_us: Long,
      level_micro: Long, over_cap: Boolean)

  /** Leaky-bucket rate limiting AT INGEST — the stateful dual of
    * q210's batch closed form: the batch side solves the Lindley
    * recursion as two window aggregates over history, the stream side
    * RUNS the recursion forward with one (lastUs, level) record per
    * user, emitting each event's post-deposit level and its over-cap
    * verdict in the micro-batch where it arrives. Within a batch
    * events sort by (ts, id); across batches per-user arrival order is
    * the stream's time order (the same contract the sessionizer
    * carries). Spec-pinned: per-event levels ≡ the sequential bucket,
    * and the per-user rollup ≡ batch q210 on the union. */
  /** One clamped leaky-bucket step — shared by [[rateLimit]] and the
    * ingest pipeline's admission gate. The in-order contract says
    * ts_us never regresses across batches, but a violation must not
    * CORRUPT the bucket: a late event would make (ts - lastUs)
    * negative and ADD tokens. Clamp the drain at zero and keep lastUs
    * monotone, so a late arrival pays full cost with no drain — the
    * conservative (over-limiting) failure mode — instead of silently
    * inflating the level. Returns (state after, level after deposit). */
  def advanceBucket(prev: Option[BucketState], tsUs: Long,
      costMicro: Long): (BucketState, Long) = {
    val lvl = prev match {
      case Some(p) =>
        math.max(0L, p.level - math.max(0L, tsUs - p.lastUs)) + costMicro
      case None => costMicro
    }
    (BucketState(math.max(tsUs, prev.fold(Long.MinValue)(_.lastUs)), lvl), lvl)
  }

  def rateLimit(events: Dataset[BucketEvent], costMicro: Long,
      capMicro: Long): Dataset[BucketOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[BucketState, BucketOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (u: Long, rows: Iterator[BucketEvent], state: GroupState[BucketState]) =>
          var st = state.getOption
          val out = rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).map { e =>
            val (next, lvl) = advanceBucket(st, e.ts_us, costMicro)
            st = Some(next)
            BucketOut(u, e.event_id, e.ts_us, lvl, lvl > capMicro)
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  // ---- streaming pending-news delivery queue (q243's stateful form) ----

  case class QueueEvent(url: String, seq: Long, op: String)
  case class QueueState(queuedN: Long, inflight: Boolean, droppedN: Long,
      ackedN: Long, retriedN: Long, lastSeq: Long)
  case class QueueSnapshot(url: String, queued_n: Long, inflight: Boolean,
      dropped_n: Long, acked_n: Long, retried_n: Long, last_seq: Long)

  /** The pending-news queue's at-least-once accounting AT INGEST —
    * the stateful dual of batch q243: one (depth, inflight, counters)
    * record per url, advanced by each micro-batch's enqueue / pull /
    * ack / retry events in seq order
    * (pending_news_queue.py:26-71 semantics: an enqueue while the url
    * is in flight is DROPPED, duplicates in the waiting queue are
    * legal, retry returns the in-flight document to the queue). Each
    * batch emits the url's current snapshot (update-mode semantics,
    * like newsRepoState); the global queued/inflight depths are an
    * aggregation over snapshots downstream. Spec-pinned: incremental
    * replay across micro-batch splits ≡ the batch q243 fold on the
    * union. */
  def pendingQueue(events: Dataset[QueueEvent]): Dataset[QueueSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.url)
      .mapGroupsWithState[QueueState, QueueSnapshot](GroupStateTimeout.NoTimeout()) {
        (url: String, rows: Iterator[QueueEvent], state: GroupState[QueueState]) =>
          var st = state.getOption.getOrElse(QueueState(0L, false, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.seq).foreach { e =>
            e.op match {
              case "enqueue" =>
                if (st.inflight) st = st.copy(droppedN = st.droppedN + 1L)
                else st = st.copy(queuedN = st.queuedN + 1L)
              case "pull" =>
                // a faithful log only pulls queued documents; the
                // inflight dict replaces on a duplicate pull
                st = st.copy(queuedN = math.max(0L, st.queuedN - 1L), inflight = true)
              case "ack" =>
                st = st.copy(inflight = false, ackedN = st.ackedN + 1L)
              case "retry" =>
                if (st.inflight)
                  st = st.copy(inflight = false, queuedN = st.queuedN + 1L,
                    retriedN = st.retriedN + 1L)
              case other =>
                throw new IllegalArgumentException(s"unknown queue op: $other")
            }
            st = st.copy(lastSeq = math.max(st.lastSeq, e.seq))
          }
          state.update(st)
          QueueSnapshot(url, st.queuedN, st.inflight, st.droppedN, st.ackedN,
            st.retriedN, st.lastSeq)
      }
  }
}
