package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReportsSourceMetrics, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 AMQP source: `spark.readStream.format("amqp")`.
  *
  * Spark-native redesign of the reference's DStream receivers
  * (AMQPReceiver.scala:38-163, ReliableAMQPReceiver.scala:44-188 in
  * /root/reference): instead of a push Receiver storing converted
  * objects into the BlockManager, a pull-based MicroBatchStream over
  * per-link sequence offsets.
  *
  * Delivery semantics: offsets are checkpointed by Structured Streaming;
  * [[AmqpMicroBatchStream.commit]] settles deliveries up to the durably
  * committed sequence — the reference's settle-after-durable-store
  * contract (ReliableAMQPReceiver.scala:142-159) with checkpointed
  * offsets replacing the WAL. Unsettled messages remain replayable, so
  * restart-after-failure re-reads the uncommitted tail: at-least-once,
  * upgraded to effectively-once by the deterministic (seq-keyed) replay.
  * Note Spark calls commit(N) while constructing batch N+1, so
  * settlement lags one batch behind delivery (exactly like the Kafka
  * source's offset commits); producer admission therefore keys off the
  * delivered watermark, not settlement (see InMemoryAmqpBroker).
  *
  * Admission control: `maxMessagesPerTrigger` (default 10000 — the
  * reference's implied per-link ceiling, BASELINE.md) bounds each
  * micro-batch; link credit (1000 / 50% re-issue) bounds the sender's
  * in-flight window inside the endpoint.
  *
  * Partitioning: one AMQP link = one ordered sequence = one input
  * partition (the reference is likewise single-link). Horizontal scale
  * comes from many links/addresses, each its own partition; downstream
  * transforms are partition-parallel regardless.
  *
  * Options: endpoint (mem://name), address, maxMessagesPerTrigger,
  * maxMessagesPerSecond (0 = unlimited — rate-controller parity, see
  * [[AmqpMicroBatchStream.rateBudget]]); host/port/username/password are
  * accepted for API parity with AMQPUtils.createStream and used by
  * socket transports.
  */
class AmqpDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "amqp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AmqpEnvelope.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AmqpTable(new CaseInsensitiveStringMap(properties))
}

class AmqpTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"amqp:${AmqpSourceConfig(options).endpoint}/${AmqpSourceConfig(options).address}"
  override def schema(): StructType = AmqpEnvelope.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new AmqpScanBuilder(AmqpSourceConfig(opts))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AmqpWriteBuilder(AmqpSourceConfig(info.options()), info)
}

/** `addresses` (plural) is the horizontal-scale surface: one AMQP link
  * per address, one input partition per link per micro-batch. `address`
  * remains the single-link form (and the sink's target). */
case class AmqpSourceConfig(endpoint: String, address: String, addresses: Seq[String],
    maxPerTrigger: Long, maxPerSecond: Long, statsRowBytes: Long = 1024L,
    startingTimestampMicros: Option[Long] = None)

object AmqpSourceConfig {
  def apply(o: CaseInsensitiveStringMap): AmqpSourceConfig = {
    val primary = o.getOrDefault("address", "my_address")
    val rawEndpoint = o.getOrDefault("endpoint",
      s"mem://${o.getOrDefault("host", "localhost")}:${o.getOrDefault("port", "5672")}")
    // SASL-PLAIN parity: username/password options fold into the socket
    // URI so every executor-side connection authenticates (reference:
    // PLAIN when credentials present, ANONYMOUS otherwise).
    val user = Option(o.get("username"))
    val socketScheme = Seq("tcp://", "amqp10://", "amqps://").find(rawEndpoint.startsWith)
    val endpoint = socketScheme match {
      case Some(scheme) if user.isDefined && !rawEndpoint.contains("@") =>
        s"$scheme${user.get}:${Option(o.get("password")).getOrElse("")}@${rawEndpoint.stripPrefix(scheme)}"
      case _ => rawEndpoint
    }
    AmqpSourceConfig(
      endpoint = endpoint,
      address = primary,
      addresses = Option(o.get("addresses"))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq(primary)),
      maxPerTrigger = o.getOrDefault("maxMessagesPerTrigger", "10000").toLong,
      maxPerSecond = o.getOrDefault("maxMessagesPerSecond", "0").toLong,
      // planner row-size estimate (statistics): AMQP has no byte-count
      // surface, so the width is declared; raise it for fat payloads
      statsRowBytes = o.getOrDefault("statsRowBytes", "1024").toLong,
      // Kafka-parity startingOffsetsByTimestamp: a NEW streaming query
      // begins at the first sequence whose enqueue timestamp reaches
      // this bound instead of draining the whole backlog. Accepts
      // epoch micros ("startingTimestampMicros") or an ISO-8601
      // instant ("startingTimestamp", e.g. 2024-01-15T00:00:00Z).
      startingTimestampMicros =
        Option(o.get("startingTimestampMicros")).map(_.toLong)
          .orElse(Option(o.get("startingTimestamp")).map { ts =>
            val i = java.time.Instant.parse(ts)
            i.getEpochSecond * 1000000L + i.getNano / 1000L
          }))
  }
}

/** The scan's pushed-predicate residue, carried from the builder to the
  * planning (window pruning) and reader (exact row filter) layers. All
  * accepted predicates are conjuncts: a timestamp interval [tsLo, tsHi]
  * (micros, inclusive both ends) folded from every range/equality
  * comparison on `ingest_timestamp`, plus equality constraints on the
  * scalar string properties. The reader evaluates them EXACTLY, so the
  * builder may claim complete handling and Spark plans no re-filter. */
case class AmqpPushedFilters(
    tsLoMicros: Long = Long.MinValue, tsHiMicros: Long = Long.MaxValue,
    stringEq: Seq[(String, String)] = Nil,
    notNull: Seq[String] = Nil, isNull: Seq[String] = Nil) {
  def isEmpty: Boolean =
    tsLoMicros == Long.MinValue && tsHiMicros == Long.MaxValue &&
      stringEq.isEmpty && notNull.isEmpty && isNull.isEmpty
  def hasTsBounds: Boolean = tsLoMicros != Long.MinValue || tsHiMicros != Long.MaxValue
  def matches(msg: AmqpMessage, tsMicros: Long): Boolean =
    tsMicros >= tsLoMicros && tsMicros <= tsHiMicros &&
      stringEq.forall { case (f, v) => AmqpPushedFilters.field(msg, f).contains(v) } &&
      notNull.forall(f => AmqpPushedFilters.field(msg, f).isDefined) &&
      isNull.forall(f => AmqpPushedFilters.field(msg, f).isEmpty)
  def describe: String =
    ((if (tsLoMicros != Long.MinValue) Seq(s"ingest_timestamp >= ${tsLoMicros}us") else Nil) ++
     (if (tsHiMicros != Long.MaxValue) Seq(s"ingest_timestamp <= ${tsHiMicros}us") else Nil) ++
     stringEq.map { case (f, v) => s"$f = '$v'" } ++
     notNull.map(f => s"$f IS NOT NULL") ++
     isNull.map(f => s"$f IS NULL")).mkString(", ")
}

object AmqpPushedFilters {
  /** The pushable scalar string properties of the envelope. Map columns
    * (application_properties) are not pushable: V2 predicates reference
    * columns, not map lookups. */
  val StringCols: Set[String] =
    Set("message_id", "to", "subject", "reply_to", "correlation_id")
  def field(msg: AmqpMessage, name: String): Option[String] = name match {
    case "message_id" => msg.messageId
    case "to" => msg.to
    case "subject" => msg.subject
    case "reply_to" => msg.replyTo
    case "correlation_id" => msg.correlationId
    case other => throw new IllegalArgumentException(s"unpushable column: $other")
  }
}

/** Column pruning (SURVEY §4's one applicable pushdown): Catalyst hands
  * the scan the envelope columns the query actually references; readers
  * then skip materializing the rest — which matters when the pruned
  * columns are the expensive ones (JSON-ifying structured bodies,
  * stringifying wide application-property maps).
  *
  * Predicate pushdown (SupportsPushDownV2Filters): timestamp range and
  * string-property equality conjuncts are accepted and evaluated
  * EXACTLY by the partition reader (before envelope materialization, so
  * a filtered-out message never pays body JSON-ification); timestamp
  * bounds additionally prune the planned fetch windows through the
  * endpoint's [[AmqpEndpoint.timestampWindow]] probe, so a
  * time-bounded peek at a deep queue fetches only the covering
  * sequence span instead of draining every message.
  *
  * Pushdown composition: filters, aggregates and limit/offset are
  * mutually exclusive here — each push refuses when another kind is
  * already in (Spark's rule order makes most combinations unreachable
  * today, but a future Spark that composes them — as the JDBC scan does
  * — must degrade to Spark-side evaluation, not plan a wrong scan). */
class AmqpScanBuilder(cfg: AmqpSourceConfig) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownOffset
    with SupportsPushDownV2Filters {
  private var required: StructType = AmqpEnvelope.schema
  private var countPushed = false
  private var limit: Option[Int] = None
  private var offset: Int = 0
  private var filters = AmqpPushedFilters()
  private var accepted: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** LIMIT/OFFSET pushdown: a `df.offset(k).limit(n)` peek at a queue
    * snapshot plans fetch windows that SKIP the first k replayable
    * sequence numbers and span at most n — the ledger gives exact
    * per-address bounds, so both cuts are computed at planning time
    * and no skipped or capped message ever crosses the wire. Spark
    * rewrites `offset(k).limit(n)` to pushed limit = k+n with offset
    * = k, i.e. the scan must apply the LIMIT first and skip the
    * OFFSET inside it — which is what [[AmqpBatchRead]] does.
    * Refused once predicates are pushed: the planned windows would
    * then count fetched rows, not rows surviving the reader's filter,
    * and a limit cut inside a filtered window returns too few rows. */
  override def pushLimit(n: Int): Boolean =
    if (countPushed || !filters.isEmpty) false else { limit = Some(n); true }
  override def pushOffset(n: Int): Boolean =
    if (countPushed || !filters.isEmpty) false else { offset = n; true }

  // ------------------------------------------------- predicate pushdown
  import org.apache.spark.sql.connector.expressions.{Expression => VExpr, Literal => VLiteral, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate
  import org.apache.spark.sql.types.{StringType, TimestampType}

  private def colNameOf(e: VExpr): Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
    case _ => None
  }
  private def flip(op: String): String = op match {
    case ">" => "<"
    case "<" => ">"
    case ">=" => "<="
    case "<=" => ">="
    case o => o
  }
  private def acceptCmp(op: String, col: String, lit: VLiteral[_]): Boolean =
    if (col == "ingest_timestamp" && lit.dataType == TimestampType &&
        lit.value.isInstanceOf[java.lang.Long]) {
      val v = lit.value.asInstanceOf[java.lang.Long].longValue
      op match {
        case "=" =>
          filters = filters.copy(tsLoMicros = math.max(filters.tsLoMicros, v),
            tsHiMicros = math.min(filters.tsHiMicros, v)); true
        case ">=" =>
          filters = filters.copy(tsLoMicros = math.max(filters.tsLoMicros, v)); true
        case "<=" =>
          filters = filters.copy(tsHiMicros = math.min(filters.tsHiMicros, v)); true
        case ">" if v < Long.MaxValue =>
          filters = filters.copy(tsLoMicros = math.max(filters.tsLoMicros, v + 1)); true
        case "<" if v > Long.MinValue =>
          filters = filters.copy(tsHiMicros = math.min(filters.tsHiMicros, v - 1)); true
        case _ => false
      }
    } else if (op == "=" && AmqpPushedFilters.StringCols(col) &&
        lit.dataType == StringType && lit.value != null) {
      filters = filters.copy(stringEq = filters.stringEq :+ (col -> lit.value.toString))
      true
    } else false

  private def tryAccept(p: Predicate): Boolean = {
    val ch = p.children()
    // IS [NOT] NULL on the scalar string properties (Catalyst derives
    // isnotnull(c) from every c = 'v' constraint — rejecting it would
    // leave a residual Filter over an already-exact scan).
    // ingest_timestamp is non-nullable: IS NOT NULL on it is vacuous.
    if (ch.length == 1) colNameOf(ch(0)) match {
      case Some(c) if AmqpPushedFilters.StringCols(c) && p.name() == "IS_NOT_NULL" =>
        filters = filters.copy(notNull = filters.notNull :+ c); true
      case Some(c) if AmqpPushedFilters.StringCols(c) && p.name() == "IS_NULL" =>
        filters = filters.copy(isNull = filters.isNull :+ c); true
      case Some("ingest_timestamp") if p.name() == "IS_NOT_NULL" => true
      case _ => false
    }
    else if (ch.length != 2) false
    else (colNameOf(ch(0)), ch(1), colNameOf(ch(1)), ch(0)) match {
      case (Some(c), l: VLiteral[_], _, _) => acceptCmp(p.name(), c, l)
      case (_, _, Some(c), l: VLiteral[_]) => acceptCmp(flip(p.name()), c, l)
      case _ => false
    }
  }

  override def pushPredicates(predicates: Array[Predicate]): Array[Predicate] = {
    // Spark pushes filters before aggregates/limits, so these guards are
    // unreachable today — kept so an unexpected composition degrades to
    // Spark-side filtering instead of a wrong scan.
    if (countPushed || limit.isDefined || offset != 0) return predicates
    val (ok, rest) = predicates.partition(tryAccept)
    accepted = ok
    rest // fully handled by the reader: nothing accepted needs re-evaluation
  }
  override def pushedPredicates(): Array[Predicate] = accepted

  /** Global COUNT(*) pushdown: the broker's per-address sequence
    * ledger (high-water minus settled floor, the exact bounds
    * [[AmqpBatchRead]] plans its fetch slices from) already IS the
    * row count, so the "scan" for a bare `df.count()` moves 8 bytes
    * instead of every message body. COMPLETE pushdown only, and only
    * for the ungrouped single-COUNT(*) shape — anything else (group
    * keys, other aggregates, count(col) with its null semantics)
    * falls back to the row scan untouched. Refused when predicates or
    * limit/offset are already pushed: the ledger count ignores both. */
  private def isGlobalCountStar(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
  private def countPushable(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    isGlobalCountStar(agg) && filters.isEmpty && limit.isEmpty && offset == 0
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    countPushable(agg)
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (countPushable(agg)) { countPushed = true; true } else false
  }

  override def build(): Scan =
    if (countPushed) new AmqpCountScan(cfg)
    else new AmqpScan(cfg, required, limit, offset, filters)
}

/** The COUNT(*)-pushed scan: one metadata partition carrying the
  * replayable-row count, snapshotted on the driver at planning time
  * (the same moment a row scan would pin its fetch bounds). */
class AmqpCountScan(cfg: AmqpSourceConfig) extends Scan {
  override def readSchema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("count(*)",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def description(): String =
    s"AmqpCountScan(${cfg.endpoint}/${cfg.addresses.mkString(",")}) PushedAggregates: [COUNT(*)]"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val b = AmqpEndpointRegistry.endpoint(cfg.endpoint)
      val n = cfg.addresses
        .map(a => math.max(0L, b.latestSeq(a) - b.settledUpTo(a))).sum
      Array(AmqpCountPartition(n))
    }
    override def createReaderFactory(): PartitionReaderFactory = AmqpCountReaderFactory
  }
}

case class AmqpCountPartition(n: Long) extends InputPartition

object AmqpCountReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val n = partition.asInstanceOf[AmqpCountPartition].n
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = InternalRow(n)
      override def close(): Unit = ()
    }
  }
}

class AmqpScan(cfg: AmqpSourceConfig, required: StructType = AmqpEnvelope.schema,
    limit: Option[Int] = None, offset: Int = 0,
    pushed: AmqpPushedFilters = AmqpPushedFilters())
    extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new AmqpMicroBatchStream(cfg, required.fieldNames, pushed)
  override def toBatch: Batch = new AmqpBatchRead(cfg, required.fieldNames, limit, offset, pushed)
  override def description(): String =
    s"AmqpScan(${cfg.endpoint}/${cfg.address}) ReadSchema: ${required.simpleString}" +
      limit.map(n => s" PushedLimit: $n").getOrElse("") +
      (if (offset > 0) s" PushedOffset: $offset" else "") +
      (if (!pushed.isEmpty) s" PushedFilters: [${pushed.describe}]" else "")

  /** Planner-visible size: without statistics a DSv2 relation defaults
    * to "unknown = huge", so a 100-row AMQP snapshot joined against a
    * fact table would SHUFFLE both sides. Reporting the broker's
    * per-address sequence high-water mark (an upper bound on readable
    * rows) times a DECLARED row width (`statsRowBytes`, default 1 KiB —
    * AMQP exposes no byte-count surface, and schema defaultSize would
    * undersize document-carrying bodies into a broadcast OOM) lets
    * Catalyst broadcast genuinely small snapshots. The broker probe
    * runs on the driver at planning time, like a file-source listing;
    * an unreachable broker reports empty (= the old never-broadcast
    * behavior). */
  override def estimateStatistics(): Statistics = {
    val rows =
      try {
        val client = AmqpEndpointRegistry.endpoint(cfg.endpoint)
        // Replayable rows (high-water minus settled floor), then the
        // pushed LIMIT/OFFSET window arithmetic from
        // AmqpBatchRead.planInputPartitions: a df.limit(5) peek at a
        // deep queue must report 5 rows, not the backlog, or the
        // broadcast-join benefit these stats exist for is forfeited.
        // Pushed predicates only shrink the count further — the
        // uncut number stays a valid upper bound for planning.
        val replayable = cfg.addresses
          .map(a => math.max(0L, client.latestSeq(a) - client.settledUpTo(a))).sum
        math.max(0L,
          math.min(replayable, limit.map(_.toLong).getOrElse(Long.MaxValue)) - offset)
      } catch { case _: Exception => -1L } // unreachable broker: unknown
    val width = math.max(cfg.statsRowBytes, required.defaultSize.toLong)
    new Statistics {
      override def sizeInBytes: java.util.OptionalLong =
        if (rows < 0) java.util.OptionalLong.empty()
        else java.util.OptionalLong.of(rows * width)
      override def numRows: java.util.OptionalLong =
        if (rows < 0) java.util.OptionalLong.empty()
        else java.util.OptionalLong.of(rows)
    }
  }
}

/** Offset = highest delivered sequence number PER LINK (SURVEY.md §7.1).
  * JSON shape: {"seqs":{"addr":n,...}} with keys sorted, so equal
  * offsets serialize identically (Spark compares offsets by json). The
  * legacy single-link {"seq":n} form is still parsed (mapped to the
  * stream's primary address) so pre-multi-link checkpoints resume. */
case class AmqpOffset(seqs: Map[String, Long]) extends Offset {
  override def json(): String =
    seqs.toSeq.sortBy(_._1)
      .map { case (a, n) => s"${AmqpEnvelope.quote(a)}:$n" }
      .mkString("""{"seqs":{""", ",", "}}")
  def seqOf(address: String): Long = seqs.getOrElse(address, 0L)
}

object AmqpOffset {
  def single(address: String, seq: Long): AmqpOffset = AmqpOffset(Map(address -> seq))
  private val LegacyRe = """\{\s*"seq"\s*:\s*(\d+)\s*\}""".r
  private val SeqsRe = """(?s).*"seqs"\s*:\s*\{(.*)\}\s*\}\s*""".r
  // key = JSON string with escapes intact; addresses are quoted by
  // AmqpEnvelope.quote, so '"' and '\' in topic names survive the
  // checkpoint round-trip instead of corrupting the offset JSON
  private val EntryRe = """"((?:[^"\\]|\\.)*)"\s*:\s*(\d+)""".r
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'u' if i + 6 <= s.length =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case c => sb.append(c); i += 2
          }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }
  def fromJson(s: String, primaryAddress: String): AmqpOffset = s match {
    case LegacyRe(n) => single(primaryAddress, n.toLong)
    case SeqsRe(entries) =>
      AmqpOffset(EntryRe.findAllMatchIn(entries)
        .map(m => unescape(m.group(1)) -> m.group(2).toLong).toMap)
    case other => throw new IllegalArgumentException(s"bad AMQP offset: $other")
  }
}

class AmqpMicroBatchStream(cfg: AmqpSourceConfig,
    fields: Array[String] = AmqpEnvelope.schema.fieldNames,
    pushed: AmqpPushedFilters = AmqpPushedFilters())
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with ReportsSourceMetrics {

  /** Per-trigger source metrics in StreamingQueryProgress (the
    * observability face the Kafka source sets the pattern for):
    * total backlog behind the consumed offset and the unsettled
    * (replayable) window across links. */
  override def metrics(latestConsumed: java.util.Optional[Offset]): java.util.Map[String, String] = {
    // After crash recovery Spark passes the offset restored from the
    // offset WAL as a SerializedOffset (populateStartOffsets feeds
    // finishTrigger the re-executed uncommitted batch's entry), so a
    // blind cast to AmqpOffset throws during the restarted query's first
    // trigger — exactly the replay path the reliable contract covers.
    // Match like the Kafka source does and fall back to JSON parsing.
    val consumed = if (latestConsumed.isPresent) latestConsumed.get() match {
      case o: AmqpOffset => o
      case other => AmqpOffset.fromJson(other.json(), cfg.addresses.head)
    } else AmqpOffset(Map.empty)
    val backlog = cfg.addresses.map(a =>
      math.max(0L, broker.latestSeq(a) - consumed.seqOf(a))).sum
    val unsettled = cfg.addresses.map(a =>
      math.max(0L, broker.latestSeq(a) - broker.settledUpTo(a))).sum
    java.util.Map.of(
      "backlogMessages", backlog.toString,
      "unsettledMessages", unsettled.toString,
      "links", cfg.addresses.length.toString)
  }

  private def broker = AmqpEndpointRegistry.endpoint(cfg.endpoint)

  /** Trigger.AvailableNow: snapshot the backlog at query start; batches
    * (still capped by maxMessagesPerTrigger / rate budget) drain up to
    * the snapshot and the query stops — run-to-completion catch-up with
    * the same admission control as continuous execution. */
  private var availableNowCap: Option[Map[String, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(cfg.addresses.map(a => a -> broker.latestSeq(a)).toMap)

  private def latestFor(a: String): Long = {
    val live = broker.latestSeq(a)
    availableNowCap.fold(live)(cap => math.min(live, cap.getOrElse(a, 0L)))
  }

  /** Where a NEW query begins (a checkpointed restart never calls
    * this — exactly Kafka's startingOffsets contract). With
    * `startingTimestamp[Micros]` set, each link starts at the first
    * sequence whose enqueue timestamp reaches the bound (via the
    * endpoint's timestampWindow probe — the same surface the batch
    * scan's predicate pushdown plans from): a consumer attaching to a
    * deep queue at "yesterday 00:00" skips the history instead of
    * draining it. Non-monotone producer timestamps degrade
    * conservatively (the covering window may start earlier, never
    * later); a transport without the probe starts from 0 (full
    * backlog — correct, nothing skipped). */
  override def initialOffset(): Offset =
    AmqpOffset(cfg.addresses.map { a =>
      val start = cfg.startingTimestampMicros match {
        case Some(t) => broker.timestampWindow(a, t, Long.MaxValue) match {
          case Some((fromExclusive, to)) if to > fromExclusive => fromExclusive
          case Some(_) => broker.latestSeq(a) // nothing at/after t yet
          case None => 0L
        }
        case None => 0L
      }
      a -> start
    }.toMap)

  override def latestOffset(): Offset =
    AmqpOffset(cfg.addresses.map(a => a -> latestFor(a)).toMap)

  override def reportLatestOffset(): Offset =
    AmqpOffset(cfg.addresses.map(a => a -> broker.latestSeq(a)).toMap)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(cfg.maxPerTrigger)

  /** Injectable clock (nanos) so rate-limit admission is unit-testable. */
  private[streaming] var nanoClock: () => Long = () => System.nanoTime()
  private var lastAdmissionNanos = 0L
  private var firstAdmission = true

  /** Admission cap from `maxMessagesPerSecond`: the declarative
    * replacement for the reference's rate-controller hierarchy
    * (AMQPRateController.scala:38-341 in /root/reference — dead code
    * there, but its manual-credit variant caps deliveries per pacing
    * interval). Budget = rate x seconds since the last admission
    * decision; the first trigger gets one second's worth. Unused budget
    * does NOT accumulate beyond one interval (the reference's
    * RateLimiter likewise smooths bursts). */
  private def rateBudget(): Long =
    if (cfg.maxPerSecond <= 0L) Long.MaxValue
    else {
      val now = nanoClock()
      val budget =
        if (firstAdmission) cfg.maxPerSecond
        else {
          val dt = (now - lastAdmissionNanos) / 1e9
          math.max(1L, math.min(cfg.maxPerSecond * 10, // burst ceiling
            (cfg.maxPerSecond * dt).toLong))
        }
      firstAdmission = false
      lastAdmissionNanos = now
      budget
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startOff = start.asInstanceOf[AmqpOffset]
    val triggerCap = limit match {
      case rl: streaming.ReadMaxRows => rl.maxRows()
      case _ => Long.MaxValue
    }
    // The trigger's row budget is shared across links: each link gets an
    // equal share (at least 1), so a hot link cannot starve the others —
    // the multi-link generalization of the reference's per-link credit.
    val totalCap = math.min(triggerCap, rateBudget())
    val perLink = math.max(1L, totalCap / cfg.addresses.length)
    AmqpOffset(cfg.addresses.map { a =>
      val startSeq = startOff.seqOf(a)
      // saturating add: an uncapped limit (ReadAllAvailable under
      // Trigger.Once) makes perLink = Long.MaxValue, and a wrapped sum
      // would move the end offset BACKWARD past the start — admitting
      // nothing and checkpointing a corrupt offset
      val cap = if (startSeq > Long.MaxValue - perLink) Long.MaxValue
                else startSeq + perLink
      a -> math.min(latestFor(a), cap)
    }.toMap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[AmqpOffset], end.asInstanceOf[AmqpOffset])
    cfg.addresses
      .filter(a => e.seqOf(a) > s.seqOf(a))
      .map(a => AmqpInputPartition(cfg.endpoint, a, s.seqOf(a), e.seqOf(a)): InputPartition)
      .toArray
  }

  // Offsets stay seq-based and unfiltered (settlement must advance over
  // skipped messages too); the reader drops non-matching rows.
  override def createReaderFactory(): PartitionReaderFactory =
    new AmqpReaderFactory(fields, pushed)

  /** Settle-after-durable-commit: the epoch is checkpointed, release
    * every link's unsettled window (the WAL-replacement contract). */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[AmqpOffset]
    cfg.addresses.foreach(a => broker.settle(a, e.seqOf(a)))
  }

  override def deserializeOffset(json: String): Offset =
    AmqpOffset.fromJson(json, cfg.addresses.head)

  override def stop(): Unit = ()
}

/** Batch read of everything currently replayable (unsettled + new):
  * the envelope as a static DataFrame for tests/oracle comparisons.
  * One partition per link, like the streaming path. */
class AmqpBatchRead(cfg: AmqpSourceConfig,
    fields: Array[String] = AmqpEnvelope.schema.fieldNames,
    limit: Option[Int] = None, offset: Int = 0,
    pushed: AmqpPushedFilters = AmqpPushedFilters()) extends Batch {
  // The builder never combines limit/offset with pushed predicates
  // (each refuses once the other is in): the window arithmetic below
  // counts FETCHED rows, which only equals returned rows when the
  // reader filters nothing.
  require(pushed.isEmpty || (limit.isEmpty && offset == 0),
    "pushed predicates cannot combine with pushed limit/offset")
  override def planInputPartitions(): Array[InputPartition] = {
    val b = AmqpEndpointRegistry.endpoint(cfg.endpoint)
    // Pushed timestamp bounds prune each address's fetch window to the
    // tightest sequence span covering the bounds (broker-side probe; a
    // transport without the probe keeps the full window). Timestamps
    // need not be monotone, so the span may still contain non-matching
    // messages — the reader re-filters exactly; the probe only cuts
    // what crosses the wire.
    val tsWin: String => Option[(Long, Long)] =
      if (pushed.hasTsBounds)
        a => b.timestampWindow(a, pushed.tsLoMicros, pushed.tsHiMicros)
      else _ => None
    // Pushed OFFSET/LIMIT cut the fetch windows at planning time:
    // the sequence ledger knows each address's replayable span, so the
    // planned windows skip the first `offset` rows and span at most
    // `limit` more. Span arithmetic, never from+remaining: with no
    // limit pushed `remaining` is Long.MaxValue and adding a nonzero
    // settled floor would overflow negative, silently planning zero
    // partitions.
    // Spark's contract applies the pushed LIMIT first, then OFFSET
    // within it (it rewrites `offset(k).limit(n)` to limit = k+n,
    // offset = k before pushing): cap the taken prefix at `limit`,
    // then skip `offset` rows inside that prefix.
    var toTake = limit.map(_.toLong).getOrElse(Long.MaxValue)
    var toSkip = offset.toLong
    cfg.addresses.flatMap { a =>
      val floor = b.settledUpTo(a)
      val latest = b.latestSeq(a)
      // startingTimestamp[Micros] positions batch reads too (Kafka's
      // startingOffsetsByTimestamp applies to batch queries, so must
      // this): the span begins at the first in-bound sequence. A
      // position cut, not a row filter — every planned row is fetched,
      // so the limit/offset arithmetic below stays exact.
      val startFloor = cfg.startingTimestampMicros match {
        case Some(t) => b.timestampWindow(a, t, Long.MaxValue) match {
          case Some((fromExclusive, to)) if to > fromExclusive => math.max(floor, fromExclusive)
          case Some(_) => latest // nothing at/after t: empty span
          case None => floor    // no probe on this transport: full span
        }
        case None => floor
      }
      // Intersect the replayable span (startFloor, latest] with the
      // pushed timestamp window, when the endpoint can answer the probe.
      val (from0, to0) = tsWin(a) match {
        case Some((f, t)) => (math.max(startFloor, f), math.min(latest, t))
        case None => (startFloor, latest)
      }
      val avail = math.max(0L, to0 - from0)
      val take = math.min(avail, toTake)
      toTake -= take
      val skip = math.min(take, toSkip)
      toSkip -= skip
      if (take - skip <= 0) None
      else Some(AmqpInputPartition(cfg.endpoint, a,
        from0 + skip, from0 + take): InputPartition)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AmqpReaderFactory(fields, pushed)
}

case class AmqpInputPartition(endpoint: String, address: String,
    fromExclusive: Long, toInclusive: Long) extends InputPartition

class AmqpReaderFactory(fields: Array[String] = AmqpEnvelope.schema.fieldNames,
    pushed: AmqpPushedFilters = AmqpPushedFilters())
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AmqpPartitionReader(partition.asInstanceOf[AmqpInputPartition], fields, pushed)
}

/** Pull-based reader for one (start, end] slice of a link's sequence.
  * The bounded handoff the reference needed between the Vert.x event
  * loop and Receiver.store (AMQPFlowController.scala:159-161) is
  * structural here: the endpoint buffers unsettled deliveries, the
  * reader pulls exactly the planned slice. */
class AmqpPartitionReader(p: AmqpInputPartition, fields: Array[String],
    pushed: AmqpPushedFilters = AmqpPushedFilters())
    extends PartitionReader[InternalRow] {

  // A connection of this reader's own (pooled; mem:// = the shared
  // broker): N link-partitions drain N sockets in parallel instead of
  // serializing on the JVM's one cached client — the per-executor-link
  // topology a cluster runs. Returned to the pool in close().
  private val endpointConn = AmqpEndpointRegistry.readerEndpoint(p.endpoint)

  // Iterate — never index: endpoint implementations may return a
  // linked Seq (2.13's ArrayBuffer.toSeq builds a List), where indexed
  // access turns the scan O(n²). Measured: 40k messages took 5.4s via
  // messages(idx), 14ms via iterator.
  // If the constructor fetch throws (broker gone after the re-dial
  // retry), Spark never registers the completion listener that calls
  // close() — release the borrowed connection HERE or it leaks one
  // socket per failed task attempt.
  private val it =
    try endpointConn.fetch(p.address, p.fromExclusive, p.toInclusive).iterator
    catch { case e: Throwable =>
      AmqpEndpointRegistry.releaseReaderEndpoint(p.endpoint, endpointConn)
      throw e
    }
  private var cur: (Long, AmqpMessage, Long) = _
  private val unfiltered = pushed.isEmpty

  // Pushed predicates are evaluated here, BEFORE any envelope column is
  // materialized: a filtered-out message costs one timestamp/string
  // comparison, never body JSON-ification. Exact evaluation — the
  // builder claimed complete handling, so no Spark-side re-filter runs.
  override def next(): Boolean = {
    while (it.hasNext) {
      val c = it.next()
      if (unfiltered || pushed.matches(c._2, c._3)) { cur = c; return true }
    }
    false
  }

  // Column-name → accessor tag resolved ONCE per reader (by NAME, so
  // the mapping cannot drift if the schema order changes); the row loop
  // below dispatches on a compiled int switch, not per-cell string
  // matching — this is the scan inner loop the ingest bench times.
  private val ordinals: Array[Int] = fields.map {
    case "message_id" => 0
    case "to" => 1
    case "subject" => 2
    case "reply_to" => 3
    case "correlation_id" => 4
    case "application_properties" => 5
    case "message_annotations" => 6
    case "body_type" => 7
    case "body" => 8
    case "body_binary" => 9
    case "ingest_timestamp" => 10
    case other => throw new IllegalArgumentException(s"unknown envelope column: $other")
  }

  private def utf(o: Option[String]) = o.map(UTF8String.fromString).orNull
  private def smap(entries: Seq[(String, Any)]) =
    if (entries.isEmpty) null
    else new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(e => UTF8String.fromString(String.valueOf(e._2))).toArray[Any]))

  override def get(): InternalRow = {
    val (_, msg, tsMicros) = cur
    // Only the pruned columns are computed: a query that never touches
    // the body skips JSON-ification entirely; one that skips the
    // property maps never stringifies them. Body fields are shared by
    // three ordinals, so compute them at most once per row.
    var body: (Option[String], Option[String], Option[Array[Byte]]) = null
    def bodyF = { if (body == null) body = AmqpEnvelope.bodyFields(msg); body }
    val arr = new Array[Any](ordinals.length)
    var i = 0
    while (i < ordinals.length) {
      arr(i) = ordinals(i) match {
        case 0 => utf(msg.messageId)
        case 1 => utf(msg.to)
        case 2 => utf(msg.subject)
        case 3 => utf(msg.replyTo)
        case 4 => utf(msg.correlationId)
        case 5 => smap(msg.applicationProperties)
        case 6 => smap(msg.messageAnnotations)
        case 7 => utf(bodyF._1)
        case 8 => utf(bodyF._2)
        case 9 => bodyF._3.orNull
        case 10 => tsMicros
      }
      i += 1
    }
    new GenericInternalRow(arr)
  }

  override def close(): Unit =
    AmqpEndpointRegistry.releaseReaderEndpoint(p.endpoint, endpointConn)
}
