package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AMQP 1.0 message model + the engine's fixed envelope schema.
  *
  * The reference exposes raw Proton `Message`s to a user-supplied
  * converter (`Message => Option[T]`, AMQPUtils.scala:52 in
  * /root/reference). The Spark-native redesign (SURVEY.md §1.3) replaces
  * that callback with a FIXED envelope schema emitted by the source —
  * per-row conversion then happens declaratively with columns, and the
  * two built-in converters (body / JSON) become Column functions.
  *
  * The message sections modeled here are exactly those the reference's
  * JSON converter surfaces (AMQPJsonFunction.scala:38-54): properties
  * (messageId, to, subject, replyTo, correlationId), application
  * properties, message annotations, and the body as a tagged union of
  * AmqpValue (string / list / array / map) and Data (binary).
  */
sealed trait AmqpBody
/** An amqp-value section; `value` is String, Seq[Any], or Seq[(String, Any)]
  * (map entries in insertion order, as the wire preserves them). */
case class AmqpValueBody(value: Any) extends AmqpBody
/** A data section (raw bytes). */
case class AmqpDataBody(bytes: Array[Byte]) extends AmqpBody
/** An amqp-value list/array/map section already serialized to JSON text —
  * used when an envelope row is written back out (the sink can't recover
  * the original structure, but preserves the serialized form + its
  * body_type provenance so source→sink round-trips are lossless). */
case class AmqpJsonBody(json: String) extends AmqpBody
/** Any other section (e.g. amqp-sequence): body content omitted, message
  * still delivered (AMQPJsonFunction.scala:149-154 never drops). */
case object AmqpOtherBody extends AmqpBody

case class AmqpMessage(
    messageId: Option[String] = None,
    to: Option[String] = None,
    subject: Option[String] = None,
    replyTo: Option[String] = None,
    correlationId: Option[String] = None,
    applicationProperties: Seq[(String, Any)] = Nil,
    messageAnnotations: Seq[(String, Any)] = Nil,
    body: AmqpBody = AmqpOtherBody,
    /** Header-section ttl (§3.2.1 field 3): milliseconds from enqueue
      * after which the message is expired and must not be delivered to
      * a TTL-respecting consumer (the source's `respectTtl` option).
      * None = no expiry. Rides the wire as the header section. */
    ttlMillis: Option[Long] = None)

object AmqpEnvelope {

  /** The source's fixed output schema (FIXTURES.md §1). */
  val schema: StructType = StructType(Seq(
    StructField("message_id", StringType, nullable = true),
    StructField("to", StringType, nullable = true),
    StructField("subject", StringType, nullable = true),
    StructField("reply_to", StringType, nullable = true),
    StructField("correlation_id", StringType, nullable = true),
    StructField("application_properties", MapType(StringType, StringType), nullable = true),
    StructField("message_annotations", MapType(StringType, StringType), nullable = true),
    StructField("body_type", StringType, nullable = true), // amqpValue | amqpValueJson | data | null
    StructField("body", StringType, nullable = true),      // value / JSON text
    StructField("body_binary", BinaryType, nullable = true),
    StructField("ingest_timestamp", TimestampType, nullable = false)))

  /** Parse one `propertyColumns` entry — `name` (string-typed lift, the
    * original form) or `name:type` with type ∈ {string, long}. A LONG
    * lift carries the property's NUMERIC value (AMQP application
    * properties are typed on the wire; the reference stringifies them,
    * AMQPJsonFunction.scala:86 in /root/reference — parity-neutral),
    * which is what lets RANGE predicates push on it; unknown types
    * refuse loudly rather than silently lifting text.
    *
    * Only the LAST colon can introduce a type, so a property name that
    * itself contains ':' is liftable via the explicit form
    * (`a:b:string` lifts property "a:b"); a bare colon-bearing entry or
    * a trailing ':' (the `price:` typo) refuses loudly instead of
    * silently string-lifting a name the user didn't write. */
  def parsePropertyColumn(entry: String): (String, DataType) = {
    def bad(): Nothing = throw new IllegalArgumentException(
      s"bad propertyColumns entry '$entry' — use name or name:string|long " +
        "(a property name containing ':' needs the explicit name:string|long form)")
    val cut = entry.lastIndexOf(':')
    if (cut < 0) { val n = entry.trim; if (n.isEmpty) bad(); n -> StringType }
    else {
      val n = entry.substring(0, cut).trim
      if (n.isEmpty) bad()
      entry.substring(cut + 1).trim match {
        case "string" => n -> StringType
        case "long" => n -> LongType
        case _ => bad()
      }
    }
  }

  /** The envelope schema plus one nullable column per LIFTED application
    * property (the source's `propertyColumns` option): string lifts use
    * the same String.valueOf stringification as the map column, long
    * lifts the property's integral value (NULL when absent OR
    * non-integral — typed projection, not coercion). Lifting is what
    * makes a property predicate prunable and pushable — V2 predicates
    * reference columns, never map lookups; a LONG lift additionally
    * makes RANGE predicates pushable. Property names shadowing an
    * envelope column are refused (the lifted column would be
    * unreachable). */
  def schemaWith(propertyColumns: Seq[(String, DataType)]): StructType =
    if (propertyColumns.isEmpty) schema
    else {
      val names = propertyColumns.map(_._1)
      val base = schema.fieldNames.toSet
      val clash = names.filter(base)
      require(clash.isEmpty,
        s"propertyColumns ${clash.mkString(",")} shadow envelope columns")
      require(names.distinct == names,
        s"propertyColumns has duplicates: ${names.mkString(",")}")
      StructType(schema.fields ++
        propertyColumns.map { case (p, dt) => StructField(p, dt, nullable = true) })
    }

  /** Minimal JSON writer for AmqpValue bodies — list/array/map bodies are
    * carried in the envelope's `body` column as JSON text, mirroring the
    * reference's Jackson serialization (AMQPJsonFunction.scala:122-135):
    * strings quoted/escaped, numbers bare, nested structures recursed,
    * map keys in insertion order. */
  def jsonify(v: Any): String = v match {
    case null => "null"
    case s: String => quote(s)
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => d.toString
    case f: Float => f.toString
    case entries: Seq[_] if entries.nonEmpty && entries.head.isInstanceOf[(_, _)] =>
      entries.asInstanceOf[Seq[(String, Any)]]
        .map { case (k, x) => quote(k) + ":" + jsonify(x) }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(jsonify).mkString("[", ",", "]")
    case xs: Array[_] => xs.toSeq.map(jsonify).mkString("[", ",", "]")
    case other => quote(other.toString) // reference stringifies unknown types
  }

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Inverse of [[quote]] for a captured JSON-string BODY (escapes
    * intact, surrounding quotes already stripped by the caller's regex)
    * — shared by the offset parsers, so an address with '"' or '\' in
    * its name survives every checkpoint round-trip. */
  def unquote(s: String): String = {
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

  /** Envelope field values for a message (pre-InternalRow). The body
    * mapping follows AMQPJsonFunction.scala:105-152: AmqpValue(String) →
    * the string; list/array/map → JSON text; Data → bytes (+ the
    * reference's Base64 representation is available via base64()). */
  def toFields(m: AmqpMessage): (Option[String], Option[String], Option[String],
      Option[String], Option[String], Seq[(String, String)], Seq[(String, String)],
      Option[String], Option[String], Option[Array[Byte]]) = {
    val (bodyType, bodyText, bodyBin) = bodyFields(m)
    (m.messageId, m.to, m.subject, m.replyTo, m.correlationId,
      m.applicationProperties.map { case (k, v) => k -> String.valueOf(v) },
      m.messageAnnotations.map { case (k, v) => k -> String.valueOf(v) },
      bodyType, bodyText, bodyBin)
  }

  /** The (body_type, body, body_binary) triple alone — the scan computes
    * it only when a pruned read actually requires a body column. */
  def bodyFields(m: AmqpMessage): (Option[String], Option[String], Option[Array[Byte]]) =
    m.body match {
      // Provenance is carried in body_type, never re-derived from the
      // text: a plain string body is "amqpValue" even if it happens to
      // start with '[' or '{'; a serialized list/array/map body is
      // "amqpValueJson". amqpToJson keys off this tag so a string body
      // is ALWAYS emitted as a JSON string (matching the reference's
      // Jackson behavior, AMQPJsonFunction.scala:122-135).
      case AmqpValueBody(s: String) => (Some("amqpValue"), Some(s), None)
      case AmqpValueBody(v)         => (Some("amqpValueJson"), Some(jsonify(v)), None)
      case AmqpJsonBody(j)          => (Some("amqpValueJson"), Some(j), None)
      case AmqpDataBody(bs)         => (Some("data"), None, Some(bs))
      case AmqpOtherBody            => (None, None, None)
    }
}

/** The reference's two built-in converters, as Column functions over the
  * envelope DataFrame (SURVEY.md §2.1 C1/C2). */
object AmqpConverters {

  /** C1 (AMQPBodyFunction): the amqp-value body, NULL for anything else —
    * pair with .where(amqp_body.isNotNull) for the reference's drop
    * semantics (deliberately the safe flatMap variant, not the crashing
    * non-reliable path — SURVEY.md §7.4.5). */
  def amqpBody: Column =
    when(col("body_type").isin("amqpValue", "amqpValueJson"), col("body"))

  /** C1 with cast, e.g. amqpBodyAs(IntegerType) for the temperature
    * example's `String => Int` converter. */
  def amqpBodyAs(dt: DataType): Column = amqpBody.cast(dt)

  /** C2 (AMQPJsonFunction): the full envelope as one JSON document with
    * the reference's shape — properties / applicationProperties /
    * messageAnnotations (only when present) and the tagged body union
    * ({"type":"amqpValue"|"data","section":...}); Data sections are
    * Base64-encoded (AMQPJsonFunction.scala:139-148). Never NULL: the
    * JSON converter never drops a message. */
  def amqpToJson: Column = {
    val props = to_json(struct(
      col("message_id").as("messageId"),
      col("to").as("to"),
      col("subject").as("subject"),
      col("reply_to").as("replyTo"),
      col("correlation_id").as("correlationId")))
    val propsPart = concat(lit("\"properties\":"), props)
    val appPart = when(col("application_properties").isNotNull &&
        size(col("application_properties")) > 0,
      concat(lit("\"applicationProperties\":"), to_json(col("application_properties"))))
    val annPart = when(col("message_annotations").isNotNull &&
        size(col("message_annotations")) > 0,
      concat(lit("\"messageAnnotations\":"), to_json(col("message_annotations"))))
    // body_type carries the provenance: "amqpValueJson" bodies already
    // hold serialized JSON; "amqpValue" bodies are plain strings and are
    // ALWAYS quoted — even ones starting with [ or {.
    // Quoting+escaping a string via to_json: '["x"]' minus the brackets.
    val quoted = {
      val arr = to_json(array(col("body")))
      arr.substr(lit(2), length(arr) - 2)
    }
    val valueSection =
      when(col("body_type") === "amqpValueJson", col("body")).otherwise(quoted)
    // Spark's base64() MIME-chunks with CRLF every 76 chars (conf-
    // dependent in 4.x) — inside a JSON string that is an unescaped
    // control character. The reference uses the non-chunking encoder
    // (Base64.getEncoder, AMQPJsonFunction.scala:146), so strip any
    // line breaks unconditionally. (Caught by AmqpModelPropertySpec:
    // every payload > 57 bytes produced unparseable JSON.)
    val b64 = regexp_replace(base64(col("body_binary")), "[\\r\\n]", "")
    val bodyPart = when(col("body_type").isin("amqpValue", "amqpValueJson"),
        concat(lit("\"body\":{\"type\":\"amqpValue\",\"section\":"), valueSection, lit("}")))
      .when(col("body_type") === "data",
        concat(lit("\"body\":{\"type\":\"data\",\"section\":\""), b64, lit("\"}")))
    concat(lit("{"), concat_ws(",", propsPart, appPart, annPart, bodyPart), lit("}"))
  }
}
