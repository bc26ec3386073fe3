package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** AMQP 1.0 wire codec (OASIS AMQP v1.0 §1 "types", §2.4 "framing",
  * §2.7 "performatives", §3.2 "message format") — the piece the
  * reference delegates to Vert.x Proton / Qpid Proton
  * (AMQPReceiver.scala:59-97 in /root/reference). Implemented from the
  * public specification so the `amqp10://` transport exchanges real
  * AMQP 1.0 frames, not a bespoke serialization.
  *
  * Scope (the subset the engine's links exercise):
  *  - the primitive type system: fixed/variable/compound encodings with
  *    their standard constructors (null, booleans, all signed/unsigned
  *    integers incl. small/zero forms, float, double, timestamp, uuid,
  *    binary, string, symbol, list0/8/32, map8/32, described types);
  *  - the connection/session/link performatives: open, begin, attach,
  *    flow, transfer, disposition, detach, end, close, plus source,
  *    target, error, the accepted/rejected delivery states, and the
  *    transactional set (coordinator, declare, discharge, declared,
  *    transactional-state);
  *  - SASL layer: mechanisms / init / outcome (PLAIN + ANONYMOUS);
  *  - message sections: header, delivery-annotations,
  *    message-annotations, properties, application-properties, data,
  *    amqp-sequence, amqp-value, footer.
  *
  * Values decode to: null, java.lang.Boolean, Int (byte/short/int),
  * Long (long), [[UInt]]/[[UByte]]/[[UShort]]/[[ULong]] (unsigned),
  * Float, Double, [[Ts]] (timestamp), java.util.UUID, Array[Byte]
  * (binary), String, [[Sym]] (symbol), Vector[Any] (list),
  * [[AmqpWireMap]] (map, entry order preserved), [[Described]].
  * Encoding accepts exactly those — the codec round-trips its own
  * output bit-for-bit (property-tested in Amqp10CodecPropertySpec:
  * decode∘encode = id and encode∘decode∘encode = encode over the full
  * value model, frames, and bare messages).
  */
object Amqp10Codec {

  // ---------------------------------------------------------- value model
  case class Sym(name: String)
  case class Ts(millis: Long)
  case class UByte(v: Int)
  case class UShort(v: Int)
  case class UInt(v: Long)
  case class ULong(v: Long)
  /** AMQP map with wire entry order preserved (keys may be any type). */
  case class AmqpWireMap(entries: Vector[(Any, Any)]) {
    def get(k: Any): Option[Any] = entries.collectFirst {
      case (ek, v) if ek == k => v
    }
  }
  case class Described(descriptor: Any, value: Any)

  /** Numeric widening helper for decoded performative fields. */
  def asLong(v: Any): Long = v match {
    case null => 0L
    case i: Int => i.toLong
    case l: Long => l
    case UByte(b) => b.toLong
    case UShort(s) => s.toLong
    case UInt(u) => u
    case ULong(u) => u
    case Ts(ms) => ms
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  def asBool(v: Any, dflt: Boolean = false): Boolean = v match {
    case null => dflt
    case b: java.lang.Boolean => b.booleanValue()
    case other => throw new IllegalArgumentException(s"not boolean: $other")
  }

  // ------------------------------------------------------------- encoding
  final class Writer {
    private val out = new ByteArrayOutputStream(256)
    def bytes: Array[Byte] = out.toByteArray
    def u8(v: Int): Writer = { out.write(v & 0xff); this }
    def u16(v: Int): Writer = { u8(v >>> 8); u8(v) }
    def u32(v: Long): Writer = { u16((v >>> 16).toInt); u16(v.toInt) }
    def u64(v: Long): Writer = { u32(v >>> 32); u32(v) }
    def raw(bs: Array[Byte]): Writer = { out.write(bs, 0, bs.length); this }
  }

  def encode(v: Any): Array[Byte] = { val w = new Writer; writeValue(w, v); w.bytes }

  def writeValue(w: Writer, v: Any): Unit = v match {
    case null => w.u8(0x40)
    case b: java.lang.Boolean => w.u8(if (b) 0x41 else 0x42)
    case UByte(b) => w.u8(0x50).u8(b)
    case UShort(s) => w.u8(0x60).u16(s)
    case UInt(u) =>
      if (u == 0L) w.u8(0x43)
      else if (u <= 255L) w.u8(0x52).u8(u.toInt)
      else w.u8(0x70).u32(u)
    case ULong(u) =>
      if (u == 0L) w.u8(0x44)
      else if (u >= 0 && u <= 255L) w.u8(0x53).u8(u.toInt)
      else w.u8(0x80).u64(u)
    case i: Int =>
      if (i >= -128 && i <= 127) w.u8(0x54).u8(i)
      else w.u8(0x71).u32(i.toLong & 0xffffffffL)
    case l: Long =>
      if (l >= -128 && l <= 127) w.u8(0x55).u8(l.toInt)
      else w.u8(0x81).u64(l)
    case f: Float => w.u8(0x72).u32(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL)
    case d: Double => w.u8(0x82).u64(java.lang.Double.doubleToLongBits(d))
    case Ts(ms) => w.u8(0x83).u64(ms)
    case u: java.util.UUID =>
      w.u8(0x98).u64(u.getMostSignificantBits).u64(u.getLeastSignificantBits)
    case bs: Array[Byte] =>
      if (bs.length <= 255) w.u8(0xa0).u8(bs.length).raw(bs)
      else { w.u8(0xb0).u32(bs.length.toLong); w.raw(bs) }
    case s: String =>
      val bs = s.getBytes(UTF_8)
      if (bs.length <= 255) w.u8(0xa1).u8(bs.length).raw(bs)
      else { w.u8(0xb1).u32(bs.length.toLong); w.raw(bs) }
    case Sym(s) =>
      val bs = s.getBytes(UTF_8)
      if (bs.length <= 255) w.u8(0xa3).u8(bs.length).raw(bs)
      else { w.u8(0xb3).u32(bs.length.toLong); w.raw(bs) }
    case xs: Seq[_] =>
      if (xs.isEmpty) { w.u8(0x45); () }
      else {
        val body = new Writer
        xs.foreach(writeValue(body, _))
        val content = body.bytes
        // list8: size counts the count byte itself plus the content
        if (content.length + 1 <= 255 && xs.size <= 255)
          w.u8(0xc0).u8(content.length + 1).u8(xs.size).raw(content)
        else {
          w.u8(0xd0).u32(content.length.toLong + 4).u32(xs.size.toLong)
          w.raw(content)
        }
      }
    case AmqpWireMap(entries) =>
      val body = new Writer
      entries.foreach { case (k, x) => writeValue(body, k); writeValue(body, x) }
      val content = body.bytes
      val n = entries.size * 2
      if (content.length + 1 <= 255 && n <= 255)
        w.u8(0xc1).u8(content.length + 1).u8(n).raw(content)
      else {
        w.u8(0xd1).u32(content.length.toLong + 4).u32(n.toLong)
        w.raw(content)
      }
    case Described(d, value) =>
      w.u8(0x00)
      writeValue(w, d)
      writeValue(w, value)
    case other =>
      throw new IllegalArgumentException(s"cannot AMQP-encode ${other.getClass}: $other")
  }

  // ------------------------------------------------------------- decoding
  final class Reader(buf: ByteBuffer) {
    def this(bs: Array[Byte]) = this(ByteBuffer.wrap(bs))
    def hasRemaining: Boolean = buf.hasRemaining
    def u8(): Int = buf.get() & 0xff
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16().toLong
    def u64(): Long = (u32() << 32) | u32()
    def raw(n: Int): Array[Byte] = { val bs = new Array[Byte](n); buf.get(bs); bs }
  }

  def decode(bs: Array[Byte]): Any = readValue(new Reader(bs))

  def readValue(r: Reader): Any = {
    val c = r.u8()
    c match {
      case 0x00 =>
        val d = readValue(r)
        Described(d, readValue(r))
      case 0x40 => null
      case 0x41 => java.lang.Boolean.TRUE
      case 0x42 => java.lang.Boolean.FALSE
      case 0x56 => java.lang.Boolean.valueOf(r.u8() != 0)
      case 0x50 => UByte(r.u8())
      case 0x60 => UShort(r.u16())
      case 0x43 => UInt(0L)
      case 0x52 => UInt(r.u8().toLong)
      case 0x70 => UInt(r.u32())
      case 0x44 => ULong(0L)
      case 0x53 => ULong(r.u8().toLong)
      case 0x80 => ULong(r.u64())
      case 0x51 => r.u8().toByte.toInt
      case 0x61 => r.u16().toShort.toInt
      case 0x54 => r.u8().toByte.toInt
      case 0x71 => r.u32().toInt
      case 0x55 => r.u8().toByte.toLong
      case 0x81 => r.u64()
      case 0x72 => java.lang.Float.intBitsToFloat(r.u32().toInt)
      case 0x82 => java.lang.Double.longBitsToDouble(r.u64())
      case 0x83 => Ts(r.u64())
      case 0x98 => new java.util.UUID(r.u64(), r.u64())
      case 0xa0 => r.raw(r.u8())
      case 0xb0 => r.raw(r.u32().toInt)
      case 0xa1 => new String(r.raw(r.u8()), UTF_8)
      case 0xb1 => new String(r.raw(r.u32().toInt), UTF_8)
      case 0xa3 => Sym(new String(r.raw(r.u8()), UTF_8))
      case 0xb3 => Sym(new String(r.raw(r.u32().toInt), UTF_8))
      case 0x45 => Vector.empty[Any]
      case 0xc0 => { r.u8(); val n = r.u8(); Vector.fill(n)(readValue(r)) }
      case 0xd0 => { r.u32(); val n = r.u32().toInt; Vector.fill(n)(readValue(r)) }
      case 0xc1 =>
        r.u8(); val n = r.u8()
        AmqpWireMap(Vector.fill(n / 2)((readValue(r), readValue(r))))
      case 0xd1 =>
        r.u32(); val n = r.u32().toInt
        AmqpWireMap(Vector.fill(n / 2)((readValue(r), readValue(r))))
      case other =>
        throw new IllegalArgumentException(f"unsupported AMQP constructor 0x$other%02x")
    }
  }

  // -------------------------------------------------- frames & performatives
  /** AMQP frame type codes (§2.3.2): 0x00 AMQP, 0x01 SASL. */
  val FrameTypeAmqp: Int = 0x00
  val FrameTypeSasl: Int = 0x01

  /** §2.3.1 protocol headers: 'A''M''Q''P' proto major minor revision. */
  val HeaderAmqp: Array[Byte] = Array[Byte]('A', 'M', 'Q', 'P', 0, 1, 0, 0)
  val HeaderSasl: Array[Byte] = Array[Byte]('A', 'M', 'Q', 'P', 3, 1, 0, 0)

  case class Frame(frameType: Int, channel: Int, performative: Described,
      payload: Array[Byte])

  /** Frame = size(4) doff(1, =2: no extended header) type(1) channel(2)
    * body. Body = performative (described list) ++ payload. */
  def encodeFrame(f: Frame): Array[Byte] = {
    val body = encode(f.performative) ++ f.payload
    val w = new Writer
    w.u32(8L + body.length).u8(2).u8(f.frameType).u16(f.channel).raw(body)
    w.bytes
  }

  /** Decode one frame from its full bytes (size prefix included). */
  def decodeFrame(bs: Array[Byte]): Frame = {
    val r = new Reader(bs)
    val size = r.u32()
    require(size == bs.length, s"frame size $size != ${bs.length}")
    val doff = r.u8()
    val ftype = r.u8()
    val channel = r.u16()
    r.raw(doff * 4 - 8) // extended header, unused
    val buf = ByteBuffer.wrap(bs, doff * 4, bs.length - doff * 4)
    val rr = new Reader(buf)
    val perf = readValue(rr).asInstanceOf[Described]
    val payload = new Array[Byte](buf.remaining())
    buf.get(payload)
    Frame(ftype, channel, perf, payload)
  }

  /** §2.7 / §3.2 / §4.5 / §5.3 descriptor codes. */
  object Desc {
    val Open = 0x10L; val Begin = 0x11L; val Attach = 0x12L; val Flow = 0x13L
    val Transfer = 0x14L; val Disposition = 0x15L; val Detach = 0x16L
    val End = 0x17L; val Close = 0x18L
    val Error = 0x1dL
    val Source = 0x28L; val Target = 0x29L
    val Accepted = 0x24L; val Rejected = 0x25L; val Released = 0x26L
    val Coordinator = 0x30L; val Declare = 0x31L; val Discharge = 0x32L
    val Declared = 0x33L; val TransactionalState = 0x34L
    val SaslMechanisms = 0x40L; val SaslInit = 0x41L
    val SaslChallenge = 0x42L; val SaslResponse = 0x43L; val SaslOutcome = 0x44L
    val Header = 0x70L; val DeliveryAnnotations = 0x71L
    val MessageAnnotations = 0x72L; val Properties = 0x73L
    val ApplicationProperties = 0x74L; val Data = 0x75L
    val AmqpSequence = 0x76L; val AmqpValue = 0x77L; val Footer = 0x78L
  }

  /** Build a described list, dropping trailing nulls (§1.4: a peer MAY
    * omit trailing null fields). */
  def described(code: Long, fields: Any*): Described = {
    val fs = fields.toVector
    val trimmed = fs.take(fs.lastIndexWhere(_ != null) + 1)
    Described(ULong(code), trimmed)
  }

  /** §1.2 lets a peer pick either form of a standard descriptor: the
    * numeric code or the symbolic name. We emit numeric (like Proton)
    * but accept both. */
  private val SymbolicDescriptors: Map[String, Long] = Map(
    "amqp:open:list" -> Desc.Open, "amqp:begin:list" -> Desc.Begin,
    "amqp:attach:list" -> Desc.Attach, "amqp:flow:list" -> Desc.Flow,
    "amqp:transfer:list" -> Desc.Transfer,
    "amqp:disposition:list" -> Desc.Disposition,
    "amqp:detach:list" -> Desc.Detach, "amqp:end:list" -> Desc.End,
    "amqp:close:list" -> Desc.Close, "amqp:error:list" -> Desc.Error,
    "amqp:source:list" -> Desc.Source, "amqp:target:list" -> Desc.Target,
    "amqp:accepted:list" -> Desc.Accepted, "amqp:rejected:list" -> Desc.Rejected,
    "amqp:released:list" -> Desc.Released,
    "amqp:coordinator:list" -> Desc.Coordinator,
    "amqp:declare:list" -> Desc.Declare, "amqp:discharge:list" -> Desc.Discharge,
    "amqp:declared:list" -> Desc.Declared,
    "amqp:transactional-state:list" -> Desc.TransactionalState,
    "amqp:sasl-mechanisms:list" -> Desc.SaslMechanisms,
    "amqp:sasl-init:list" -> Desc.SaslInit,
    "amqp:sasl-challenge:list" -> Desc.SaslChallenge,
    "amqp:sasl-response:list" -> Desc.SaslResponse,
    "amqp:sasl-outcome:list" -> Desc.SaslOutcome,
    "amqp:header:list" -> Desc.Header,
    "amqp:delivery-annotations:map" -> Desc.DeliveryAnnotations,
    "amqp:message-annotations:map" -> Desc.MessageAnnotations,
    "amqp:properties:list" -> Desc.Properties,
    "amqp:application-properties:map" -> Desc.ApplicationProperties,
    "amqp:data:binary" -> Desc.Data, "amqp:amqp-sequence:list" -> Desc.AmqpSequence,
    "amqp:amqp-value:*" -> Desc.AmqpValue, "amqp:footer:map" -> Desc.Footer)

  def descriptorCode(d: Described): Long = d.descriptor match {
    case ULong(c) => c
    case UInt(c) => c
    case Sym(n) if SymbolicDescriptors.contains(n) => SymbolicDescriptors(n)
    case other => throw new IllegalArgumentException(s"symbolic descriptor: $other")
  }

  /** Tolerant form for message sections: an unknown (e.g. custom
    * vendor-symbol) descriptor maps to -1 so the section is skipped
    * instead of failing the whole message. */
  private def descriptorCodeOrUnknown(d: Described): Long = d.descriptor match {
    case ULong(c) => c
    case UInt(c) => c
    case Sym(n) => SymbolicDescriptors.getOrElse(n, -1L)
    case _ => -1L
  }

  /** Performative field access with trailing-null tolerance. */
  def field(d: Described, i: Int): Any = d.value match {
    case xs: Vector[_] => if (i < xs.length) xs(i) else null
    case other => throw new IllegalArgumentException(s"not a list performative: $other")
  }

  // ------------------------------------------------------ message sections
  /** Encode an [[AmqpMessage]] as an AMQP 1.0 bare message (§3.2):
    * message-annotations, properties, application-properties, then the
    * body section. Delivery annotations carry transport metadata added
    * by the endpoint (e.g. the assigned sequence number), not here. */
  /** Annotation marking a body that is pre-serialized JSON text (an
    * [[AmqpJsonBody]] from a sink round-trip) rather than a plain string
    * amqp-value — provenance the envelope's body_type column preserves. */
  val JsonBodyAnnotation = "x-graft-body-json"

  /** Delivery annotations + bare message in ONE buffer — the transfer
    * payload both produce paths send per message; fusing the two
    * encodes avoids an extra array and copy on the hot path. */
  def encodeTransferPayload(deliveryAnns: Seq[(String, Any)], m: AmqpMessage): Array[Byte] = {
    val w = new Writer
    // §3.2 section order: header, delivery-annotations, then the bare
    // message — the header must lead the TRANSFER payload too, not just
    // a standalone encode, or a spec-compliant peer parsing sections in
    // order drops the ttl.
    writeHeader(w, m)
    writeValue(w, Described(ULong(Desc.DeliveryAnnotations),
      AmqpWireMap(deliveryAnns.map { case (k, v) => (Sym(k): Any, anyToWire(v)) }.toVector)))
    writeBareSections(w, m)
    w.bytes
  }

  def encodeMessage(m: AmqpMessage): Array[Byte] = {
    val w = new Writer
    writeHeader(w, m)
    writeBareSections(w, m)
    w.bytes
  }

  /** §3.2: the header section, when present, precedes every other
    * section. Fields: durable, priority, ttl(uint ms), first-acquirer,
    * delivery-count — only ttl carries model state here. */
  private def writeHeader(w: Writer, m: AmqpMessage): Unit =
    m.ttlMillis.foreach { t =>
      require(t >= 0 && t <= 0xFFFFFFFFL, s"ttl out of uint range: $t")
      writeValue(w, described(Desc.Header, null, null, UInt(t)))
    }

  private def writeBareSections(w: Writer, m: AmqpMessage): Unit = {
    val anns = m.body match {
      case AmqpJsonBody(_) => m.messageAnnotations :+ (JsonBodyAnnotation -> true)
      case _ => m.messageAnnotations
    }
    if (anns.nonEmpty)
      writeValue(w, Described(ULong(Desc.MessageAnnotations),
        AmqpWireMap(anns.map { case (k, v) => (Sym(k): Any, anyToWire(v)) }.toVector)))
    if (m.messageId.isDefined || m.to.isDefined || m.subject.isDefined ||
        m.replyTo.isDefined || m.correlationId.isDefined)
      writeValue(w, described(Desc.Properties,
        m.messageId.orNull, null /* user-id */, m.to.orNull, m.subject.orNull,
        m.replyTo.orNull, m.correlationId.orNull))
    if (m.applicationProperties.nonEmpty)
      writeValue(w, Described(ULong(Desc.ApplicationProperties),
        AmqpWireMap(m.applicationProperties.map { case (k, v) => (k: Any, anyToWire(v)) }.toVector)))
    m.body match {
      case AmqpValueBody(v) => writeValue(w, Described(ULong(Desc.AmqpValue), anyToWire(v)))
      case AmqpJsonBody(j) =>
        // provenance rides the JsonBodyAnnotation added above, so a
        // source→sink→source wire hop keeps body_type stable
        writeValue(w, Described(ULong(Desc.AmqpValue), j))
      case AmqpDataBody(bs) => writeValue(w, Described(ULong(Desc.Data), bs))
      case AmqpOtherBody => writeValue(w, Described(ULong(Desc.AmqpSequence), Vector.empty[Any]))
    }
  }

  /** Scala model value → wire value (maps become AmqpWireMap etc.). */
  def anyToWire(v: Any): Any = v match {
    case null => null
    case d: Described => d
    case s: String => s
    case b: Boolean => java.lang.Boolean.valueOf(b)
    case i: Int => i
    case l: Long => l
    case sh: Short => sh.toInt
    case by: Byte => by.toInt
    case f: Float => f
    case d: Double => d
    case bs: Array[Byte] => bs
    case entries: Seq[_] if entries.nonEmpty && entries.head.isInstanceOf[(_, _)] =>
      AmqpWireMap(entries.asInstanceOf[Seq[(Any, Any)]]
        .map { case (k, x) => (anyToWire(k), anyToWire(x)) }.toVector)
    case xs: Seq[_] => xs.map(anyToWire).toVector
    case xs: Array[_] => xs.toVector.map(anyToWire)
    case other => other.toString // reference stringifies unknown types
  }

  /** Wire value → Scala model value. */
  def wireToAny(v: Any): Any = v match {
    case null => null
    case b: java.lang.Boolean => b.booleanValue()
    case UByte(b) => b
    case UShort(s) => s
    case UInt(u) => u
    case ULong(u) => u
    case Ts(ms) => ms
    case Sym(s) => s
    case AmqpWireMap(entries) =>
      entries.map { case (k, x) => (String.valueOf(wireToAny(k)), wireToAny(x)) }
    case xs: Vector[_] => xs.map(wireToAny)
    case other => other
  }

  /** Delivery annotations (§3.2.2) prepended to a bare message: the
    * transport-metadata channel an endpoint uses for e.g. the assigned
    * sequence number — consumed by the peer, never part of the bare
    * message the application sees. */
  def encodeDeliveryAnnotations(entries: Seq[(String, Any)]): Array[Byte] =
    encode(Described(ULong(Desc.DeliveryAnnotations),
      AmqpWireMap(entries.map { case (k, v) => (Sym(k): Any, anyToWire(v)) }.toVector)))

  /** Decode a bare message (§3.2) back to the [[AmqpMessage]] model.
    * Section handling mirrors the reference's converter: header and
    * footer are transport-level and dropped; amqp-sequence keeps the
    * MESSAGE but omits the body content (AMQPJsonFunction.scala:149-154
    * in /root/reference never drops). */
  def decodeMessage(bs: Array[Byte]): AmqpMessage = decodeTransferPayload(bs)._1

  /** Like [[decodeMessage]], also returning the delivery annotations. */
  def decodeTransferPayload(bs: Array[Byte]): (AmqpMessage, Vector[(String, Any)]) = {
    val r = new Reader(bs)
    var m = AmqpMessage()
    var deliveryAnns = Vector.empty[(String, Any)]
    while (r.hasRemaining) {
      val d = readValue(r).asInstanceOf[Described]
      descriptorCodeOrUnknown(d) match {
        case Desc.Properties =>
          def s(i: Int): Option[String] = field(d, i) match {
            case null => None
            case x: String => Some(x)
            case other => Some(String.valueOf(wireToAny(other)))
          }
          m = m.copy(messageId = s(0), to = s(2), subject = s(3),
            replyTo = s(4), correlationId = s(5))
        case Desc.ApplicationProperties =>
          val entries = d.value.asInstanceOf[AmqpWireMap].entries
            .map { case (k, v) => (String.valueOf(wireToAny(k)), wireToAny(v)) }
          m = m.copy(applicationProperties = entries)
        case Desc.MessageAnnotations =>
          val entries = d.value.asInstanceOf[AmqpWireMap].entries
            .map { case (k, v) => (String.valueOf(wireToAny(k)), wireToAny(v)) }
          m = m.copy(messageAnnotations = entries)
        case Desc.AmqpValue =>
          m = m.copy(body = AmqpValueBody(wireToAny(d.value)))
        case Desc.Data =>
          m = m.copy(body = AmqpDataBody(d.value.asInstanceOf[Array[Byte]]))
        case Desc.AmqpSequence =>
          m = m.copy(body = AmqpOtherBody)
        case Desc.DeliveryAnnotations =>
          deliveryAnns = d.value.asInstanceOf[AmqpWireMap].entries
            .map { case (k, v) => (String.valueOf(wireToAny(k)), wireToAny(v)) }
        case Desc.Header =>
          // field 3 (index 2) is ttl: uint milliseconds. Other header
          // fields stay transport-level and dropped (as the reference's
          // converter does — AMQPJsonFunction.scala:38-54 reads none).
          field(d, 2) match {
            case UInt(t) => m = m.copy(ttlMillis = Some(t))
            case _ => ()
          }
        case Desc.Footer => ()
        case other => () // unknown section: keep the message, skip the section
      }
    }
    if (m.messageAnnotations.exists(_._1 == JsonBodyAnnotation)) {
      val body = m.body match {
        case AmqpValueBody(s: String) => AmqpJsonBody(s)
        case other => other
      }
      m = m.copy(body = body,
        messageAnnotations = m.messageAnnotations.filterNot(_._1 == JsonBodyAnnotation))
    }
    (m, deliveryAnns)
  }
}
