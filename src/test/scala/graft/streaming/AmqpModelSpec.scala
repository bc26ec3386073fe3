package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

import graft.SparkSpecBase

/** Envelope + converter parity with the reference's fixtures
  * (FIXTURES.md §2; AMQPBrokerStreamSuite.scala in /root/reference). */
class AmqpModelSpec extends SparkSpecBase {

  private val mapper = new ObjectMapper()

  private def envelopeDf(msgs: AmqpMessage*) = {
    val rows = msgs.map { m =>
      val f = AmqpEnvelope.toFields(m)
      Row(f._1.orNull, f._2.orNull, f._3.orNull, f._4.orNull, f._5.orNull,
        if (f._6.isEmpty) null else f._6.toMap,
        if (f._7.isEmpty) null else f._7.toMap,
        f._8.orNull, f._9.orNull, f._10.orNull,
        new java.sql.Timestamp(1700000000000L))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), AmqpEnvelope.schema)
  }

  test("string body round-trips (simple-string fixture)") {
    val df = envelopeDf(AmqpMessage(to = Some("my_address"),
      body = AmqpValueBody("Spark Streaming & AMQP")))
    val r = df.select(AmqpConverters.amqpBody.as("b")).collect().head
    assert(r.getString(0) == "Spark Streaming & AMQP")
  }

  test("list body serializes as JSON array (list fixture)") {
    val m = AmqpMessage(body = AmqpValueBody(Seq("a string", 1, 2)))
    assert(AmqpEnvelope.toFields(m)._9.contains("""["a string",1,2]"""))
  }

  test("map body serializes as JSON object in insertion order (map fixture)") {
    val m = AmqpMessage(body = AmqpValueBody(Seq("field_a" -> "a string", "field_b" -> 1)))
    assert(AmqpEnvelope.toFields(m)._9.contains("""{"field_a":"a string","field_b":1}"""))
  }

  test("array body serializes as JSON array (array fixture)") {
    val m = AmqpMessage(body = AmqpValueBody(Array(1, 2)))
    assert(AmqpEnvelope.toFields(m)._9.contains("[1,2]"))
  }

  test("binary body lands in body_binary; body converter drops it (C1 None)") {
    val bytes = "Spark Streaming & AMQP".getBytes("UTF-8")
    val df = envelopeDf(AmqpMessage(body = AmqpDataBody(bytes)))
    val r = df.select(AmqpConverters.amqpBody.as("b"), org.apache.spark.sql.functions.col("body_binary")).collect().head
    assert(r.isNullAt(0), "C1 drops non-AmqpValue bodies")
    assert(new String(r.getAs[Array[Byte]](1), "UTF-8") == "Spark Streaming & AMQP")
  }

  test("C2 JSON matches the reference shape for the map fixture") {
    val df = envelopeDf(AmqpMessage(to = Some("my_address"),
      body = AmqpValueBody(Seq("field_a" -> "a string", "field_b" -> 1))))
    val json = df.select(AmqpConverters.amqpToJson.as("j")).collect().head.getString(0)
    val tree = mapper.readTree(json)
    assert(tree.at("/properties/to").asText() == "my_address")
    assert(tree.at("/body/type").asText() == "amqpValue")
    assert(tree.at("/body/section/field_a").asText() == "a string")
    assert(tree.at("/body/section/field_b").asInt() == 1)
  }

  test("C2 JSON base64-encodes data bodies (binary fixture)") {
    val bytes = "Spark Streaming & AMQP".getBytes("UTF-8")
    val df = envelopeDf(AmqpMessage(body = AmqpDataBody(bytes)))
    val json = df.select(AmqpConverters.amqpToJson.as("j")).collect().head.getString(0)
    val tree = mapper.readTree(json)
    assert(tree.at("/body/type").asText() == "data")
    assert(java.util.Base64.getDecoder.decode(tree.at("/body/section").asText())
      .sameElements(bytes))
  }

  test("C2 quotes a plain string body even when it starts with '{' or '['") {
    for (s <- Seq("{hello", "[not json", """{"a":1}""")) {
      val df = envelopeDf(AmqpMessage(body = AmqpValueBody(s)))
      val json = df.select(AmqpConverters.amqpToJson.as("j")).collect().head.getString(0)
      val tree = mapper.readTree(json)
      assert(tree.at("/body/type").asText() == "amqpValue")
      assert(tree.at("/body/section").isTextual, s"string body '$s' must stay a JSON string")
      assert(tree.at("/body/section").asText() == s)
    }
  }

  test("C2 never drops: other-section bodies still produce a document") {
    val df = envelopeDf(AmqpMessage(subject = Some("s"), body = AmqpOtherBody))
    val json = df.select(AmqpConverters.amqpToJson.as("j")).collect().head.getString(0)
    val tree = mapper.readTree(json)
    assert(tree.at("/properties/subject").asText() == "s")
    assert(tree.at("/body").isMissingNode)
  }

  test("AmqpSequence envelope parity: the row is kept, body content omitted") {
    // Reference rule: AMQPJsonFunction.scala:149-154 in /root/reference —
    // a section it doesn't model (amqp-sequence) hits the bare `case _`,
    // so the message is STILL emitted, with no body content. Assert the
    // same through the engine end-to-end: source row present, all body
    // columns null, the rest of the envelope intact.
    val ep = "mem://seq-envelope"
    val broker = AmqpEndpointRegistry.broker(ep)
    broker.send("a", AmqpMessage(messageId = Some("sq1"), subject = Some("s"),
      applicationProperties = Seq("k" -> "v"), body = AmqpOtherBody), 7L)
    try {
      val rows = spark.read.format("amqp")
        .option("endpoint", ep).option("address", "a").load().collect()
      assert(rows.length == 1, "sequence-bodied messages are never dropped")
      val r = rows.head
      assert(r.getAs[String]("message_id") == "sq1")
      assert(r.getAs[String]("subject") == "s")
      assert(r.getAs[Map[String, String]]("application_properties") == Map("k" -> "v"))
      assert(r.getAs[String]("body_type") == null)
      assert(r.getAs[String]("body") == null)
      assert(r.getAs[Array[Byte]]("body_binary") == null)
    } finally AmqpEndpointRegistry.reset(ep)

    // And from the wire: a CONTENT-BEARING amqp-sequence section (which
    // only a third-party peer would produce — our encoder writes empty
    // sequences) decodes to the same kept-message/omitted-body model.
    import Amqp10Codec._
    val bare = encode(described(Desc.Properties, "sq2")) ++
      encode(Described(ULong(Desc.AmqpSequence), Vector("x", 1, true)))
    val m = decodeMessage(bare)
    assert(m.messageId.contains("sq2"))
    assert(m.body == AmqpOtherBody, "sequence content is omitted, not surfaced")
  }

  test("application properties are stringified (reference toString coercion)") {
    val m = AmqpMessage(applicationProperties = Seq("k1" -> 5, "k2" -> "v"))
    val f = AmqpEnvelope.toFields(m)
    assert(f._6 == Seq("k1" -> "5", "k2" -> "v"))
  }

  test("propertyColumns parsing: only the LAST colon types; typos refuse loudly") {
    import org.apache.spark.sql.types.{LongType, StringType}
    assert(AmqpEnvelope.parsePropertyColumn("price") == ("price" -> StringType))
    assert(AmqpEnvelope.parsePropertyColumn("price:string") == ("price" -> StringType))
    assert(AmqpEnvelope.parsePropertyColumn(" price : long ") == ("price" -> LongType))
    // a property name containing ':' is liftable via the explicit form
    assert(AmqpEnvelope.parsePropertyColumn("ns:price:long") == ("ns:price" -> LongType))
    // the 'price:' typo must REFUSE, not silently string-lift 'price'
    intercept[IllegalArgumentException](AmqpEnvelope.parsePropertyColumn("price:"))
    // bare colon-bearing entry: ambiguous — refuse, pointing at the
    // explicit form (a silent string lift could hide a type typo)
    intercept[IllegalArgumentException](AmqpEnvelope.parsePropertyColumn("ns:price"))
    intercept[IllegalArgumentException](AmqpEnvelope.parsePropertyColumn(":long"))
    intercept[IllegalArgumentException](AmqpEnvelope.parsePropertyColumn(""))
  }
}
