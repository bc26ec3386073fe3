package graft.streaming

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.Row

import graft.SparkSpecBase

/** Property tests for the envelope → JSON path (SURVEY §5's test plan:
  * ScalaCheck on the round-trip). The pure pieces (quote/jsonify/
  * toFields) get true forAll properties with shrinking; the Column
  * converter (C2) is checked over one generated batch per run so the
  * suite costs one Spark job, not hundreds.
  */
class AmqpModelPropertySpec extends SparkSpecBase {

  private val mapper = new ObjectMapper()

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // strings exercising quoting: quotes, backslashes, braces/brackets
  // (the ADVICE-r1 sniffing regression), control chars, some unicode
  private val genStr: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf('"', '\\', '{', '}', '[', ']', ',', ':', ' '),
    2 -> Gen.oneOf('\n', '\r', '\t', '', ''),
    1 -> Gen.oneOf('é', 'λ', '中', ' '))).map(_.mkString)

  private val genScalar: Gen[Any] = Gen.oneOf(
    genStr,
    Gen.chooseNum(Int.MinValue, Int.MaxValue),
    Gen.chooseNum(Long.MinValue, Long.MaxValue),
    Gen.oneOf(true, false))

  private val genValue: Gen[Any] = Gen.oneOf(
    genScalar,
    Gen.listOfN(3, genScalar).map(_.toSeq),
    // map-entry keys deduplicated: with duplicate keys both jsonify and
    // the reference's Jackson emit repeated members, and JSON parsers
    // keep an arbitrary one — not a behavior worth pinning
    Gen.listOfN(3, Gen.zip(genStr, genScalar))
      .map(_.distinctBy(_._1).toSeq))

  test("quote() emits JSON any parser reads back verbatim (forAll strings)") {
    check(Prop.forAll(genStr) { s =>
      mapper.readTree(AmqpEnvelope.quote(s)).asText() == s
    })
  }

  test("jsonify() is structure-preserving JSON (forAll nested values)") {
    def matches(v: Any, node: JsonNode): Boolean = v match {
      case s: String => node.isTextual && node.asText() == s
      case i: Int => node.isNumber && node.asLong() == i.toLong
      case l: Long => node.isNumber && node.asLong() == l
      case b: Boolean => node.isBoolean && node.asBoolean() == b
      case entries: Seq[_] if entries.nonEmpty && entries.head.isInstanceOf[(_, _)] =>
        val es = entries.asInstanceOf[Seq[(String, Any)]]
        node.isObject && es.forall { case (k, x) => matches(x, node.get(k)) }
      case xs: Seq[_] =>
        node.isArray && node.size() == xs.length &&
          xs.zipWithIndex.forall { case (x, i) => matches(x, node.get(i)) }
      case other => node.isTextual && node.asText() == other.toString
    }
    check(Prop.forAll(genValue) { v =>
      matches(v, mapper.readTree(AmqpEnvelope.jsonify(v)))
    })
  }

  test("toFields: string bodies keep provenance 'amqpValue'; structured 'amqpValueJson'") {
    check(Prop.forAll(genValue) { v =>
      val (bt, text, bin) = {
        val f = AmqpEnvelope.toFields(AmqpMessage(body = AmqpValueBody(v)))
        (f._8, f._9, f._10)
      }
      bin.isEmpty && (v match {
        case s: String => bt.contains("amqpValue") && text.contains(s)
        case _ => bt.contains("amqpValueJson") && text.exists(t =>
          mapper.readTree(t) != null)
      })
    })
  }

  test("offset JSON round-trips any address name (checkpoint safety)") {
    val genAddr = Gen.nonEmptyListOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('/', '.', '-', '_', ' '),
      1 -> Gen.oneOf('"', '\\', '{', '}', ':', ','))).map(_.mkString)
    val genSeqs = Gen.nonEmptyMap(Gen.zip(genAddr, Gen.chooseNum(0L, Long.MaxValue)))
    check(Prop.forAll(genSeqs) { m =>
      val off = AmqpOffset(m)
      AmqpOffset.fromJson(off.json(), "primary") == off
    }, n = 200)
  }

  test("C2 over a generated batch: parses, quotes string bodies, base64s data") {
    val genMsg: Gen[AmqpMessage] = for {
      mid <- Gen.option(genStr)
      subj <- Gen.option(genStr)
      props <- Gen.listOfN(2, Gen.zip(Gen.identifier, genScalar))
        .map(_.distinctBy(_._1))
      body <- Gen.oneOf(
        genStr.map(s => AmqpValueBody(s): AmqpBody),
        genValue.map(v => AmqpValueBody(v): AmqpBody),
        Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
          .map(bs => AmqpDataBody(bs.toArray): AmqpBody),
        Gen.const(AmqpOtherBody: AmqpBody))
    } yield AmqpMessage(messageId = mid, subject = subj,
      applicationProperties = props, body = body)

    val msgs = Gen.listOfN(150, genMsg).sample.getOrElse(Nil)
    assert(msgs.nonEmpty)
    val rows = msgs.map { m =>
      val f = AmqpEnvelope.toFields(m)
      Row(f._1.orNull, f._2.orNull, f._3.orNull, f._4.orNull, f._5.orNull,
        if (f._6.isEmpty) null else f._6.toMap,
        if (f._7.isEmpty) null else f._7.toMap,
        f._8.orNull, f._9.orNull, f._10.orNull,
        new java.sql.Timestamp(1700000000000L))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), AmqpEnvelope.schema)
    val jsons = df.select(AmqpConverters.amqpToJson.as("j"))
      .collect().map(_.getString(0))
    msgs.zip(jsons).foreach { case (m, json) =>
      val tree = mapper.readTree(json) // every document parses
      m.messageId.foreach(v => assert(tree.at("/properties/messageId").asText() == v))
      m.subject.foreach(v => assert(tree.at("/properties/subject").asText() == v))
      m.applicationProperties.foreach { case (k, v) =>
        assert(tree.at(s"/applicationProperties/$k").asText() == String.valueOf(v))
      }
      m.body match {
        case AmqpValueBody(s: String) =>
          assert(tree.at("/body/section").isTextual, s"string body must stay textual: $json")
          assert(tree.at("/body/section").asText() == s)
        case AmqpValueBody(_) =>
          assert(tree.at("/body/type").asText() == "amqpValue")
        case AmqpDataBody(bs) =>
          assert(tree.at("/body/type").asText() == "data")
          assert(java.util.Base64.getDecoder
            .decode(tree.at("/body/section").asText()).sameElements(bs))
        case _ =>
          assert(tree.at("/body").isMissingNode, "other sections omit the body")
      }
    }
  }
}
