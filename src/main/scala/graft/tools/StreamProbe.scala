package graft.tools
import org.apache.spark.sql.SparkSession
import graft.streaming._
import scala.jdk.CollectionConverters._
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ep = "mem://probe"
    val broker = AmqpEndpointRegistry.broker(ep)
    (1 to 10).foreach(i => broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"m$i"))))
    val q = spark.readStream.format("amqp").option("endpoint", ep).option("address", "my_address").load()
      .select(AmqpConverters.amqpBody.as("b"))
      .writeStream.format("memory").queryName("t").outputMode("append").start()
    q.processAllAvailable()
    println(s"PROBE first count=${spark.table("t").count()}")
    (11 to 15).foreach(i => broker.send("my_address", AmqpMessage(body = AmqpValueBody(s"m$i"))))
    val deadline = System.currentTimeMillis() + 15000
    var n = spark.table("t").count()
    while (n < 15 && System.currentTimeMillis() < deadline) { Thread.sleep(500); n = spark.table("t").count() }
    println(s"PROBE second count=$n status=${q.status.message}")
    if (n < 15) {
      Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
        if (t.getName.contains("stream")) println(s"PROBESTACK ${t.getName} ${t.getState}\n  " + st.take(18).mkString("\n  "))
      }
    }
    q.stop(); spark.stop()
  }
}
