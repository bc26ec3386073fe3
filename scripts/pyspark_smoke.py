#!/usr/bin/env python3
"""PySpark smoke test for the DSv2 AMQP source/sink.

The reference ships a Python binding (/root/reference/python/amqp.py, a
py4j shim over AMQPUtils — stale upstream). This engine's claim is that
DataSource V2 makes Python parity free: `format("amqp")` resolves
through META-INF service registration with no Python-side code at all.
This script is the executable proof: it writes rows through the AMQP
sink and reads them back through the source, entirely from pyspark.

Run:  python3 scripts/pyspark_smoke.py   (after `sbt compile`)
"""
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CLASSES = "target/scala-2.13/classes"

spark = (
    SparkSession.builder.master("local[2]")
    .appName("amqp-pyspark-smoke")
    .config("spark.driver.extraClassPath", CLASSES)
    .config("spark.executor.extraClassPath", CLASSES)
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

ep = "mem://pyspark-smoke"
n = 100

# produce through the sink (exactly the Scala batch-write path)
(
    spark.range(n)
    .select(
        F.col("id").cast("string").alias("message_id"),
        F.concat(F.lit("k"), F.col("id") % 3).alias("subject"),
        F.col("id").cast("string").alias("body"),
    )
    .write.format("amqp")
    .option("endpoint", ep)
    .option("address", "smoke")
    .mode("append")
    .save()
)

# read back through the source; envelope schema + a grouped aggregate
df = (
    spark.read.format("amqp")
    .option("endpoint", ep)
    .option("address", "smoke")
    .load()
)
assert df.schema["ingest_timestamp"].dataType.typeName() == "timestamp", df.schema
got = {
    r["subject"]: r["cnt"]
    for r in df.groupBy("subject").agg(F.count(F.lit(1)).alias("cnt")).collect()
}
expected = {"k0": 34, "k1": 33, "k2": 33}
assert got == expected, f"{got} != {expected}"

# COUNT(*) pushdown works from Python too (AmqpCountScan in the plan)
counted = df.groupBy().count()
plan = counted._jdf.queryExecution().executedPlan().toString()
assert "AmqpCountScan" in plan, plan
assert counted.collect()[0][0] == n

# propertyColumns, both directions, from Python: string columns become
# application properties on the way out, lifted pushable columns on the
# way back (the pushed predicate shows in PushedFilters)
(
    spark.range(n)
    .select(
        F.col("id").cast("string").alias("message_id"),
        F.concat(F.lit("t"), F.col("id") % 2).alias("tier"),
        F.col("id").cast("string").alias("body"),
    )
    .write.format("amqp")
    .option("endpoint", ep)
    .option("address", "smoke-props")
    .option("propertyColumns", "tier")
    .mode("append")
    .save()
)
lifted = (
    spark.read.format("amqp")
    .option("endpoint", ep)
    .option("address", "smoke-props")
    .option("propertyColumns", "tier")
    .load()
    .where(F.col("tier") == "t1")
)
lplan = lifted._jdf.queryExecution().executedPlan().toString()
assert "tier = 't1'" in lplan, lplan
assert lifted.count() == n // 2, lifted.count()

# pattern subscription from Python: the glob discovers both shard
# queues written above and never the unrelated ones
for shard in ("fleet-a", "fleet-b"):
    (
        spark.range(10)
        .select(F.col("id").cast("string").alias("body"))
        .write.format("amqp")
        .option("endpoint", ep).option("address", shard)
        .mode("append").save()
    )
fleet = (
    spark.read.format("amqp")
    .option("endpoint", ep)
    .option("addressPattern", "fleet-*")
    .load()
)
assert fleet.count() == 20, fleet.count()

# per-row routing from Python: routeByTo publishes each row to its own
# `to` address, null rows fall back to the address option
(
    spark.range(10)
    .select(
        F.col("id").cast("string").alias("body"),
        F.when(F.col("id") % 2 == 0, F.lit("route-even")).alias("to"),
    )
    .write.format("amqp")
    .option("endpoint", ep)
    .option("address", "route-fallback")
    .option("routeByTo", "true")
    .mode("append")
    .save()
)
for addr, want in (("route-even", 5), ("route-fallback", 5)):
    routed = (
        spark.read.format("amqp")
        .option("endpoint", ep).option("address", addr).load().count()
    )
    assert routed == want, f"{addr}: {routed} != {want}"

# STREAMING from Python: readStream over the source, AvailableNow drain
# into a memory sink — the micro-batch planner, offsets, and commit path
# all driven from pyspark
sq = (
    spark.readStream.format("amqp")
    .option("endpoint", ep)
    .option("address", "smoke")
    .load()
    .groupBy("subject")
    .agg(F.count(F.lit(1)).alias("cnt"))
    .writeStream.format("memory")
    .queryName("py_stream_smoke")
    .outputMode("complete")
    .trigger(availableNow=True)
    .start()
)
assert sq.awaitTermination(120), "streaming drain hung"
sgot = {
    r["subject"]: r["cnt"] for r in spark.table("py_stream_smoke").collect()
}
assert sgot == expected, f"streaming: {sgot} != {expected}"

# SQL DDL from Python: the catalog identity resolves through DSv2 and
# the stored OPTIONS reach the scan
spark.sql("DROP TABLE IF EXISTS amqp_py_tbl")
spark.sql(
    f"CREATE TABLE amqp_py_tbl USING amqp "
    f"OPTIONS (endpoint '{ep}', address 'smoke')"
)
sql_n = spark.sql("SELECT count(*) FROM amqp_py_tbl").collect()[0][0]
assert sql_n == n, sql_n
spark.sql("DROP TABLE amqp_py_tbl")

# TYPED property lift from Python: a long-lifted property takes a RANGE
# push (the bounds show in PushedFilters), and the column is a real long
(
    spark.range(n)
    .select(
        F.col("id").cast("string").alias("message_id"),
        (F.col("id") * 10).alias("price"),
        F.col("id").cast("string").alias("body"),
    )
    .write.format("amqp")
    .option("endpoint", ep)
    .option("address", "smoke-typed")
    .option("propertyColumns", "price:long")
    .mode("append")
    .save()
)
typed = (
    spark.read.format("amqp")
    .option("endpoint", ep)
    .option("address", "smoke-typed")
    .option("propertyColumns", "price:long")
    .load()
    .where((F.col("price") >= 100) & (F.col("price") < 300))
)
tplan = typed._jdf.queryExecution().executedPlan().toString()
assert "price >= 100" in tplan and "price <= 299" in tplan, tplan
assert typed.count() == 20, typed.count()

# MIN-ROWS admission from Python (minMessagesPerTrigger/maxTriggerDelay,
# Kafka ReadMinRows parity): every non-empty batch carries at least the
# floor — a trickle stream batches up instead of firing per row
(
    spark.range(n)
    .select(F.col("id").cast("string").alias("message_id"),
            F.col("id").cast("string").alias("body"))
    .write.format("amqp")
    .option("endpoint", ep).option("address", "smoke-minrows")
    .mode("append").save()
)
qmin = (
    spark.readStream.format("amqp")
    .option("endpoint", ep).option("address", "smoke-minrows")
    .option("minMessagesPerTrigger", 10)
    .option("maxTriggerDelay", "1s")
    .load()
    .select("message_id")
    .writeStream.format("memory")
    .queryName("py_minrows")
    .outputMode("append")
    .start()
)
qmin.processAllAvailable()
assert spark.table("py_minrows").count() == n
sizes = [p["numInputRows"] for p in qmin.recentProgress if p["numInputRows"] > 0]
assert sizes and all(s >= 10 for s in sizes), sizes
qmin.stop()

# SHARED SUBSCRIPTION from Python: two streaming consumers in one group
# work-share a queue; the union is exactly-once across the fleet
(
    spark.range(n)
    .select(F.col("id").cast("string").alias("message_id"),
            F.col("id").cast("string").alias("body"))
    .write.format("amqp")
    .option("endpoint", ep).option("address", "smoke-jobs")
    .mode("append").save()
)
workers = [
    (
        spark.readStream.format("amqp")
        .option("endpoint", ep).option("address", "smoke-jobs")
        .option("sharedGroup", "py-workers")
        .option("maxMessagesPerTrigger", 25)
        .load()
        .select("message_id")
        .writeStream.format("memory")
        .queryName(f"py_shared_{i}")
        .outputMode("append")
        .start()
    )
    for i in (1, 2)
]
for q in workers:
    q.processAllAvailable()
for q in workers:
    q.processAllAvailable()
union = [
    r["message_id"]
    for i in (1, 2)
    for r in spark.table(f"py_shared_{i}").collect()
]
assert len(union) == n and len(set(union)) == n, (len(union), len(set(union)))
for q in workers:
    q.stop()

spark.stop()
print(f"PYSPARK SMOKE OK: {n} messages sink->source round-trip, "
      "envelope schema + grouped agg + COUNT(*) pushdown + "
      "propertyColumns lift/pushdown (string AND typed long ranges) + "
      "addressPattern discovery + routeByTo per-row routing + "
      "streaming AvailableNow drain + SQL DDL + min-rows admission + "
      "shared-subscription work-sharing, all from Python")
sys.exit(0)
