package graft

/** Single-threaded heap pre-fault for the driver-gate mains.
  *
  * On this environment's kernel, FIRST-TOUCH page faults contend
  * catastrophically when many threads fault concurrently: JVM parallel
  * pretouch of a 16g heap burns 40+ CPU-minutes of kernel time
  * (measured — see build.sbt), and the same storm hits mid-query when 32
  * executor threads first touch fresh heap regions (measured: a 7s
  * aggregation inflated to 191s). One thread touching pages costs only
  * ~1.7s/GiB. So: fault the heap in ONCE, single-threaded, before any
  * parallel work. The buffers are dropped afterwards; the pages stay
  * mapped for the process lifetime (Xms=Xmx, so G1 never uncommits).
  */
object HeapPrefault {
  def prefault(fraction: Double = 0.7): Unit = {
    val t0 = System.nanoTime()
    val chunk = 64 << 20
    val n = ((Runtime.getRuntime.maxMemory * fraction) / chunk).toInt
    val keep = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val a = new Array[Byte](chunk)
      var j = 0
      while (j < chunk) { a(j) = 1; j += 4096 }
      keep(i) = a
      i += 1
    }
    java.util.Arrays.fill(keep.asInstanceOf[Array[AnyRef]], null)
    System.gc() // reclaim the humongous regions before real work starts
    System.err.println(
      f"[prefault] ${n * 64L / 1024.0}%.1f GiB in ${(System.nanoTime() - t0) / 1e9}%.1fs")
  }
}
