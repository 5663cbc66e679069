package graft

/** Driver-side simulation of the batched BPE rule (no Spark): reports
  * per-round acceptance and what limited it. Throwaway. */
object ScratchBpeSim {
  def main(args: Array[String]): Unit = {
    val rng = new java.util.Random(7)
    // zipf word draw, base-26 spelling, same shape as the probe
    def spell(r: Long): String = {
      val rng2 = new java.util.Random(r * 2654435761L)
      val len = 2 + rng2.nextInt(6)
      (0 until len).map(_ => ('a' + rng2.nextInt(26)).toChar).mkString
    }
    val counts = new scala.collection.mutable.HashMap[String, Long]
    for (_ <- 0 until 5000000) {
      val u = rng.nextDouble()
      val rank = math.pow(50000.0, u).toLong
      val w = spell(rank)
      counts(w) = counts.getOrElse(w, 0L) + 1
    }
    var words: Array[(Array[String], Long)] =
      counts.toArray.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val ord: Ordering[((String, String), Long)] =
      Ordering.by { case ((a, b), c) => (-c, a, b) }
    var merged = 0
    var rounds = 0
    var stopTouched = 0
    var stopCap = 0
    val accSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (merged < 1000) {
      rounds += 1
      val pc = new scala.collection.mutable.HashMap[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1)); pc(k) = pc.getOrElse(k, 0L) + c; i += 1
        }
      }
      val fetch = 4096
      val top = pc.toSeq.sorted(ord).take(fetch)
      var cap = if (top.length == fetch) top.last._2 else 0L
      val touched = scala.collection.mutable.HashSet.empty[String]
      val scanned = scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
      var i = 0
      var stop = false
      var why = "exhausted"
      while (i < top.length && !stop) {
        val item @ ((l, r), c) = top(i)
        if (touched(l) || touched(r)) { cap = math.max(cap, c); stop = true; why = "touched" }
        else if (c < 2) { stop = true; why = "min" }
        else { scanned += item; touched += l; touched += r; touched += (l + r) }
        i += 1
      }
      val capCut = scanned.lastOption.exists(_._2 <= cap)
      val accepted0 = scanned.takeWhile(_._2 > cap).map(_._1)
      val accepted = if (accepted0.nonEmpty) accepted0 else Seq(top.head._1)
      if (why == "touched" && !capCut) stopTouched += 1 else stopCap += 1
      accSizes += accepted.length
      if (rounds <= 12 || rounds % 25 == 0)
        println(f"round $rounds%4d acc=${accepted.length}%4d scanStop=$why capCut=$capCut " +
          f"scanLen=${scanned.length}%4d c1=${top.head._2} cap=$cap")
      merged += accepted.length
      words = words.map { case (syms, wc) =>
        (accepted.foldLeft(syms) { case (s, (l, r)) => graft.text.BpeScratchAccess.applyMerge(s, l, r) }, wc)
      }
    }
    println(s"TOTAL rounds=$rounds merged=$merged stopTouched=$stopTouched stopCap=$stopCap " +
      s"meanAcc=${accSizes.sum.toDouble / accSizes.length}")
  }
}
