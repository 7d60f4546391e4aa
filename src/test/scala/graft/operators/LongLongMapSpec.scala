package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the primitive open-addressing long→long map that
  * backs the single-task union-find (ConnectedComponents.componentsLocal):
  * any op sequence must agree with a boxed reference HashMap, including
  * the Long.MinValue sentinel side-slot and growth across doublings.
  * Deterministic seeded generation — failures reproduce exactly.
  */
class LongLongMapSpec extends AnyFunSuite {

  private def randKey(rnd: scala.util.Random): Long = rnd.nextInt(4) match {
    case 0 => rnd.between(-100L, 101L) // collision-heavy small range
    case 1 => rnd.nextLong()
    case 2 => Long.MinValue            // the sentinel key
    case _ => Long.MaxValue
  }

  test("random op sequences agree with a reference HashMap") {
    (1 to 50).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val m = new ConnectedComponents.LongLongMap(16)
      val ref = scala.collection.mutable.HashMap.empty[Long, Long]
      (1 to 500).foreach { _ =>
        val k = randKey(rnd); val v = rnd.between(-1000L, 1000L)
        if (rnd.nextBoolean()) { m.put(k, v); ref(k) = v }
        else { m.putIfAbsent(k, v); if (!ref.contains(k)) ref(k) = v }
      }
      ref.foreach { case (k, v) => assert(m(k) === v, s"seed=$seed key=$k") }
      assert(m.keysArray.sorted.toSeq === ref.keys.toSeq.sorted, s"seed=$seed")
    }
  }

  test("growth: 200k sequential keys all retrievable") {
    val m = new ConnectedComponents.LongLongMap(16)
    (0L until 200000L).foreach(k => m.put(k, k * 2))
    (0L until 200000L).foreach(k => assert(m(k) === k * 2))
    assert(m.keysArray.length === 200000)
  }
}
