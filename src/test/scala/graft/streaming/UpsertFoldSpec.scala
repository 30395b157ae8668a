package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential pin for the latest-wins fold (the CentroidRankSpec
  * discipline): `StreamingUpsert.fold` replaced a sort-and-fold with a
  * single maxBy; this spec reimplements the REPLACED formulation
  * verbatim and asserts equality over generated batches dense in
  * same-microsecond ties (the event_id tie-break) and stale rows (the
  * no-emission path), plus empty batches. Plain Scala — no Spark
  * session, the fold is driver-free logic shared by both twins. */
class UpsertFoldSpec extends AnyFunSuite {

  /** The replaced sort-and-fold, verbatim semantics: apply rows in
    * (us, event_id) order, track whether state changed. */
  private def reference(prev: Option[UpsertState],
      rows: Seq[AttrEvent]): Option[UpsertState] = {
    val ordered = rows.sortBy(r => (r.us, r.event_id))
    var cur = prev
    var changed = false
    ordered.foreach { r =>
      val newer = cur.forall(c =>
        r.us > c.us || (r.us == c.us && r.event_id > c.event_id))
      if (newer) {
        cur = Some(UpsertState(r.event_id, r.event_type, r.us, r.cents))
        changed = true
      }
    }
    if (changed) cur else None
  }

  private val eventGen: Gen[AttrEvent] = for {
    // tiny domains on purpose: collisions in us AND event_id are the
    // interesting cases
    us <- Gen.choose(0L, 8L)
    id <- Gen.choose(0L, 8L)
    tpe <- Gen.oneOf("click", "view", null: String)
    cents <- Gen.choose(0L, 100L)
  } yield AttrEvent(1L, id, tpe, us, cents,
    new java.sql.Timestamp(us / 1000L))

  private val caseGen: Gen[(Option[UpsertState], List[AttrEvent])] = for {
    prev <- Gen.option(eventGen.map(e =>
      UpsertState(e.event_id, e.event_type, e.us, e.cents)))
    rows <- Gen.listOfN(6, eventGen).flatMap(l =>
      Gen.choose(0, 6).map(l.take))
  } yield (prev, rows)

  test("fold == the replaced sort-and-fold on tie-dense generated batches") {
    val cases = Gen.listOfN(2000, caseGen)
      .pureApply(Gen.Parameters.default, Seed(7L))
    cases.foreach { case (prev, rows) =>
      val got = StreamingUpsert.fold(prev, rows.iterator)
      val want = reference(prev, rows)
      assert(got === want, s"prev=$prev rows=$rows")
    }
  }

  test("empty batch folds to None for any prior state") {
    assert(StreamingUpsert.fold(None, Iterator.empty) === None)
    assert(StreamingUpsert.fold(
      Some(UpsertState(1L, "x", 5L, 10L)), Iterator.empty) === None)
  }
}
