package graft.operators

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the CDC fold: random change logs (key collisions,
  * equal-seq conflicts, late-arriving lower seqs, delete-of-absent,
  * all-delete batches) must fold identically through
  * [[Layout.mergeChanges]] and the [[graft.streaming.UpsertSink]]
  * apply→compact→vacuum pipeline as through a naive in-memory reference
  * of the documented semantics: per batch the winner per key is the MAX
  * `(seq, op, payload)` tuple (nulls low), and the winner REPLACES the
  * snapshot state unconditionally (sequential-fold semantics — a later
  * batch wins even with a lower seq, by design).
  * (Raw scalacheck Gen sampling, the GeomPropertySpec idiom.) */
class CdcPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(1337L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private case class Chg(key: Long, seq: Long, op: String, v: Option[String])

  // few keys + few seqs force collisions, in-batch conflicts, and
  // equal-(seq, op) payload ties; D rows carry a null payload
  private val batchGen: Gen[List[Chg]] = for {
    n <- Gen.chooseNum(1, 14)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 8L)
      s <- Gen.chooseNum(1L, 5L)
      op <- Gen.oneOf("I", "U", "D")
      v <- Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    } yield Chg(k, s, op, if (op == "D") None else Some(v)))
  } yield rows

  /** The documented winner rule: max (seq, op, payload), null payload
    * low. Ops are 'U' > 'I' > 'D' in string order, same as the struct. */
  private def winner(rows: Seq[Chg]): Map[Long, Chg] =
    rows.groupBy(_.key).view
      .mapValues(_.maxBy(c => (c.seq, c.op, c.v.getOrElse("")))).toMap

  private def fold(state: Map[Long, String], batch: Seq[Chg]): Map[Long, String] =
    winner(batch).foldLeft(state) { case (st, (k, c)) =>
      if (c.op == "D") st - k else st + (k -> c.v.get)
    }

  private def toDf(b: Seq[Chg]) =
    b.map(c => (c.key, c.seq, c.op, c.v.orNull)).toDF("key", "seq", "op", "v")

  test("mergeChanges folds any random 3-batch log like the reference") {
    forAll(Gen.listOfN(3, batchGen), n = 25) { batches =>
      var df = Seq.empty[(Long, String)].toDF("key", "v")
      var ref = Map.empty[Long, String]
      batches.foreach { b =>
        df = Layout.mergeChanges(df, toDf(b), "key", "seq", "op", Seq("v"))
        ref = fold(ref, b)
      }
      val got = df.as[(Long, String)].collect().toMap
      assert(got === ref, s"log: $batches")
    }
  }

  test("history state machine: random apply/compact/vacuum interleavings " +
      "keep exactly the modeled versions readable, each with the modeled " +
      "rows") {
    val sink = graft.streaming.UpsertSink
    sealed trait Op
    case class Apply(b: List[Chg]) extends Op
    case class Compact(maxDirs: Int) extends Op
    case class Vacuum(retain: Int) extends Op
    // applies dominate; compactions vary the dir layout under the same
    // state; vacuums vary retention — the newest, least-tested invariant
    // surface is exactly their interaction with time travel
    val opGen: Gen[Op] = Gen.frequency(
      5 -> batchGen.map(Apply.apply),
      2 -> Gen.chooseNum(1, 3).map(Compact.apply),
      2 -> Gen.chooseNum(1, 3).map(Vacuum.apply))
    forAll(Gen.listOfN(8, opGen), n = 25) { ops =>
      val path = java.nio.file.Files.createTempDirectory("cdc-hist").toString
      var nextId = 0L
      // model: committed versions still readable, in commit order
      var history = Vector.empty[(Long, Map[Long, String])]
      ops.foreach {
        case Apply(b) =>
          val prev = history.lastOption.map(_._2).getOrElse(Map.empty[Long, String])
          assert(sink.applyBatch(spark, path, "key", "seq", "op", Seq("v"), 4)(
            toDf(b), nextId))
          history :+= (nextId -> fold(prev, b))
          nextId += 1
        case Compact(m) if history.nonEmpty =>
          sink.compactSnapshot(spark, path, m) // layout only: model unchanged
        case Vacuum(r) if history.nonEmpty =>
          sink.vacuum(path, r)
          history = history.takeRight(r) // newest r versions survive
        case _ => () // maintenance before the first commit: nothing to do
      }
      if (history.nonEmpty) {
        assert(sink.snapshotVersions(path) == history.map(_._1),
          s"versions diverged; ops: $ops")
        history.foreach { case (id, want) =>
          val got = sink.readSnapshotAt(spark, path, id)
            .as[(Long, String)].collect().toMap
          assert(got === want, s"version $id diverged; ops: $ops")
        }
        // every vacuumed-away version fails with the CLEAR vacuum error,
        // never a silent empty or a neighboring version's rows
        if (history.head._1 > 0) {
          val e = intercept[IllegalStateException] {
            sink.readSnapshotAt(spark, path, history.head._1 - 1)
          }
          assert(e.getMessage.contains("vacuum"), e.getMessage)
        }
        // CHANGEFEED invariant over the surviving history: for every
        // consecutive pair and the full span, the emitted feed IS the
        // model diff — exact change classification, post-image values,
        // nothing extra from repointed-but-equal buckets
        val pairs = history.map(_._1).sliding(2).filter(_.size == 2)
          .map(p => (p(0), p(1))).toSeq :+ (history.head._1, history.last._1)
        pairs.distinct.foreach { case (i, j) =>
          val (wi, wj) = (history.find(_._1 == i).get._2,
            history.find(_._1 == j).get._2)
          val want =
            (wj.keySet -- wi.keySet).map(k => (k, "insert", wj(k))) ++
            (wi.keySet -- wj.keySet).map(k => (k, "delete", null: String)) ++
            (wi.keySet & wj.keySet).filter(k => wi(k) != wj(k))
              .map(k => (k, "update", wj(k)))
          val got = sink.readChanges(spark, path, i, j)
            .as[(Long, String, String)].collect().toSet
          assert(got === want, s"changefeed $i->$j diverged; ops: $ops")
        }
      }
    }
  }

  test("matview property: random apply/compact/catchUp schedules keep " +
      "the struct-keyed view equal to recomputation over the base") {
    val sink = graft.streaming.UpsertSink
    case class C2(key: Long, seq: Long, op: String,
                  g: Option[String], p: Option[Long], x: Option[Long])
    val batchGen2: Gen[List[C2]] = for {
      n <- Gen.chooseNum(1, 12)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 8L)
        s <- Gen.chooseNum(1L, 5L)
        op <- Gen.oneOf("I", "U", "D")
        g <- Gen.oneOf("a", "b", "c")
        p <- Gen.chooseNum(0L, 1L)
        // negative addends (sums may go < 0) AND occasional NULLs on
        // LIVE rows (SQL: SUM ignores them; all-NULL groups sum NULL)
        x <- Gen.option(Gen.chooseNum(-5L, 20L))
      } yield C2(k, s, op,
        if (op == "D") None else Some(g),
        if (op == "D") None else Some(p),
        if (op == "D") None else x))
    } yield rows
    def toDf2(b: Seq[C2]) = b.map(c => (c.key, c.seq, c.op, c.g.orNull,
        c.p.map(java.lang.Long.valueOf).orNull,
        c.x.map(java.lang.Long.valueOf).orNull))
      .toDF("key", "seq", "op", "g", "p", "x")
    sealed trait Op2
    case class Apply2(b: List[C2]) extends Op2
    case class Compact2(m: Int) extends Op2
    case object CatchUp2 extends Op2
    // catch-ups fire mid-history (composed multi-version diffs) and
    // compactions repoint layout between them — the view must never see
    // either as a state change
    val opGen: Gen[Op2] = Gen.frequency(
      5 -> batchGen2.map(Apply2.apply),
      2 -> Gen.chooseNum(1, 3).map(Compact2.apply),
      3 -> Gen.const(CatchUp2))
    forAll(Gen.listOfN(8, opGen), n = 12) { ops =>
      val root = java.nio.file.Files.createTempDirectory("mv-prop").toString
      val base = s"$root/base"; val view = s"$root/view"
      var nextId = 0L
      def catchUp(): Unit = if (nextId > 0)
        graft.streaming.MatView.catchUp(spark, base, view,
          Seq("g", "p"), Seq("x"), 4)
      ops.foreach {
        case Apply2(b) =>
          assert(sink.applyBatch(spark, base, "key", "seq", "op",
            Seq("g", "p", "x"), 4)(toDf2(b), nextId))
          nextId += 1
        case Compact2(m) if nextId > 0 => sink.compactSnapshot(spark, base, m)
        case CatchUp2 => catchUp()
        case _ => ()
      }
      if (nextId > 0) {
        catchUp()
        val want = sink.readSnapshot(spark, base).groupBy("g", "p")
          .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("cnt"),
            org.apache.spark.sql.functions.sum("x").as("x"))
          .as[(String, Long, Long, Option[Long])].collect().sorted.toSeq
        // a log whose every batch nets to nothing (deletes of absent
        // keys) never creates the view store — the model agrees: empty
        val got =
          if (sink.readManifest(view).isEmpty) Seq.empty
          else graft.streaming.MatView.readView(spark, view)
            .select("g", "p", "cnt", "x")
            .as[(String, Long, Long, Option[Long])].collect().sorted.toSeq
        assert(got === want, s"ops: $ops")
      }
    }
  }

  test("UpsertSink apply -> compact -> vacuum folds any random 6-batch " +
      "log like the reference, end to end through the store") {
    val sink = graft.streaming.UpsertSink
    forAll(Gen.listOfN(6, batchGen), n = 3) { batches =>
      val path = java.nio.file.Files.createTempDirectory("cdc-prop").toString
      var ref = Map.empty[Long, String]
      batches.zipWithIndex.foreach { case (b, i) =>
        sink.applyBatch(spark, path, "key", "seq", "op", Seq("v"), 4)(
          toDf(b), i.toLong)
        ref = fold(ref, b)
      }
      sink.compactSnapshot(spark, path)
      sink.vacuum(path)
      val got = sink.readSnapshot(spark, path)
        .as[(Long, String)].collect().toMap
      assert(got === ref, s"log: $batches")
    }
  }
}
