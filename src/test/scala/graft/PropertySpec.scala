package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks over the engine's PURE decision math — the
  * helpers whose correctness is an algebraic claim, not a data claim:
  * C15's LSH design rule, A32's sampling decision, B75's packed-max
  * encoding, A36's schema diff. No SparkSession: these laws hold for
  * every input, so they get generators, not examples.
  */
object PropertySpec extends Properties("graft.pure") {

  import graft.operators.Dedup

  // ── C15: LSH banding ──

  private val lanes = Gen.oneOf(16, 32, 64, 128, 256)
  private val target = Gen.choose(0.05, 0.95)

  property("chooseBands splits the exact lane budget") =
    forAll(lanes, target) { (n, t) =>
      val (b, r) = Dedup.chooseBands(n, t)
      b > 0 && r > 0 && b * r == n
    }

  property("chooseBands is optimal among divisor splits") =
    forAll(lanes, target) { (n, t) =>
      val (b, r) = Dedup.chooseBands(n, t)
      val best = math.abs(Dedup.lshThreshold(b, r) - t)
      (1 to n).filter(n % _ == 0).forall { b2 =>
        math.abs(Dedup.lshThreshold(b2, n / b2) - t) >= best - 1e-12
      }
    }

  property("collision probability is monotone in similarity") =
    forAll(lanes, Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (n, s1, s2) =>
      val (b, r) = Dedup.chooseBands(n, 0.5)
      val (lo, hi) = if (s1 <= s2) (s1, s2) else (s2, s1)
      Dedup.lshCollisionProb(lo, b, r) <= Dedup.lshCollisionProb(hi, b, r) + 1e-12
    }

  // ── A32: row-group sampling decision ──

  private val fileGen = Gen.alphaNumStr.suchThat(_.nonEmpty).map("/t/" + _)

  property("sample and complement partition every (file, row group)") =
    forAll(fileGen, Gen.choose(0, 500), Gen.choose(0.01, 0.99), Gen.long) {
      (f, rg, frac, seed) =>
        import graft.sources.v2.GraftV2.inSample
        val in = inSample(f, rg, Some((frac, seed, false)))
        val comp = inSample(f, rg, Some((frac, seed, true)))
        (in != comp) && inSample(f, rg, Some((1.0, seed, false))) &&
          inSample(f, rg, None)
    }

  property("sampled fraction concentrates near the request") =
    forAll(Gen.choose(0.2, 0.8), Gen.choose(0L, 1000L)) { (frac, seed) =>
      import graft.sources.v2.GraftV2.inSample
      val n = 4000
      val hits = (0 until n).count(i =>
        inSample(s"/t/f${i % 40}", i / 40, Some((frac, seed, false))))
      math.abs(hits.toDouble / n - frac) < 0.12
    }

  // ── B75: packed-max forward-fill encoding ──

  private val Pack = 10000000000000L

  property("pack decodes its payload and orders by day first") =
    forAll(Gen.choose(0L, 5000L), Gen.choose(0L, Pack - 1),
           Gen.choose(0L, 5000L), Gen.choose(0L, Pack - 1)) { (d1, c1, d2, c2) =>
      val p1 = d1 * Pack + c1
      val p2 = d2 * Pack + c2
      (p1 % Pack == c1) && (p2 % Pack == c2) &&
        ((d1 < d2) == (p1 < p2) || d1 == d2)
    }

  // ── A36: schema diff laws ──

  import org.apache.spark.sql.types._
  import graft.sources.GraftSchemaPolicy

  private val dtGen = Gen.oneOf[DataType](IntegerType, LongType, DoubleType,
    StringType, DecimalType(10, 2))
  private val fieldGen = for {
    n <- Gen.oneOf("a", "b", "c", "d", "e")
    t <- dtGen
    nb <- Gen.oneOf(true, false)
  } yield StructField(n, t, nb)
  private val schemaGen = Gen.listOfN(4, fieldGen)
    .map(fs => StructType(fs.groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)))

  property("diff of a schema with itself is empty") =
    forAll(schemaGen)(s => GraftSchemaPolicy.diff(s, s).isEmpty)

  property("drops one way are adds the other way, by name") =
    forAll(schemaGen, schemaGen) { (a, b) =>
      val ab = GraftSchemaPolicy.diff(a, b)
      val ba = GraftSchemaPolicy.diff(b, a)
      val dropped = ab.collect { case GraftSchemaPolicy.DroppedColumn(n) => n }.toSet
      val addedBack = ba.collect { case GraftSchemaPolicy.AddedColumn(n, _) => n }.toSet
      dropped == addedBack
    }

  property("adding one nullable column is the lone compatible change") =
    forAll(schemaGen, dtGen) { (s, t) =>
      val extra = StructField("zz_new", t, nullable = true)
      val changes = GraftSchemaPolicy.diff(s, StructType(s.fields :+ extra))
      changes == Seq(GraftSchemaPolicy.AddedColumn("zz_new", nullable = true)) &&
        !changes.head.breaking
    }

  property("every type change is breaking on parquet tables") =
    forAll(schemaGen, dtGen) { (s, t) =>
      s.fields.isEmpty || {
        val f = s.fields.head
        f.dataType == t || {
          val changed = StructType(s.fields.map(x =>
            if (x.name == f.name) x.copy(dataType = t) else x))
          GraftSchemaPolicy.diff(s, changed).exists(c =>
            c.breaking && (c.isInstanceOf[GraftSchemaPolicy.WidenedType] ||
              c.isInstanceOf[GraftSchemaPolicy.RetypedColumn]))
        }
      }
    }
}
