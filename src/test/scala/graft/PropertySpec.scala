package graft

import java.sql.Timestamp
import java.time.ZoneId

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.run.RefreshJob
import graft.types.TypeMapper
import graft.xform.Normalizer

/** Property-based checks (SURVEY.md §5 item 4): explode⊕reassemble
  * identity, watermark format order-preservation and roundtrip, type
  * mapper totality. Raw ScalaCheck (no scalatest bridge in the offline
  * cache) driven through Test.check. */
class PropertySpec extends SparkSpec {

  private def check(label: String, p: Prop, min: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val tsGen: Gen[Timestamp] =
    Gen.choose(0L, 4102444800L).map(s => Timestamp.from(java.time.Instant.ofEpochSecond(s)))

  test("watermark format preserves order and roundtrips at second granularity") {
    val utc = ZoneId.of("UTC")
    check("order-preserving", Prop.forAll(tsGen, tsGen) { (a, b) =>
      val (fa, fb) = (RefreshJob.formatTs(a, utc), RefreshJob.formatTs(b, utc))
      (a.compareTo(b) <= 0) == (fa.compareTo(fb) <= 0)
    })
    check("roundtrip", Prop.forAll(tsGen) { t =>
      RefreshJob.parseTs(RefreshJob.formatTs(t, utc), utc) == t
    })
  }

  test("type mapper is total over the mapping table; strict mode rejects unknowns") {
    val known = Gen.oneOf(TypeMapper.defaultMappings)
    check("mapped", Prop.forAll(known) { m =>
      TypeMapper.default.sparkType(m.sourceSystem,
        graft.model.FieldMeta("f", m.sourceDataType)) != null
    })
    val unknown = Gen.alphaStr.suchThat(s =>
      s.nonEmpty && !TypeMapper.defaultMappings.exists(_.sourceDataType == s))
    check("unknown-strict-throws", Prop.forAll(unknown) { s =>
      Prop.throws(classOf[IllegalArgumentException]) {
        TypeMapper.default.sparkType("priority", graft.model.FieldMeta("f", s))
      }
    }, min = 20)
    check("unknown-lenient-varchar", Prop.forAll(unknown) { s =>
      TypeMapper(lenient = true).sparkType("priority",
        graft.model.FieldMeta("f", s)) == StringType
    }, min = 20)
  }

  test("explode then reassemble is the identity on nested frames") {
    val childGen = Gen.listOfN(3, Gen.choose(1, 999))
    val parentsGen: Gen[List[(String, List[Int])]] = for {
      n <- Gen.choose(1, 5)
      ps <- Gen.listOfN(n, for {
        pk <- Gen.identifier.map(_.take(8))
        kids <- Gen.choose(0, 4).flatMap(k => Gen.listOfN(k, Gen.choose(1, 999)))
      } yield (pk, kids))
      if ps.map(_._1).distinct.size == ps.size // unique PKs
    } yield ps

    val schema = StructType(Seq(
      StructField("PK", StringType),
      StructField("KIDS_SUBFORM", ArrayType(StructType(Seq(
        StructField("V", IntegerType)))))))

    check("identity", Prop.forAll(parentsGen) { parents =>
      val rows = parents.map { case (pk, kids) =>
        Row(pk, kids.map(Row(_)))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val n = Normalizer.normalize("E", df, Seq("PK"), "r",
        Timestamp.valueOf("2026-01-01 00:00:00"))
      val reassembled = n.children.get("kids") match {
        case None => Map.empty[String, List[Int]] // no non-empty subforms
        case Some(child) => child.collect()
          .groupBy(_.getAs[String]("pk"))
          .view.mapValues(_.map(_.getAs[Int]("v")).toList.sorted).toMap
      }
      val expected = parents.filter(_._2.nonEmpty)
        .map { case (pk, kids) => pk -> kids.sorted }.toMap
      reassembled == expected
    }, min = 8)
  }
}
