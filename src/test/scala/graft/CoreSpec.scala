package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SchemaRegistry
import graft.model._
import graft.types.TypeMapper

class TypeMapperSpec extends AnyFunSuite {
  val m = TypeMapper.default

  test("6-row mapping resolves, case-insensitive on system") {
    assert(m.targetName("Priority", "Edm.String") == "VARCHAR")
    assert(m.targetName("priority", "Edm.Decimal") == "NUMERIC")
    assert(m.targetName("Priority", "Edm.DateTimeOffset") == "TIMESTAMP")
    assert(m.targetName("Priority", "Edm.Int64") == "BIGINT")
    assert(m.targetName("SBO", "SBO_text") == "VARCHAR(255)")
    assert(m.targetName("SBO", "SBO_num") == "VARCHAR(255)")
  }

  test("unmapped type fails loudly by default, falls back when lenient") {
    intercept[IllegalArgumentException](m.targetName("Priority", "Edm.Guid"))
    assert(TypeMapper(lenient = true).targetName("Priority", "Edm.Guid") == "VARCHAR")
  }

  test("PK fields are StringType regardless of source type") {
    val pk = FieldMeta("ORD", "Edm.Int64", keyFlag = true)
    assert(m.sparkType("Priority", pk) == StringType)
    assert(m.sparkType("Priority", pk.copy(keyFlag = false)) == LongType)
  }

  test("resolve rewrites targetDataType incl. PK→VARCHAR") {
    val meta = EntityMeta("ORDERS", "Priority", fields = Seq(
      FieldMeta("ORDNAME", "Edm.String", keyFlag = true),
      FieldMeta("ORD", "Edm.Int64")))
    val r = m.resolve(meta)
    assert(r.fields.map(_.targetDataType) == Seq(Some("VARCHAR"), Some("BIGINT")))
  }
}

class SchemaRegistrySpec extends AnyFunSuite {

  val ordersMeta = EntityMeta("ORDERS", "Priority", "Orders",
    fields = Seq(
      FieldMeta("ORDNAME", "Edm.String", keyFlag = true),
      FieldMeta("CURDATE", "Edm.DateTimeOffset"),
      FieldMeta("QPRICE", "Edm.Decimal"),
      FieldMeta("ORD", "Edm.Int64")),
    entityPk = Seq("ORDNAME"))

  val reg = new SchemaRegistry()

  test("entity schema: lowercased names, mapped types, PK non-nullable string") {
    val s = reg.schemaOf(ordersMeta)
    assert(s.fieldNames.toSeq == Seq("ordname", "curdate", "qprice", "ord"))
    assert(s("ordname").dataType == StringType && !s("ordname").nullable)
    assert(s("curdate").dataType == TimestampType)
    assert(s("qprice").dataType == DecimalType(38, 18))
    assert(s("ord").dataType == LongType)
  }

  test("parent schema drops subform cols and appends audit cols") {
    val withSub = ordersMeta.copy(fields =
      ordersMeta.fields :+ FieldMeta("ORDERITEMS_SUBFORM", "Edm.String"))
    val s = reg.parentSchema(withSub, Seq("ORDERITEMS"))
    assert(!s.fieldNames.contains("orderitems_subform"))
    assert(s.fieldNames.takeRight(2).toSeq ==
      Seq("extractionid", "extractiontimestamputc"))
  }

  test("child schema: propagated parent PK + own fields + audit") {
    val child = EntityMeta("ORDERITEMS", "Priority", fields = Seq(
      FieldMeta("LINE", "Edm.Int64"), FieldMeta("PARTNAME", "Edm.String")))
    val s = reg.childSchema(child, ordersMeta)
    assert(s.fieldNames.toSeq ==
      Seq("ordname", "line", "partname", "extractionid", "extractiontimestamputc"))
    assert(s("ordname").dataType == StringType)
  }

  val xml =
    """<edmx:Edmx xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
      |<edmx:DataServices><Schema xmlns="http://docs.oasis-open.org/odata/ns/edm">
      |  <EntityType Name="ORDERS">
      |    <Key><PropertyRef Name="ORDNAME"/></Key>
      |    <Property Name="ORDNAME" Type="Edm.String" Nullable="false"/>
      |    <Property Name="CURDATE" Type="Edm.DateTimeOffset"/>
      |    <Annotation Term="Priority.OData.Description" String="Orders"/>
      |  </EntityType>
      |  <EntityType Name="COMPOSITE">
      |    <Key><PropertyRef Name="A"/><PropertyRef Name="B"/></Key>
      |    <Property Name="A" Type="Edm.String"/>
      |    <Property Name="B" Type="Edm.Int64"/>
      |  </EntityType>
      |  <EntityType Name="SINGLEFIELD">
      |    <Property Name="ONLY" Type="Edm.String"/>
      |  </EntityType>
      |</Schema></edmx:DataServices></edmx:Edmx>""".stripMargin

  test("$metadata XML parse: keys single/composite/absent, single-field entity") {
    val metas = SchemaRegistry.parseMetadataXml(xml, "Priority")
    val byId = metas.map(m => m.id -> m).toMap
    assert(byId("ORDERS").entityPk == Seq("ORDNAME"))
    assert(byId("ORDERS").desc == "Orders")
    assert(byId("ORDERS").fields.head.keyFlag)
    assert(byId("COMPOSITE").entityPk == Seq("A", "B"))
    assert(byId("SINGLEFIELD").entityPk.isEmpty)
    assert(byId("SINGLEFIELD").fields.map(_.fieldName) == Seq("ONLY"))
  }

  test("EntityPk derivation invariant matches KeyFlag'd fields") {
    val metas = SchemaRegistry.parseMetadataXml(xml, "Priority")
    metas.foreach(m => assert(m.entityPk == m.derivedPk))
  }

  test("catalog persists: a NEW registry instance serves the same StructTypes") {
    val path =
      s"${java.nio.file.Files.createTempDirectory("catalog")}/catalog.json"
    val r1 = new SchemaRegistry(persistPath = Some(path))
    r1.putAll(SchemaRegistry.parseMetadataXml(xml, "Priority"))

    // a fresh instance boots from disk — no $metadata re-parse
    val r2 = new SchemaRegistry(persistPath = Some(path))
    assert(r2.list == r1.list)
    assert(r2.schemaOf(r2.get("ORDERS").get) == r1.schemaOf(r1.get("ORDERS").get))
    assert(r2.get("COMPOSITE").get.entityPk == Seq("A", "B"))

    // single-entity update and drop are durable too
    r2.put(r2.get("ORDERS").get.copy(desc = "updated"))
    assert(new SchemaRegistry(persistPath = Some(path))
      .get("ORDERS").get.desc == "updated")
    r2.drop()
    assert(new SchemaRegistry(persistPath = Some(path)).list.isEmpty)
    // no stray temp files from the atomic-rename protocol
    import scala.jdk.CollectionConverters._
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(path).getParent)
      .iterator().asScala.forall(!_.getFileName.toString.contains(".tmp")))
  }
}
