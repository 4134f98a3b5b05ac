package graft.sources.odata

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class EdmxParserSpec extends AnyFunSuite {

  val v4Edmx: String =
    """<?xml version="1.0"?>
      |<edmx:Edmx xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx" Version="4.0">
      | <edmx:DataServices>
      |  <Schema xmlns="http://docs.oasis-open.org/odata/ns/edm" Namespace="NS">
      |   <EnumType Name="Color"><Member Name="Red"/><Member Name="Blue"/></EnumType>
      |   <ComplexType Name="Address">
      |     <Property Name="City" Type="Edm.String"/>
      |     <Property Name="Zip" Type="Edm.String" Nullable="false"/>
      |   </ComplexType>
      |   <EntityType Name="Product">
      |     <Key><PropertyRef Name="ID"/></Key>
      |     <Property Name="ID" Type="Edm.Int32" Nullable="false"/>
      |     <Property Name="Name" Type="Edm.String"/>
      |     <Property Name="Price" Type="Edm.Decimal" Precision="10" Scale="2"/>
      |     <Property Name="Weight" Type="Edm.Decimal" Precision="99" Scale="120"/>
      |     <Property Name="Tags" Type="Collection(Edm.String)"/>
      |     <Property Name="Home" Type="NS.Address"/>
      |     <Property Name="Hue" Type="NS.Color"/>
      |     <Property Name="When" Type="Edm.TimeOfDay"/>
      |     <NavigationProperty Name="Parts" Type="Collection(NS.Part)"/>
      |     <NavigationProperty Name="Maker" Type="NS.Maker"/>
      |   </EntityType>
      |   <EntityType Name="Part">
      |     <Key><PropertyRef Name="PID"/></Key>
      |     <Property Name="PID" Type="Edm.Int64" Nullable="false"/>
      |   </EntityType>
      |   <EntityType Name="Maker">
      |     <Key><PropertyRef Name="MID"/></Key>
      |     <Property Name="MID" Type="Edm.Guid" Nullable="false"/>
      |   </EntityType>
      |   <EntityContainer Name="C">
      |     <EntitySet Name="Products" EntityType="NS.Product"/>
      |     <EntitySet Name="Parts" EntityType="NS.Part"/>
      |   </EntityContainer>
      |  </Schema>
      | </edmx:DataServices>
      |</edmx:Edmx>""".stripMargin

  val v2Edmx: String =
    """<?xml version="1.0"?>
      |<edmx:Edmx xmlns:edmx="http://schemas.microsoft.com/ado/2007/06/edmx">
      | <edmx:DataServices m:DataServiceVersion="2.0"
      |    xmlns:m="http://schemas.microsoft.com/ado/2007/08/dataservices/metadata">
      |  <Schema xmlns="http://schemas.microsoft.com/ado/2008/09/edm" Namespace="NW">
      |   <EntityType Name="Customer">
      |     <Key><PropertyRef Name="CustomerID"/></Key>
      |     <Property Name="CustomerID" Type="Edm.String" Nullable="false"/>
      |     <Property Name="Since" Type="Edm.DateTime"/>
      |     <Property Name="Active" Type="Edm.Boolean"/>
      |     <NavigationProperty Name="Orders" Relationship="NW.FK_CO" FromRole="C" ToRole="O"/>
      |   </EntityType>
      |   <EntityType Name="Order">
      |     <Key><PropertyRef Name="OrderID"/></Key>
      |     <Property Name="OrderID" Type="Edm.Int32" Nullable="false"/>
      |   </EntityType>
      |   <Association Name="FK_CO">
      |     <End Role="C" Type="NW.Customer" Multiplicity="1"/>
      |     <End Role="O" Type="NW.Order" Multiplicity="*"/>
      |   </Association>
      |   <EntityContainer Name="E">
      |     <EntitySet Name="Customers" EntityType="NW.Customer"/>
      |     <EntitySet Name="Orders" EntityType="NW.Order"/>
      |   </EntityContainer>
      |  </Schema>
      | </edmx:DataServices>
      |</edmx:Edmx>""".stripMargin

  test("v4: version, sets, primitive and structural type mapping") {
    val m = EdmxParser.parse(v4Edmx)
    assert(m.version == "4.0")
    assert(m.entitySets.map(_.name) == Seq("Products", "Parts"))
    val s = m.schemaOfSet("Products")
    assert(s("ID").dataType == IntegerType && !s("ID").nullable)
    assert(s("Price").dataType == DecimalType(10, 2))
    // reference clamping: p>38 -> 38, s>p -> p (odata_edm.hpp:2111-2118)
    assert(s("Weight").dataType == DecimalType(38, 38))
    assert(s("Tags").dataType == ArrayType(StringType))
    assert(s("Home").dataType.isInstanceOf[StructType])
    assert(s("Home").dataType.asInstanceOf[StructType]("Zip").nullable == false)
    assert(s("Hue").dataType == StringType) // enum -> string
    assert(s("When").dataType == StringType) // no TIME type in Spark
  }

  test("v4: nav property expansion -> struct / array<struct> columns") {
    val m = EdmxParser.parse(v4Edmx)
    val s = m.schemaWithExpand("Products", Seq("Parts", "Maker"))
    assert(s("Parts").dataType.isInstanceOf[ArrayType])
    assert(s("Parts").dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType]("PID").dataType == LongType)
    assert(s("Maker").dataType.isInstanceOf[StructType])
  }

  test("v2: version detection + association multiplicity") {
    val m = EdmxParser.parse(v2Edmx)
    assert(m.version == "2.0")
    val et = m.entityTypes("Customer")
    assert(et.properties.find(_.name == "Since").get.edmType == "Edm.DateTime")
    val nav = et.navProperties.head
    assert(nav.name == "Orders" && nav.toMany && nav.targetType == "Order")
    val s = m.schemaWithExpand("Customers", Seq("Orders"))
    assert(s("Orders").dataType == ArrayType(m.schemaOf("Order")))
  }

  test("unknown EDM types fall back to string, like the reference") {
    assert(EdmTypes.primitive("Edm.Mystery") == StringType)
    assert(EdmTypes.primitive("Edm.GeographyPoint") == StringType)
  }
}
