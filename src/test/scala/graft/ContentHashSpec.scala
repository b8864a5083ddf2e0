package graft

import org.apache.spark.sql.functions._

/** ADVICE r9: the spill/cluster harness hash must be invariant to map
  * ENTRY ORDER (Spark does not canonicalize it, and the legacy
  * allowHashOnMapType hash it replaced depends on it) while still
  * catching every value change — including the null-struct vs
  * struct-of-nulls distinction the canonicalizer could erase.
  */
class ContentHashSpec extends SparkSpec {
  import spark.implicits._

  test("map entry order does not change the hash; map content does") {
    val a = Seq(1, 2).toDF("id")
      .select($"id", map(lit("x"), $"id", lit("y"), $"id" * 2).as("m"))
    val b = Seq(1, 2).toDF("id")
      .select($"id", map(lit("y"), $"id" * 2, lit("x"), $"id").as("m"))
    val c = Seq(1, 2).toDF("id")
      .select($"id", map(lit("x"), $"id", lit("y"), $"id" * 3).as("m"))
    val (na, ha) = ContentHash.rowsAndHash(a)
    val (nb, hb) = ContentHash.rowsAndHash(b)
    val (_, hc) = ContentHash.rowsAndHash(c)
    assert(na === 2L && nb === 2L)
    assert(ha === hb, "entry order must not affect the hash")
    assert(ha !== hc, "a value change must flip the hash")
  }

  test("nested maps (array<struct<…,map>>, map<k,map>) canonicalize") {
    val mk = udf((i: Int) => Map("b" -> Map("q" -> i), "a" -> Map("p" -> i)))
    val mkRev = udf((i: Int) => Map("a" -> Map("p" -> i), "b" -> Map("q" -> i)))
    val a = Seq(1, 2).toDF("id").select($"id", mk($"id").as("mm"),
      array(struct($"id".as("k"), mk($"id").as("v"))).as("am"))
    val b = Seq(1, 2).toDF("id").select($"id", mkRev($"id").as("mm"),
      array(struct($"id".as("k"), mkRev($"id").as("v"))).as("am"))
    assert(ContentHash.rowsAndHash(a) === ContentHash.rowsAndHash(b))
  }

  test("row order and partitioning do not change the hash") {
    val a = spark.range(100).toDF("id").repartition(7)
    val b = spark.range(100).toDF("id").sort($"id".desc).coalesce(1)
    assert(ContentHash.rowsAndHash(a)._2 === ContentHash.rowsAndHash(b)._2)
    // multiplicity matters: a duplicated row is a different corpus
    val dup = a.union(spark.range(1).toDF("id"))
    assert(ContentHash.rowsAndHash(a)._2 !== ContentHash.rowsAndHash(dup)._2)
  }

  test("NULL struct hashes differently from a struct of NULLs") {
    val withMap = (c: org.apache.spark.sql.Column) =>
      struct(c.as("x"), map(lit("k"), c).as("m"))
    val nullStruct = Seq(1).toDF("id")
      .select(when(lit(false), withMap($"id")).as("s"))
    val structOfNulls = Seq(1).toDF("id")
      .select(withMap(lit(null).cast("int")).as("s"))
    assert(ContentHash.rowsAndHash(nullStruct)._2
      !== ContentHash.rowsAndHash(structOfNulls)._2)
  }
}
