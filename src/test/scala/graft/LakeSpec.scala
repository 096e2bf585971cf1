package graft

class LakeSpec extends SparkSpec {

  test("lake views expose SQL over all tables + relationalized children") {
    Lake.open(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) FROM lineitem").collect().head.getLong(0) > 0)
    assert(spark.sql(
      "SELECT count(*) FROM documents WHERE graft_simhash(text) != 0").collect()
      .head.getLong(0) > 0)
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val children = Lake.openRelationalized(spark, emb, "embeddings", Seq("vec_id"))
    assert(children.keySet === Set("embeddings", "embeddings_embedding"))
    assert(spark.sql("SELECT count(*) FROM embeddings_embedding").collect()
      .head.getLong(0) === 500L * 64)
  }
}
