package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relationalize — flatten nested structs into underscore-named columns and
  * pivot every (possibly nested) array into a separate child table that
  * carries the parent's index columns.
  *
  * Reference semantics: Glue `DynamicFrame.relationalize` + `add_index_to_table`
  * (`/root/reference/src/glue/jobs/json_to_parquet.py:539-718`):
  *   - parent table: dotted struct paths `a.b` become `a_b`;
  *   - each array field `F` (path `p`) becomes child table
  *     `{root}_{p-with-underscores}` (lowercased), whose rows are the exploded
  *     elements keyed by the parent's index fields plus an `index` position
  *     column (Glue's synthetic `id` join is unnecessary here — we carry the
  *     parent key through the explode, eliminating reference join J2);
  *   - child column names strip the `{p}.val.` prefix; on collision the longer
  *     `{p}_{field}` form is used; if that still collides the fully qualified
  *     `{p}_val_{field}` form is kept (the reference leaves the dotted name;
  *     we keep parquet-safe underscores);
  *   - an array of scalars yields a single value column `{p}_val`.
  *
  * Scale notes: this is a pure narrow transformation — `explode` pipelines
  * inside whole-stage codegen with no shuffle and no staging directory
  * (unlike Glue relationalize, which spills to S3). Each child table is an
  * independent plan over the same scan, so with the parent cached (or the
  * scan columnar-pruned) producing N children costs N projection passes, not
  * N shuffles.
  */
object Relationalize {

  /** @param indexCols columns copied into every child table (logical key of
    *                  the parent, e.g. INDEX_FIELD_MAP entry + cohort).
    *                  Missing ones are ignored, matching the reference's
    *                  optional `ParticipantID` propagation.
    */
  def apply(df: DataFrame, rootName: String, indexCols: Seq[String]): Map[String, DataFrame] = {
    val carry = indexCols.filter(df.columns.contains)
    val out = scala.collection.mutable.LinkedHashMap[String, DataFrame]()

    // Walk the schema: scalar/struct leaves stay in the parent; arrays become
    // child tables (recursively).
    def walk(schema: StructType, path: Seq[String]): (Seq[(Seq[String], Column)], Seq[(Seq[String], ArrayType)]) = {
      val scalars = Seq.newBuilder[(Seq[String], Column)]
      val arrays = Seq.newBuilder[(Seq[String], ArrayType)]
      schema.fields.foreach { f =>
        val p = path :+ f.name
        f.dataType match {
          case s: StructType =>
            val (sc, ar) = walk(s, p)
            scalars ++= sc; arrays ++= ar
          case a: ArrayType => arrays += ((p, a))
          case _ => scalars += ((p, col(p.map(seg => s"`$seg`").mkString("."))))
        }
      }
      (scalars.result(), arrays.result())
    }

    def resolveNames(paths: Seq[Seq[String]]): Seq[String] = {
      // Parent columns: dotted path -> underscores. Paths are unique, but
      // their underscore flattenings can still collide (struct path `a.b`
      // vs a literal column named `a_b`) — and duplicate output names make
      // the parent table unwritable. First occurrence keeps the short
      // name; later collisions get a numeric suffix, like child tables.
      val seen = scala.collection.mutable.Set[String]()
      paths.map { p =>
        val base = p.mkString("_")
        val name =
          if (!seen.contains(base)) base
          else Iterator.from(2).map(i => s"${base}_$i").find(!seen.contains(_)).get
        seen += name
        name
      }
    }

    val (parentScalars, parentArrays) = walk(df.schema, Nil)
    val parentNames = resolveNames(parentScalars.map(_._1))
    out += rootName.toLowerCase -> df.select(
      parentScalars.zip(parentNames).map { case ((_, c), n) => c.as(n) }: _*)

    // Child-table naming per reference: root + field path, lowercased.
    // Distinct paths can flatten to the same name (`a.b` vs literal `a_b`);
    // uniquify with a numeric suffix rather than silently overwriting.
    def childName(p: Seq[String]): String = {
      val base = (rootName +: p).mkString("_").toLowerCase
      if (!out.contains(base)) base
      else Iterator.from(2).map(i => s"${base}_$i").find(!out.contains(_)).get
    }

    def emitChild(parent: DataFrame, carryCols: Seq[String], path: Seq[String],
                  arrayCol: Column, at: ArrayType): Unit = {
      val name = childName(path)
      val fieldPath = path.mkString("_")
      val posCol = if (carryCols.contains("index")) s"index_${path.length}" else "index"
      val exploded = parent.select(
        carryCols.map(col) :+ posexplode_outer(arrayCol).as(Seq(posCol, "__val")): _*)

      at.elementType match {
        case st: StructType =>
          // Expand struct element fields with reference rename rules.
          val existing = scala.collection.mutable.Set[String]((carryCols :+ posCol): _*)
          val keepCols = Seq.newBuilder[Column]
          keepCols ++= (carryCols :+ posCol).map(col)
          val nestedArrays = Seq.newBuilder[(String, ArrayType)]
          st.fields.foreach { f =>
            f.dataType match {
              case a: ArrayType => nestedArrays += ((f.name, a))
              case s: StructType =>
                // flatten nested struct fields as {sub}_{subsub}
                def flat(inner: StructType, ip: Seq[String]): Unit = inner.fields.foreach { g =>
                  val gp = ip :+ g.name
                  g.dataType match {
                    case s2: StructType => flat(s2, gp)
                    case a2: ArrayType => nestedArrays += ((gp.mkString("."), a2))
                    case _ =>
                      val n = pickName(gp.mkString("_"))
                      keepCols += col(("__val" +: gp).map(x => s"`$x`").mkString(".")).as(n)
                  }
                }
                flat(s, Seq(f.name))
              case _ =>
                val n = pickName(f.name)
                keepCols += col(s"__val.`${f.name}`").as(n)
            }
          }
          def pickName(short: String): String = {
            val succinct = short.replace(".", "_")
            val longer = s"${fieldPath}_$succinct"
            val full = s"${fieldPath}_val_$succinct"
            val chosen =
              if (!existing.contains(succinct)) succinct
              else if (!existing.contains(longer)) longer
              else full
            existing += chosen
            chosen
          }
          val childDf = exploded.select(keepCols.result(): _*)
          out += name -> childDf
          // Nested arrays inside the element recurse with the child's carry
          // (parent index + this level's position).
          nestedArrays.result().foreach { case (sub, a) =>
            val subSegs = sub.split('.').toSeq
            val nestedCol = sub.replace('.', '_')
            val nestedParent = exploded.select(
              (carryCols :+ posCol).map(col) :+
                col(("__val" +: subSegs).map(x => s"`$x`").mkString(".")).as(nestedCol): _*)
            emitChild(nestedParent, carryCols :+ posCol, path ++ subSegs, col(nestedCol), a)
          }
        case inner: ArrayType =>
          // Array of arrays: recurse — the grandchild is keyed by both
          // positions (Glue's `{path}.val.val` chain, underscore-named).
          val renamed = exploded.withColumnRenamed("__val", s"${fieldPath}_val")
          emitChild(renamed, carryCols :+ posCol, path :+ "val",
            col(s"${fieldPath}_val"), inner)
        case _ =>
          // Array of scalars: single value column `{path}_val`.
          out += name -> exploded.withColumnRenamed("__val", s"${fieldPath}_val")
      }
    }

    parentArrays.foreach { case (p, a) =>
      emitChild(df, carry, p, col(p.map(s => s"`$s`").mkString(".")), a)
    }
    out.toMap
  }

  /** True when the schema contains any struct or array column — the
    * reference's `has_nested_fields` (`json_to_parquet.py:108-128`).
    */
  def hasNestedFields(schema: StructType): Boolean =
    schema.fields.exists(f => f.dataType match {
      case _: StructType | _: ArrayType => true
      case _ => false
    })
}
