package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.sgml.Pwp

/** Spark surface of the PWP template engine (SURVEY.md §2.5;
  * `pwp.pl — pwp_xml/3` [V] re-expressed relationally — see
  * graft.sgml.Pwp for the accepted dialect).
  *
  * Shape: one driver-side template, rendered once per input row in a
  * single narrow mapPartitions stage — the template parses ONCE per
  * partition, each row's columns become the bindings (scalar columns
  * bind `$name`; array<struct> columns bind `pwp:ask` row sets, which is
  * exactly the correlated-lateral-join reading of the reference's goal
  * solutions). Nothing shuffles here; building the nested row sets
  * upstream (groupBy + collect_list) is the caller's one exchange.
  */
object PwpOps {

  /** Render `template` per row of `df`. Returns `(keyCol, pwp_out)` —
    * keyCol is carried through as a string (cast back as needed). */
  def render(df: DataFrame, template: String, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = df.schema
    val ki = schema.fieldIndex(keyCol)
    df.mapPartitions { it =>
      val tpl = Pwp.parseTemplate(template) // once per partition, task-local
      it.map { r =>
        (String.valueOf(r.get(ki)), Pwp.render(tpl, rowBindings(r, schema)))
      }
    }.toDF(keyCol, "pwp_out")
  }

  private[graft] def rowBindings(r: Row, schema: StructType): Pwp.Bindings = {
    val fs = schema.fields
    val b = Map.newBuilder[String, Pwp.Val]
    var i = 0
    while (i < fs.length) {
      b += fs(i).name -> toVal(r.get(i), fs(i).dataType)
      i += 1
    }
    b.result()
  }

  private def toVal(v: Any, dt: DataType): Pwp.Val = dt match {
    case ArrayType(st: StructType, _) =>
      val rows =
        if (v == null) Seq.empty[Map[String, Pwp.Val]]
        else v.asInstanceOf[scala.collection.Seq[Row]].toSeq.map { rr =>
          val fs = st.fields
          val m = Map.newBuilder[String, Pwp.Val]
          var i = 0
          while (i < fs.length) {
            m += fs(i).name -> toVal(rr.get(i), fs(i).dataType)
            i += 1
          }
          m.result()
        }
      Pwp.Rows(rows)
    case _ => Pwp.Scalar(if (v == null) "" else String.valueOf(v))
  }
}
