package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** MySQL-exact GROUP_CONCAT(DISTINCT) as a typed Aggregator (SURVEY §2.10):
  * the library default (Relational.groupConcatDistinct) SORTS for determinism;
  * this variant reproduces MySQL's contract precisely when compatibility
  * matters — DISTINCT, configurable separator, and truncation at
  * `group_concat_max_len` (default 1024 chars, like the server default).
  * Output order is made deterministic by sorting (MySQL's is unspecified
  * without ORDER BY — sorted is a legal realization of the contract).
  *
  * Merge-friendly buffer (a set) -> partial aggregation works: the shuffle
  * carries distinct values per group, not raw rows. */
class GroupConcatDistinct(sep: String = ",", maxLen: Int = 1024)
    extends Aggregator[String, Set[String], String] {

  override def zero: Set[String] = Set.empty

  override def reduce(b: Set[String], a: String): Set[String] =
    if (a == null) b else b + a

  override def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 ++ b2

  override def finish(r: Set[String]): String =
    if (r.isEmpty) null // MySQL: no non-null values -> NULL
    else {
      val full = r.toSeq.sorted.mkString(sep)
      if (full.length <= maxLen) full else full.substring(0, maxLen)
    }

  override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object GroupConcatDistinct {
  def apply(sep: String = ",", maxLen: Int = 1024): TypedColumn[String, String] =
    new GroupConcatDistinct(sep, maxLen).toColumn
}
