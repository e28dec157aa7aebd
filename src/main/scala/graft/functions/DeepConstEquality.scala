package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Value equality for Catalyst expressions that embed constant
  * `Array` fields (centroid tables, LSH planes, PQ codebooks, JL
  * projection matrices). Scala's synthesized case-class `equals`
  * compares arrays by REFERENCE, so two semantically identical
  * expressions built from separate (but equal) constant arrays would
  * compare unequal — defeating `canonicalized`/`semanticEquals`,
  * common-subexpression elimination, and exchange reuse. Mixing this
  * in replaces field comparison with `java.util.Arrays.deepEquals`
  * over the product elements: arrays (nested included) compare by
  * value, child `Expression`s and boxed primitives fall through to
  * their own `equals`.
  */
trait DeepConstEquality { self: Expression with Product =>

  override def equals(o: Any): Boolean = o match {
    case that: Product if that.getClass == this.getClass =>
      java.util.Arrays.deepEquals(
        this.productIterator.toArray[Any].asInstanceOf[Array[AnyRef]],
        that.productIterator.toArray[Any].asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Arrays.deepHashCode(
      productIterator.toArray[Any].asInstanceOf[Array[AnyRef]])
}
