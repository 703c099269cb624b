package graft.core

/** Fluent conditional pipeline stage.
  *
  * Replaces the `uk.co.gresearch:spark-extension` `.when(cond).call(f)`
  * idiom the reference leans on for config-flag-driven stages (reference:
  * DbpediaDgraphSparkApp.scala:184-185, 220-228; pom.xml:62-66). The repo
  * builds offline against stock Spark jars, so this is a from-scratch
  * reimplementation of the *semantics*: apply `f` only when `cond` holds.
  *
  * Works for any `T` (Dataset, DataFrame, DataFrameWriter, ...).
  */
object Implicits {

  implicit class ConditionalCall[T](private val t: T) extends AnyVal {
    def when(condition: Boolean): Conditional[T] = new Conditional(t, condition)
  }

  final class Conditional[T](t: T, condition: Boolean) {
    def call(f: T => T): T = if (condition) f(t) else t
  }
}
