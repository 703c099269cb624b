package graft.core

/** Core data model: one RDF triple.
  *
  * Subject `s` and predicate `p` are angle-bracketed URIs; object `o` is
  * either a URI `<...>` or a literal `"v"`, optionally suffixed with a
  * datatype (`"v"^^<type>`) or a language tag (`"v"@de`).
  *
  * Mirrors the reference data model (reference: package.scala:20). Every
  * pipeline stage works on this plus a `lang` partition column, i.e. the
  * working relation is a 4-string-column table `(s, p, o, lang)`.
  */
case class Triple(s: String, p: String, o: String)
