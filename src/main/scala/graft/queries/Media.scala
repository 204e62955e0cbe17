package graft.queries

import graft.functions.Multimodal

/** Multimodal pipeline exposure in the correctness catalog. */
object Media extends QueryModule {
  override def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q50_multimodal_features",
      (s, d) => Multimodal.featureQuery(s, d),
      Some(Multimodal.featureOracleSql)),
  )
}
