package graft.queries

/** LLM-training-data pipeline operators (dedup, similarity search, text
  * analysis) over the documents/embeddings tables.
  */
object PipelineQueries {
  def defs: Seq[QueryDef] = Seq()
}
