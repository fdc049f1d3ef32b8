package graft

import graft.queries.QueryDef

/** LLM-training-data pipeline extensions (dedup, similarity search, text
  * analysis, multimodal) — filled in as each operator lands. */
object PipelineQueries {
  val defs: Seq[(String, QueryDef)] = Seq()
}
