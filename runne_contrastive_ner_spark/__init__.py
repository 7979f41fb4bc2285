"""runne_contrastive_ner_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the data-processing capabilities of the reference
``bond005/runne_contrastive_ner`` (nested NER over 29 RuNNE entity types),
re-expressed as Spark DataFrame operators and vectorized pandas/Arrow UDFs.

Layout
------
functions/   pure-Python + numpy kernels that run *inside* pandas UDFs
             (text normalization, sentenization, offset-exact tokenization,
             constrained greedy span decoding, span embeddings, pluggable scorer)
sources/     scans & sinks: RuNNE JSONL, TableIO (Iceberg with Parquet fallback),
             deterministic synthetic transcript generation
operators/   DataFrame-level operators: mention detection, predicate induction,
             entity linking, connected components, triple materialization,
             dedup family, similarity search, text analysis, relational ops
plans/       staged pipeline with per-stage manifests (lineage + metrics) and
             checkpointed resume
streaming/   incremental / checkpointed-batch execution helpers

Everything is DataFrame + pandas/Arrow UDFs: no RDDs, no per-row Python UDFs,
no custom Catalyst rules (see SURVEY.md §7.0).
"""

__version__ = "0.1.0"
