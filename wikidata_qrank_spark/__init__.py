"""wikidata_qrank_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
brawer/wikidata-qrank (reference read-only at /root/reference).

Not a port: the reference is a single-machine Go pipeline over sorted
compressed text files; this engine declares the same *semantics* as lazy
DataFrame DAGs and lets Catalyst/Tungsten/AQE pick physical strategy.

Layout
------
functions/   scalar kernels: page-key normalization (formatLine parity),
             item parsing, ISO weeks, domain decoding
sources/     table loaders + the interleaved-document span model
operators/   mention detection, entity linking/canonicalization, triples,
             rank/signal aggregation, dedup, similarity, text analysis,
             multimodal plumbing
plans/       checkpoint manifest (resumability, lineage), pipeline driver
streaming/   Structured Streaming variants of the batch aggregations
"""

__version__ = "0.1.0"
