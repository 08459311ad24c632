"""entity_extractor_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of adsabs/entity_extractor.

Pipeline: gazetteer mention detection (Arrow-batched automaton scan) →
entity-link scoring (TF-IDF/char-ngram similarity + keyword heuristics) →
likelihood classification → alias canonicalization (connected components)
→ (subj, pred, obj) triple + node/edge materialization, all expressed as
pyspark.sql DataFrame plans so Catalyst/AQE pick the physical strategy.

Reference semantics: /root/reference (adsabs/entity_extractor, 2025-07-25).
"""

__version__ = "0.1.0"
