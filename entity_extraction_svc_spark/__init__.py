"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of
``deeppavlov/entity_extraction_svc`` (reference at /root/reference) as an
idiomatic Spark batch pipeline:

    pages(url, warc_ts, html, text, lang)
      -> extract_text      (byte-identical boilerplate strip, pandas UDF)
      -> chunk             (sentence packing, mapInPandas)
      -> detect_mentions   (NER stand-in w/ reference BIO-decode semantics)
      -> classify_tags     (EL fine-tag top-3)
      -> link_entities     (inverted-index candidate gen + fuzzy scoring +
                            connection ranking, applyInPandas by url)
      -> canonicalize      (connected-components alias clustering)
      -> triples           ((subj, pred, obj) partitioned by subject hash)

plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) on top of the same engine.
"""

__version__ = "0.1.0"
