"""big_data_analysis_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities surveyed in SURVEY.md (the reference
checkout at /root/reference is empty — see SURVEY.md §0 — so §2's
operator inventory is the authoritative capability list).

Design: DataFrame/SQL first, Catalyst does the optimization; Pandas
UDFs over Arrow only where built-ins can't express the semantics;
Structured Streaming for the event stream; every operator written for
100 TB scale (partition discipline, broadcast hints for bounded dims,
no driver-side collect in any operator path).

Public surface:
  - ``api``                    — fixture-independent library kernels
                                 (tokenize/tfidf, dedup, clusters,
                                 connected components, sessionize,
                                 fill/interpolate, EWMA, PageRank,
                                 kNN, chunking, MinHash pairs,
                                 splits, BPE training)
  - ``session.get_spark()``    — tuned local session builder
  - ``registry.REGISTRY``      — name -> QuerySpec (fn + oracle SQL)
  - ``registry.load_all()``    — import every operator module
  - ``python -m big_data_analysis_spark.run <query> [...]`` — CLI
    runner for any registered query (--explain / --limit / --sf-dir)
"""

__version__ = "0.1.0"
