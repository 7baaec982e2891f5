"""PySpark-native semi-supervised labelling engine.

A from-scratch, Spark-first re-expression of the capabilities of
ONSBigData/labelpropagation_clothing (semi-supervised label propagation
for classifying web-scraped product records), extended with the
large-scale data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) that a 100 TB training-data pipeline
needs.

Design stance (see SURVEY.md §7.0):
  - DataFrame/SQL API only; no RDDs.
  - Explicit ``product_id``/row keys everywhere (the reference relies on
    the pandas index for identity — SURVEY.md §1.1).
  - Native Catalyst expressions wherever possible; the single mandatory
    pandas UDF is the difflib partial-ratio kernel.
  - Every operator is a DataFrame -> DataFrame function, broadcast-small
    on the seed side, shuffle-minimal on the big side.
"""

__version__ = "0.1.0"
