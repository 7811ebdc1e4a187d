"""fcrepo3_rdf_extractor_spark — a from-scratch PySpark-native
knowledge-graph construction engine with the capabilities of
Smithsonian/fcrepo3-rdf-extractor.

Layers:
- pure-Python core: ``vocab``, ``terms``, ``foxml``, ``rdfxml``, ``dc``,
  ``extract`` (no Spark imports; runs inside pandas UDFs)
- ``operators/``: vectorized extraction, filters, dedup, canonicalization,
  training-data ops (minhash/simhash/ANN/text-quality/multimodal)
- ``sources/``: source-table readers/synthesizers, N-Quads sink
- ``plans/``: the end-to-end extraction pipeline + checkpoint/resume
- ``streaming/``: Structured Streaming variant
"""

__version__ = "0.1.0"
