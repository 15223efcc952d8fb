"""remine_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the capabilities of ReMine (WSDM'19 open information extraction).

Pipeline: pages (url, warc_ts, html, text, lang) → extract_text →
tokenize_tag → quality-phrase mining → dependency-constrained Viterbi
segmentation (ReMine-Local) → shortest-dependency-path tuple extraction →
TransE-style re-ranking (ReMine-Global) → (subj, pred, obj) triples.

All heavy lifting is DataFrame/Catalyst; per-sentence algorithmic work rides
in Arrow-batched pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"
