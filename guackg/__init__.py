"""guackg — a PySpark-native knowledge-graph construction engine.

A from-scratch reimagination of xkcd-2347/guac's four-stage dataflow
(collector → document-processor → ingest-predicates → graph-assembler,
see /root/reference/pkg/handler/collector/collector.go:34-44,
pkg/handler/processor/process/process.go:115-168,
pkg/ingestor/parser/parser.go:131-155,
pkg/assembler/clients/helpers/bulk.go:29-191) as a batch DataFrame
pipeline over web-page tables:

    extract → triples → link → canonicalize → materialize

Everything is declared with the DataFrame API so Catalyst/AQE plan the
physical execution; Python appears only as Arrow-vectorized pandas
UDFs (extract, triple extraction, minhash) — never row-at-a-time.
"""

__version__ = "0.1.0"
