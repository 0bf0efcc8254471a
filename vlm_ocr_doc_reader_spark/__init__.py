"""vlm_ocr_doc_reader_spark — a PySpark-native main-content extraction engine.

Brand-new engine with the query/data-processing capabilities of the reference
``Dieugene/vlm-ocr-doc-reader`` (see /root/repo/SURVEY.md), re-expressed as
deterministic, vectorized PySpark DataFrame transforms plus pandas/Arrow UDFs
over a table of interleaved text+media documents
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.

Layout:
  extraction/   shared deterministic spec (regexes, classify, XY-cut) used by
                BOTH the single-node oracle and the Spark path
  operators/    reusable DataFrame operators (vote, chunking, registry merge,
                reconciliation, assembly)
  functions/    scalar column helpers (normalization, hashing, ids)
  plans/        end-to-end pipelines (extract: docs -> ordered spans)
  state/        checkpoint manifest + resume (anti-join)
  sources/      readers/writers
  datapipe/     training-data ops: dedup, similarity search, text analysis,
                multimodal stubs
  fixtures/     deterministic synthetic corpus generator
"""

__version__ = "0.1.0"
