"""Serial reference-semantics oracle — re-exported for the test suite.

The implementation lives in ``ehr_relation_extraction_ray.serial_oracle``
because the driver's correctness gate also uses it to build parquet
fixtures for non-SQL-expressible pipelines (see that module's docstring).
It remains a deliberately naive, single-process transcription of the
reference's semantics — never the engine's distributed code.
"""

from ehr_relation_extraction_ray.serial_oracle import (  # noqa: F401
    NEW_LINE_IND,
    SENT_END_IND,
    assemble_serial,
    naive_char_windows,
    naive_dict_ner,
    naive_split_points,
    naive_token_maps,
    naive_triples,
    reference_triples,
)
