"""Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the query / data-processing capabilities of
``smitkiri/ehr-relation-extraction`` (reference at ``/root/reference``, cited
as ``file:line`` throughout) on top of ``ray.data.Dataset`` streaming
pipelines over zero-copy Arrow batches.

Logical tables (all fixed ``pyarrow`` schemas, see :mod:`.schemas`):

    transcripts -> documents -> mentions -> candidates -> edges -> triples
                                    \\-> nodes (canonicalization)

The execution model is Ray-Data-first: every stage is a ``map_batches``
transform (actor pools where state is loaded once per worker), wide steps are
``groupby`` / ``sort`` hash shuffles with explicit keys, and the only
driver-side materializations are vocabulary-sized (distinct surfaces,
aggregate counters).
"""

__version__ = "0.1.0"
