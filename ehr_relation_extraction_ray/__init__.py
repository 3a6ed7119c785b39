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


def _configure_ray_data() -> None:
    """Engine-wide Ray Data context defaults.

    ``use_polars_sort=False``: Ray's polars-backed sort path lazy-imports
    polars inside sort tasks and intermittently fails with
    ``module 'polars' has no attribute 'Series'`` (a partial-import race
    observed twice across long multi-query sessions). The Arrow sort path
    is deterministic and within noise of polars at our block sizes, so the
    engine pins it. Runs in every process that imports the package
    (driver AND Ray workers deserializing UDFs).
    """
    try:
        from ray.data import DataContext

        DataContext.get_current().use_polars_sort = False
    except Exception:  # pragma: no cover - ray absent or API moved
        pass


_configure_ray_data()
